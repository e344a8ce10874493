"""Prompt-encoder coverage: Bert + mT5 dual-text wrappers (V4/V5) actually
run, and loader.load_text_encoders dispatches per text_encoder config."""
import json

import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_bert():
    from transformers import BertConfig, FlaxBertModel

    cfg = BertConfig(vocab_size=32, hidden_size=16, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=64)
    return FlaxBertModel(cfg, _do_init=True)


def _bert_tokenizer(tmp_path):
    from transformers import BertTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "a", "cat",
             "walks", "on", "the", "grass", "video"]
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(vocab))
    return BertTokenizer(str(p))


class _FakeSPTokenizer:
    """Duck-typed tokenizer (sentencepiece assets aren't synthesizable
    offline); exercises the flax mT5 tower itself."""

    def __call__(self, prompts, padding=None, max_length=None,
                 truncation=None, return_tensors=None, **kw):
        b = len(prompts)
        ids = np.zeros((b, max_length), np.int32)
        mask = np.zeros((b, max_length), np.int32)
        for i, p in enumerate(prompts):
            n = min(max(len(p.split()), 1), max_length)
            ids[i, :n] = (np.arange(n) % 30) + 1
            mask[i, :n] = 1
        return {"input_ids": ids, "attention_mask": mask}


def test_bert_encoder_runs(tmp_path):
    from easyanimate_tpu.models.text.encoders import BertTextEncoder

    enc = BertTextEncoder(model=_tiny_bert(),
                          tokenizer=_bert_tokenizer(tmp_path), max_length=12)
    emb, mask = enc(["a cat walks on the grass", "video"])
    assert emb.shape == (2, 12, 16)
    assert mask.shape == (2, 12)
    assert np.isfinite(np.asarray(emb)).all()
    assert int(mask[0].sum()) > int(mask[1].sum())


def test_mt5_encoder_runs():
    from transformers import FlaxMT5EncoderModel, MT5Config

    from easyanimate_tpu.models.text.encoders import MT5TextEncoder

    cfg = MT5Config(vocab_size=64, d_model=16, d_kv=8, d_ff=32,
                    num_layers=1, num_heads=2)
    enc = MT5TextEncoder(model=FlaxMT5EncoderModel(cfg, _do_init=True),
                         tokenizer=_FakeSPTokenizer(), max_length=10)
    emb, mask = enc(["a cat", "a longer test prompt here"])
    assert emb.shape == (2, 10, 16)
    assert np.isfinite(np.asarray(emb)).all()


def test_load_text_encoders_dispatch(tmp_path, monkeypatch):
    """Directory layout + config.json -> the right encoder stack."""
    import easyanimate_tpu.models.text.encoders as encoders_mod
    from easyanimate_tpu.loader import load_text_encoders

    built = []

    class _Fake:
        def __init__(self, kind, dim):
            self.kind, self.dim = kind, dim

        def __call__(self, prompts):
            return (jnp.zeros((len(prompts), 4, self.dim)),
                    jnp.ones((len(prompts), 4)))

    def fake_build(kind, path, **kw):
        built.append((kind, path))
        return _Fake(kind, {"qwen2_vl": 8, "bert": 6, "mt5": 7}[kind])

    monkeypatch.setattr(encoders_mod, "build_text_encoder", fake_build)

    # V5.1: qwen2 single stream
    q = tmp_path / "v51" / "text_encoder"
    q.mkdir(parents=True)
    (q / "config.json").write_text(json.dumps({"model_type": "qwen2_vl"}))
    enc = load_text_encoders(str(tmp_path / "v51"))
    out = enc(["hi"])
    assert out["text"].shape == (1, 4, 8) and "text_t5" not in out

    # V4/V5: bert + mT5 dual stream
    b = tmp_path / "v5" / "text_encoder"
    b.mkdir(parents=True)
    (b / "config.json").write_text(json.dumps({"model_type": "bert"}))
    m = tmp_path / "v5" / "text_encoder_2"
    m.mkdir()
    (m / "config.json").write_text(json.dumps({"model_type": "mt5"}))
    enc = load_text_encoders(str(tmp_path / "v5"))
    out = enc(["hi", "there"])
    assert out["text"].shape == (2, 4, 6)
    assert out["text_t5"].shape == (2, 4, 7)

    # unknown type fails loud
    u = tmp_path / "vx" / "text_encoder"
    u.mkdir(parents=True)
    (u / "config.json").write_text(json.dumps({"model_type": "gpt9"}))
    with pytest.raises(ValueError):
        load_text_encoders(str(tmp_path / "vx"))
