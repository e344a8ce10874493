"""Reward model tests on a tiny random FlaxCLIP."""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clip():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from transformers import CLIPConfig, CLIPTokenizerFast, FlaxCLIPModel

        cfg = CLIPConfig(
            text_config=dict(hidden_size=32, intermediate_size=64,
                             num_hidden_layers=2, num_attention_heads=2,
                             vocab_size=1000, max_position_embeddings=77),
            vision_config=dict(hidden_size=32, intermediate_size=64,
                               num_hidden_layers=2, num_attention_heads=2,
                               image_size=32, patch_size=8),
            projection_dim=16)
        model = FlaxCLIPModel(cfg, seed=0)
    try:
        tok = CLIPTokenizerFast.from_pretrained("openai/clip-vit-base-patch32")
    except Exception:
        pytest.skip("no tokenizer available offline")
    return model, tok


class _FakeTok:
    model_max_length = 8

    def __call__(self, prompts, **kw):
        n = len(prompts)
        return {"input_ids": np.ones((n, 8), np.int32),
                "attention_mask": np.ones((n, 8), np.int32)}


def test_clip_score_reward_differentiable(rng, tiny_clip=None):
    from transformers import CLIPConfig, FlaxCLIPModel

    from easyanimate_tpu.reward import CLIPScoreReward

    cfg = CLIPConfig(
        text_config=dict(hidden_size=32, intermediate_size=64,
                         num_hidden_layers=2, num_attention_heads=2,
                         vocab_size=1000, max_position_embeddings=16),
        vision_config=dict(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=8),
        projection_dim=16)
    model = FlaxCLIPModel(cfg, seed=0)
    reward = CLIPScoreReward(model=model, tokenizer=_FakeTok(), num_frames=2)
    frames = jnp.asarray(rng.random((1, 4, 24, 24, 3)).astype(np.float32))

    def loss(fr):
        l, r = reward(fr, ["a cat"])
        return l

    g = jax.grad(loss)(frames)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0  # grads reach the frames


def test_aesthetic_head_conversion():
    import torch

    from easyanimate_tpu.reward.reward_fn import convert_aesthetic_head

    sd = {
        "layers.0.weight": torch.randn(8, 16),
        "layers.0.bias": torch.randn(8),
        "layers.2.weight": torch.randn(1, 8),
        "layers.2.bias": torch.randn(1),
    }
    head = convert_aesthetic_head({k: v.numpy() for k, v in sd.items()})
    assert head["w0"].shape == (16, 8) and head["w1"].shape == (8, 1)
