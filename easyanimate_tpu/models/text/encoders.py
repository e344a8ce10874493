"""Prompt encoders for every model generation.

Parity target: pipeline encode_prompt (pipeline_easyanimate.py:377-463) and
the per-edition text_encoder_kwargs:
  V1-V3: T5/mT5 encoder last_hidden_state
  V4/V5: dual Bert-CLIP + mT5 (enable_multi_text_encoder)
  V5.1:  Qwen2-VL chat-template hidden_states[-2] (replace_t5_to_llm)

Bert/mT5 run as transformers Flax classes (load fine-tuned weights with
from_pt=True); Qwen2 uses the in-repo flax tower (models/text/qwen2.py).
Each encoder returns (embeds [B,S,D], mask [B,S]).
"""
import dataclasses
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class BertTextEncoder:
    model: object
    tokenizer: object
    max_length: int = 77

    @classmethod
    def from_pretrained(cls, path: str, **kw):
        from transformers import AutoTokenizer, FlaxBertModel

        return cls(model=FlaxBertModel.from_pretrained(path, from_pt=True),
                   tokenizer=AutoTokenizer.from_pretrained(path), **kw)

    def __call__(self, prompts: Sequence[str]):
        ids = self.tokenizer(list(prompts), padding="max_length",
                             max_length=self.max_length, truncation=True,
                             return_tensors="np")
        out = self.model(input_ids=ids["input_ids"],
                         attention_mask=ids["attention_mask"])
        return out.last_hidden_state, jnp.asarray(ids["attention_mask"])


@dataclasses.dataclass
class MT5TextEncoder:
    model: object
    tokenizer: object
    max_length: int = 256

    @classmethod
    def from_pretrained(cls, path: str, **kw):
        from transformers import AutoTokenizer, FlaxMT5EncoderModel

        return cls(
            model=FlaxMT5EncoderModel.from_pretrained(path, from_pt=True),
            tokenizer=AutoTokenizer.from_pretrained(path), **kw)

    def __call__(self, prompts: Sequence[str]):
        ids = self.tokenizer(list(prompts), padding="max_length",
                             max_length=self.max_length, truncation=True,
                             return_tensors="np")
        out = self.model(input_ids=ids["input_ids"],
                         attention_mask=ids["attention_mask"])
        return out.last_hidden_state, jnp.asarray(ids["attention_mask"])


@dataclasses.dataclass
class QwenVLTextEncoder:
    """V5.1 prompt encoding: chat template + hidden_states[-2]
    (see models/text/qwen2.py for the tower)."""

    encoder: object          # Qwen2TextEncoder
    variables: dict
    tokenizer: object
    max_length: int = 256

    @classmethod
    def from_pretrained(cls, path: str, **kw):
        import glob
        import os

        from transformers import AutoTokenizer

        from ...models.convert import load_safetensors
        from .qwen2 import Qwen2Config, Qwen2TextEncoder, convert_qwen2_state_dict

        sd = {}
        for f in glob.glob(os.path.join(path, "*.safetensors")):
            sd.update(load_safetensors(f))
        cfg = Qwen2Config()
        return cls(encoder=Qwen2TextEncoder(cfg),
                   variables=convert_qwen2_state_dict(sd, cfg),
                   tokenizer=AutoTokenizer.from_pretrained(path), **kw)

    def __call__(self, prompts: Sequence[str]):
        texts = []
        for p in prompts:
            msg = [{"role": "user",
                    "content": [{"type": "text", "text": p}]}]
            texts.append(self.tokenizer.apply_chat_template(
                msg, tokenize=False, add_generation_prompt=True))
        ids = self.tokenizer(texts, padding="max_length",
                             max_length=self.max_length, truncation=True,
                             padding_side="right", return_tensors="np")
        emb = self.encoder.apply(self.variables,
                                 jnp.asarray(ids["input_ids"]),
                                 jnp.asarray(ids["attention_mask"]))
        return emb, jnp.asarray(ids["attention_mask"])


def build_text_encoder(kind: str, path: str, **kw):
    return {"bert": BertTextEncoder, "mt5": MT5TextEncoder,
            "qwen2_vl": QwenVLTextEncoder}[kind].from_pretrained(path, **kw)
