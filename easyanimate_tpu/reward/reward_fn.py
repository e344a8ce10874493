"""Differentiable reward models for reward-backprop training.

Parity target: easyanimate/reward/reward_fn.py -- AestheticReward (:30),
HPSReward (:99), PickScoreReward (:193), MPSReward (:256): all expose
`loss_fn(frames, prompts) -> (loss, reward)` and are differentiable w.r.t.
frames so the sampler can be trained through them.

TPU port: the CLIP towers run as transformers Flax classes (weights load
from the usual HF/HPS/PickScore checkpoints via from_pt); HPS and PickScore
are CLIP image-text similarities with their respective fine-tuned weights,
Aesthetic adds an MLP head over image embeddings. MPS's vendored
cross-attention scorer is not ported yet (raise with a pointer).

`frames`: (B, T, H, W, C) float in [0, 1]; a uniform subset of frames is
scored and averaged (reference scores 4 sampled frames,
train_reward_lora.py:144-206).
"""
import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def _preprocess(frames: jnp.ndarray, size: int) -> jnp.ndarray:
    """(B,T,H,W,C) in [0,1] -> (B*T, C, size, size) CLIP-normalized."""
    b, t, h, w, c = frames.shape
    x = frames.reshape(b * t, h, w, c)
    x = jax.image.resize(x, (b * t, size, size, c), "bilinear",
                         antialias=False)
    x = (x - jnp.asarray(_CLIP_MEAN)) / jnp.asarray(_CLIP_STD)
    return jnp.transpose(x, (0, 3, 1, 2))


def _subsample(frames: jnp.ndarray, num: int) -> jnp.ndarray:
    t = frames.shape[1]
    idx = jnp.linspace(0, t - 1, min(num, t)).astype(jnp.int32)
    return frames[:, idx]


@dataclasses.dataclass
class CLIPScoreReward:
    """CLIP image-text cosine similarity; the base class for HPS/PickScore
    (which are the same computation with fine-tuned weights)."""

    model: object                  # FlaxCLIPModel
    tokenizer: object
    num_frames: int = 4

    @classmethod
    def from_pretrained(cls, path: str, **kw):
        from transformers import AutoTokenizer, FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(path, from_pt=True)
        tok = AutoTokenizer.from_pretrained(path)
        return cls(model=model, tokenizer=tok, **kw)

    def _image_size(self) -> int:
        return self.model.config.vision_config.image_size

    def _text_features(self, prompts: Sequence[str]):
        ids = self.tokenizer(list(prompts), padding="max_length",
                             truncation=True,
                             max_length=self.tokenizer.model_max_length
                             if self.tokenizer.model_max_length < 1e6 else 77,
                             return_tensors="np")
        feat = self.model.get_text_features(
            input_ids=ids["input_ids"],
            attention_mask=ids.get("attention_mask"))
        return feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)

    def __call__(self, frames: jnp.ndarray, prompts: Sequence[str]):
        """-> (loss, reward); loss = -reward."""
        sub = _subsample(frames, self.num_frames)
        b, t = sub.shape[:2]
        pix = _preprocess(sub, self._image_size())
        img = self.model.get_image_features(pixel_values=pix)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = jax.lax.stop_gradient(self._text_features(prompts))
        txt = jnp.repeat(txt, t, axis=0)
        scale = jnp.exp(self.model.params["logit_scale"])
        reward = jnp.mean(jnp.sum(img * txt, axis=-1) * scale)
        return -reward, reward


class HPSReward(CLIPScoreReward):
    """Human Preference Score v2/v2.1: CLIP-H fine-tune, same scoring."""


class PickScoreReward(CLIPScoreReward):
    """PickScore: CLIP-H fine-tune scoring image-text preference."""


@dataclasses.dataclass
class AestheticReward:
    """CLIP/SigLIP image embeddings + linear MLP aesthetic head
    (reward/reward_fn.py:30-97 + aesthetic_predictor head)."""

    model: object                  # FlaxCLIPModel (vision used)
    head_params: dict              # MLP weights {w0,b0,...}
    num_frames: int = 4

    @classmethod
    def from_pretrained(cls, clip_path: str, head_state_dict=None, **kw):
        from transformers import FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(clip_path, from_pt=True)
        head = convert_aesthetic_head(head_state_dict) if head_state_dict \
            else None
        if head is None:
            raise ValueError("aesthetic head weights required "
                             "(improved-aesthetic-predictor linear stack)")
        return cls(model=model, head_params=head, **kw)

    def __call__(self, frames: jnp.ndarray, prompts=None):
        sub = _subsample(frames, self.num_frames)
        pix = _preprocess(sub, self.model.config.vision_config.image_size)
        emb = self.model.get_image_features(pixel_values=pix)
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        h = emb
        n_layers = len([k for k in self.head_params if k.startswith("w")])
        for i in range(n_layers):
            h = h @ self.head_params[f"w{i}"] + self.head_params[f"b{i}"]
            if i < n_layers - 1:
                h = jax.nn.relu(h)
        reward = jnp.mean(h)
        return -reward, reward


def convert_aesthetic_head(sd) -> dict:
    """torch improved-aesthetic-predictor `layers.N.{weight,bias}` -> jnp."""
    out = {}
    i = 0
    for k in sorted(sd, key=lambda s: int(s.split(".")[1])):
        if k.endswith("weight"):
            out[f"w{i}"] = jnp.asarray(np.asarray(sd[k]).T)
        elif k.endswith("bias"):
            out[f"b{i}"] = jnp.asarray(np.asarray(sd[k]))
            i += 1
    return out


def MPSReward(*args, **kw):
    """MPS scorer lives in mps.py (flax port of the vendored cross-attention
    model); kept here for the reference's import location."""
    from .mps import MPSReward as _MPS

    return _MPS(*args, **kw)
