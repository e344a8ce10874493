"""MPS (Multi-dimensional Preference Score) reward model.

Parity target: reward/reward_fn.py:256-344 + the vendored cross-attention
scorer reward/MPS/trainer/models/cross_modeling.py (CrossAttention :172-258,
ParallelTransformerBlock :78-170, Cross_model :261-290) and clip_model.py
(condition-similarity mask :126-129, first-token similarity output :143).

Flow: per-token projected CLIP-H features for image (257 tokens), prompt
(77) and a fixed "condition" prompt; a mask keeps only prompt tokens whose
max similarity to any condition token exceeds 0.01 of the max; 4 cross/self
layers refine the image tokens against the masked prompt; reward is the
cosine similarity between the refined CLS token and the prompt EOS feature.

The CLIP backbone is a transformers FlaxCLIPModel (per-token projections
computed here); the cross model weights convert via
`convert_mps_cross_state_dict`.
"""
import dataclasses
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MPS_CONDITION = ("light, color, clarity, tone, style, ambiance, artistry, "
                 "shape, face, hair, hands, limbs, structure, instance, "
                 "texture, quantity, attributes, position, number, location, "
                 "word, things.")


def _rotary(positions, t):
    """rotate-half rotary (cross_modeling.py:43-66) on the last dim."""
    d = t.shape[-1]
    inv = 1.0 / (10000 ** (np.arange(0, d, 2, dtype=np.float32) / d))
    ang = positions[:, None].astype(jnp.float32) * inv[None]
    emb = jnp.concatenate([ang, ang], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    t1, t2 = jnp.split(t.astype(jnp.float32), 2, axis=-1)
    rot = jnp.concatenate([-t2, t1], axis=-1)
    return (t * cos + rot * sin).astype(t.dtype)


class _CrossAttention(nn.Module):
    """Multi-query cross attention with single-head K/V and parallel SwiGLU
    feedforward (cross_modeling.py:172-258)."""

    dim: int
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, mask):
        h, hd = self.heads, self.dim_head
        xn = nn.LayerNorm(use_bias=False, dtype=jnp.float32, name="norm")(x)
        q = nn.Dense(h * hd, use_bias=False, dtype=self.dtype, name="to_q")(xn)
        kv = nn.Dense(2 * hd, use_bias=False, dtype=self.dtype,
                      name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        b, n, _ = x.shape
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3) * (hd ** -0.5)
        sim = jnp.einsum("bhid,bjd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim + mask[:, None]
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="to_out")(out)
        # parallel SwiGLU feedforward on the queries
        ff = nn.Dense(2 * self.ff_mult * self.dim, use_bias=False,
                      dtype=self.dtype, name="ff_in")(xn)
        a, g = jnp.split(ff, 2, axis=-1)
        ff = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                      name="ff_out")(a * nn.silu(g))
        return out + ff


class _ParallelBlock(nn.Module):
    """PaLM-style parallel attention+FF with rotary q/k and multi-query
    single-head K/V (cross_modeling.py:78-170)."""

    dim: int
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, hd = self.heads, self.dim_head
        ffd = self.ff_mult * self.dim
        xn = nn.LayerNorm(use_bias=False, dtype=jnp.float32, name="norm")(x)
        fused = nn.Dense(h * hd + 2 * hd + 2 * ffd, use_bias=False,
                         dtype=self.dtype, name="fused_proj")(xn)
        q, k, v, ff = jnp.split(
            fused, [h * hd, h * hd + hd, h * hd + 2 * hd], axis=-1)
        b, n, _ = x.shape
        q = q.reshape(b, n, h, hd).transpose(0, 2, 1, 3)
        pos = jnp.arange(n)
        q = _rotary(pos, q)
        k = _rotary(pos, k)
        q = q * (hd ** -0.5)
        sim = jnp.einsum("bhid,bjd->bhij", q, k,
                         preferred_element_type=jnp.float32)
        sim = sim - jax.lax.stop_gradient(sim.max(axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjd->bhid", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * hd)
        out = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="attn_out")(out)
        a, g = jnp.split(ff, 2, axis=-1)
        ffo = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                       name="ff_out")(a * nn.silu(g))
        return out + ffo


class MPSCrossModel(nn.Module):
    """4 x [Residual(cross-attn), Residual(parallel block)]
    (cross_modeling.py:261-290)."""

    dim: int = 1024
    layer_num: int = 4
    heads: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image_tokens, text_tokens, mask):
        x = image_tokens
        for i in range(self.layer_num):
            x = x + _CrossAttention(self.dim, self.heads, dtype=self.dtype,
                                    name=f"cross{i}")(x, text_tokens, mask)
            x = x + _ParallelBlock(self.dim, self.heads, dtype=self.dtype,
                                   name=f"self{i}")(x)
        return x


def mps_condition_mask(text_f, condition_f, threshold: float = 0.01):
    """prompt-token mask from condition similarity (clip_model.py:126-129):
    keep tokens whose max similarity to any condition token exceeds
    `threshold` of the global max."""
    sim = jnp.einsum("bid,bjd->bji", text_f, condition_f)
    sim = sim.max(axis=1, keepdims=True)           # (B, 1, 77)
    sim = sim / sim.max()
    return jnp.where(sim > threshold, 0.0, -jnp.inf)


def mps_score(cross_apply, image_tokens, text_tokens, text_eos, condition_f):
    """-> per-sample reward (cosine of refined CLS vs prompt EOS)."""
    mask = mps_condition_mask(text_tokens, condition_f)
    mask = jnp.broadcast_to(mask, (image_tokens.shape[0],
                                   image_tokens.shape[1],
                                   text_tokens.shape[1]))
    refined = cross_apply(image_tokens, text_tokens, mask)[:, 0]
    a = refined / jnp.linalg.norm(refined, axis=-1, keepdims=True)
    b = text_eos / jnp.linalg.norm(text_eos, axis=-1, keepdims=True)
    return jnp.sum(a * b, axis=-1)


@dataclasses.dataclass
class MPSReward:
    """Differentiable MPS scorer: CLIP-H per-token features + cross model.

    (frames, prompts) -> (loss, reward); loss = |reward - max_reward|.
    """

    model: object                  # FlaxCLIPModel (CLIP-H)
    tokenizer: object
    cross_params: dict
    condition: str = MPS_CONDITION
    num_frames: int = 4
    max_reward: float = 1.0

    @classmethod
    def from_pretrained(cls, clip_path: str, cross_state_dict=None, **kw):
        from transformers import AutoTokenizer, FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(clip_path, from_pt=True)
        tok = AutoTokenizer.from_pretrained(clip_path)
        if cross_state_dict is None:
            raise ValueError("MPS needs the Cross_model weights "
                             "(MPS_overall.pth state dict)")
        return cls(model=model, tokenizer=tok,
                   cross_params=convert_mps_cross_state_dict(
                       cross_state_dict), **kw)

    # per-token projected features (base_model.py XCLIPModel semantics)
    def _text_tokens(self, prompts: Sequence[str]):
        ids = self.tokenizer(list(prompts), padding="max_length",
                             truncation=True, max_length=77,
                             return_tensors="np")
        out = self.model.text_model(input_ids=ids["input_ids"],
                                    attention_mask=ids["attention_mask"])
        seq = out.last_hidden_state
        proj = self.model.params["text_projection"]["kernel"]
        seq_f = seq @ proj
        eos_idx = ids["input_ids"].argmax(axis=-1)
        eos = seq_f[jnp.arange(seq_f.shape[0]), eos_idx]
        return seq_f, eos

    def _image_tokens(self, pixel_values):
        out = self.model.vision_model(pixel_values=pixel_values)
        seq = out.last_hidden_state
        proj = self.model.params["visual_projection"]["kernel"]
        return seq @ proj

    def __call__(self, frames: jnp.ndarray, prompts: Sequence[str],
                 conditions: Optional[Sequence[str]] = None):
        from .reward_fn import _preprocess, _subsample

        if conditions is None:
            conditions = [self.condition] * len(prompts)
        sub = _subsample(frames, self.num_frames)
        b, t = sub.shape[:2]
        pix = _preprocess(sub, self.model.config.vision_config.image_size)
        img = self._image_tokens(pix)
        txt, eos = self._text_tokens(prompts)
        cond, _ = self._text_tokens(conditions)
        txt = jax.lax.stop_gradient(txt)
        eos = jax.lax.stop_gradient(eos)
        cond = jax.lax.stop_gradient(cond)
        cross = MPSCrossModel()
        txt_r = jnp.repeat(txt, t, axis=0)
        reward = jnp.mean(mps_score(
            lambda i, tt, m: cross.apply(self.cross_params, i, tt, m),
            img, txt_r, jnp.repeat(eos, t, axis=0),
            jnp.repeat(cond, t, axis=0)))
        loss = jnp.abs(reward - self.max_reward)
        return loss, reward


def convert_mps_cross_state_dict(sd) -> dict:
    """torch Cross_model weights (cross_model.layers.N.{0,1}.fn.*) ->
    MPSCrossModel tree."""
    import flax

    def find(k):
        for pre in ("cross_model.", "model.cross_model.", ""):
            if pre + k in sd:
                return np.asarray(sd[pre + k])
        raise KeyError(k)

    flat = {}
    n_layers = 4
    for i in range(n_layers):
        c = f"layers.{i}.0.fn."
        flat[f"cross{i}/norm/scale"] = find(c + "norm.gamma")
        flat[f"cross{i}/to_q/kernel"] = find(c + "to_q.weight").T
        flat[f"cross{i}/to_kv/kernel"] = find(c + "to_kv.weight").T
        flat[f"cross{i}/to_out/kernel"] = find(c + "to_out.weight").T
        flat[f"cross{i}/ff_in/kernel"] = find(c + "ff.0.weight").T
        flat[f"cross{i}/ff_out/kernel"] = find(c + "ff.2.weight").T
        s = f"layers.{i}.1.fn."
        flat[f"self{i}/norm/scale"] = find(s + "norm.gamma")
        flat[f"self{i}/fused_proj/kernel"] = find(
            s + "fused_attn_ff_proj.weight").T
        flat[f"self{i}/attn_out/kernel"] = find(s + "attn_out.weight").T
        flat[f"self{i}/ff_out/kernel"] = find(s + "ff_out.1.weight").T
    return {"params": flax.traverse_util.unflatten_dict(flat, sep="/")}
