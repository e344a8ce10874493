"""Qwen2 / Qwen2-VL text tower in flax: the V5.1 prompt encoder.

Parity target: the reference encodes prompts with
Qwen2VLForConditionalGeneration(...).hidden_states[-2]
(pipeline_easyanimate.py:455-461) -- i.e. embeddings + all but the LAST
decoder layer, no final norm (HF collects hidden states *before* each layer).
For text-only prompts Qwen2-VL's M-RoPE degenerates to standard RoPE (all
three position axes share the text position ids), so this is a standard
Qwen2 decoder stack: RMSNorm, GQA causal attention with rope_theta from the
config, SwiGLU MLP.

`convert_qwen2_state_dict` maps HF weights (model.layers.N.*) to this tree;
the golden test checks exact agreement with `transformers` on a tiny config.
"""
import dataclasses
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.norms import fp32_rms_norm


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    rope_theta: float = 1000000.0
    rms_norm_eps: float = 1e-6
    scan_layers: bool = True   # compile the stack as one nn.scan body
    dtype: str = "bfloat16"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


TINY_QWEN = Qwen2Config(
    vocab_size=128, hidden_size=32, intermediate_size=64,
    num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
    dtype="float32")


def _rope_tables(cfg: Qwen2Config, positions: jnp.ndarray):
    """HF-style rope: cos/sin [S, head_dim] with halves layout."""
    hd = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2, dtype=np.float64) / hd))
    ang = positions.astype(jnp.float32)[:, None] * jnp.asarray(inv, jnp.float32)[None]
    emb = jnp.concatenate([ang, ang], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _apply_rope_half(x, cos, sin):
    """HF rotate_half convention: x*cos + rotate_half(x)*sin."""
    h = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin
            ).astype(x.dtype)


class Qwen2Attention(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias):
        cfg = self.cfg
        dt = cfg.jdtype
        b, s, _ = x.shape
        hd = cfg.head_dim
        nq, nkv = cfg.num_attention_heads, cfg.num_key_value_heads
        q = nn.Dense(nq * hd, dtype=dt, name="q_proj")(x)
        k = nn.Dense(nkv * hd, dtype=dt, name="k_proj")(x)
        v = nn.Dense(nkv * hd, dtype=dt, name="v_proj")(x)
        q = q.reshape(b, s, nq, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
        q = _apply_rope_half(q, cos, sin)
        k = _apply_rope_half(k, cos, sin)
        # GQA: repeat kv heads
        rep = nq // nkv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (hd ** -0.5)
        scores = scores + attn_bias
        p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, nq * hd)
        return nn.Dense(cfg.hidden_size, use_bias=False, dtype=dt,
                        name="o_proj")(o)


class Qwen2MLP(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x):
        dt = self.cfg.jdtype
        gate = nn.Dense(self.cfg.intermediate_size, use_bias=False, dtype=dt,
                        name="gate_proj")(x)
        up = nn.Dense(self.cfg.intermediate_size, use_bias=False, dtype=dt,
                      name="up_proj")(x)
        return nn.Dense(self.cfg.hidden_size, use_bias=False, dtype=dt,
                        name="down_proj")(nn.silu(gate) * up)


class Qwen2Layer(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias):
        cfg = self.cfg
        w1 = self.param("input_layernorm", nn.initializers.ones,
                        (cfg.hidden_size,), jnp.float32)
        h = fp32_rms_norm(x, w1, cfg.rms_norm_eps)
        x = x + Qwen2Attention(cfg, name="self_attn")(h, cos, sin, attn_bias)
        w2 = self.param("post_attention_layernorm", nn.initializers.ones,
                        (cfg.hidden_size,), jnp.float32)
        h = fp32_rms_norm(x, w2, cfg.rms_norm_eps)
        return x + Qwen2MLP(cfg, name="mlp")(h)


class _Qwen2ScanLayer(nn.Module):
    cfg: Qwen2Config

    @nn.compact
    def __call__(self, x, cos, sin, attn_bias):
        x = Qwen2Layer(self.cfg, name="layer")(x, cos, sin, attn_bias)
        return x, None


class Qwen2TextEncoder(nn.Module):
    """Embeddings + the first (N-1) decoder layers: hidden_states[-2]."""

    cfg: Qwen2Config
    drop_last_layer: bool = True

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        cfg = self.cfg
        b, s = input_ids.shape
        emb = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                       dtype=cfg.jdtype, name="embed_tokens")(input_ids)
        pos = jnp.arange(s)
        cos, sin = _rope_tables(cfg, pos)
        causal = jnp.tril(jnp.ones((s, s), bool))
        mask = causal[None, None]
        if attention_mask is not None:
            mask = mask & attention_mask[:, None, None, :].astype(bool)
        attn_bias = jnp.where(mask, 0.0, -1e9).astype(jnp.float32)
        n = cfg.num_hidden_layers - (1 if self.drop_last_layer else 0)
        x = emb
        if cfg.scan_layers:
            stack = nn.scan(
                _Qwen2ScanLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=n,
            )(cfg, name="layers")
            x, _ = stack(x, cos, sin, attn_bias)
        else:
            for i in range(n):
                x = Qwen2Layer(cfg, name=f"layers_{i}")(x, cos, sin, attn_bias)
        return x


def convert_qwen2_state_dict(sd: Dict[str, np.ndarray], cfg: Qwen2Config,
                             drop_last_layer: bool = True):
    """HF Qwen2(-VL text) weights -> Qwen2TextEncoder tree.

    Accepts either `model.layers.*` or `model.language_model.layers.*`
    (Qwen2-VL) prefixes; numpy arrays in, {'params': ...} out.
    """
    import flax

    def find(key):
        for pre in ("model.", "model.language_model.", "language_model.model.", ""):
            if pre + key in sd:
                return np.asarray(sd[pre + key])
        raise KeyError(key)

    flat = {"embed_tokens/embedding": find("embed_tokens.weight")}
    n = cfg.num_hidden_layers - (1 if drop_last_layer else 0)

    def layer_items(i):
        src = f"layers.{i}."
        out = {
            "input_layernorm": find(src + "input_layernorm.weight"),
            "post_attention_layernorm": find(
                src + "post_attention_layernorm.weight"),
            "self_attn/o_proj/kernel": find(src + "self_attn.o_proj.weight").T,
        }
        for p in ("q", "k", "v"):
            out[f"self_attn/{p}_proj/kernel"] = find(
                src + f"self_attn.{p}_proj.weight").T
            out[f"self_attn/{p}_proj/bias"] = find(
                src + f"self_attn.{p}_proj.bias")
        for p in ("gate", "up", "down"):
            out[f"mlp/{p}_proj/kernel"] = find(src + f"mlp.{p}_proj.weight").T
        return out

    if cfg.scan_layers:
        per = [layer_items(i) for i in range(n)]
        for k in per[0]:
            flat[f"layers/layer/{k}"] = np.stack([p[k] for p in per])
    else:
        for i in range(n):
            for k, v in layer_items(i).items():
                flat[f"layers_{i}/{k}"] = v
    return {"params": flax.traverse_util.unflatten_dict(flat, sep="/")}
