"""W8A8 int8 linear layers for the v5e's int8 MXU path (~1.5x bf16
throughput measured at the 12B's FFN shapes: 222 vs 147 TF/s).

Scheme: per-output-channel symmetric int8 weights + per-token dynamic
activation quantization (absmax), int8 x int8 -> int32 matmul, fused
dequantization. This is the standard W8A8 dynamic-quant recipe (SmoothQuant
without the offline smoothing step); the reference ships a weight-only fp8
mode for low VRAM (README.md:119-124) -- this is the TPU-native throughput
analogue, opt-in via MMDiTConfig.linear_quant="int8".
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def quantize_weight(w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[in, out] float -> (int8 [in, out], f32 scale [out]) per-out-channel."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.round(w / scale[None, :]).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x [..., in] float; w_q int8 [in, out]; w_scale f32 [out].

    Per-token dynamic absmax activation quantization; the int32 accumulator
    dequantizes with row_scale * col_scale.
    """
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    ax = jnp.maximum(ax, 1e-12)
    xq = jnp.round(xf * (127.0 / ax)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (ax / 127.0) * w_scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


# Block linears that MMDiTBlock routes through the int8 path when
# MMDiTConfig.linear_quant == "int8" (models/blocks.py). Matched by the
# (parent-module, leaf) of the param path, restricted to block subtrees.
_QUANT_PARENTS = frozenset(
    ["to_q", "to_k", "to_v", "attn1_out", "attn2_out", "wi", "wo"])


def _is_block_linear(path: Tuple[str, ...]) -> bool:
    return (len(path) >= 2 and path[-1] == "kernel"
            and path[-2] in _QUANT_PARENTS
            and any(p.startswith("block") for p in path[:-2]))


def quantize_params_int8(params):
    """Float params tree (linear_quant=None model) -> params tree for the
    SAME config with linear_quant="int8": block-linear kernels become int8
    with an f32 per-out-channel "scale" sibling. Handles nn.scan-stacked
    kernels ([L, in, out] -> scale [L, out]); everything else passes
    through unchanged. Quantization is per-out-channel, so it commutes with
    PermutedDense's static output permutation."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if _is_block_linear(path) and jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.floating):
            w = jnp.asarray(leaf, jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-2) / 127.0, 1e-12)
            wq = jnp.round(w / scale[..., None, :]).astype(jnp.int8)
            out[path] = wq
            out[path[:-1] + ("scale",)] = scale.astype(jnp.float32)
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out)
