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


# --- int4 weight-only storage (W4A16) -------------------------------------
#
# Purpose: memory, not MXU throughput. Group-wise (group=128 along the
# contraction axis) symmetric int4 weights packed two-per-byte halve the
# resident transformer from 11.8 GB (fp8/int8) to ~6 GB, which is what lets
# the 576x1008x49f workload fit ONE 16 GB v5e chip (the reference runs it
# from 80 GB, README.md:143). Compute dequantizes per layer to the compute
# dtype and rides the bf16 MXU: the transient dequantized kernel is
# ~75 MB (3072x12288 bf16) and XLA frees it after the matmul.

GROUP_INT4 = 128


def _int4_groups(fan_in: int) -> int:
    return fan_in // GROUP_INT4 if fan_in % GROUP_INT4 == 0 else 1


def quantize_weight_int8(w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., in, out] float -> (int8 [..., in, out], f32 scale [..., out]).
    Symmetric per-out-channel absmax."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-2) / 127.0, 1e-12)
    wq = jnp.round(w / scale[..., None, :]).astype(jnp.int8)
    return wq, scale.astype(jnp.float32)


def quantize_weight_int4(w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., in, out] float -> (int8 packed [..., in//2, out] two nibbles
    per byte, f32 scale [..., n_groups, out]). Symmetric per-(group, out
    channel) absmax; rows 2k / 2k+1 are the low / high nibble of byte k."""
    w = jnp.asarray(w, jnp.float32)
    fan_in, out = w.shape[-2], w.shape[-1]
    if fan_in % 2:
        raise ValueError(f"int4 packing needs even fan_in, got {fan_in}")
    groups = _int4_groups(fan_in)
    lead = w.shape[:-2]
    wg = w.reshape(*lead, groups, fan_in // groups, out)
    scale = jnp.maximum(jnp.max(jnp.abs(wg), axis=-2) / 7.0, 1e-12)
    q = jnp.clip(jnp.round(wg / scale[..., None, :]), -8, 7)
    q = q.reshape(*lead, fan_in // 2, 2, out).astype(jnp.int8)
    lo, hi = q[..., 0, :], q[..., 1, :]
    packed = jnp.bitwise_or(jnp.bitwise_and(lo, 0xF),
                            jnp.left_shift(hi, 4)).astype(jnp.int8)
    return packed, scale.astype(jnp.float32)


def unpack_int4(packed: jnp.ndarray, fan_in: int) -> jnp.ndarray:
    """int8 packed [..., in//2, out] -> int8 [..., in, out] in [-8, 7]."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extended
    hi = jnp.right_shift(packed, 4)                     # arithmetic shift
    q = jnp.stack([lo, hi], axis=-2)                    # [..., in//2, 2, out]
    return q.reshape(*packed.shape[:-2], fan_in, packed.shape[-1])


def dequantize_int4(packed: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """int8 packed [..., in//2, out] + f32 scale [..., groups, out] ->
    f32 [..., in, out]. The single definition of the group/nibble layout's
    inverse (used by the matmuls and LoRA merge alike)."""
    fan_in = packed.shape[-2] * 2
    groups = scale.shape[-2]
    q = unpack_int4(packed, fan_in)
    qg = q.reshape(*q.shape[:-2], groups, fan_in // groups, q.shape[-1])
    return (qg * scale[..., None, :]).reshape(q.shape)


def int4_matmul(x: jnp.ndarray, w_packed: jnp.ndarray, w_scale: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """x [..., in]; w_packed int8 [in//2, out]; w_scale f32 [groups, out]."""
    w = dequantize_int4(w_packed, w_scale).astype(out_dtype)
    y = x.astype(out_dtype) @ w
    if bias is not None:
        y = y + bias.astype(out_dtype)
    return y


def int4_matmul_a8(x: jnp.ndarray, w_packed: jnp.ndarray,
                   w_scale: jnp.ndarray,
                   bias: Optional[jnp.ndarray] = None,
                   out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """W4A8: int4-packed storage, int8-MXU compute (same params as
    int4_matmul). The per-group int4 values are re-scaled onto a single
    per-out-channel int8 grid — the 16x-finer int8 grid absorbs the group
    scales (q8 = round(q4 * s_g / s8), s8 = 8 * max_g s_g / 127, so
    |q8| <= 127) — and the product runs through the W8A8 dynamic-quant
    matmul. Memory stays at int4 (the transient int8 kernel is half the
    W4A16 path's bf16 transient); throughput rides the ~1.5x int8 MXU."""
    fan_in = x.shape[-1]
    out = w_packed.shape[-1]
    groups = w_scale.shape[-2]
    q4 = unpack_int4(w_packed, fan_in).reshape(groups, fan_in // groups, out)
    s8 = jnp.maximum(jnp.max(w_scale, axis=-2), 1e-12) * (8.0 / 127.0)
    q8 = jnp.round(q4 * (w_scale[:, None, :] / s8[None, None, :]))
    q8 = q8.astype(jnp.int8).reshape(fan_in, out)
    return int8_matmul(x, q8, s8, bias, out_dtype)


def _quantize_params(params, quantize_fn):
    """Shared traversal: replace every floating block-linear kernel with
    (quantized kernel, f32 "scale" sibling) = quantize_fn(leaf)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        if _is_block_linear(path) and jnp.issubdtype(
                jnp.asarray(leaf).dtype, jnp.floating):
            wq, scale = quantize_fn(jnp.asarray(leaf))
            out[path] = wq
            out[path[:-1] + ("scale",)] = scale
        else:
            out[path] = leaf
    return traverse_util.unflatten_dict(out)


def quantize_params_int4(params):
    """Float params tree (linear_quant=None model) -> tree for the SAME
    config with linear_quant="int4": block-linear kernels become packed
    int4 (two per int8 byte) with a per-(group=128, out-channel) f32
    "scale" sibling. Handles nn.scan-stacked kernels [L, in, out]."""
    return _quantize_params(params, quantize_weight_int4)


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
    return _quantize_params(params, quantize_weight_int8)
