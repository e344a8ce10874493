"""Numerically-hardened norms, computed in fp32 regardless of input dtype.

Behavioral parity: reference FP32LayerNorm / EasyAnimateRMSNorm
(easyanimate/models/norm.py:16-42). On TPU these are bandwidth-bound
elementwise chains that XLA fuses into neighbouring matmuls; a Pallas kernel
buys nothing here, so we keep them as jnp for fusion.
"""
from typing import Optional

import jax.numpy as jnp


def fp32_layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last axis with fp32 statistics and affine math."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def fp32_rms_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """RMSNorm with fp32 variance; weight applied after downcast, matching the
    reference (`weight * hidden_states.to(input_dtype)`, norm.py:39)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = (x32 * jnp.reciprocal(jnp.sqrt(var + eps))).astype(dtype)
    if weight is not None:
        y = weight.astype(dtype) * y
    return y
