"""Weight-only fp8 storage (reference utils/fp8_optimization.py parity).

The reference stores module weights as float8_e4m3fn and upcasts per-forward
(fp8_optimization.py:6-35). TPU-native version: store the param pytree in
float8_e4m3fn and cast to the compute dtype inside the jitted program - XLA
fuses the convert into consumers, so weights live in HBM at 1 byte/param
(11.6 GB for the 12B MMDiT, fitting a single 16 GB chip).

Only matmul-heavy 2D+ kernels are quantized; norms/bias/modulation vectors
stay in their original dtype (matching the reference, which skips
non-Linear modules).
"""
from typing import Any

import jax
import jax.numpy as jnp

FP8 = jnp.float8_e4m3fn


def _should_quantize(x) -> bool:
    return hasattr(x, "ndim") and x.ndim >= 2 and jnp.issubdtype(x.dtype, jnp.floating)


def quantize_params_fp8(params: Any) -> Any:
    """Cast >=2D floating kernels to fp8 (e4m3), keep vectors as-is."""
    return jax.tree.map(
        lambda x: x.astype(FP8) if _should_quantize(x) else x, params
    )


def dequantize_params(params: Any, dtype=jnp.bfloat16) -> Any:
    """Upcast fp8 leaves to the compute dtype (call inside jit)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if hasattr(x, "dtype") and x.dtype == FP8 else x,
        params,
    )
