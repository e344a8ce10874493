"""W8A8 int8 linear microbench at the 12B's block-linear shapes (CFG batch,
26368 tokens). Compares bf16, pure int8 MXU, and the dynamic-quant W8A8 path
(ops/quant.py) the model actually runs.

Expected on a healthy v5e: int8 ~1.5x bf16 (222-235 vs ~147 TF/s at these
shapes); dynamic quantization adds only ~2% over the pure int8 matmul (XLA
fuses the absmax/round chain into the operands).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=10, warm=10):
    for _ in range(warm):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).reshape(-1)[0])
    return (time.time() - t0) / iters


def main():
    from easyanimate_tpu.ops.quant import (
        int4_matmul,
        int4_matmul_a8,
        int8_matmul,
        quantize_weight_int4,
    )

    shapes = [
        ("qkv   (3072->3072)", 26368, 3072, 3072),
        ("ffn wi (3072->12288)", 26368, 3072, 12288),
        ("ffn wo (12288->3072)", 26368, 12288, 3072),
    ]
    for name, m, k, n in shapes:
        flops = 2 * m * k * n
        x = jax.random.normal(jax.random.PRNGKey(0), (m, k), jnp.bfloat16)
        xq = jnp.round(jax.random.normal(
            jax.random.PRNGKey(0), (m, k)) * 30).astype(jnp.int8)
        wq = jnp.round(jax.random.normal(
            jax.random.PRNGKey(1), (k, n)) * 30).astype(jnp.int8)
        wb = wq.astype(jnp.bfloat16)
        ws = jnp.full((n,), 1e-3, jnp.float32)

        t = timed(jax.jit(lambda a, b: a @ b), x, wb)
        print(f"{name} bf16:         {t*1e3:7.2f} ms = {flops/t/1e12:5.0f} TF/s")
        t = timed(jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)), xq, wq)
        print(f"{name} pure int8:    {t*1e3:7.2f} ms = {flops/t/1e12:5.0f} TOPS")
        t = timed(jax.jit(lambda a, b, s: int8_matmul(a, b, s)), x, wq, ws)
        print(f"{name} dynamic W8A8: {t*1e3:7.2f} ms = {flops/t/1e12:5.0f} TOPS",
              flush=True)
        packed, gs = quantize_weight_int4(
            jax.random.normal(jax.random.PRNGKey(1), (k, n)) * k ** -0.5)
        t = timed(jax.jit(lambda a, b, s: int4_matmul(a, b, s)), x, packed, gs)
        print(f"{name} W4A16:        {t*1e3:7.2f} ms = {flops/t/1e12:5.0f} TF/s")
        t = timed(jax.jit(lambda a, b, s: int4_matmul_a8(a, b, s)),
                  x, packed, gs)
        print(f"{name} W4A8:         {t*1e3:7.2f} ms = {flops/t/1e12:5.0f} TOPS",
              flush=True)


if __name__ == "__main__":
    main()
