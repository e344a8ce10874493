"""Microbenchmark for the Pallas flash-attention kernel at the flagship
model's exact shapes (V5.1-12B, T2V 384x672x49f CFG: bh=96, seq=13360, d=64).

Usage:
  python benchmarks/attn_bench.py                 # default sweep
  python benchmarks/attn_bench.py --blocks 1024,2048,256 --iters 10

Prints TF/s based on *useful* flops (4 * bh * valid^2 * d), so padding waste
shows up as lower TF/s.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def run_case(bh, sq, d, block_q, block_kv, inner, iters=8, valid=None):
    from easyanimate_tpu.ops.attention import attention

    valid = valid or sq
    q = jax.random.normal(jax.random.PRNGKey(0), (1, bh, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, bh, sq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, bh, sq, d), jnp.bfloat16)

    fn = jax.jit(lambda q, k, v: attention(
        q, k, v, impl="pallas", block_q=block_q, block_kv=block_kv,
        block_kv_inner=inner))
    # the tunneled runtime doesn't sync on block_until_ready (fetch a scalar
    # instead) and is slow for the first ~8 executions of a fresh program
    for _ in range(8):
        out = fn(q, k, v)
    float(out[0, 0, 0, 0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(q, k, v)
    float(out[0, 0, 0, 0])
    dt = (time.time() - t0) / iters
    flops = 4 * bh * valid * valid * d
    return dt, flops / dt / 1e12


def run_bwd_case(bh, sq, d, bwd_bq, bwd_bkv, iters=8, inner_q=None,
                 inner_kv=None):
    """Fused fwd+bwd TF/s. FLOP convention: 14 * bh * s^2 * d = 2 forward
    GEMMs + 5 backward GEMM passes (dq pass recomputes qk; dkv pass
    recomputes qk and dp), each 2*s^2*d."""
    from easyanimate_tpu.ops import flash_attention as fa
    from easyanimate_tpu.ops.attention import attention

    fa._BWD_BLOCK_Q, fa._BWD_BLOCK_KV = bwd_bq, bwd_bkv
    fa._BWD_INNER_Q, fa._BWD_INNER_KV = inner_q, inner_kv
    q = jax.random.normal(jax.random.PRNGKey(0), (1, bh, sq, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, bh, sq, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, bh, sq, d), jnp.bfloat16)

    def loss(q, k, v):
        return attention(q, k, v, impl="pallas").astype(jnp.float32).sum()

    fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    for _ in range(8):
        g = fn(q, k, v)
    float(g[0][0, 0, 0, 0])
    t0 = time.time()
    for _ in range(iters):
        g = fn(q, k, v)
    float(g[0][0, 0, 0, 0])
    dt = (time.time() - t0) / iters
    flops = 14 * bh * sq * sq * d
    return dt, flops / dt / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bh", type=int, default=96)      # CFG batch 2 x 48 heads
    ap.add_argument("--seq", type=int, default=13360)  # 13104 video + 256 text
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--sweep", type=str, default=(
        "1024,2048,256;1024,1024,256;512,1024,256;1024,2048,512;"
        "512,512,256;1024,2048,128;2048,2048,256"))
    ap.add_argument("--bwd", action="store_true",
                    help="sweep the BACKWARD block clamps (fused "
                         "fwd+grad timing; sweep cases are bwd_bq,bwd_bkv)")
    args = ap.parse_args()

    print(f"# backend={jax.default_backend()} bh={args.bh} seq={args.seq} "
          f"d={args.d}")
    if args.bwd:
        for case in args.sweep.split(";"):
            parts = [int(x) for x in case.split(",")]
            bq, bkv = parts[:2]
            iq = parts[2] if len(parts) > 2 and parts[2] else None
            ikv = parts[3] if len(parts) > 3 and parts[3] else None
            try:
                dt, tfs = run_bwd_case(args.bh, args.seq, args.d, bq, bkv,
                                       args.iters, iq, ikv)
                print(f"bwd bq={bq:5d} bkv={bkv:5d} iq={iq or bq:4d} "
                      f"ikv={ikv or bkv:4d}  {dt*1e3:8.2f} ms  "
                      f"{tfs:6.2f} TF/s fused", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"bwd bq={bq:5d} bkv={bkv:5d} iq={iq} ikv={ikv}  "
                      f"FAILED: {type(e).__name__}: {str(e)[:120]}",
                      flush=True)
        return
    for case in args.sweep.split(";"):
        bq, bkv, inner = (int(x) for x in case.split(","))
        try:
            dt, tfs = run_case(args.bh, args.seq, args.d, bq, bkv, inner,
                               args.iters)
            print(f"bq={bq:5d} bkv={bkv:5d} inner={inner:4d}  "
                  f"{dt*1e3:8.2f} ms  {tfs:6.2f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives bad configs
            print(f"bq={bq:5d} bkv={bkv:5d} inner={inner:4d}  FAILED: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
