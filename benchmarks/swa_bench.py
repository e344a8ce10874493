"""SWA joint-attention microbench at the 12B model's headline shapes
(B=2 CFG, H=48, 256 text + 13x24x42 video tokens, window = 1008).

--streams times the FULL swa_attention_streams composition (6-direction
permutes + strided global gather + kernel(s) + combine) exactly as
blocks.MMDiTBlock calls it per layer, in both fuse_cross modes — the
honest harness VERDICT r4 #7 demands: the r4 fused kernel won its
kernel-only microbench (35.0 vs 43.9 ms) yet LOST 3.30 -> 4.41 s/step
in-pipeline, a divergence a full-call measurement would have caught."""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

B, H, D = 2, 48, 64
ST = 256
GF, GH, GW = 13, 24, 42  # --frames overrides GF (25f workload: GF=7)
SV = GF * GH * GW
S = ST + SV


def timed(fn, *args, iters=8, warm=8):
    for _ in range(warm):
        out = fn(*args)
    float(out.reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    float(out.reshape(-1)[0])
    return (time.time() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default="1024,512,256;1024,256,256;512,512,256;"
                                       "1024,512,512;2048,512,256")
    ap.add_argument("--frames", type=int, default=13,
                    help="latent frames (GF); 7 = the 25f workload")
    ap.add_argument("--bwd", action="store_true",
                    help="also sweep the backward tile clamp (fused "
                         "fwd+grad timing)")
    ap.add_argument("--bwd_blocks", default="256,512,1024")
    ap.add_argument("--streams", action="store_true",
                    help="time the FULL swa_attention_streams call "
                         "(permutes+gathers+kernel+combine) fused vs "
                         "unfused, plus a numeric agreement check")
    args = ap.parse_args()
    global GF, SV, S
    GF = args.frames
    SV = GF * GH * GW
    S = ST + SV
    from easyanimate_tpu.ops.swa import (sliding_window_attention,
                                         swa_joint_attention)

    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S, D), jnp.bfloat16)

    t = timed(jax.jit(lambda q, k, v: swa_joint_attention(
        q, k, v, text_len=ST, num_frames=GF, height=GH, width=GW)), q, k, v)
    print(f"swa_joint (full: 6-dir local + cross): {t*1e3:8.2f} ms", flush=True)

    if args.streams:
        import numpy as np
        from easyanimate_tpu.ops.swa import swa_attention_streams

        split = lambda a: (a[:, :, :ST], a[:, :, ST:])
        qt, qv_ = split(q)
        kt, kv_ = split(k)
        vt, vv_ = split(v)

        outs = {}
        for fused in (False, True):
            fn = jax.jit(lambda qt, kt, vt, qv, kv, vv, f=fused:
                         swa_attention_streams(
                             qt, kt, vt, qv, kv, vv, num_frames=GF,
                             height=GH, width=GW, fuse_cross=f)[1])
            t = timed(fn, qt, kt, vt, qv_, kv_, vv_)
            outs[fused] = np.asarray(
                fn(qt, kt, vt, qv_, kv_, vv_), np.float32)
            print(f"streams full-call fuse_cross={str(fused):5s}: "
                  f"{t*1e3:8.2f} ms / layer-equivalent", flush=True)
        a, b = outs[False].ravel(), outs[True].ravel()
        cos = float(a @ b / max(np.linalg.norm(a) * np.linalg.norm(b),
                                1e-12))
        print(f"fused-vs-unfused video-out cosine: {cos:.6f}", flush=True)

    qv = q[:, :, ST:]
    kv = k[:, :, ST:]
    vv = v[:, :, ST:]
    window = GH * GW
    for case in args.sweep.split(";"):
        bq, bkv, inner = (int(x) for x in case.split(","))
        try:
            t = timed(jax.jit(lambda q, k, v: sliding_window_attention(
                q, k, v, window=window, block_q=bq, block_kv=bkv,
                block_kv_inner=inner)), qv, kv, vv)
            print(f"local bq={bq:5d} bkv={bkv:4d} inner={inner:4d}: "
                  f"{t*1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"local bq={bq:5d} bkv={bkv:4d} inner={inner:4d}: FAILED "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)

    if args.bwd:
        from easyanimate_tpu.ops import swa as swa_mod

        def loss(q, k, v):
            return sliding_window_attention(
                q, k, v, window=window).astype(jnp.float32).sum()

        def grad_probe(q, k, v):
            # scalar combining all three grads so none is DCE'd and the
            # fetch in timed() stays one float
            dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return (dq.ravel()[0] + dk.ravel()[0] + dv.ravel()[0]
                    ).reshape(1, 1)

        for clamp in (int(x) for x in args.bwd_blocks.split(",")):
            swa_mod._SWA_BWD_BLOCK = clamp
            try:
                t = timed(jax.jit(grad_probe), qv, kv, vv)
                print(f"bwd clamp={clamp:5d}: {t*1e3:8.2f} ms fused "
                      f"fwd+grad", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"bwd clamp={clamp:5d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
