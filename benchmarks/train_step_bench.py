"""SWA train-step bench at REAL 12B layer shapes (VERDICT r4 #8).

The README's 187 ms/step train row is a 0.51B DENSE model; this measures a
full SFT train step (flow loss, Adam, remat) through the SWA path at the
pretrain stage-2 geometry (512x512x49f = 13312+256 tokens,
reports/report_v5_1.md:46-60) with the flagship's layer SHAPES (3072 dim,
48 heads, 12288 FFN). Layer count is reduced (default 2) to fit params +
f32 Adam moments + grads in one v5e's 16 GB; per-layer cost is what the
number normalizes to.

FLOP accounting: XLA's cost_analysis does NOT see inside Pallas kernels
(the flash/SWA attention fwd+bwd), so its figure badly undercounts and is
printed to stderr only. The JSON reports a hand model-FLOP count:
6*N*T_stream per matmul kernel (fwd 2NT + bwd 4NT; T_stream = the token
count that kernel's stream actually processes -- video tokens for the
video stream, 256 for the text stream, 1 for AdaLN/time-embed) plus
12*s^2*inner_dim per DENSE joint-attention layer
(QK^T + PV fwd = 4*s^2*d, backward ~2x). SWA layers do strictly fewer
attention flops than that, so for SWA rows the same dense count is
reported as tf_per_s_dense_equiv -- "effective" throughput relative to
dense math, the standard way to express a sparse-attention speedup --
alongside the raw s/step.

Prints one JSON line:
  {"s_per_step", "tf_per_s" | "tf_per_s_dense_equiv", "layers", "tokens",
   "mode", "geometry"}
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--dense", action="store_true",
                    help="dense-attention variant instead of SWA")
    ap.add_argument("--swa_all", action="store_true",
                    help="window EVERY layer (default keeps layer 0 dense "
                    "like the V5.1 SWA config); lets --layers 1 still "
                    "exercise the SWA path")
    ap.add_argument("--optimizer", default="adamw",
                    help="adamw | came | adamw8bit (8-bit moments shave "
                    "~3 GB of f32 Adam state at 0.51B params -- needed to "
                    "fit the 53k-token geometry on one 16 GB v5e)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warm", type=int, default=8,
                    help="first ~8 executions are slow through the tunnel")
    args = ap.parse_args()

    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.pipeline.t2v import build_rope
    from easyanimate_tpu.training import (TrainConfig, create_train_state,
                                          make_train_step)

    swa = (() if args.dense else
           tuple(range(0 if args.swa_all else 1, args.layers)))
    cfg = dataclasses.replace(PRESETS["v5.1-12b"], num_layers=args.layers,
                              swa_layers=swa)
    model = EasyAnimateTransformer3D(cfg)
    lat_t = (args.frames - 1) // 4 + 1
    text_len = 256
    rope = build_rope(cfg, args.height, args.width, lat_t)
    lat = jax.random.normal(
        jax.random.PRNGKey(1),
        (1, 16, lat_t, args.height // 8, args.width // 8), jnp.float32)
    txt = 0.02 * jax.random.normal(
        jax.random.PRNGKey(2), (1, text_len, cfg.text_embed_dim), jnp.float32)

    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), lat.astype(cfg.jdtype),
                        jnp.full((1,), 500.0), txt.astype(cfg.jdtype), rope)
    tcfg = TrainConfig(use_ema=False, optimizer=args.optimizer)
    state = create_train_state(params, tcfg)
    jax.block_until_ready(state.params)
    n_par = sum(x.size for x in jax.tree.leaves(params))
    print(f"# {n_par/1e9:.2f}B params ({args.layers} layers, "
          f"{'dense' if args.dense else 'SWA'}), init {time.time()-t0:.0f}s",
          file=sys.stderr)

    step_fn = make_train_step(model, tcfg)
    batch = {"latents": lat, "text": txt, "rope": rope}
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    t0 = time.time()
    lowered = jstep.lower(state, batch, jax.random.PRNGKey(3))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca_flops = float(ca.get("flops", 0.0)) if ca else 0.0

    # Hand model-FLOP count (see module docstring): 6*N*T_stream per matmul
    # kernel + 12*s^2*d per dense joint-attention layer. Each kernel is
    # multiplied by the token count ITS stream processes: text-stream
    # kernels (attn2*, txt_ff, text_proj) see only the 256 text tokens,
    # AdaLN/time-embed kernels see 1 (the temb vector) -- counting them all
    # at the joint length would roughly double the figure. 1-D biases/norm
    # scales are noise at this scale.
    from flax import traverse_util

    vid_tokens = lat_t * (args.height // 16) * (args.width // 16)
    seq = vid_tokens + text_len

    def _stream_tokens(path) -> int:
        parts = set(path)
        if parts & {"attn2", "attn2_out", "txt_ff", "text_proj"}:
            return text_len
        if parts & {"time_embedding", "norm1", "norm2", "norm_out"}:
            return 1  # applied to the single temb vector
        return vid_tokens  # proj, attn1*, ff, proj_out

    linear_flops = sum(
        6.0 * leaf.size * _stream_tokens(path)
        for path, leaf in traverse_util.flatten_dict(params).items()
        if leaf.ndim >= 2)
    attn_flops = 12.0 * seq * seq * cfg.inner_dim * args.layers
    flops = linear_flops + attn_flops
    print(f"# compile {time.time()-t0:.0f}s; hand count {flops/1e12:.1f} "
          f"TFLOP/step (dense-equiv; attn {attn_flops/1e12:.1f}), "
          f"cost_analysis {ca_flops/1e12:.1f} (misses Pallas kernels)",
          file=sys.stderr)

    for i in range(args.warm):
        state, metrics = jstep(state, batch, jax.random.PRNGKey(10 + i))
    float(metrics["loss"])  # sync (tunnel-safe)
    t0 = time.time()
    for i in range(args.iters):
        state, metrics = jstep(state, batch, jax.random.PRNGKey(50 + i))
    loss = float(metrics["loss"])
    dt = (time.time() - t0) / args.iters
    assert np.isfinite(loss), loss

    tokens = lat_t * (args.height // 16) * (args.width // 16)
    tf_key = "tf_per_s" if args.dense else "tf_per_s_dense_equiv"
    print(json.dumps({
        "s_per_step": round(dt, 4),
        tf_key: round(flops / dt / 1e12, 1),
        "layers": args.layers,
        "tokens": tokens,
        "mode": ("dense" if args.dense else
                 f"SWA {len(swa)}/{args.layers} layers"),
        "optimizer": args.optimizer,
        "geometry": f"{args.height}x{args.width}x{args.frames}f",
    }))


if __name__ == "__main__":
    main()
