"""SWA train-step bench at REAL 12B layer shapes (VERDICT r4 #8).

The README's 187 ms/step train row is a 0.51B DENSE model; this measures a
full SFT train step (flow loss, Adam, remat) through the SWA path at the
pretrain stage-2 geometry (512x512x49f = 13312+256 tokens,
reports/report_v5_1.md:46-60) with the flagship's layer SHAPES (3072 dim,
48 heads, 12288 FFN). Layer count is reduced (default 2) to fit params +
f32 Adam moments + grads in one v5e's 16 GB; per-layer cost is what the
number normalizes to. TF/s comes from the compiled executable's own
cost_analysis, not a hand FLOP count.

Prints one JSON line:
  {"s_per_step", "tf_per_s", "layers", "tokens", "mode"}
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warm", type=int, default=8,
                    help="first ~8 executions are slow through the tunnel")
    args = ap.parse_args()

    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.pipeline.t2v import build_rope
    from easyanimate_tpu.training import (TrainConfig, create_train_state,
                                          make_train_step)

    swa = () if args.dense else tuple(range(1, args.layers))
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
    tcfg = TrainConfig(use_ema=False)
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
    flops = float(ca.get("flops", 0.0)) if ca else 0.0
    print(f"# compile {time.time()-t0:.0f}s, cost-analysis "
          f"{flops/1e12:.1f} TFLOP/step", file=sys.stderr)

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
    print(json.dumps({
        "s_per_step": round(dt, 4),
        "tf_per_s": round(flops / dt / 1e12, 1) if flops else None,
        "layers": args.layers,
        "tokens": tokens,
        "mode": ("dense" if args.dense else
                 f"SWA {len(swa)}/{args.layers} layers"),
        "geometry": f"{args.height}x{args.width}x{args.frames}f",
    }))


if __name__ == "__main__":
    main()
