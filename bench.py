"""Benchmark: V5.1-12B MMDiT denoise step at the reference's headline
workload (T2V 384x672x49f, CFG batch 2) on one TPU chip.

Baseline (BASELINE.md): A100 80GB runs this at 3.7 s/step (25 steps ~ 90 s).
The 12B does not fit a 16 GB v5e in bf16, so weights are stored fp8-e4m3
(the reference's own low-VRAM mode, README.md:119-124 "24 GB fp8+offload")
and upcast to bf16 inside the program; compute is bf16.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the A100 reference.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.pipeline.t2v import build_rope


    cfg = PRESETS["v5.1-12b"]
    model = EasyAnimateTransformer3D(cfg)

    # 384x672x49f -> latent (16, 13, 48, 84); tokens 13*24*42 = 13104
    b, c, t, h, w = 1, 16, 13, 48, 84
    text_len = 256
    cfg_batch = 2 * b  # CFG doubles the batch per reference step

    lat = jnp.zeros((cfg_batch, c, t, h, w), jnp.bfloat16)
    ts = jnp.full((cfg_batch,), 500.0, jnp.float32)
    txt = jnp.zeros((cfg_batch, text_len, cfg.text_embed_dim), jnp.bfloat16)
    rope = build_rope(cfg, 384, 672, t)  # (height, width, latent frames)

    t0 = time.time()
    # Materializing fp32 init weights would be 47 GB; instead build the tree
    # straight from eval_shape with fp8 kernels / fp32 vectors. flax's
    # per-call dtype promotion upcasts each layer's slice to bf16 inside the
    # scan body, so no full-precision copy ever exists.
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), lat[:1], ts[:1], txt[:1], rope))

    leaves, treedef = jax.tree.flatten(shapes)

    @jax.jit
    def make_all():
        out = []
        for i, s in enumerate(leaves):
            if s.ndim >= 2:
                k = jax.random.PRNGKey(i)
                out.append((0.02 * jax.random.normal(k, s.shape, jnp.bfloat16)
                            ).astype(jnp.float8_e4m3fn))
            else:
                out.append(jnp.zeros(s.shape, s.dtype))
        return out

    params = jax.tree.unflatten(treedef, make_all())
    jax.block_until_ready(params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    bytes_params = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))
    print(f"# params {n_params/1e9:.2f}B, {bytes_params/1e9:.1f} GB stored, "
          f"init {time.time()-t0:.0f}s", file=sys.stderr)

    @jax.jit
    def step(params, lat, ts, txt):
        return model.apply(params, lat, ts, txt, rope)

    t0 = time.time()
    out = step(params, lat, ts, txt)
    out.block_until_ready()
    print(f"# compile+first step {time.time()-t0:.0f}s", file=sys.stderr)

    n_iter = 5
    t0 = time.time()
    for _ in range(n_iter):
        out = step(params, lat, ts, txt)
    out.block_until_ready()
    sec_per_step = (time.time() - t0) / n_iter

    baseline = 3.7  # A100 s/step at this workload (README.md:143)
    print(json.dumps({
        "metric": "12B MMDiT denoise s/step, T2V 384x672x49f CFG (fp8 weights, 1x v5e)",
        "value": round(sec_per_step, 4),
        "unit": "s/step",
        "vs_baseline": round(baseline / sec_per_step, 3),
    }))


if __name__ == "__main__":
    main()
