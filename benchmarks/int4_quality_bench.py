"""Quality artifact for the int4 README rows (VERDICT r4 #5): full-forward
cosine of the W4A8 / W4A16 model vs the SAME-weights bf16 model at the
ACTUAL published geometries (576x1008x49f, 768x1344x49f, 1024x1024x49f).

Layer count is reduced (default 4, dense layer 0 + SWA like the real
config) because per-layer quantization error is what the cosine measures --
layer SHAPES (3072 dim, 48 heads, 12288 FFN) and the real token counts
(29k / 52k / 53k) are kept, since per-token dynamic int8 activation scales
and the SWA/window composition are sequence-length-dependent while layer
count only compounds a per-layer error that the tiny-model guard
(tests/test_quant.py::test_mmdit_w4a8_same_params_as_int4_and_close_to_float)
already pins.

Prints one JSON line per geometry:
  {"geometry", "tokens", "w4a8_cosine", "w4a16_cosine", "int8_cosine"}
Run on the TPU; logs land in benchmarks/logs_r5_int4_quality.log and are
cited next to the int4 rows in README.md.
"""
import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--geometries", default="576x1008;768x1344;1024x1024")
    ap.add_argument("--frames", type=int, default=49)
    args = ap.parse_args()

    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.ops.quant import (quantize_params_int4,
                                           quantize_params_int8)
    from easyanimate_tpu.pipeline.t2v import build_rope

    base = dataclasses.replace(
        PRESETS["v5.1-12b"], num_layers=args.layers,
        swa_layers=tuple(range(1, args.layers)))  # dense layer 0, like V5.1

    lat_t = (args.frames - 1) // 4 + 1
    text_len = 256
    for geom in args.geometries.split(";"):
        height, width = (int(x) for x in geom.split("x"))
        rope = build_rope(base, height, width, lat_t)
        lat = 0.5 * jax.random.normal(
            jax.random.PRNGKey(1),
            (1, 16, lat_t, height // 8, width // 8), jnp.bfloat16)
        ts = jnp.full((1,), 500.0, jnp.float32)
        txt = 0.02 * jax.random.normal(
            jax.random.PRNGKey(2), (1, text_len, base.text_embed_dim),
            jnp.bfloat16)

        model_f = EasyAnimateTransformer3D(base)
        params = model_f.init(jax.random.PRNGKey(0), lat, ts, txt,
                              rope)["params"]
        out_f = np.asarray(
            jax.jit(lambda p: model_f.apply({"params": p}, lat, ts, txt,
                                            rope))(params),
            np.float32).ravel()

        row = {"geometry": f"{height}x{width}x{args.frames}f",
               "tokens": lat_t * (height // 16) * (width // 16)}

        def cosine(quant, params_q):
            model_q = EasyAnimateTransformer3D(
                dataclasses.replace(base, linear_quant=quant))
            out_q = np.asarray(
                jax.jit(lambda p: model_q.apply({"params": p}, lat, ts,
                                                txt, rope))(params_q),
                np.float32).ravel()
            return round(float(
                (out_f @ out_q) / max(np.linalg.norm(out_f)
                                      * np.linalg.norm(out_q), 1e-12)), 5)

        p4 = quantize_params_int4(params)
        row["w4a8_cosine"] = cosine("w4a8", p4)
        row["w4a16_cosine"] = cosine("int4", p4)
        for x in jax.tree.leaves(p4):
            x.delete()
        p8 = quantize_params_int8(params)
        row["int8_cosine"] = cosine("int8", p8)
        # free everything before the next (larger) geometry: at 53k tokens
        # the float params + two quantized copies + stale executables from
        # the previous geometries RESOURCE_EXHAUST a 16 GB chip
        for x in jax.tree.leaves((params, p8)):
            x.delete()
        jax.clear_caches()
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
