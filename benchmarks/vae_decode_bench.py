"""VAE decode wall-clock sweep over decode_chunk_frames (real TPU).

The cache_mag decode loop (ref autoencoder_magvit.py:289 ->
omnigen_enc_dec.py:621-629) feeds mini_batch_decoder=1 latent frame per
decoder pass; through the tunneled v5e each pass is a separate device
program, so dispatch overhead and tail-effects dominate. decode_chunk_frames
batches several latent frames per pass (bit-identical math - the causal
cache threads exact conv state; tests/test_vae.py pins it). This sweep
measures the decode wall-clock per chunk size at the tracked 384x672x49f
geometry and checks max|diff| vs the reference chunking.

Usage: python benchmarks/vae_decode_bench.py [--height 384 --width 672
       --frames 49] [--chunks 1,2,4,7,13]
"""
import argparse
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--chunks", default="1,2,4,7,13")
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--tile_min", type=int, default=384,
                    help="tile_sample_min_size; raise above the width to "
                         "decode untiled (no overlap redundancy, fewer "
                         "programs; fine on 16 GB once the transformer is "
                         "freed)")
    args = ap.parse_args()

    from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
    from easyanimate_tpu.pipeline import EasyAnimatePipeline

    lat_f = (args.frames - 1) // 4 + 1
    lat = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 16, lat_f, args.height // 8, args.width // 8)), jnp.float32)

    ref_frames = None
    for chunk in [int(c) for c in args.chunks.split(",")]:
        cfg = MagvitVAEConfig(dtype="bfloat16", decode_chunk_frames=chunk,
                              tile_sample_min_size=args.tile_min)
        vae = AutoencoderKLMagvit(cfg)
        vparams = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 8, 8, 3)))
        pipe = EasyAnimatePipeline(transformer=None, vae=vae,
                                   transformer_params=None,
                                   vae_params=vparams)
        t0 = time.time()
        out = pipe.decode_latents(lat, to_uint8=True)
        first = time.time() - t0
        for _ in range(args.warmup - 1):
            out = pipe.decode_latents(lat, to_uint8=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            out = pipe.decode_latents(lat, to_uint8=True)
            best = min(best, time.time() - t0)
        arr = np.asarray(out)
        if ref_frames is None:
            ref_frames = arr
            diff = 0
        else:
            diff = int(np.max(np.abs(arr.astype(np.int32)
                                     - ref_frames.astype(np.int32))))
        print(f"chunk={chunk:2d}: first {first:6.1f}s  best {best:6.3f}s  "
              f"out {arr.shape}  max|uint8 diff| vs chunk1 = {diff}",
              flush=True)


if __name__ == "__main__":
    main()
