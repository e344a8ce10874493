"""Video-to-video generation (reference predict_v2v.py equivalent):
re-denoise an input video at partial strength through the inpaint pipeline.

  python examples/predict_v2v.py --model_path ... --video in.mp4 \
      --denoise_strength 0.7 --prompt "..."
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--prompt", default="")
    ap.add_argument("--negative_prompt", default="")
    ap.add_argument("--video", required=True)
    ap.add_argument("--denoise_strength", type=float, default=0.70)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--video_length", type=int, default=49)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=43)
    from examples.common import add_common_flags, load_pipe_from_args

    add_common_flags(ap)
    ap.add_argument("--text_encoder_path", default=None)
    ap.add_argument("--output", default="samples/v2v.mp4")
    args = ap.parse_args()

    from easyanimate_tpu.utils.media import (
        get_video_to_video_latent,
        save_videos_grid,
    )
    from examples.predict_t2v import _encode_text

    pipe = load_pipe_from_args(args, "inpaint")
    pos, neg = _encode_text(args, pipe.mmdit_cfg.text_embed_dim)

    # (1, C, T, H, W) in [0,1]; a full-ones mask regenerates every pixel but
    # the input video anchors the partial-strength initial latents
    # (pipeline_easyanimate_inpaint.py:760-767 strength path)
    video, _ = get_video_to_video_latent(
        args.video, args.video_length, (args.height, args.width))

    out = pipe(pos, neg,
               video=jnp.asarray(video),
               mask_video=jnp.ones((1, 1, *video.shape[2:])),
               height=args.height, width=args.width,
               video_length=args.video_length,
               num_inference_steps=args.steps,
               guidance_scale=args.guidance_scale,
               strength=args.denoise_strength,
               rng=jax.random.PRNGKey(args.seed),
               teacache_threshold=args.teacache,
               cfg_skip_ratio=args.cfg_skip)
    save_videos_grid(np.asarray(out), args.output, fps=args.fps,
                     color_transfer_post_process=args.color_transfer)
    print("saved", args.output)


if __name__ == "__main__":
    main()
