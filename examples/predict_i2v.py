"""Image-to-video / video-to-video inference (reference predict_i2v.py /
predict_v2v.py equivalents) through the inpaint pipeline.

  python examples/predict_i2v.py --model_path ... --start_image cat.png
  python examples/predict_i2v.py --model_path ... --video src.mp4 --strength 0.7
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
    ap.add_argument("--start_image", default=None)
    ap.add_argument("--end_image", default=None)
    ap.add_argument("--video", default=None)
    ap.add_argument("--strength", type=float, default=0.70)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--video_length", type=int, default=49)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=43)
    from examples.common import add_common_flags, load_pipe_from_args

    add_common_flags(ap)
    ap.add_argument("--partial_video_length", type=int, default=None,
                    help="ultra-long video: sliding-window segment length "
                         "(reference predict_i2v.py partial_video_length); "
                         "--video_length becomes the TOTAL length")
    ap.add_argument("--overlap_video_length", type=int, default=4,
                    help="blend overlap between segments")
    ap.add_argument("--text_encoder_path", default=None)
    ap.add_argument("--output", default="samples/i2v.mp4")
    args = ap.parse_args()

    from easyanimate_tpu.utils.media import (
        get_image_to_video_latent,
        get_video_to_video_latent,
        save_videos_grid,
    )
    from examples.predict_t2v import _encode_text

    pipe = load_pipe_from_args(args, "inpaint")
    pos, neg = _encode_text(args, pipe.mmdit_cfg.text_embed_dim)

    if args.partial_video_length:
        if args.video:
            # same refusal as the reference UI (ui.py:487)
            raise SystemExit(
                "Video to Video does not support Long Video Generation")

        from easyanimate_tpu.ui.controller import generate_long_video
        from easyanimate_tpu.utils.media import _load_and_resize

        def frame(path):
            # (H, W, 3) [0,1] -> (3, H, W): generate_long_video writes
            # frames into a channels-first buffer
            return _load_and_resize(
                path, (args.height, args.width)).transpose(2, 0, 1)

        out = generate_long_video(
            pipe, pos, neg, total_length=args.video_length,
            partial_video_length=args.partial_video_length,
            overlap_video_length=args.overlap_video_length,
            height=args.height, width=args.width,
            start_image=frame(args.start_image) if args.start_image else None,
            end_image=frame(args.end_image) if args.end_image else None,
            rng=jax.random.PRNGKey(args.seed),
            num_inference_steps=args.steps,
            guidance_scale=args.guidance_scale,
            teacache_threshold=args.teacache,
            cfg_skip_ratio=args.cfg_skip)
        save_videos_grid(np.asarray(out), args.output, fps=args.fps,
                         color_transfer_post_process=args.color_transfer)
        print("saved", args.output)
        return

    if args.video:
        video, mask = get_video_to_video_latent(
            args.video, args.video_length, (args.height, args.width))
        strength = args.strength
    else:
        video, mask = get_image_to_video_latent(
            args.start_image, args.end_image, args.video_length,
            (args.height, args.width))
        strength = 1.0

    out = pipe(pos, neg, video=jnp.asarray(video), mask_video=jnp.asarray(mask),
               strength=strength, height=args.height, width=args.width,
               video_length=args.video_length, num_inference_steps=args.steps,
               guidance_scale=args.guidance_scale,
               rng=jax.random.PRNGKey(args.seed),
               teacache_threshold=args.teacache,
               cfg_skip_ratio=args.cfg_skip)
    save_videos_grid(np.asarray(out), args.output, fps=args.fps,
                     color_transfer_post_process=args.color_transfer)
    print("saved", args.output)


if __name__ == "__main__":
    main()
