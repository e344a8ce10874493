"""Control-conditioned generation (reference predict_v2v_control.py
equivalent): pose/canny/depth control video, camera trajectories, ref image.

  python examples/predict_v2v_control.py --model_path ... \
      --control_video pose.mp4 [--ref_image id.png]
  python examples/predict_v2v_control.py --model_path ... \
      --camera_pose poses.txt
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
    ap.add_argument("--control_video", default=None)
    ap.add_argument("--camera_pose", default=None,
                    help="RealEstate10K-style pose txt -> Plucker control")
    ap.add_argument("--ref_image", default=None)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--video_length", type=int, default=49)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=43)
    from examples.common import add_common_flags, load_pipe_from_args

    add_common_flags(ap)
    ap.add_argument("--text_encoder_path", default=None)
    ap.add_argument("--output", default="samples/control.mp4")
    args = ap.parse_args()

    from easyanimate_tpu.data.camera import plucker_from_file
    from easyanimate_tpu.utils.media import (
        _load_and_resize,
        get_video_to_video_latent,
        save_videos_grid,
    )
    from examples.predict_t2v import _encode_text

    pipe = load_pipe_from_args(args, "control")
    pos, neg = _encode_text(args, pipe.mmdit_cfg.text_embed_dim)

    kw = {}
    if args.camera_pose:
        pl = plucker_from_file(args.camera_pose, args.height, args.width)
        pl = pl[: args.video_length]  # (T, H, W, 6) -> (1, 6, T, H, W)
        kw["control_camera_video"] = jnp.asarray(
            np.transpose(pl, (3, 0, 1, 2))[None])
    elif args.control_video:
        video, _ = get_video_to_video_latent(
            args.control_video, args.video_length, (args.height, args.width))
        kw["control_video"] = jnp.asarray(video)
    if args.ref_image:
        img = _load_and_resize(args.ref_image, (args.height, args.width))
        kw["ref_image"] = jnp.asarray(
            np.transpose(img, (2, 0, 1))[None, :, None])

    out = pipe(pos, neg, height=args.height, width=args.width,
               video_length=args.video_length, num_inference_steps=args.steps,
               guidance_scale=args.guidance_scale,
               rng=jax.random.PRNGKey(args.seed),
               teacache_threshold=args.teacache,
               cfg_skip_ratio=args.cfg_skip, **kw)
    save_videos_grid(np.asarray(out), args.output, fps=args.fps,
                     color_transfer_post_process=args.color_transfer)
    print("saved", args.output)


if __name__ == "__main__":
    main()
