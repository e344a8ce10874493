"""Text-to-video inference (reference predict_t2v.py equivalent).

Usage:
  python examples/predict_t2v.py --model_path /path/to/EasyAnimateV5.1-12b \
      --prompt "a cat playing piano" --height 384 --width 672 \
      --video_length 49 --steps 50 [--fp8] [--teacache 0.1] [--lora my.npz]

With no --model_path, runs a random-weight tiny demo (shape/pipeline check).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from examples.common import add_common_flags, load_pipe_from_args

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--prompt", default="A cat walks on the grass.")
    ap.add_argument("--negative_prompt", default="")
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--width", type=int, default=672)
    ap.add_argument("--video_length", type=int, default=49)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--seed", type=int, default=43)
    add_common_flags(ap)
    ap.add_argument("--lora", default=None)
    ap.add_argument("--lora_scale", type=float, default=1.0)
    ap.add_argument("--text_encoder_path", default=None,
                    help="Qwen2-VL dir for on-TPU text encoding")
    ap.add_argument("--output", default="samples/t2v.mp4")
    args = ap.parse_args()

    from easyanimate_tpu.utils.media import save_videos_grid

    if args.model_path:
        pipe = load_pipe_from_args(args, "t2v")
        if args.lora:
            from easyanimate_tpu.training.lora import load_lora, merge_lora

            lora, lcfg = load_lora(args.lora)
            pipe.transformer_params = {"params": merge_lora(
                pipe.transformer_params["params"], lora, lcfg,
                scale=args.lora_scale)}
        pos, neg = _encode_text(args, pipe.mmdit_cfg.text_embed_dim)
    else:
        print("no --model_path: running the tiny random-weight demo")
        pipe, text_dim = _tiny_pipe()
        args.height = args.width = 64
        args.video_length = 5
        args.steps = 4
        pos, neg = _random_text(text_dim)
        if args.sampler:  # the loader path already switched
            from easyanimate_tpu.pipeline import make_scheduler

            pipe.scheduler = make_scheduler(args.sampler,
                                            base=pipe.scheduler)
    video = pipe(
        pos, neg, height=args.height, width=args.width,
        video_length=args.video_length, num_inference_steps=args.steps,
        guidance_scale=args.guidance_scale,
        rng=jax.random.PRNGKey(args.seed),
        teacache_threshold=args.teacache, cfg_skip_ratio=args.cfg_skip)
    save_videos_grid(np.asarray(video), args.output, fps=args.fps,
                     color_transfer_post_process=args.color_transfer)
    print("saved", args.output, video.shape)


def _encode_text(args, text_dim):
    if args.text_encoder_path:
        from transformers import AutoTokenizer

        from easyanimate_tpu.models.convert import load_safetensors
        from easyanimate_tpu.models.text import (
            Qwen2Config, Qwen2TextEncoder, convert_qwen2_state_dict)

        tok = AutoTokenizer.from_pretrained(args.text_encoder_path)
        cfg = Qwen2Config()
        enc = Qwen2TextEncoder(cfg)
        import glob
        sd = {}
        for f in glob.glob(os.path.join(args.text_encoder_path,
                                        "*.safetensors")):
            sd.update(load_safetensors(f))
        variables = convert_qwen2_state_dict(sd, cfg)

        def embed(prompt):
            msg = [{"role": "user", "content": [{"type": "text",
                                                 "text": prompt}]}]
            text = tok.apply_chat_template(msg, tokenize=False,
                                           add_generation_prompt=True)
            ids = tok(text, padding="max_length", max_length=256,
                      truncation=True, return_tensors="np")
            return enc.apply(variables, jnp.asarray(ids["input_ids"]),
                             jnp.asarray(ids["attention_mask"]))

        return embed(args.prompt), embed(args.negative_prompt or "")
    raise SystemExit("pass --text_encoder_path (or precompute embeddings)")


def _tiny_pipe():
    import dataclasses

    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
    from easyanimate_tpu.pipeline import EasyAnimatePipeline

    mmdit_cfg = PRESETS["tiny"]
    vae_cfg = MagvitVAEConfig(
        latent_channels=4, block_out_channels=(8, 16),
        down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
        up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
        layers_per_block=1, norm_num_groups=4, mini_batch_encoder=2,
        mini_batch_decoder=1, scaling_factor=0.5)
    transformer = EasyAnimateTransformer3D(mmdit_cfg)
    vae = AutoencoderKLMagvit(vae_cfg)
    lat = jnp.zeros((1, 4, 3, 32, 32))
    txt = jnp.zeros((1, 8, mmdit_cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    return EasyAnimatePipeline(transformer=transformer, vae=vae,
                               transformer_params=tp, vae_params=vp), \
        mmdit_cfg.text_embed_dim


def _random_text(dim):
    pos = jax.random.normal(jax.random.PRNGKey(2), (1, 8, dim))
    return pos, jnp.zeros_like(pos)


if __name__ == "__main__":
    main()
