"""LCM-LoRA distillation driver.

Parity target: reference scripts/train_lcm_lora.py (consistency distillation
of a DDIM teacher into a LoRA student with an EMA target network, huber loss,
skipping-step boundary conditions).

Usage:
  python examples/train_lcm_lora.py --model_path ... --train_data_meta ...
  python examples/train_lcm_lora.py --tiny_demo
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_data_meta", default=None)
    ap.add_argument("--train_data_dir", default=None)
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--output_dir", default="runs/train_lcm")
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--lora_rank", type=int, default=64)
    ap.add_argument("--num_ddim_timesteps", type=int, default=50)
    ap.add_argument("--w_min", type=float, default=3.0)
    ap.add_argument("--w_max", type=float, default=15.0)
    ap.add_argument("--ema_decay", type=float, default=0.95)
    ap.add_argument("--max_train_steps", type=int, default=100)
    ap.add_argument("--train_batch_size", type=int, default=1)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny_demo", action="store_true")
    return ap.parse_args()


def main():
    args = parse_args()
    from easyanimate_tpu.pipeline.schedulers import DDIMConfig
    from easyanimate_tpu.training import TrainConfig
    from easyanimate_tpu.training.lcm import LCMConfig, make_lcm_train_step
    from easyanimate_tpu.training.lora import LoRAConfig, save_lora
    from easyanimate_tpu.utils.observability import MetricLogger

    if args.tiny_demo:
        import dataclasses

        from easyanimate_tpu.models.mmdit import (
            PRESETS,
            EasyAnimateTransformer3D,
        )

        args.max_train_steps = 3
        args.num_ddim_timesteps = 10
        args.lora_rank = 2
        cfg = dataclasses.replace(PRESETS["tiny"], out_channels=4)
        model = EasyAnimateTransformer3D(cfg)
        lat0 = jnp.zeros((1, 4, 2, 8, 8))
        txt0 = jnp.zeros((1, 5, cfg.text_embed_dim))
        teacher = model.init(jax.random.PRNGKey(0), lat0, jnp.array([1.0]),
                             txt0, None)
        rng = np.random.default_rng(args.seed)
        batches = (
            {"latents": jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8))
                                    .astype(np.float32)),
             "text": jnp.asarray(
                 rng.standard_normal((1, 5, cfg.text_embed_dim))
                 .astype(np.float32))}
            for _ in range(args.max_train_steps))
    else:
        if not args.model_path:
            raise SystemExit("pass --model_path or --tiny_demo")
        if not args.train_data_meta:
            raise SystemExit("pass --train_data_meta (json manifest)")
        from easyanimate_tpu.data import (
            AspectRatioBatchSampler,
            DataLoader,
            ImageVideoDataset,
            ResumableRandomSampler,
        )
        from easyanimate_tpu.loader import load_pipeline, load_text_encoders
        from easyanimate_tpu.models.vae import gaussian_sample, vae_encode

        pipe = load_pipeline(args.model_path, "t2v")
        model, teacher = pipe.transformer, pipe.transformer_params
        vae, vp = pipe.vae, pipe.vae_params
        encode_text = load_text_encoders(args.model_path)
        dataset = ImageVideoDataset(
            args.train_data_meta, args.train_data_dir,
            video_sample_n_frames=49, height=384, width=672, seed=args.seed)
        sampler = ResumableRandomSampler(len(dataset), seed=args.seed)
        loader = iter(DataLoader(
            dataset,
            AspectRatioBatchSampler(sampler=sampler,
                                    batch_size=args.train_batch_size,
                                    sample_info=dataset.sample_info()),
            num_workers=2))
        enc_rng = jax.random.PRNGKey(args.seed + 1)

        def _batches():
            nonlocal enc_rng
            for _ in range(args.max_train_steps):
                loaded = next(loader)
                pixels = jnp.asarray(loaded["pixel_values"] * 2.0 - 1.0)
                enc_rng, r = jax.random.split(enc_rng)
                moments = vae_encode(vae, vp, pixels)
                latents = gaussian_sample(moments, r, axis=1) \
                    * vae.cfg.scaling_factor
                yield {"latents": latents,
                       "text": encode_text(loaded["text"])["text"]}

        batches = _batches()

    init_fn, step_fn = make_lcm_train_step(
        model, teacher, DDIMConfig(),
        LCMConfig(num_ddim_timesteps=args.num_ddim_timesteps,
                  w_min=args.w_min, w_max=args.w_max,
                  ema_decay=args.ema_decay),
        LoRAConfig(rank=args.lora_rank),
        TrainConfig(learning_rate=args.learning_rate))
    state = init_fn(jax.random.PRNGKey(args.seed))
    step_fn = jax.jit(step_fn)

    logger = MetricLogger(os.path.join(args.output_dir, "metrics.jsonl"))
    for step, batch in enumerate(batches):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        logger.log(step, {k: float(v) for k, v in metrics.items()})
        print(f"step {step}: loss={float(metrics['loss']):.5f}", flush=True)

    os.makedirs(args.output_dir, exist_ok=True)
    save_lora(os.path.join(args.output_dir, "lcm_lora.npz"),
              state.params, LoRAConfig(rank=args.lora_rank))
    print("saved", os.path.join(args.output_dir, "lcm_lora.npz"))


if __name__ == "__main__":
    main()
