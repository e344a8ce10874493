"""MagViT VAE GAN training driver.

Parity target: reference scripts/train_vae.py (reconstruction + LPIPS +
KL + hinge-GAN with adaptive generator weight, alternating ae/disc steps,
optional EMA). Data is the same train.json metadata format as train.py.

Usage:
  python examples/train_vae.py --train_data_meta meta.json [...]
  python examples/train_vae.py --tiny_demo        # CI smoke on random frames
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
    ap.add_argument("--output_dir", default="runs/train_vae")
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--disc_learning_rate", type=float, default=1e-4)
    ap.add_argument("--train_batch_size", type=int, default=1)
    ap.add_argument("--video_sample_n_frames", type=int, default=17)
    ap.add_argument("--sample_size", type=int, default=256)
    ap.add_argument("--max_train_steps", type=int, default=100)
    ap.add_argument("--disc_start", type=int, default=50)
    ap.add_argument("--perceptual_weight", type=float, default=1.0)
    ap.add_argument("--kl_weight", type=float, default=1e-6)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--checkpointing_steps", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny_demo", action="store_true")
    return ap.parse_args()


def main():
    args = parse_args()
    from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
    from easyanimate_tpu.training.vae_losses import (
        Discriminator3D,
        VAELossConfig,
    )
    from easyanimate_tpu.training.vae_trainer import (
        VAETrainConfig,
        create_vae_train_state,
        make_vae_train_steps,
    )
    from easyanimate_tpu.utils.observability import MetricLogger

    if args.tiny_demo:
        args.sample_size, args.video_sample_n_frames = 16, 3
        args.max_train_steps, args.disc_start = 4, 2
        args.perceptual_weight = 0.0
        vae_cfg = MagvitVAEConfig(
            latent_channels=4, block_out_channels=(8, 16),
            down_block_types=("SpatialTemporalDownBlock3D",
                              "SpatialDownBlock3D"),
            up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
            layers_per_block=1, norm_num_groups=4, mini_batch_encoder=2,
            mini_batch_decoder=1, scaling_factor=0.5)
        disc = Discriminator3D(base_channels=8, num_layers=2)
    else:
        vae_cfg = MagvitVAEConfig()
        disc = Discriminator3D()
    vae = AutoencoderKLMagvit(vae_cfg)

    s, f = args.sample_size, args.video_sample_n_frames
    vp = vae.init(jax.random.PRNGKey(args.seed),
                  jnp.zeros((1, 1, s, s, 3)))
    dp = disc.init(jax.random.PRNGKey(args.seed + 1),
                   jnp.zeros((1, f, s, s, 3)))

    lpips_apply = None
    if args.perceptual_weight > 0:
        from easyanimate_tpu.training.vae_losses import LPIPS

        lp = LPIPS()
        x0 = jnp.zeros((1, s, s, 3))
        lpips_params = lp.init(jax.random.PRNGKey(0), x0, x0)
        lpips_apply = lambda a, b: lp.apply(lpips_params, a, b)

    cfg = VAETrainConfig(
        learning_rate=args.learning_rate,
        disc_learning_rate=args.disc_learning_rate,
        use_ema=args.use_ema,
        loss=VAELossConfig(disc_start=args.disc_start,
                           perceptual_weight=args.perceptual_weight,
                           kl_weight=args.kl_weight))
    state = create_vae_train_state(vp, dp, cfg)
    ae_step, disc_step = make_vae_train_steps(vae, disc, cfg,
                                              lpips_apply=lpips_apply)
    ae_step, disc_step = jax.jit(ae_step), jax.jit(disc_step)

    if args.tiny_demo:
        rng = np.random.default_rng(args.seed)
        batches = (
            {"video": jnp.asarray(
                rng.standard_normal((args.train_batch_size, f, s, s, 3))
                .astype(np.float32) * 0.5)}
            for _ in range(args.max_train_steps))
    else:
        if not args.train_data_meta:
            raise SystemExit("pass --train_data_meta or --tiny_demo")
        from easyanimate_tpu.data import ImageVideoDataset

        ds = ImageVideoDataset(args.train_data_meta, args.train_data_dir,
                               video_sample_n_frames=f, sample_size=s)

        def gen():
            i = 0
            while True:
                items = [ds[(i + j) % len(ds)]
                         for j in range(args.train_batch_size)]
                i += args.train_batch_size
                vid = np.stack([it["pixel_values"] for it in items])
                # (B,T,C,H,W) in [-1,1] -> channels-last
                yield {"video": jnp.asarray(vid.transpose(0, 1, 3, 4, 2))}
        batches = gen()

    logger = MetricLogger(os.path.join(args.output_dir, "metrics.jsonl"))
    for step, batch in enumerate(batches):
        if step >= args.max_train_steps:
            break
        state, aux = ae_step(state, batch, jax.random.PRNGKey(step))
        state, daux = disc_step(state, batch, jax.random.PRNGKey(step + 17))
        logger.log(step, {k: float(v) for k, v in {**aux, **daux}.items()})
        print(f"step {step}: loss={float(aux['loss']):.4f} "
              f"disc={float(daux['disc_loss']):.4f}", flush=True)
    print("done")


if __name__ == "__main__":
    main()
