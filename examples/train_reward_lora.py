"""Reward-backprop LoRA driver.

Parity target: reference scripts/train_reward_lora.py (differentiable reward
fine-tuning: run the sampler with selective gradient steps, decode a subset
of latents, backprop a reward model's score into a LoRA; DRTune detach).

Usage:
  python examples/train_reward_lora.py --model_path ... --reward aesthetic
  python examples/train_reward_lora.py --tiny_demo
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
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--output_dir", default="runs/train_reward")
    ap.add_argument("--reward", default="brightness",
                    choices=["brightness", "clip", "hps", "pickscore",
                             "aesthetic"])
    ap.add_argument("--reward_model_path", default=None,
                    help="HF path for the CLIP/HPS/PickScore/aesthetic model")
    ap.add_argument("--prompt_path", default=None,
                    help="newline-separated training prompts")
    ap.add_argument("--learning_rate", type=float, default=1e-5)
    ap.add_argument("--lora_rank", type=int, default=32)
    ap.add_argument("--num_sample_steps", type=int, default=50)
    ap.add_argument("--backprop_strategy", default="last",
                    choices=["last", "tail", "uniform", "random"])
    ap.add_argument("--num_decoded_latents", type=int, default=1)
    ap.add_argument("--guidance_scale", type=float, default=6.0)
    ap.add_argument("--max_train_steps", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tiny_demo", action="store_true")
    return ap.parse_args()


def main():
    args = parse_args()
    from easyanimate_tpu.training import TrainConfig
    from easyanimate_tpu.training.lora import LoRAConfig, save_lora
    from easyanimate_tpu.training.reward import (
        RewardConfig,
        make_reward_train_step,
    )
    from easyanimate_tpu.utils.observability import MetricLogger

    if args.tiny_demo:
        import dataclasses

        from easyanimate_tpu.models.mmdit import (
            PRESETS,
            EasyAnimateTransformer3D,
        )
        from easyanimate_tpu.models.vae import (
            AutoencoderKLMagvit,
            MagvitVAEConfig,
        )

        args.max_train_steps = 2
        args.num_sample_steps = 3
        args.lora_rank = 2
        cfg = dataclasses.replace(PRESETS["tiny"], out_channels=4)
        model = EasyAnimateTransformer3D(cfg)
        vae_cfg = MagvitVAEConfig(
            latent_channels=4, block_out_channels=(8, 16),
            down_block_types=("SpatialTemporalDownBlock3D",
                              "SpatialDownBlock3D"),
            up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
            layers_per_block=1, norm_num_groups=4, mini_batch_encoder=2,
            mini_batch_decoder=1, scaling_factor=0.5)
        vae = AutoencoderKLMagvit(vae_cfg)
        lat0 = jnp.zeros((1, 4, 2, 8, 8))
        txt0 = jnp.zeros((1, 5, cfg.text_embed_dim))
        base = model.init(jax.random.PRNGKey(0), lat0, jnp.array([1.0]),
                          txt0, None)
        vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
        vae_scaling = vae_cfg.scaling_factor
        latent_shape = (1, 4, 2, 8, 8)
        rng = np.random.default_rng(args.seed)
        batches = ({"text": jnp.asarray(
            rng.standard_normal((1, 5, cfg.text_embed_dim))
            .astype(np.float32)),
            "latent_shape": latent_shape}
            for _ in range(args.max_train_steps))
    else:
        if not args.model_path:
            raise SystemExit("pass --model_path or --tiny_demo")
        from easyanimate_tpu.loader import load_pipeline, load_text_encoders

        pipe = load_pipeline(args.model_path, "t2v")
        model, vae = pipe.transformer, pipe.vae
        base, vp = pipe.transformer_params, pipe.vae_params
        vae_scaling = vae.cfg.scaling_factor
        encode_text = load_text_encoders(args.model_path)
        train_prompts = (open(args.prompt_path).read().splitlines()
                         if args.prompt_path
                         else ["a photo of a cat"])  # ref default prompt set
        latent_shape = pipe.latent_shape(1, 49, 384, 672)
        rng = np.random.default_rng(args.seed)

        def _batches():
            for _ in range(args.max_train_steps):
                p = train_prompts[int(rng.integers(len(train_prompts)))]
                yield {"text": encode_text([p])["text"],
                       "latent_shape": latent_shape}

        batches = _batches()

    if args.reward == "brightness":
        # differentiable proxy useful for smoke tests
        reward_fn = lambda frames: jnp.mean(frames, axis=(1, 2, 3, 4))
    else:
        # CLIP-family scorers need pretrained weights + the batch prompts;
        # wrap them to the per-sample reward contract of
        # make_reward_train_step (training/reward.py:63)
        from easyanimate_tpu.reward import reward_fn as rf

        cls = {"clip": rf.CLIPScoreReward, "hps": rf.HPSReward,
               "pickscore": rf.PickScoreReward,
               "aesthetic": rf.AestheticReward}[args.reward]
        if not args.reward_model_path:
            raise SystemExit("--reward_model_path required for " + args.reward)
        scorer = cls.from_pretrained(args.reward_model_path)
        prompts = (open(args.prompt_path).read().splitlines()
                   if args.prompt_path else [""])
        reward_fn = lambda frames: scorer(frames, prompts)[1][None]

    rcfg = RewardConfig(num_sample_steps=args.num_sample_steps,
                        backprop_strategy=args.backprop_strategy,
                        num_decoded_latents=args.num_decoded_latents,
                        guidance_scale=args.guidance_scale)
    init_fn, step_fn = make_reward_train_step(
        model, vae, vp, base, reward_fn, rcfg,
        LoRAConfig(rank=args.lora_rank),
        TrainConfig(learning_rate=args.learning_rate),
        vae_scaling=vae_scaling)
    state = init_fn(jax.random.PRNGKey(args.seed))

    logger = MetricLogger(os.path.join(args.output_dir, "metrics.jsonl"))
    for step, batch in enumerate(batches):
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(step))
        logger.log(step, {k: float(v) for k, v in metrics.items()})
        print(f"step {step}: loss={float(metrics['loss']):.5f} "
              f"reward={float(metrics.get('reward', 0.0)):.4f}", flush=True)

    os.makedirs(args.output_dir, exist_ok=True)
    save_lora(os.path.join(args.output_dir, "reward_lora.npz"),
              state.params, LoRAConfig(rank=args.lora_rank))
    print("saved", os.path.join(args.output_dir, "reward_lora.npz"))


if __name__ == "__main__":
    main()
