"""SFT / LoRA training driver (reference scripts/train.py + train_lora.py
equivalent, accelerate+DeepSpeed replaced by one GSPMD mesh).

  python examples/train.py --train_data_meta train.json --output_dir runs/x \
      [--model_path ckpt_dir] [--lora_rank 32] [--loss_type flow] \
      [--mesh dp=4,sp=1,tp=2] [--token_length 13312] ...

Without --model_path it trains the tiny random-weight config (pipeline
smoke / CI). The loop: aspect-bucket batching -> native frame preprocessing
-> VAE encode (no grad) -> text encode (or cached embeds) -> sharded train
step -> EMA -> orbax checkpoints with sampler-cursor resume -> metric logs.
"""
import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_data_meta", required=True)
    ap.add_argument("--train_data_dir", default=None)
    ap.add_argument("--output_dir", default="runs/train")
    ap.add_argument("--model_path", default=None)
    ap.add_argument("--config_path",
                    default="config/easyanimate_video_v5.1_magvit_qwen.yaml")
    ap.add_argument("--loss_type", default="flow",
                    choices=["flow", "ddpm", "sigma"])
    ap.add_argument("--learning_rate", type=float, default=2e-5)
    ap.add_argument("--max_grad_norm", type=float, default=0.05)
    ap.add_argument("--train_batch_size", type=int, default=1)
    ap.add_argument("--video_sample_n_frames", type=int, default=49)
    ap.add_argument("--sample_height", type=int, default=384)
    ap.add_argument("--sample_width", type=int, default=672)
    ap.add_argument("--max_train_steps", type=int, default=100)
    ap.add_argument("--checkpointing_steps", type=int, default=500)
    ap.add_argument("--checkpoints_total_limit", type=int, default=3)
    ap.add_argument("--use_ema", action="store_true")
    ap.add_argument("--uniform_sampling_bands", type=int, default=0)
    ap.add_argument("--lora_rank", type=int, default=0,
                    help=">0 trains a LoRA instead of full SFT")
    ap.add_argument("--enable_inpaint", action="store_true")
    ap.add_argument("--train_mode", default="sft",
                    choices=["sft", "control"],
                    help="control: condition on control videos "
                         "(train_control.py parity)")
    ap.add_argument("--validation_steps", type=int, default=0,
                    help=">0: render a validation sample every N steps "
                         "(log_validation parity)")
    ap.add_argument("--mesh", default="dp=-1,sp=1,tp=1")
    ap.add_argument("--dataloader_num_workers", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--resume_from_checkpoint", action="store_true")
    ap.add_argument("--tiny_demo", action="store_true",
                    help="tiny random models + 32px frames (CI smoke)")
    return ap.parse_args()


def main():
    args = parse_args()
    from easyanimate_tpu.data import (
        AspectRatioBatchSampler,
        ImageVideoDataset,
        ResumableRandomSampler,
    )
    from easyanimate_tpu.models.vae import gaussian_sample, vae_encode
    from easyanimate_tpu.parallel import MeshConfig, create_mesh
    from easyanimate_tpu.pipeline.t2v import build_rope
    from easyanimate_tpu.training import (
        FlowMatchLossConfig,
        TrainConfig,
        create_train_state,
        make_train_step,
    )
    from easyanimate_tpu.training.checkpoints import CheckpointManager
    from easyanimate_tpu.utils.observability import MetricLogger, StepTimer

    mesh_kw = dict(kv.split("=") for kv in args.mesh.split(","))
    mesh = create_mesh(MeshConfig(**{k: int(v) for k, v in mesh_kw.items()}))
    print("mesh:", dict(zip(mesh.axis_names, mesh.devices.shape)))

    if args.tiny_demo:
        args.sample_height = args.sample_width = 32
        args.video_sample_n_frames = 5
        transformer, vae, tparams, vparams, text_dim = _tiny_models(
            args.enable_inpaint, args.train_mode == "control")
        encode_text = lambda texts: jnp.zeros(
            (len(texts), 8, text_dim), jnp.float32)
        vae_cfg = vae.cfg
    elif args.model_path:
        from easyanimate_tpu.loader import load_pipeline

        pipe = load_pipeline(args.model_path,
                             "inpaint" if args.enable_inpaint else "t2v")
        transformer, vae = pipe.transformer, pipe.vae
        tparams, vparams = pipe.transformer_params, pipe.vae_params
        vae_cfg = vae.cfg
        raise SystemExit("wire a text encoder for full training runs "
                         "(see examples/predict_t2v.py _encode_text)")
    else:
        raise SystemExit("pass --model_path or --tiny_demo")

    if args.train_mode == "control":
        from easyanimate_tpu.data import ImageVideoControlDataset

        dataset = ImageVideoControlDataset(
            args.train_data_meta, args.train_data_dir,
            video_sample_n_frames=args.video_sample_n_frames,
            height=args.sample_height, width=args.sample_width,
            enable_inpaint=False, seed=args.seed)
    else:
        dataset = ImageVideoDataset(
            args.train_data_meta, args.train_data_dir,
            video_sample_n_frames=args.video_sample_n_frames,
            height=args.sample_height, width=args.sample_width,
            enable_inpaint=args.enable_inpaint, seed=args.seed)
    sampler = ResumableRandomSampler(len(dataset), seed=args.seed)
    batch_sampler = AspectRatioBatchSampler(
        sampler=sampler, batch_size=args.train_batch_size,
        sample_info=dataset.sample_info())
    from easyanimate_tpu.data import DataLoader

    loader = iter(DataLoader(dataset, batch_sampler,
                             num_workers=args.dataloader_num_workers))

    tcfg = TrainConfig(
        learning_rate=args.learning_rate, max_grad_norm=args.max_grad_norm,
        use_ema=args.use_ema, loss_type=args.loss_type,
        loss=FlowMatchLossConfig(uniform_bands=args.uniform_sampling_bands))
    if args.lora_rank > 0:
        from easyanimate_tpu.training.lora import (LoRAConfig,
                                                   make_lora_train_step)

        init_fn, step_fn = make_lora_train_step(
            transformer, tcfg, LoRAConfig(rank=args.lora_rank), tparams)
        state = init_fn(jax.random.PRNGKey(args.seed))
    else:
        state = create_train_state(tparams, tcfg)
        step_fn = make_train_step(transformer, tcfg)
    jstep = jax.jit(step_fn)

    ckpts = CheckpointManager(os.path.join(args.output_dir, "checkpoints"),
                              max_to_keep=args.checkpoints_total_limit)
    if args.resume_from_checkpoint:
        restored, sampler_state, step = ckpts.restore_latest(state)
        if restored is not None:
            state = restored
            sampler.load_state_dict(sampler_state)
            print(f"resumed from step {step}")

    logger = MetricLogger(args.output_dir)
    timer = StepTimer()
    rng = jax.random.PRNGKey(args.seed)
    lat_scale = vae_cfg.scaling_factor
    step0 = int(np.asarray(state.step))

    with mesh:
        for step in range(step0, args.max_train_steps):
            loaded = next(loader)
            pixels = loaded["pixel_values"] * 2.0 - 1.0  # [-1,1] for the VAE
            rng, r_enc, r_step = jax.random.split(rng, 3)
            moments = vae_encode(vae, vparams, jnp.asarray(pixels))
            latents = gaussian_sample(moments, r_enc, axis=1) * lat_scale
            text = encode_text(loaded["text"])
            batch = {
                "latents": latents,
                "text": text,
                "rope": build_rope(
                    transformer.cfg, args.sample_height, args.sample_width,
                    latents.shape[2],
                    vae_scale=vae_cfg.spatial_compression),
            }
            if args.enable_inpaint:
                batch["inpaint_latents"] = _inpaint_latents(
                    vae, vparams, loaded, pixels, latents, lat_scale,
                    transformer.cfg)
            if args.train_mode == "control":
                from easyanimate_tpu.models.vae import gaussian_mode

                ctl = loaded["control_pixel_values"]
                ctl_lat = gaussian_mode(
                    vae_encode(vae, vparams, jnp.asarray(ctl * 2 - 1)),
                    axis=1) * lat_scale
                batch["control_latents"] = ctl_lat.astype(latents.dtype)
            state, metrics = jstep(state, batch, r_step)
            metrics.update(timer.tick())
            logger.log(step, metrics)
            if step % 10 == 0:
                print(f"step {step}: loss={float(metrics['loss']):.4f} "
                      f"gnorm={float(metrics['grad_norm']):.3f}")
            if (step + 1) % args.checkpointing_steps == 0:
                ckpts.save(step + 1, state, sampler.state_dict())
            if args.validation_steps and (step + 1) % args.validation_steps == 0:
                _log_validation(args, transformer, vae,
                                state, vparams, encode_text, step + 1)
    ckpts.save(args.max_train_steps, state, sampler.state_dict())
    print("done; checkpoints in", ckpts.directory)


def _log_validation(args, transformer, vae, state, vparams, encode_text,
                    step):
    """Render a sample with the current weights (train.py:246-384 parity)."""
    from easyanimate_tpu.pipeline import EasyAnimatePipeline
    from easyanimate_tpu.utils.media import save_videos_grid

    params = state.params if "params" in getattr(state.params, "keys",
                                                 lambda: [])() else None
    tparams = state.params if params is None else state.params
    if not isinstance(tparams, dict) or "params" not in tparams:
        return  # LoRA state: skip (merge handled by predict scripts)
    if args.train_mode == "control":
        from easyanimate_tpu.pipeline import EasyAnimateControlPipeline

        pipe = EasyAnimateControlPipeline(
            transformer=transformer, vae=vae, transformer_params=tparams,
            vae_params=vparams)
    elif args.enable_inpaint:
        from easyanimate_tpu.pipeline import EasyAnimateInpaintPipeline

        pipe = EasyAnimateInpaintPipeline(
            transformer=transformer, vae=vae, transformer_params=tparams,
            vae_params=vparams)
    else:
        pipe = EasyAnimatePipeline(
            transformer=transformer, vae=vae, transformer_params=tparams,
            vae_params=vparams)
    pos = encode_text(["validation sample"])
    neg = jnp.zeros_like(pos)
    video = pipe(pos, neg, height=args.sample_height,
                 width=args.sample_width,
                 video_length=args.video_sample_n_frames,
                 num_inference_steps=4, guidance_scale=3.0,
                 rng=jax.random.PRNGKey(step))
    out = os.path.join(args.output_dir, f"validation_{step}.gif")
    save_videos_grid(np.asarray(video), out, fps=8)
    print("validation sample ->", out)


def _inpaint_latents(vae, vparams, samples, pixels, latents, scale, cfg):
    import jax.numpy as jnp
    import numpy as np

    from easyanimate_tpu.models.vae import gaussian_mode, vae_encode
    from easyanimate_tpu.pipeline.inpaint import resize_mask_to_latent

    masks = np.asarray(samples["mask"])  # collated (B,1,T,H,W) 1=regen
    masked = jnp.asarray(pixels * (masks < 0.5))
    masked_lat = gaussian_mode(vae_encode(vae, vparams, masked), axis=1) * scale
    mask_lat = resize_mask_to_latent(
        jnp.asarray(1.0 - masks), latents.shape,
        vae.cfg.chunk_mode == "cache_mag") * scale
    return jnp.concatenate([mask_lat, masked_lat], axis=1).astype(latents.dtype)


def _tiny_models(enable_inpaint, enable_control=False):
    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig

    vae_cfg = MagvitVAEConfig(
        latent_channels=4, block_out_channels=(8, 16),
        down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
        up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
        layers_per_block=1, norm_num_groups=4, mini_batch_encoder=2,
        mini_batch_decoder=1, scaling_factor=0.5)
    in_ch = 4
    if enable_inpaint:
        in_ch = 9
    elif enable_control:
        in_ch = 8
    mmdit_cfg = dataclasses.replace(PRESETS["tiny"], in_channels=in_ch,
                                    out_channels=4)
    transformer = EasyAnimateTransformer3D(mmdit_cfg)
    vae = AutoencoderKLMagvit(vae_cfg)
    lat = jnp.zeros((1, 4, 3, 16, 16))
    txt = jnp.zeros((1, 8, mmdit_cfg.text_embed_dim))
    kw = {}
    if enable_inpaint:
        kw["inpaint_latents"] = jnp.zeros((1, 5, 3, 16, 16))
    elif enable_control:
        kw["control_latents"] = jnp.zeros((1, 4, 3, 16, 16))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None, **kw)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    return transformer, vae, tp, vp, mmdit_cfg.text_embed_dim


if __name__ == "__main__":
    main()
