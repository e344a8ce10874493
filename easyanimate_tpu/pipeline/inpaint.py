"""I2V / V2V inpaint pipeline.

Parity target: EasyAnimateInpaintPipeline (pipeline_easyanimate_inpaint.py):
  - mask + masked-video latents: masked video VAE-encoded (mode) * scaling;
    the mask either VAE-encoded (legacy) or trilinearly resized straight to
    latent shape with the first frame handled separately when the VAE is
    cache_mag (resize_mask, :116-149; resize_inpaint_mask_directly config)
  - optional noise-augmented reference video (sigma ~ exp(N(-3, 0.5)) or a
    fixed ratio; zeros where the video is -1) (:152-167)
  - strength / partial denoise: start from noised video latents at timestep
    t_start (get_timesteps :760-767, prepare_latents :828-913)
  - transformer consumes channel-concat [latents, mask, masked] via
    inpaint_latents (in_channels check :1414-1425)
  - pure T2V through an inpaint checkpoint: zero mask/masked latents
    (:1391-1402)
"""
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.vae import gaussian_mode, vae_encode
from .schedulers import (DDIMConfig, EulerConfig, FlowMatchEulerConfig,
                         ddim_add_noise, init_noise_sigma)
from .t2v import EasyAnimatePipeline, build_rope


def resize_mask_to_latent(mask: jnp.ndarray, latent_shape,
                          first_frame_special: bool) -> jnp.ndarray:
    """Trilinear-resize a pixel mask (B,1,T,H,W) to the latent grid; the
    first frame maps 1:1 when the VAE is cache_mag (reference resize_mask)."""
    b, c = mask.shape[:2]
    lt, lh, lw = latent_shape[2:]
    # antialias=False matches torch F.interpolate(mode='trilinear',
    # align_corners=False)
    resize = lambda m, shape: jax.image.resize(
        m, (b, c, *shape), method="trilinear", antialias=False)
    if first_frame_special:
        first = resize(mask[:, :, :1], (1, lh, lw))
        if lt > 1:
            rest = resize(mask[:, :, 1:], (lt - 1, lh, lw))
            return jnp.concatenate([first, rest], axis=2)
        return first
    return resize(mask, (lt, lh, lw))


def add_noise_to_reference_video(video: jnp.ndarray, rng: jax.Array,
                                 ratio: Optional[float] = None) -> jnp.ndarray:
    """Noise-augment the reference video; masked (-1) pixels stay clean."""
    b = video.shape[0]
    r_sigma, r_noise = jax.random.split(rng)
    if ratio is None:
        sigma = jnp.exp(jax.random.normal(r_sigma, (b,)) * 0.5 - 3.0)
    else:
        sigma = jnp.full((b,), ratio)
    sigma = sigma.reshape(b, 1, 1, 1, 1).astype(video.dtype)
    noise = jax.random.normal(r_noise, video.shape, video.dtype) * sigma
    noise = jnp.where(video == -1.0, 0.0, noise)
    return video + noise


@dataclasses.dataclass(eq=False)
class EasyAnimateInpaintPipeline(EasyAnimatePipeline):
    """T2V/I2V/V2V through an inpaint-trained transformer."""

    def __call__(
        self,
        prompt_embeds: jnp.ndarray,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        *,
        video: Optional[jnp.ndarray] = None,       # (B,C,T,H,W) in [0,1]
        mask_video: Optional[jnp.ndarray] = None,  # (B,1,T,H,W) in [0,1], 1=generate
        height: int = 384,
        width: int = 672,
        video_length: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        guidance_rescale: float = 0.0,
        strength: float = 1.0,
        noise_aug_strength: float = 0.0563,
        rng: Optional[jax.Array] = None,
        output_type: str = "np",
        prompt_embeds_t5: Optional[jnp.ndarray] = None,
        negative_prompt_embeds_t5: Optional[jnp.ndarray] = None,
        clip_encoder_hidden_states: Optional[jnp.ndarray] = None,
        clip_attention_mask: Optional[jnp.ndarray] = None,
        clip_apply_ratio: float = 0.40,
        teacache_threshold: Optional[float] = None,
        scan_chunk: Optional[int] = None,
        cfg_split: bool = False,
        cfg_skip_ratio: Optional[float] = None,
        **kw,
    ):
        cfg = self.mmdit_cfg
        b = prompt_embeds.shape[0]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_lat, r_aug = jax.random.split(rng)

        shape = self.latent_shape(b, video_length, height, width)
        num_channels_transformer = cfg.in_channels
        latent_channels = self.vae_cfg.latent_channels
        has_inpaint_channels = num_channels_transformer != latent_channels
        scaling = self.vae_cfg.scaling_factor
        dt = cfg.jdtype

        # --- timestep subset for strength (V2V partial denoise) -----------
        t_start = max(num_inference_steps - int(num_inference_steps * strength), 0)
        is_strength_max = strength >= 1.0

        # --- encode video / build mask latents ----------------------------
        noise = jax.random.normal(r_lat, shape, jnp.float32)
        video_latents = None
        if video is not None:
            vid = (2.0 * video - 1.0).astype(self.vae_cfg.jdtype)
            if mask_video is not None:
                # regenerate-regions filled with -1 (reference
                # pipeline_easyanimate_inpaint.py:1346); the noise-aug
                # guard keys on the -1 fill to keep them clean
                keep = (mask_video < 0.5).astype(vid.dtype)
                masked_video = vid * keep - (1.0 - keep)
            else:
                masked_video = vid
            if noise_aug_strength and cfg.add_noise_in_inpaint_model:
                masked_video = add_noise_to_reference_video(
                    masked_video, r_aug, noise_aug_strength)
            enc = lambda x: gaussian_mode(
                vae_encode(self.vae, self.vae_params, x), axis=1
            ).astype(jnp.float32) * scaling
            masked_video_latents = enc(masked_video)
            if not is_strength_max:
                video_latents = enc(vid)
        elif has_inpaint_channels:
            masked_video_latents = jnp.zeros(shape, jnp.float32)

        if has_inpaint_channels:
            if mask_video is not None:
                if cfg.resize_inpaint_mask_directly:
                    mask_latents = resize_mask_to_latent(
                        1.0 - mask_video.astype(jnp.float32), shape,
                        self.vae_cfg.chunk_mode == "cache_mag") * scaling
                else:
                    masked_pix = jnp.broadcast_to(
                        2.0 * (1.0 - mask_video) - 1.0,
                        (b, 3, *mask_video.shape[2:])).astype(self.vae_cfg.jdtype)
                    mask_latents = gaussian_mode(
                        vae_encode(self.vae, self.vae_params, masked_pix),
                        axis=1).astype(jnp.float32) * scaling
            else:
                n_mask_ch = 1 if cfg.resize_inpaint_mask_directly else latent_channels
                mask_latents = jnp.zeros((*shape[:1], n_mask_ch, *shape[2:]),
                                         jnp.float32)
            inpaint = jnp.concatenate([mask_latents, masked_video_latents],
                                      axis=1).astype(dt)
            do_cfg = guidance_scale > 1.0
            if do_cfg:
                inpaint = jnp.concatenate([inpaint, inpaint])
            cond = {"inpaint_latents": inpaint}
        else:
            cond = {}

        # V4 I2V CLIP-image conditioning: the unconditional half gets zero
        # states and a zero mask (pipeline_easyanimate_inpaint.py:1277-1310)
        if clip_encoder_hidden_states is not None:
            clip = clip_encoder_hidden_states
            cmask = (clip_attention_mask if clip_attention_mask is not None
                     else jnp.ones((b, getattr(cfg, "n_query", 16))))
            if guidance_scale > 1.0:
                clip = jnp.concatenate([jnp.zeros_like(clip), clip])
                cmask = jnp.concatenate([jnp.zeros_like(cmask), cmask])
            cond["clip_encoder_hidden_states"] = clip.astype(dt)
            cond["clip_attention_mask"] = cmask

        # --- initial latents ------------------------------------------------
        if is_strength_max or video_latents is None:
            latents = noise * init_noise_sigma(self.scheduler,
                                               num_inference_steps)
        else:
            per_step, sched_extras = self.schedule_arrays(
                num_inference_steps, t_start)
            t0 = per_step[0, 0]
            if isinstance(self.scheduler, FlowMatchEulerConfig):
                sigma0 = per_step[0, 1]
                latents = (1.0 - sigma0) * video_latents + sigma0 * noise
            elif isinstance(self.scheduler, EulerConfig):
                # sigma-space V2V init (EulerDiscreteScheduler.add_noise)
                latents = video_latents + per_step[0, 1] * noise
            else:
                alphas_cumprod, _ = sched_extras
                latents = ddim_add_noise(video_latents, noise,
                                         t0.astype(jnp.int32), alphas_cumprod)
        latents = latents.astype(dt)

        # --- CFG text, rope, denoise ----------------------------------------
        txt = prompt_embeds
        txt_t5 = prompt_embeds_t5
        if guidance_scale > 1.0:
            txt = jnp.concatenate([negative_prompt_embeds, prompt_embeds])
            if txt_t5 is not None:
                txt_t5 = jnp.concatenate(
                    [negative_prompt_embeds_t5, prompt_embeds_t5])
        rope = build_rope(cfg, height, width, shape[2],
                          vae_scale=self.vae_cfg.spatial_compression)
        denoise = self._denoise_fn(
            num_inference_steps, float(guidance_scale),
            float(guidance_rescale), txt_t5 is not None, t_start,
            teacache_threshold,
            clip_apply_ratio=(float(clip_apply_ratio)
                              if clip_encoder_hidden_states is not None
                              else None),
            scan_chunk=scan_chunk, cfg_split=cfg_split,
            cfg_skip_ratio=cfg_skip_ratio)
        latents = denoise(self.transformer_params, latents, txt, txt_t5, rope,
                          cond, rng=jax.random.fold_in(rng, 0x5A))
        if output_type == "latent":
            return latents
        return self.decode_latents(latents,
                                   as_numpy=(output_type != "device"))
