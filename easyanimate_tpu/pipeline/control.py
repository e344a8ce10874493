"""Control pipeline (canny / pose / depth / trajectory / camera control).

Parity target: EasyAnimateControlPipeline (pipeline_easyanimate_control.py):
  - control video -> VAE-encoded control_latents * scaling (:735-768)
  - camera control: per-pixel Plucker-embedding video (6ch) trilinearly
    resized to the latent grid (first frame special) and scaled x6 -- NOT
    VAE-encoded (:1063-1068)
  - optional reference image -> VAE latents placed in frame 0 of a zeros
    tensor, channel-concat onto control_latents (:1094-1125); zeros when the
    model expects the branch but no ref is given
  - transformer consumes the concat via control_latents kwarg
"""
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.vae import gaussian_mode, vae_encode
from .inpaint import resize_mask_to_latent
from .schedulers import init_noise_sigma
from .t2v import EasyAnimatePipeline, build_rope


@dataclasses.dataclass(eq=False)
class EasyAnimateControlPipeline(EasyAnimatePipeline):

    def __call__(
        self,
        prompt_embeds: jnp.ndarray,
        negative_prompt_embeds: Optional[jnp.ndarray] = None,
        *,
        control_video: Optional[jnp.ndarray] = None,         # (B,C,T,H,W) [0,1]
        control_camera_video: Optional[jnp.ndarray] = None,  # (B,6,T,H,W) Plucker
        ref_image: Optional[jnp.ndarray] = None,             # (B,C,1,H,W) [0,1]
        height: int = 384,
        width: int = 672,
        video_length: int = 49,
        num_inference_steps: int = 50,
        guidance_scale: float = 6.0,
        guidance_rescale: float = 0.0,
        rng: Optional[jax.Array] = None,
        output_type: str = "np",
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
        shape = self.latent_shape(b, video_length, height, width)
        scaling = self.vae_cfg.scaling_factor
        dt = cfg.jdtype
        do_cfg = guidance_scale > 1.0

        enc = lambda x: gaussian_mode(
            vae_encode(self.vae, self.vae_params, x.astype(self.vae_cfg.jdtype)),
            axis=1).astype(jnp.float32) * scaling

        if control_camera_video is not None:
            control_latents = resize_mask_to_latent(
                control_camera_video.astype(jnp.float32), shape,
                first_frame_special=True) * 6.0
        elif control_video is not None:
            control_latents = enc(2.0 * control_video - 1.0)
        else:
            control_latents = jnp.zeros(shape, jnp.float32)

        if ref_image is not None:
            ref_lat = enc(2.0 * ref_image - 1.0)
            ref_conv_in = jnp.zeros(shape, jnp.float32)
            if shape[2] != 1:
                ref_conv_in = ref_conv_in.at[:, :, :1].set(ref_lat)
            else:
                ref_conv_in = ref_lat
            control_latents = jnp.concatenate([control_latents, ref_conv_in],
                                              axis=1)
        elif cfg.add_ref_latent_in_control_model:
            control_latents = jnp.concatenate(
                [control_latents, jnp.zeros(shape, jnp.float32)], axis=1)

        control_latents = control_latents.astype(dt)
        if do_cfg:
            control_latents = jnp.concatenate([control_latents, control_latents])
        cond = {"control_latents": control_latents}

        latents = (jax.random.normal(rng, shape, jnp.float32)
                   * init_noise_sigma(self.scheduler, num_inference_steps)
                   ).astype(dt)
        txt = prompt_embeds
        if do_cfg:
            txt = jnp.concatenate([negative_prompt_embeds, prompt_embeds])
        rope = build_rope(cfg, height, width, shape[2],
                          vae_scale=self.vae_cfg.spatial_compression)
        denoise = self._denoise_fn(num_inference_steps, float(guidance_scale),
                                   float(guidance_rescale), False, 0,
                                   teacache_threshold,
                                   scan_chunk=scan_chunk,
                                   cfg_split=cfg_split,
                                   cfg_skip_ratio=cfg_skip_ratio)
        latents = denoise(self.transformer_params, latents, txt, None, rope,
                          cond, rng=jax.random.fold_in(rng, 0x5A))
        if output_type == "latent":
            return latents
        return self.decode_latents(latents)
