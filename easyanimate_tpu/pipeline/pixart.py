"""PixArt-alpha text-to-image pipeline over the Magvit VAE.

Parity target: pipeline_pixart_magvit.py:214-980 (PixArtAlphaMagvitPipeline)
— the V1 image-pretrain path: a PixArt Transformer2D (transformer2d.py:55,
here Transformer2D in transformer3d_legacy.py) denoises single-frame latents
that the video VAE decodes. Everything reuses the video pipeline with
video_length=1; the output squeezes the frame axis.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np

from .t2v import EasyAnimatePipeline


@dataclasses.dataclass(eq=False)
class PixArtMagvitPipeline(EasyAnimatePipeline):
    """T2I generation; returns (B, C, H, W) images in [0, 1]."""

    def __call__(self, prompt_embeds, negative_prompt_embeds=None, *,
                 height: int = 512, width: int = 512, **kw):
        kw.pop("video_length", None)
        out = super().__call__(prompt_embeds, negative_prompt_embeds,
                               height=height, width=width, video_length=1,
                               **kw)
        if kw.get("output_type") == "latent" or not kw.get("decode", True):
            return out
        return np.asarray(out)[:, :, 0]
