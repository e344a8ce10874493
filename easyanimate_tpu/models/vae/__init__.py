from .magvit import (
    AutoencoderKLMagvit,
    MagvitVAEConfig,
    gaussian_kl,
    gaussian_mode,
    gaussian_sample,
    latent_frame_count,
    vae_decode,
    vae_encode,
)

__all__ = [
    "AutoencoderKLMagvit",
    "MagvitVAEConfig",
    "gaussian_kl",
    "gaussian_mode",
    "gaussian_sample",
    "latent_frame_count",
    "vae_decode",
    "vae_encode",
]
