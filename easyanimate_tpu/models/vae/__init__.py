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

from .magvit import smooth_output, vae_decode_tiled, vae_encode_tiled  # noqa: E402

__all__ += ["smooth_output", "vae_decode_tiled", "vae_encode_tiled"]

from .cogvideox import (  # noqa: E402
    AutoencoderKLCogVideoX,
    CogVideoXVAEConfig,
    cog_latent_frame_count,
)

__all__ += ["AutoencoderKLCogVideoX", "CogVideoXVAEConfig",
            "cog_latent_frame_count"]

from .kl2d import (  # noqa: E402
    AutoencoderKL,
    KL2DConfig,
    convert_kl2d_state_dict,
)

__all__ += ["AutoencoderKL", "KL2DConfig", "convert_kl2d_state_dict"]
