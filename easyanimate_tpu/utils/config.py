"""YAML model-config system.

Parity target: the reference's OmegaConf yamls (config/*.yaml) with
transformer_additional_kwargs / vae_kwargs / text_encoder_kwargs consumed at
train.py:944-1036 and predict_*.py:91-141, plus the model registry
(models/__init__.py:6-15). omegaconf isn't in this image; plain yaml covers
the same files.
"""
import dataclasses
from typing import Any, Dict

import yaml

from ..models.hunyuan import HunyuanConfig, HunyuanTransformer3D
from ..models.mmdit import EasyAnimateTransformer3D, MMDiTConfig
from ..models.transformer3d_legacy import (
    MotionModuleConfig,
    Transformer3D,
    Transformer3DConfig,
)
from ..models.vae import (
    AutoencoderKL,
    AutoencoderKLCogVideoX,
    AutoencoderKLMagvit,
    KL2DConfig,
)

# reference registry parity (models/__init__.py:6-15)
name_to_transformer3d = {
    "Transformer3DModel": Transformer3D,
    "HunyuanTransformer3DModel": HunyuanTransformer3D,
    "EasyAnimateTransformer3DModel": EasyAnimateTransformer3D,
}
name_to_autoencoder_magvit = {
    "AutoencoderKL": AutoencoderKL,
    "AutoencoderKLMagvit": AutoencoderKLMagvit,
    "AutoencoderKLCogVideoX": AutoencoderKLCogVideoX,
}


def load_yaml_config(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def _filter_fields(cls, kw: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kw.items() if k in names}


def build_transformer(config: Dict[str, Any], dtype: str = "bfloat16",
                      **overrides):
    """transformer_additional_kwargs (+ checkpoint config.json fields) ->
    (module, config dataclass)."""
    kw = dict(config.get("transformer_additional_kwargs", config))
    kw.update(overrides)
    t_type = kw.pop("transformer_type", "EasyAnimateTransformer3DModel")
    if t_type == "EasyAnimateTransformer3DModel":
        cfg = MMDiTConfig(dtype=dtype, **_filter_fields(MMDiTConfig, kw))
        return EasyAnimateTransformer3D(cfg), cfg
    if t_type == "HunyuanTransformer3DModel":
        cfg = HunyuanConfig(dtype=dtype, **_filter_fields(HunyuanConfig, kw))
        return HunyuanTransformer3D(cfg), cfg
    if t_type == "Transformer3DModel":
        mm_fields = {}
        for side in ("even", "odd"):
            mk = kw.pop(f"motion_module_kwargs_{side}",
                        kw.get("motion_module_kwargs"))
            if mk:
                mm_fields[f"motion_module_{side}"] = MotionModuleConfig(
                    **_filter_fields(MotionModuleConfig, dict(
                        mk, grid=kw.get("motion_module_type") == "VanillaGrid")))
        kw.pop("motion_module_kwargs", None)
        # reference boolean flags -> patch_mode (transformer3d.py:203-208)
        if "patch_mode" not in kw:
            if kw.pop("casual_3d", False):
                kw["patch_mode"] = "casual_3d"
            elif kw.get("patch_3d", False) and kw.get("fake_3d", False):
                kw["patch_mode"] = "fake_3d"
            elif kw.get("patch_3d", False):
                kw["patch_mode"] = "3d"
        kw.pop("patch_3d", None)
        kw.pop("fake_3d", None)
        if kw.get("casual_3d_upsampler_index") is None:
            kw.pop("casual_3d_upsampler_index", None)
        else:
            kw["casual_3d_upsampler_index"] = tuple(
                kw["casual_3d_upsampler_index"])
        cfg = Transformer3DConfig(
            dtype=dtype, **mm_fields,
            **_filter_fields(Transformer3DConfig, kw))
        return Transformer3D(cfg), cfg
    raise ValueError(f"unknown transformer_type {t_type}")


def build_vae(config: Dict[str, Any], dtype: str = "float32", **overrides):
    """vae_kwargs -> (module, config dataclass). Accepts both this repo's
    `chunk_mode` and the reference's boolean flags (train.py:1006-1027)."""
    from ..models.vae import CogVideoXVAEConfig, MagvitVAEConfig

    kw = dict(config.get("vae_kwargs", config))
    kw.update(overrides)
    v_type = kw.pop("vae_type", "AutoencoderKLMagvit")
    if "chunk_mode" not in kw:
        for flag, mode in (("cache_mag_vae", "cache_mag"),
                           ("slice_mag_vae", "slice_mag"),
                           ("cache_compression_vae", "cache_compression"),
                           ("slice_compression_vae", "slice_compression")):
            if kw.pop(flag, False):
                kw["chunk_mode"] = mode
        for flag in ("cache_mag_vae", "slice_mag_vae",
                     "cache_compression_vae", "slice_compression_vae"):
            kw.pop(flag, None)
    if v_type == "AutoencoderKL":
        cfg = KL2DConfig(dtype=dtype, **_filter_fields(KL2DConfig, kw))
        return AutoencoderKL(cfg), cfg
    if v_type == "AutoencoderKLMagvit":
        cfg = MagvitVAEConfig(dtype=dtype,
                              **_filter_fields(MagvitVAEConfig, kw))
        return AutoencoderKLMagvit(cfg), cfg
    if v_type == "AutoencoderKLCogVideoX":
        cfg = CogVideoXVAEConfig(dtype=dtype,
                                 **_filter_fields(CogVideoXVAEConfig, kw))
        return AutoencoderKLCogVideoX(cfg), cfg
    raise ValueError(f"unknown vae_type {v_type}")
