from .norms import fp32_layer_norm, fp32_rms_norm
from .rope import (
    apply_rotary_emb,
    get_1d_rotary_pos_embed,
    get_2d_rotary_pos_embed,
    get_3d_rotary_pos_embed,
    get_resize_crop_region_for_grid,
)
from .attention import joint_attention, attention

__all__ = [
    "fp32_layer_norm",
    "fp32_rms_norm",
    "apply_rotary_emb",
    "get_1d_rotary_pos_embed",
    "get_2d_rotary_pos_embed",
    "get_3d_rotary_pos_embed",
    "get_resize_crop_region_for_grid",
    "joint_attention",
    "attention",
]
