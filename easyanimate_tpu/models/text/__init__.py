from .qwen2 import (
    Qwen2Config,
    Qwen2TextEncoder,
    TINY_QWEN,
    convert_qwen2_state_dict,
)

__all__ = [
    "Qwen2Config",
    "Qwen2TextEncoder",
    "TINY_QWEN",
    "convert_qwen2_state_dict",
]
