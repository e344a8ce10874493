from .cutscene import detect_cutscenes, split_video
from .filters import (
    compute_motion_score,
    compute_semantic_consistency,
    compute_text_score,
)
from .pipeline import run_preprocessing
from .videoclip_xl import (
    SimpleBPETokenizer,
    VideoCLIPXL,
    convert_videoclip_xl_state_dict,
    videoclip_xl_score_fn,
)

__all__ = [
    "compute_motion_score",
    "compute_semantic_consistency",
    "compute_text_score",
    "detect_cutscenes",
    "run_preprocessing",
    "split_video",
    "SimpleBPETokenizer",
    "VideoCLIPXL",
    "convert_videoclip_xl_state_dict",
    "videoclip_xl_score_fn",
]
