from .cutscene import detect_cutscenes, split_video
from .filters import (
    compute_motion_score,
    compute_semantic_consistency,
    compute_text_score,
)
from .pipeline import run_preprocessing

__all__ = [
    "compute_motion_score",
    "compute_semantic_consistency",
    "compute_text_score",
    "detect_cutscenes",
    "run_preprocessing",
    "split_video",
]
