from .buckets import (
    ASPECT_RATIO_512,
    AspectRatioBatchSampler,
    ResumableRandomSampler,
    get_closest_ratio,
    make_aspect_buckets,
)
from .camera import plucker_embedding, plucker_from_file, read_pose_file
from .dataset import (
    ImageVideoDataset,
    resize_center_crop,
    video_length_for_resolution,
)
from .masks import get_random_mask

__all__ = [
    "ASPECT_RATIO_512",
    "AspectRatioBatchSampler",
    "ImageVideoDataset",
    "ResumableRandomSampler",
    "get_closest_ratio",
    "get_random_mask",
    "make_aspect_buckets",
    "plucker_embedding",
    "plucker_from_file",
    "read_pose_file",
    "resize_center_crop",
    "video_length_for_resolution",
]

from .dataset import ImageVideoControlDataset  # noqa: E402

__all__ += ["ImageVideoControlDataset"]

from .legacy_datasets import CC15M, WebVid10M  # noqa: E402

__all__ += ["CC15M", "WebVid10M"]

from .prefetch import DataLoader, default_collate, device_prefetch  # noqa: E402

__all__ += ["DataLoader", "default_collate", "device_prefetch"]
