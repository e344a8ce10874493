"""Legacy V1-era datasets: WebVid10M (csv manifest) and CC15M (json image
manifest).

Parity target: data/dataset_video.py:80-155 (WebVid10M: csv columns
videoid/name/page_dir, stride-sampled clips, optional inpaint masks) and
data/dataset_image.py:12-88 (CC15M: file_path/text json). Both reuse the
same IO helpers as ImageVideoDataset (decord with cv2 fallback)."""
import csv
import dataclasses
import json
import os
import random
from typing import Optional, Tuple

import numpy as np

from .dataset import _read_image, _read_video, resize_center_crop
from .masks import get_random_mask


@dataclasses.dataclass
class WebVid10M:
    csv_path: str
    video_folder: str
    sample_size: int = 256
    sample_stride: int = 4
    sample_n_frames: int = 16
    enable_inpaint: bool = False
    is_image: bool = False
    seed: int = 0

    def __post_init__(self):
        with open(self.csv_path) as f:
            self.entries = list(csv.DictReader(f))
        self._rng = random.Random(self.seed)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx: int):
        for _ in range(8):
            try:
                return self._load(self.entries[idx], idx)
            except Exception:
                idx = self._rng.randrange(len(self))
        raise RuntimeError("failed to load a sample after 8 retries")

    def _load(self, e, idx):
        path = os.path.join(self.video_folder, f"{e['videoid']}.mp4")
        import cv2

        cap = cv2.VideoCapture(path)
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 1
        cap.release()
        if self.is_image:
            frame_idx = np.array([self._rng.randrange(total)])
        else:
            clip = min(total, (self.sample_n_frames - 1)
                       * self.sample_stride + 1)
            start = self._rng.randint(0, total - clip)
            frame_idx = np.linspace(start, start + clip - 1,
                                    self.sample_n_frames, dtype=int)
        frames = _read_video(path, frame_idx)
        frames = resize_center_crop(frames, self.sample_size,
                                    self.sample_size)
        pixel_values = frames.astype(np.float32) / 255.0 * 2.0 - 1.0
        pixel_values = np.transpose(pixel_values, (0, 3, 1, 2))  # (T,C,H,W)
        if self.is_image:
            pixel_values = pixel_values[0]
        sample = {"pixel_values": pixel_values, "text": e["name"]}
        if self.enable_inpaint and not self.is_image:
            t, c, h, w = pixel_values.shape
            mask = get_random_mask((t, 1, h, w),
                                   np.random.default_rng(idx))
            m = (mask.astype(np.float32) / 255.0)
            sample["mask"] = m
            sample["mask_pixel_values"] = pixel_values * (1 - m) - 1.0 * m
        return sample


@dataclasses.dataclass
class CC15M:
    json_path: str
    video_folder: Optional[str] = None
    resolution: int = 512
    seed: int = 0

    def __post_init__(self):
        with open(self.json_path) as f:
            self.entries = json.load(f)
        self._rng = random.Random(self.seed)

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, idx: int):
        for _ in range(8):
            try:
                return self._load(self.entries[idx])
            except Exception:
                idx = self._rng.randrange(len(self))
        raise RuntimeError("failed to load a sample after 8 retries")

    def _load(self, e):
        path = e["file_path"]
        if self.video_folder:
            path = os.path.join(self.video_folder, path)
        img = _read_image(path)[None]
        img = resize_center_crop(img, self.resolution, self.resolution)[0]
        pixel_values = img.astype(np.float32) / 255.0 * 2.0 - 1.0
        return {"pixel_values": np.transpose(pixel_values, (2, 0, 1)),
                "text": e["text"]}
