"""Image degradation augmentation for VAE training.

Parity target: vae/ldm/modules/image_degradation/bsrgan_light.py -- the VAE
trainer's SR-style corruption pipeline. Compact cv2/numpy port of the core
degradations applied in random order with random strengths:
  gaussian/iso blur, bicubic/bilinear down-up resampling, gaussian noise,
  JPEG compression. Operates on (H, W, 3) float images in [0, 1].
"""
from typing import Optional

import numpy as np


def _blur(img, rng):
    import cv2

    k = int(rng.choice([3, 5, 7]))
    sigma = float(rng.uniform(0.2, 2.0))
    return cv2.GaussianBlur(img, (k, k), sigma)


def _resize_cycle(img, rng):
    import cv2

    h, w = img.shape[:2]
    scale = float(rng.uniform(0.5, 1.0))
    interp = int(rng.choice([cv2.INTER_LINEAR, cv2.INTER_CUBIC,
                             cv2.INTER_AREA]))
    small = cv2.resize(img, (max(int(w * scale), 8), max(int(h * scale), 8)),
                       interpolation=interp)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)


def _gaussian_noise(img, rng):
    sigma = float(rng.uniform(1, 12)) / 255.0
    return img + rng.normal(0, sigma, img.shape).astype(np.float32)


def _jpeg(img, rng):
    import cv2

    q = int(rng.integers(40, 96))
    ok, enc = cv2.imencode(".jpg", (np.clip(img, 0, 1) * 255).astype(np.uint8),
                           [cv2.IMWRITE_JPEG_QUALITY, q])
    return cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32) / 255.0


def degradation_pipeline(img: np.ndarray,
                         rng: Optional[np.random.Generator] = None,
                         num_ops: int = 3) -> np.ndarray:
    """Random subset of degradations in random order (bsrgan_light
    behavior); input/output (H, W, 3) float32 in [0, 1]."""
    if rng is None:
        rng = np.random.default_rng()
    img = np.asarray(img, np.float32)
    ops = [_blur, _resize_cycle, _gaussian_noise, _jpeg]
    order = rng.permutation(len(ops))[:num_ops]
    for i in order:
        img = ops[int(i)](img, rng)
    return np.clip(img, 0.0, 1.0).astype(np.float32)
