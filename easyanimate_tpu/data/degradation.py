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


def anisotropic_gaussian_kernel(ksize: int, theta: float, l1: float,
                                l2: float) -> np.ndarray:
    """Rotated anisotropic Gaussian blur kernel
    (bsrgan_light.py:65-97 anisotropic_Gaussian)."""
    v = np.array([np.cos(theta), np.sin(theta)])
    V = np.array([[v[0], v[1]], [v[1], -v[0]]])
    D = np.diag([l1, l2])
    cov = V @ D @ V.T
    center = ksize / 2.0 - 0.5
    ys, xs = np.mgrid[0:ksize, 0:ksize]
    pos = np.stack([ys - center, xs - center], axis=-1)
    inv = np.linalg.inv(cov)
    k = np.exp(-0.5 * np.einsum("...i,ij,...j->...", pos, inv, pos))
    return (k / k.sum()).astype(np.float32)


def _aniso_blur(img, rng):
    import cv2

    k = anisotropic_gaussian_kernel(
        ksize=int(2 * rng.integers(2, 6) + 3),
        theta=float(rng.uniform(0, np.pi)),
        l1=float(rng.uniform(0.1, 3.0)), l2=float(rng.uniform(0.1, 3.0)))
    return cv2.filter2D(img, -1, k)


def _speckle_noise(img, rng):
    """bsrgan_light.py:390-406: noise scaled by the clean image."""
    sigma = float(rng.uniform(2, 12)) / 255.0
    noise = rng.normal(0, sigma, img.shape).astype(np.float32)
    return img + np.clip(img, 0.0, 1.0) * noise


def _poisson_noise(img, rng):
    """bsrgan_light.py:408-420: photon shot noise."""
    vals = 10 ** float(rng.uniform(2.0, 4.0))
    return rng.poisson(np.clip(img, 0, 1) * vals).astype(np.float32) / vals


def _sharpen(img, rng):
    """bsrgan_light.py:299-323 add_sharpening (unsharp mask with a soft
    threshold on the residual)."""
    import cv2

    radius, threshold, weight = 50, 10, float(rng.uniform(0.3, 0.7))
    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float32)
    soft = cv2.GaussianBlur(mask, (radius, radius), 0)
    return img + weight * residual * soft


def degradation_bsrgan_variant(img: np.ndarray,
                               rng: Optional[np.random.Generator] = None
                               ) -> np.ndarray:
    """Fuller bsrgan-style pipeline (bsrgan_light.py:534+): shuffled
    iso/aniso blur, down-up resampling, gaussian/speckle/poisson noise and a
    final JPEG, with occasional sharpening."""
    if rng is None:
        rng = np.random.default_rng()
    img = np.asarray(img, np.float32)
    if rng.random() < 0.25:
        img = _sharpen(img, rng)
    ops = [_blur, _aniso_blur, _resize_cycle, _gaussian_noise,
           _speckle_noise, _poisson_noise]
    for i in rng.permutation(len(ops)):
        if rng.random() < 0.7:
            img = np.clip(ops[int(i)](img, rng), 0.0, 1.0)
    return np.clip(_jpeg(img, rng), 0.0, 1.0).astype(np.float32)
