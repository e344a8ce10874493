"""BSRGAN-style image degradation for VAE (SR-augmented) training.

Parity targets: vae/ldm/modules/image_degradation/bsrgan.py (full variant,
2,3k LoC incl. utils_image) and bsrgan_light.py (weaker blur/noise) — the
VAE trainer's corruption pipeline ("Designing a Practical Degradation Model
for Deep Blind Image Super-Resolution"). Re-derived compactly on
numpy/cv2/scipy with an explicit np.random.Generator everywhere (the
reference mixes the global `random` and `np.random` states):

  blur        iso fspecial-gaussian + rotated anisotropic kernels, widths
              scaled by the SR factor; light variant divides widths by 4
              (bsrgan.py:325-337 / bsrgan_light.py:329-341)
  resize      up (p=.2) / keep (p=.1) / down (p=.7) with random interp
              (bsrgan.py:339-350)
  downsample  either direct resize by 1/sf or the shifted-gaussian-kernel +
              nearest-stride path (bsrgan.py:480-495, shift_pixel :99-127)
  noise       gaussian in 3 modes — per-channel, grayscale, and correlated
              channel covariance L²·UᵀDU (bsrgan.py:369-384); speckle
              (:386-402); poisson shot noise, color or luma-only (:404-416)
  jpeg        quality U[30, 95] (:418-425)
  sharpening  unsharp mask with soft residual threshold (:299-323)
  sensor      optional procedural camera-ISP noise: inverse-sRGB to linear,
              heteroscedastic shot+read noise, re-gamma — an executable
              default for the reference's isp_model hook (bsrgan.py:521-524,
              applied with p=.25 when a model is provided; theirs needs an
              external pretrained ISP net)

Pipelines:
  degradation_bsrgan(img, rng, sf)          paired (lq, hq) SR sample: mod
      crop, optional pre-halving for sf=4, the 7-op shuffled order with
      downsample2-before-downsample3 kept, final JPEG, paired random crop
      (bsrgan.py:438-528)
  degradation_bsrgan_variant(img, rng)      full-image corruption at output
      size (bsrgan.py:530-615) — what the VAE trainer consumes
  degradation_pipeline(img, rng)            the old light 3-op chain (kept
      for existing callers/tests)

All ops take/return (H, W, 3) float32 in [0, 1].
"""
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def isotropic_gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """fspecial('gaussian') (bsrgan.py:187-199)."""
    center = ksize / 2.0 - 0.5
    ys, xs = np.mgrid[0:ksize, 0:ksize]
    k = np.exp(-((ys - center) ** 2 + (xs - center) ** 2)
               / (2.0 * max(sigma, 1e-6) ** 2))
    return (k / k.sum()).astype(np.float32)


def anisotropic_gaussian_kernel(ksize: int, theta: float, l1: float,
                                l2: float) -> np.ndarray:
    """Rotated anisotropic Gaussian blur kernel (bsrgan.py:65-97)."""
    v = np.array([np.cos(theta), np.sin(theta)])
    V = np.array([[v[0], v[1]], [v[1], -v[0]]])
    D = np.diag([max(l1, 1e-6), max(l2, 1e-6)])
    cov = V @ D @ V.T
    center = ksize / 2.0 - 0.5
    ys, xs = np.mgrid[0:ksize, 0:ksize]
    pos = np.stack([ys - center, xs - center], axis=-1)
    inv = np.linalg.inv(cov)
    k = np.exp(-0.5 * np.einsum("...i,ij,...j->...", pos, inv, pos))
    return (k / k.sum()).astype(np.float32)


def shift_kernel(k: np.ndarray, sf: int) -> np.ndarray:
    """Sub-pixel shift by 0.5*(sf-1) so a strided downsample stays grid-
    aligned (bsrgan.py shift_pixel:99-127), then renormalize."""
    from scipy.ndimage import shift as nd_shift

    s = 0.5 * (sf - 1)
    k = nd_shift(k, (-s, -s), order=1, mode="nearest")
    return (k / max(k.sum(), 1e-12)).astype(np.float32)


def _conv(img: np.ndarray, k: np.ndarray) -> np.ndarray:
    from scipy.ndimage import convolve

    return convolve(img, k[:, :, None], mode="mirror")


# ---------------------------------------------------------------------------
# single degradations
# ---------------------------------------------------------------------------


def add_blur(img: np.ndarray, rng: np.random.Generator, sf: int = 4,
             light: bool = False) -> np.ndarray:
    """Iso (p=.5) or anisotropic gaussian blur with sf-scaled widths; the
    light variant quarters the widths and shrinks the kernel support
    (bsrgan.py:325-337 vs bsrgan_light.py:329-341)."""
    wd2 = 4.0 + sf
    wd = 2.0 + 0.2 * sf
    if light:
        wd2, wd = wd2 / 4.0, wd / 4.0
    if rng.random() < 0.5:
        ksize = (int(rng.integers(2, 12)) + 3 if light
                 else 2 * int(rng.integers(2, 12)) + 3)
        k = anisotropic_gaussian_kernel(
            ksize, float(rng.uniform(0, np.pi)),
            wd2 * float(rng.random()) + 1e-3,
            wd2 * float(rng.random()) + 1e-3)
    else:
        ksize = (int(rng.integers(2, 5)) + 3 if light
                 else 2 * int(rng.integers(2, 12)) + 3)
        k = isotropic_gaussian_kernel(ksize, wd * float(rng.random()) + 1e-3)
    return _conv(img, k)


_INTERPS = (1, 2, 3)  # cv2 LINEAR / CUBIC / AREA, as the reference draws


def add_resize(img: np.ndarray, rng: np.random.Generator,
               sf: int = 4) -> np.ndarray:
    """Up (p=.2) / keep (p=.1) / down-to-[0.5/sf, 1] (p=.7) resize at the
    current size, random interpolation (bsrgan.py:339-350)."""
    import cv2

    r = rng.random()
    if r > 0.8:
        s = float(rng.uniform(1.0, 2.0))
    elif r < 0.7:
        s = float(rng.uniform(0.5 / sf, 1.0))
    else:
        s = 1.0
    h, w = img.shape[:2]
    img = cv2.resize(img, (max(int(s * w), 1), max(int(s * h), 1)),
                     interpolation=int(rng.choice(_INTERPS)))
    return np.clip(img, 0.0, 1.0)


def add_gaussian_noise(img: np.ndarray, rng: np.random.Generator,
                       noise_level1: int = 2,
                       noise_level2: int = 25) -> np.ndarray:
    """Three-mode gaussian noise: per-channel color (p=.4), grayscale
    (p=.4), or channel-correlated with covariance |L²·UᵀDU| (p=.2)
    (bsrgan.py:369-384)."""
    level = int(rng.integers(noise_level1, noise_level2 + 1))
    r = rng.random()
    if r > 0.6:
        img = img + rng.normal(0, level / 255.0, img.shape).astype(np.float32)
    elif r < 0.4:
        img = img + rng.normal(0, level / 255.0,
                               (*img.shape[:2], 1)).astype(np.float32)
    else:
        L = noise_level2 / 255.0
        D = np.diag(rng.random(3))
        # orthonormal basis of a random matrix (scipy orth equivalent)
        U, _ = np.linalg.qr(rng.random((3, 3)))
        cov = np.abs(L ** 2 * (U.T @ D @ U))
        img = img + rng.multivariate_normal(
            np.zeros(3), cov, img.shape[:2]).astype(np.float32)
    return np.clip(img, 0.0, 1.0)


def add_speckle_noise(img: np.ndarray, rng: np.random.Generator,
                      noise_level1: int = 2,
                      noise_level2: int = 25) -> np.ndarray:
    """Multiplicative (image-scaled) version of the same three modes
    (bsrgan.py:386-402)."""
    level = int(rng.integers(noise_level1, noise_level2 + 1))
    img = np.clip(img, 0.0, 1.0)
    r = rng.random()
    if r > 0.6:
        n = rng.normal(0, level / 255.0, img.shape)
    elif r < 0.4:
        n = rng.normal(0, level / 255.0, (*img.shape[:2], 1))
    else:
        L = noise_level2 / 255.0
        D = np.diag(rng.random(3))
        U, _ = np.linalg.qr(rng.random((3, 3)))
        cov = np.abs(L ** 2 * (U.T @ D @ U))
        n = rng.multivariate_normal(np.zeros(3), cov, img.shape[:2])
    return np.clip(img + img * n.astype(np.float32), 0.0, 1.0)


def add_poisson_noise(img: np.ndarray,
                      rng: np.random.Generator) -> np.ndarray:
    """Photon shot noise at 10^U[2,4] photons/unit; full-color (p=.5) or
    luma-only (bsrgan.py:404-416)."""
    img = np.clip((img * 255.0).round(), 0, 255) / 255.0
    vals = 10 ** (2 * float(rng.random()) + 2.0)
    if rng.random() < 0.5:
        img = rng.poisson(img * vals).astype(np.float32) / vals
    else:
        gray = img[..., :3] @ np.array([0.299, 0.587, 0.114])
        gray = np.clip((gray * 255.0).round(), 0, 255) / 255.0
        img = img + (rng.poisson(gray * vals).astype(np.float32) / vals
                     - gray)[..., None]
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def add_jpeg_noise(img: np.ndarray, rng: np.random.Generator,
                   qmin: int = 30, qmax: int = 95) -> np.ndarray:
    """JPEG round trip at quality U[qmin, qmax] (bsrgan.py:418-425)."""
    import cv2

    q = int(rng.integers(qmin, qmax + 1))
    ok, enc = cv2.imencode(
        ".jpg",
        cv2.cvtColor((np.clip(img, 0, 1) * 255).round().astype(np.uint8),
                     cv2.COLOR_RGB2BGR),
        [int(cv2.IMWRITE_JPEG_QUALITY), q])
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    return cv2.cvtColor(dec, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0


def add_sharpening(img: np.ndarray, rng: np.random.Generator,
                   weight: float = 0.5, radius: int = 50,
                   threshold: int = 10) -> np.ndarray:
    """Unsharp mask with a soft threshold on the residual
    (bsrgan.py:299-323)."""
    import cv2

    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float32)
    soft = cv2.GaussianBlur(mask, (radius, radius), 0)
    return np.clip(img + weight * residual * soft, 0.0, 1.0)


def camera_sensor_noise(img: np.ndarray,
                        rng: np.random.Generator) -> np.ndarray:
    """Procedural camera-ISP noise: linearize (inverse sRGB), apply
    heteroscedastic shot + read noise in the linear domain, re-apply the
    transfer curve. An in-repo executable default for the reference's
    pretrained-ISP hook (bsrgan.py:521-524, isp_model)."""
    x = np.clip(img, 0.0, 1.0)
    lin = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    shot = float(rng.uniform(1e-4, 1.5e-3))   # variance ∝ signal
    read = float(rng.uniform(1e-5, 3e-4))     # constant floor
    var = np.maximum(lin * shot + read, 0.0)
    lin = lin + rng.normal(0.0, 1.0, lin.shape) * np.sqrt(var)
    lin = np.clip(lin, 0.0, 1.0)
    out = np.where(lin <= 0.0031308, lin * 12.92,
                   1.055 * lin ** (1 / 2.4) - 0.055)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# pipelines
# ---------------------------------------------------------------------------


def _downsample2(img, rng, sf):
    """Random-scale resize (p=.75) or shifted-gaussian blur + nearest
    stride (bsrgan.py:480-495)."""
    import cv2

    if rng.random() < 0.75:
        s = float(rng.uniform(1.0, 2.0 * sf))
        img = cv2.resize(img, (max(int(img.shape[1] / s), 1),
                               max(int(img.shape[0] / s), 1)),
                         interpolation=int(rng.choice(_INTERPS)))
    else:
        k = isotropic_gaussian_kernel(25, float(rng.uniform(0.1, 0.6 * sf)))
        img = _conv(img, shift_kernel(k, sf))
        img = img[0::sf, 0::sf, ...]
    return np.clip(img, 0.0, 1.0)


def _shuffled_order(rng) -> list:
    """Permutation of the 7 op slots with downsample2 kept before
    downsample3 (bsrgan.py:476-479)."""
    order = list(rng.permutation(7))
    i2, i3 = order.index(2), order.index(3)
    if i2 > i3:
        order[i2], order[i3] = order[i3], order[i2]
    return order


def degradation_bsrgan(img: np.ndarray,
                       rng: Optional[np.random.Generator] = None,
                       sf: int = 4, lq_patchsize: int = 72,
                       light: bool = False,
                       isp_model=None) -> Tuple[np.ndarray, np.ndarray]:
    """Full paired SR degradation (bsrgan.py:438-528): returns
    (lq [p, p, 3], hq [p*sf, p*sf, 3]).

    isp_model: None (off), "procedural" (camera_sensor_noise above), or a
    callable (lq, hq) -> (lq, hq)."""
    if rng is None:
        rng = np.random.default_rng()
    img = np.asarray(img, np.float32)
    isp_prob, jpeg_prob, scale2_prob = 0.25, 0.9, 0.25
    sf_ori = sf
    h1, w1 = img.shape[:2]
    img = img[:h1 - h1 % sf, :w1 - w1 % sf]
    h, w = img.shape[:2]
    if h < lq_patchsize * sf or w < lq_patchsize * sf:
        raise ValueError(
            f"img {h}x{w} too small for lq_patchsize={lq_patchsize} sf={sf}")
    hq = img.copy()

    if sf == 4 and rng.random() < scale2_prob:  # pre-halve, degrade at sf=2
        import cv2

        img = np.clip(cv2.resize(
            img, (img.shape[1] // 2, img.shape[0] // 2),
            interpolation=int(rng.choice(_INTERPS))), 0.0, 1.0)
        sf = 2

    a, b = img.shape[1], img.shape[0]
    for i in _shuffled_order(rng):
        if i in (0, 1):
            img = add_blur(img, rng, sf=sf, light=light)
        elif i == 2:
            a, b = img.shape[1], img.shape[0]
            img = _downsample2(img, rng, sf)
        elif i == 3:
            import cv2

            img = np.clip(cv2.resize(
                img, (max(int(a / sf), 1), max(int(b / sf), 1)),
                interpolation=int(rng.choice(_INTERPS))), 0.0, 1.0)
        elif i == 4:
            img = add_gaussian_noise(
                img, rng, 2, 8 if light else 25)
        elif i == 5:
            if rng.random() < jpeg_prob:
                img = add_jpeg_noise(img, rng)
        elif i == 6:
            if isp_model is not None and rng.random() < isp_prob:
                if isp_model == "procedural":
                    img = camera_sensor_noise(img, rng)
                else:
                    img, hq = isp_model(img.copy(), hq)
    img = add_jpeg_noise(img, rng)

    # paired random crop (bsrgan.py random_crop:427-436)
    lh, lw = img.shape[:2]
    # guard: heavy random resizes can undershoot the patch size
    if lh < lq_patchsize or lw < lq_patchsize:
        import cv2

        img = cv2.resize(img, (max(lw, lq_patchsize), max(lh, lq_patchsize)),
                         interpolation=3)
        lh, lw = img.shape[:2]
    y = int(rng.integers(0, lh - lq_patchsize + 1))
    x = int(rng.integers(0, lw - lq_patchsize + 1))
    lq = img[y:y + lq_patchsize, x:x + lq_patchsize]
    yh, xh = y * sf_ori, x * sf_ori
    hq = hq[yh:yh + lq_patchsize * sf_ori, xh:xh + lq_patchsize * sf_ori]
    return lq.astype(np.float32), hq.astype(np.float32)


def degradation_bsrgan_variant(img: np.ndarray,
                               rng: Optional[np.random.Generator] = None,
                               sf: int = 4, light: bool = False,
                               isp_model=None) -> np.ndarray:
    """Full-image corruption at the INPUT size (bsrgan.py:530-615 but
    resized back up, which is what a same-size VAE reconstruction target
    needs): the same shuffled 7-slot order, downsamples included, then a
    final JPEG and a bicubic resize back to (H, W)."""
    import cv2

    if rng is None:
        rng = np.random.default_rng()
    img = np.asarray(img, np.float32)
    h0, w0 = img.shape[:2]
    for i in _shuffled_order(rng):
        if i in (0, 1):
            img = add_blur(img, rng, sf=sf, light=light)
        elif i == 2:
            img = _downsample2(img, rng, sf)
        elif i == 3:
            img = np.clip(cv2.resize(
                img, (max(img.shape[1] // sf, 1),
                      max(img.shape[0] // sf, 1)),
                interpolation=int(rng.choice(_INTERPS))), 0.0, 1.0)
        elif i == 4:
            img = add_gaussian_noise(img, rng, 2, 8 if light else 25)
        elif i == 5:
            if rng.random() < 0.9:
                img = add_jpeg_noise(img, rng)
        elif i == 6:
            if isp_model == "procedural" and rng.random() < 0.25:
                img = camera_sensor_noise(img, rng)
    img = add_jpeg_noise(img, rng)
    img = cv2.resize(img, (w0, h0), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def degradation_pipeline(img: np.ndarray,
                         rng: Optional[np.random.Generator] = None,
                         num_ops: int = 3) -> np.ndarray:
    """Light random chain (subset, random order) — the quick default for
    VAE training augmentation; degradation_bsrgan* above are the full
    reference pipelines."""
    if rng is None:
        rng = np.random.default_rng()
    img = np.asarray(img, np.float32)

    ops = [lambda x, r: add_blur(x, r, light=True),
           lambda x, r: _updown_cycle(x, r),
           lambda x, r: add_gaussian_noise(x, r, 1, 12),
           lambda x, r: add_jpeg_noise(x, r, 40, 95)]
    for i in rng.permutation(len(ops))[:num_ops]:
        img = ops[int(i)](img, rng)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def _updown_cycle(img, rng):
    import cv2

    h, w = img.shape[:2]
    s = float(rng.uniform(0.5, 1.0))
    small = cv2.resize(img, (max(int(w * s), 8), max(int(h * s), 8)),
                       interpolation=int(rng.choice(_INTERPS)))
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
