"""Native frame-op kernel tests: builds via g++, parity vs python paths."""
import numpy as np
import pytest

from easyanimate_tpu.data.native import (
    _build_and_load,
    resize_crop_normalize,
    to_chw_normalized,
)


def test_native_library_builds():
    lib = _build_and_load()
    assert lib is not None, "g++ build of native/frame_ops.cpp failed"


def test_to_chw_normalized_matches_numpy(rng):
    frames = (rng.random((3, 8, 6, 3)) * 255).astype(np.uint8)
    got = to_chw_normalized(frames)
    want = np.transpose(frames.astype(np.float32) * (2 / 255.0) - 1.0,
                        (3, 0, 1, 2))
    assert got.shape == (3, 3, 8, 6)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resize_crop_identity_when_same_size(rng):
    frames = (rng.random((2, 16, 16, 3)) * 255).astype(np.uint8)
    got = resize_crop_normalize(frames, 16, 16)
    want = np.transpose(frames.astype(np.float32) / 255.0, (3, 0, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_resize_crop_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")

    yy, xx = np.mgrid[:48, :64]
    img = np.stack([yy * 4, xx * 3, (yy + xx) * 2], -1).astype(np.uint8)
    frames = img[None]
    got = resize_crop_normalize(frames, 32, 32)
    # cv2 INTER_LINEAR = plain bilinear with half-pixel centers (same
    # semantics as the native kernel; PIL antialiases on downscale)
    scale = max(32 / 48, 32 / 64)
    nh, nw = round(48 * scale), round(64 * scale)
    a = cv2.resize(frames[0], (nw, nh), interpolation=cv2.INTER_LINEAR)
    a = a.astype(np.float32) / 255.0
    top, left = (nh - 32) // 2, (nw - 32) // 2
    want = a[top:top + 32, left:left + 32]
    diff = np.abs(got[:, 0].transpose(1, 2, 0) - want)
    assert diff.mean() < 0.01, diff.mean()
