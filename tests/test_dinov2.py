"""Torch-golden test for the flax DINOv2 vision tower (dinov2.py).

Builds a random-weight HF Dinov2Model (transformers is in the image; no
downloads) and pins the flax forward + converter against it, at the native
grid and at an interpolated (larger) grid.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from easyanimate_tpu.video_caption.dinov2 import (  # noqa: E402
    Dinov2Config, Dinov2Vision, convert_dinov2_state_dict, preprocess_frames)


def _build_pair(seed=0):
    from transformers import Dinov2Config as HFCfg, Dinov2Model

    torch.manual_seed(seed)
    hcfg = HFCfg(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                 mlp_ratio=4, patch_size=14, image_size=28,
                 num_channels=3)
    hf = Dinov2Model(hcfg).eval()
    # non-degenerate layerscale / pos tables
    with torch.no_grad():
        for p in hf.parameters():
            if p.ndim >= 1:
                p.add_(0.02 * torch.randn_like(p))
    cfg = Dinov2Config(hidden_size=32, num_layers=2, num_heads=2,
                       mlp_ratio=4, patch_size=14, image_size=28)
    params = convert_dinov2_state_dict(hf.state_dict(), cfg)
    return hf, Dinov2Vision(cfg), params


@pytest.mark.parametrize("hw", [(28, 28), (56, 42)])
def test_dinov2_matches_torch_golden(rng, hw):
    hf, model, params = _build_pair()
    h, w = hw
    px = rng.standard_normal((2, 3, h, w)).astype(np.float32)
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(px),
                  interpolate_pos_encoding=(hw != (28, 28))
                  ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params},
                                 jnp.asarray(px.transpose(0, 2, 3, 1))))
    # native grid is exact math; the interpolated grid goes through two
    # different bicubic implementations (torch F.interpolate vs
    # jax.image.resize), so only the pooled feature direction is pinned
    if hw == (28, 28):
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    else:
        a, b = got.mean(1), want.mean(1)
        cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1)
                                 * np.linalg.norm(b, axis=-1))
        assert (cos > 0.995).all(), cos


def test_dinov2_semantic_consistency_backend(rng, tmp_path):
    """filters.semantic_embed_fn(model='dinov2') end to end on a tiny
    synthetic clip: a static video scores ~1, a noise video scores lower."""
    import cv2

    from easyanimate_tpu.video_caption.dinov2 import dinov2_image_embed_fn
    from easyanimate_tpu.video_caption.filters import (
        compute_semantic_consistency)

    _, model, params = _build_pair()
    embed = dinov2_image_embed_fn(params=params, cfg=model.cfg)

    def write(path, frames):
        vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             8, (64, 64))
        for f in frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()

    static = [np.full((64, 64, 3), 128, np.uint8)] * 8
    noise = [rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
             for _ in range(8)]
    write(tmp_path / "static.mp4", static)
    write(tmp_path / "noise.mp4", noise)
    s_static = compute_semantic_consistency(str(tmp_path / "static.mp4"),
                                            embed, num_keyframes=4)
    s_noise = compute_semantic_consistency(str(tmp_path / "noise.mp4"),
                                           embed, num_keyframes=4)
    assert s_static > 0.999
    assert s_noise < s_static


def test_preprocess_frames_shape(rng):
    f = rng.integers(0, 255, (120, 200, 3)).astype(np.uint8)
    out = preprocess_frames([f], size=56, resize_to=64)
    assert out.shape == (1, 56, 56, 3)
    assert out.dtype == np.float32
