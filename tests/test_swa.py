"""SWA (sliding-window attention) kernel + composition tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyanimate_tpu.ops.swa import (
    _permute_tokens,
    sliding_window_attention,
    swa_joint_attention,
    swa_reference,
)


@pytest.mark.parametrize("s,window", [(256, 64), (384, 100), (200, 50)])
def test_sliding_window_kernel_matches_dense(rng, s, window):
    b, h, d = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, s, d)).astype(np.float32))
    got = sliding_window_attention(q, k, v, window=window, block_q=128,
                                   block_kv=128, interpret=True)
    want = swa_reference(q, k, v, window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_permute_tokens_roundtrip(rng):
    f, h, w = 3, 4, 5
    x = jnp.asarray(rng.standard_normal((1, 2, f * h * w, 8)).astype(np.float32))
    for order in [(0, 2, 1), (1, 0, 2), (2, 1, 0), (1, 2, 0)]:
        y = _permute_tokens(x, f, h, w, order)
        back = _permute_tokens(y, f, h, w, order, inverse=True)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_swa_joint_attention_shapes(rng):
    b, nh, d = 1, 6, 16
    f, hh, ww = 3, 4, 4
    text = 8
    s = text + f * hh * ww
    q = jnp.asarray(rng.standard_normal((b, nh, s, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, nh, s, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, nh, s, d)).astype(np.float32))
    out = swa_joint_attention(q, k, v, text_len=text, num_frames=f,
                              height=hh, width=ww, cross_attention_size=16,
                              impl="pallas_interpret")
    assert out.shape == (b, nh, s, d)
    assert np.isfinite(np.asarray(out)).all()


def test_mmdit_with_swa_layers(rng):
    import dataclasses
    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D

    cfg = dataclasses.replace(
        PRESETS["tiny"], num_layers=2, swa_layers=(1,),
        num_attention_heads=6, attention_head_dim=8)
    model = EasyAnimateTransformer3D(cfg)
    lat = jnp.zeros((1, 4, 3, 8, 8))
    txt = jnp.zeros((1, 5, cfg.text_embed_dim))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt, None)
    out = model.apply(params, jnp.asarray(
        rng.standard_normal(lat.shape).astype(np.float32)),
        jnp.array([3.0]), txt, None)
    assert out.shape == (1, 4, 3, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_segmented_scan_matches_loop(rng):
    """Heterogeneous stacks (SWA variant) compile as per-run nn.scan
    segments; outputs must equal the unscanned loop path on the same
    checkpoint (compile-time optimization only)."""
    import dataclasses

    import jax
    import numpy as np

    from easyanimate_tpu.models.convert import convert_mmdit_state_dict
    from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
    from easyanimate_tpu.pipeline.t2v import build_rope
    from tests.test_convert import _synth_mmdit_sd

    base = dataclasses.replace(PRESETS["tiny"], num_layers=4,
                               swa_layers=(1, 2, 3))
    assert base.segments() == [(True, False, 1), (True, True, 3)]
    sd = _synth_mmdit_sd(base, rng)

    lat = jnp.zeros((1, base.in_channels, 2, 16, 16))
    ts = jnp.array([500.0])
    txt = jnp.asarray(rng.standard_normal((1, 6, base.text_embed_dim)),
                      jnp.float32)
    rope = build_rope(base, 128, 128, 2)

    outs = {}
    for scan in (True, False):
        cfg = dataclasses.replace(base, scan_layers=scan)
        model = EasyAnimateTransformer3D(cfg)
        params = convert_mmdit_state_dict(sd, cfg)
        outs[scan] = np.asarray(model.apply(params, lat, ts, txt, rope))
    np.testing.assert_allclose(outs[True], outs[False], atol=2e-5, rtol=2e-5)

    # TeaCache's block-0 modulation reads the right segment params
    cfg = dataclasses.replace(base, scan_layers=True)
    model = EasyAnimateTransformer3D(cfg)
    params = convert_mmdit_state_dict(sd, cfg)
    vid = jnp.asarray(rng.standard_normal((1, 8, base.inner_dim)), jnp.float32)
    temb = jnp.asarray(rng.standard_normal((1, base.inner_dim)), jnp.float32)
    mod = model.apply(params, vid, None, temb, method="modulated_input")
    assert np.isfinite(np.asarray(mod)).all()
