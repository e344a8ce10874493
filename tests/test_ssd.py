"""Mamba2 SSD: associative scan vs sequential recurrence; V4 hybrid wiring."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from easyanimate_tpu.ops.ssd import Mamba2Block, Mamba2Config, _ssd_scan


def test_ssd_scan_matches_sequential(rng):
    b, l, h, p, n = 2, 7, 3, 4, 5
    x = jnp.asarray(rng.standard_normal((b, l, h, p)).astype(np.float32))
    dt = jnp.asarray(rng.random((b, l, h)).astype(np.float32))
    A = -jnp.asarray(rng.random((h,)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((b, l, 1, n)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((b, l, 1, n)).astype(np.float32))
    D = jnp.asarray(rng.standard_normal((h,)).astype(np.float32))
    got = np.asarray(_ssd_scan(x, dt, A, B, C, D))

    want = np.zeros((b, l, h, p), np.float32)
    for bi in range(b):
        hstate = np.zeros((h, p, n), np.float32)
        for t in range(l):
            a = np.exp(np.asarray(dt)[bi, t] * np.asarray(A))  # (h,)
            upd = (np.asarray(dt)[bi, t][:, None, None]
                   * np.asarray(x)[bi, t][:, :, None]
                   * np.asarray(B)[bi, t, 0][None, None, :])
            hstate = a[:, None, None] * hstate + upd
            want[bi, t] = (hstate @ np.asarray(C)[bi, t, 0]
                           + np.asarray(D)[:, None] * np.asarray(x)[bi, t])
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_mamba2_block_runs(rng):
    cfg = Mamba2Config(d_model=16, d_state=4, d_conv=4, expand=2, headdim=8)
    m = Mamba2Block(cfg)
    x = jnp.asarray(rng.standard_normal((1, 6, 16)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (1, 6, 16)
    assert np.isfinite(np.asarray(y)).all()
    # causality: perturbing the last token leaves earlier outputs unchanged
    x2 = x.at[:, -1].add(1.0)
    y2 = m.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y)[:, :-1], np.asarray(y2)[:, :-1],
                               atol=1e-5)


def test_hunyuan_hybrid_mamba_branch(rng):
    from easyanimate_tpu.models.hunyuan import (
        HunyuanConfig,
        HunyuanTransformer3D,
    )

    cfg = HunyuanConfig(
        num_attention_heads=2, attention_head_dim=16, in_channels=4,
        learn_sigma=False, out_channels=4, num_layers=2,
        cross_attention_dim=32, cross_attention_dim_t5=48,
        pooled_projection_dim=32, text_len=6, text_len_t5=5,
        basic_block_type="hybrid_attention", mamba_d_model=32,
        dtype="float32")
    model = HunyuanTransformer3D(cfg)
    lat = jnp.asarray(rng.standard_normal((1, 4, 4, 8, 8)).astype(np.float32))
    bert = jnp.zeros((1, 6, 32))
    t5 = jnp.zeros((1, 5, 48))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), bert,
                        None, t5)
    out = model.apply(params, lat, jnp.array([1.0]), bert, None, t5)
    assert out.shape == (1, 4, 4, 8, 8)
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
    assert "block1/mamba_block_1/A_log" in flat
    # zero-init out linear -> identical to the mamba-free forward at init
    cfg_off = dataclasses.replace(cfg, enable_mamba=False)
    out_off = HunyuanTransformer3D(cfg_off).apply(
        params, lat, jnp.array([1.0]), bert, None, t5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_off),
                               atol=1e-5)
