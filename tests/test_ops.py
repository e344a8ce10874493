"""Golden tests for core ops against independent torch implementations.

The reference's modules can't be imported (diffusers not installed), so each
test re-derives the expected math with torch primitives (SDPA, layer_norm)
per the behaviors documented in SURVEY.md §2.1.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from easyanimate_tpu.ops import (
    apply_rotary_emb,
    attention,
    fp32_layer_norm,
    fp32_rms_norm,
    get_3d_rotary_pos_embed,
    get_resize_crop_region_for_grid,
)
from easyanimate_tpu.ops.attention import joint_attention


def test_fp32_layer_norm(rng):
    x = rng.standard_normal((4, 37, 96)).astype(np.float32)
    w = rng.standard_normal(96).astype(np.float32)
    b = rng.standard_normal(96).astype(np.float32)
    got = fp32_layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), eps=1e-5)
    want = F.layer_norm(torch.from_numpy(x), (96,), torch.from_numpy(w),
                        torch.from_numpy(b), eps=1e-5).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def test_fp32_rms_norm(rng):
    x = rng.standard_normal((2, 11, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    xt = torch.from_numpy(x)
    var = xt.pow(2).mean(-1, keepdim=True)
    want = (torch.from_numpy(w) * (xt * torch.rsqrt(var + 1e-6))).numpy()
    got = fp32_rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-5)


def _torch_sdpa(q, k, v):
    return F.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)
    ).numpy()


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_attention_matches_torch_sdpa(rng, impl):
    b, h, s, d = 2, 3, 256, 64
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl=impl)
    want = _torch_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


@pytest.mark.parametrize("impl", ["xla", "pallas_interpret"])
def test_attention_unaligned_seq_pads(rng, impl):
    """Sequence not a multiple of the block; kernel pads and masks the tail."""
    b, h, s, d = 1, 2, 200, 64
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    got = attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), impl=impl,
                    kv_valid=s)
    want = _torch_sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=2e-4)


def test_attention_xla_chunked_matches_dense(rng):
    """The memory-bounded off-TPU fallback (q-block lax.map + rematted
    bodies) is the same math as attention_xla: fwd and grads agree at a
    size forcing multiple blocks AND a padded tail, with kv_valid."""
    from easyanimate_tpu.ops.attention import (attention_xla,
                                               attention_xla_chunked)

    b, h, s, d = 1, 3, 300, 32
    q, k, v, co = (jnp.asarray(rng.standard_normal((b, h, s, d)),
                               jnp.float32) for _ in range(4))

    def run(fn, *a):
        return fn(*a, kv_valid=260)

    o_ref = run(attention_xla, q, k, v)
    o_chk = run(lambda *a, **kw: attention_xla_chunked(*a, block_q=64, **kw),
                q, k, v)
    np.testing.assert_allclose(np.asarray(o_chk), np.asarray(o_ref),
                               atol=1e-5, rtol=1e-5)

    def loss(fn, q, k, v):
        return jnp.sum(run(fn, q, k, v) * co)

    g_ref = jax.grad(lambda *a: loss(attention_xla, *a), (0, 1, 2))(q, k, v)
    g_chk = jax.grad(
        lambda *a: loss(lambda *b, **kw: attention_xla_chunked(
            *b, block_q=64, **kw), *a), (0, 1, 2))(q, k, v)
    for gr, gc in zip(g_ref, g_chk):
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4)


def test_attention_xla_routes_large_to_chunked(monkeypatch):
    """attention(impl='xla') switches to the chunked form above the score
    threshold (so the 53k-token off-TPU compile never materializes the
    [S, S] scores) and stays on the dense reference below it."""
    import importlib

    A = importlib.import_module("easyanimate_tpu.ops.attention")
    calls = []
    monkeypatch.setattr(
        A, "attention_xla_chunked",
        lambda *a, **kw: calls.append("chunked") or jnp.zeros_like(a[0]))
    monkeypatch.setattr(
        A, "attention_xla",
        lambda *a, **kw: calls.append("dense") or jnp.zeros_like(a[0]))
    small = jnp.zeros((1, 1, 128, 8))
    A.attention(small, small, small, impl="xla")
    monkeypatch.setattr(A, "_CHUNKED_XLA_SCORES", 100 * 128)
    A.attention(small, small, small, impl="xla")
    assert calls == ["dense", "chunked"]


def test_flash_attention_grads_match_xla(rng):
    b, h, s, d = 1, 2, 256, 64
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    co = rng.standard_normal((b, h, s, d)).astype(np.float32)

    def loss(impl, q, k, v):
        o = attention(q, k, v, impl=impl)
        return jnp.sum(o * jnp.asarray(co))

    args = tuple(map(jnp.asarray, (q, k, v)))
    g_xla = jax.grad(lambda *a: loss("xla", *a), argnums=(0, 1, 2))(*args)
    g_pl = jax.grad(lambda *a: loss("pallas_interpret", *a), argnums=(0, 1, 2))(*args)
    for gx, gp in zip(g_xla, g_pl):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=5e-3, rtol=5e-3)


def test_flash_attention_grads_masked_tail(rng):
    """With a padded kv tail, grads through valid region match the unpadded
    computation and padded-region grads are zero."""
    b, h, s, d = 1, 1, 128, 64
    pad = 128
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    co = rng.standard_normal((b, h, s, d)).astype(np.float32)

    def loss_padded(q, k, v):
        qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        o = attention(qp, kp, vp, impl="pallas_interpret", kv_valid=s,
                      block_q=128, block_kv=128)
        return jnp.sum(o[:, :, :s] * jnp.asarray(co))

    def loss_ref(q, k, v):
        o = attention(q, k, v, impl="xla")
        return jnp.sum(o * jnp.asarray(co))

    args = tuple(map(jnp.asarray, (q, k, v)))
    gp = jax.grad(loss_padded, argnums=(0, 1, 2))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(*args)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-3, rtol=5e-3)


def test_rope_3d_shapes_and_apply(rng):
    dim = 64
    gh, gw, t = 6, 10, 5
    crop = get_resize_crop_region_for_grid((gh, gw), 90, 60)
    cos, sin = get_3d_rotary_pos_embed(dim, crop, (gh, gw), t)
    assert cos.shape == (t * gh * gw, dim)
    # norm-preservation: rotations keep pairwise L2 norms
    x = rng.standard_normal((1, 2, t * gh * gw, dim)).astype(np.float32)
    y = apply_rotary_emb(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin))
    nx = np.linalg.norm(x.reshape(-1, dim // 2, 2), axis=-1)
    ny = np.linalg.norm(np.asarray(y).reshape(-1, dim // 2, 2), axis=-1)
    np.testing.assert_allclose(nx, ny, atol=1e-4, rtol=1e-4)
    # temporal position 0: the temporal quarter of the dim is identity
    np.testing.assert_allclose(cos[0][: dim // 4], np.ones(dim // 4), atol=1e-6)
    np.testing.assert_allclose(sin[0][: dim // 4], np.zeros(dim // 4), atol=1e-6)
    # frame stride: tokens one frame apart share the spatial 3/4 of the dim
    np.testing.assert_allclose(cos[gh * gw][dim // 4:], cos[0][dim // 4:], atol=1e-6)


def test_rope_interleaved_rotation_against_torch(rng):
    """apply_rotary_emb matches an explicit complex rotation in torch."""
    dim, s = 32, 7
    pos = np.arange(s, dtype=np.float32) * 3.0
    from easyanimate_tpu.ops.rope import get_1d_rotary_pos_embed
    cos, sin = get_1d_rotary_pos_embed(dim, pos)
    x = rng.standard_normal((1, 1, s, dim)).astype(np.float32)
    got = np.asarray(apply_rotary_emb(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))

    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    ang = torch.from_numpy((pos[:, None] * freqs[None, :]))
    xt = torch.from_numpy(x).reshape(1, 1, s, dim // 2, 2)
    xc = torch.complex(xt[..., 0].double(), xt[..., 1].double())
    rot = xc * torch.exp(1j * ang)
    want = torch.stack([rot.real, rot.imag], dim=-1).reshape(1, 1, s, dim).float().numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_joint_attention_text_video_split(rng):
    """joint_attention == SDPA over the concatenation with RoPE on video."""
    b, h, st, sv, d = 1, 2, 16, 48, 32
    mk = lambda s: rng.standard_normal((b, h, s, d)).astype(np.float32)
    qt, kt, vt = mk(st), mk(st), mk(st)
    qv, kv, vv = mk(sv), mk(sv), mk(sv)
    from easyanimate_tpu.ops.rope import get_1d_rotary_pos_embed
    cos, sin = get_1d_rotary_pos_embed(d, np.arange(sv, dtype=np.float32))

    ot, ov = joint_attention(
        *(jnp.asarray(a) for a in (qt, kt, vt, qv, kv, vv)),
        jnp.asarray(cos), jnp.asarray(sin), impl="xla",
    )
    qv_r = np.asarray(apply_rotary_emb(jnp.asarray(qv), jnp.asarray(cos), jnp.asarray(sin)))
    kv_r = np.asarray(apply_rotary_emb(jnp.asarray(kv), jnp.asarray(cos), jnp.asarray(sin)))
    q = np.concatenate([qt, qv_r], axis=2)
    k = np.concatenate([kt, kv_r], axis=2)
    v = np.concatenate([vt, vv], axis=2)
    want = _torch_sdpa(q, k, v)
    got = np.concatenate([np.asarray(ot), np.asarray(ov)], axis=2)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)
