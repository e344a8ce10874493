"""MMDiT parity and shape tests.

test_block_matches_torch re-implements the reference EasyAnimateDiTBlock math
in torch (per SURVEY.md §2.1: attention.py:1027-1163, processor.py:218-312,
norm.py:135-166) and checks our flax block against it with shared weights.
"""
import dataclasses

import flax
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from easyanimate_tpu.models.blocks import MMDiTBlock
from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
from easyanimate_tpu.ops.rope import get_1d_rotary_pos_embed


def _t(a):
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def _torch_block(p, vid, txt, temb, cos, sin, heads, head_dim):
    """Reference EasyAnimateDiTBlock forward in torch."""
    dim = heads * head_dim

    def ln(x, w, b, eps=1e-6):
        return F.layer_norm(x, (x.shape[-1],), w, b, eps)

    def norm_zero(prefix, vid, txt):
        mods = F.linear(F.silu(temb), p[f"{prefix}.linear.k"].T, p[f"{prefix}.linear.b"])
        sh, sc, gate, esh, esc, egate = mods.chunk(6, dim=1)
        w, b = p[f"{prefix}.norm_scale"], p[f"{prefix}.norm_bias"]
        nv = ln(vid, w, b) * (1 + sc[:, None]) + sh[:, None]
        nt = ln(txt, w, b) * (1 + esc[:, None]) + esh[:, None]
        return nv, nt, gate[:, None], egate[:, None]

    def qkv(prefix, x):
        b_, s, _ = x.shape
        out = []
        for name in ("q", "k", "v"):
            y = F.linear(x, p[f"{prefix}.to_{name}.k"].T, p[f"{prefix}.to_{name}.b"])
            y = y.view(b_, s, heads, head_dim).transpose(1, 2)
            if name in ("q", "k"):
                y = ln(y, p[f"{prefix}.norm_{name}_scale"], p[f"{prefix}.norm_{name}_bias"])
            out.append(y)
        return out

    def rope_apply(x):
        xr = x.reshape(*x.shape[:-1], -1, 2)
        rot = torch.stack([-xr[..., 1], xr[..., 0]], dim=-1).reshape(x.shape)
        return x * cos + rot * sin

    nv, nt, gate, egate = norm_zero("norm1", vid, txt)
    qv, kv, vv = qkv("attn1", nv)
    qt, kt, vt = qkv("attn2", nt)
    qv, kv = rope_apply(qv), rope_apply(kv)
    q = torch.cat([qt, qv], dim=2)
    k = torch.cat([kt, kv], dim=2)
    v = torch.cat([vt, vv], dim=2)
    o = F.scaled_dot_product_attention(q, k, v)
    st = txt.shape[1]
    o = o.transpose(1, 2).reshape(vid.shape[0], -1, dim)
    o_txt, o_vid = o[:, :st], o[:, st:]
    o_vid = F.linear(o_vid, p["attn1_out.k"].T, p["attn1_out.b"])
    o_txt = F.linear(o_txt, p["attn2_out.k"].T, p["attn2_out.b"])
    vid = vid + gate * o_vid
    txt = txt + egate * o_txt

    nv, nt, gate2, egate2 = norm_zero("norm2", vid, txt)

    def ff(prefix, x):
        h = F.linear(x, p[f"{prefix}.wi.k"].T, p[f"{prefix}.wi.b"])
        h = F.gelu(h, approximate="tanh")
        return F.linear(h, p[f"{prefix}.wo.k"].T, p[f"{prefix}.wo.b"])

    vid = vid + gate2 * ff("ff", nv)
    txt = txt + egate2 * ff("txt_ff", nt)
    return vid, txt


def test_block_matches_torch(rng):
    heads, head_dim, dim = 2, 16, 32
    b, st, sv = 1, 5, 12
    block = MMDiTBlock(dim=dim, num_heads=heads, head_dim=head_dim,
                       attn_impl="xla")
    vid = rng.standard_normal((b, sv, dim)).astype(np.float32)
    txt = rng.standard_normal((b, st, dim)).astype(np.float32)
    temb = rng.standard_normal((b, 24)).astype(np.float32)
    cos_np, sin_np = get_1d_rotary_pos_embed(head_dim, np.arange(sv, dtype=np.float32))

    variables = block.init(jax.random.PRNGKey(3), jnp.asarray(vid),
                           jnp.asarray(txt), jnp.asarray(temb),
                           (jnp.asarray(cos_np), jnp.asarray(sin_np)))
    # randomize params so the test is non-trivial
    leaves, treedef = jax.tree.flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    leaves = [0.3 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)]
    variables = jax.tree.unflatten(treedef, leaves)

    got_vid, got_txt = block.apply(
        variables, jnp.asarray(vid), jnp.asarray(txt), jnp.asarray(temb),
        (jnp.asarray(cos_np), jnp.asarray(sin_np)))

    flat = flax.traverse_util.flatten_dict(variables["params"], sep=".")
    p = {}
    for k, v in flat.items():
        k = k.replace(".kernel", ".k").replace(".bias", ".b")
        p[k] = _t(v)
    want_vid, want_txt = _torch_block(
        p, _t(vid), _t(txt), _t(temb), _t(cos_np), _t(sin_np), heads, head_dim)

    np.testing.assert_allclose(np.asarray(got_vid), want_vid.numpy(),
                               atol=3e-4, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(got_txt), want_txt.numpy(),
                               atol=3e-4, rtol=3e-4)


def test_model_shapes_and_scan_loop_equivalence(rng):
    from easyanimate_tpu.ops.rope import (get_3d_rotary_pos_embed,
                                          get_resize_crop_region_for_grid)

    cfg = PRESETS["tiny"]
    model = EasyAnimateTransformer3D(cfg)
    b, c, t, h, w = 1, 4, 3, 8, 8
    lat = jnp.asarray(rng.standard_normal((b, c, t, h, w)).astype(np.float32))
    ts = jnp.array([321.0])
    txt = jnp.asarray(rng.standard_normal((b, 7, cfg.text_embed_dim)).astype(np.float32))
    gh, gw = h // 2, w // 2
    crop = get_resize_crop_region_for_grid((gh, gw), 45, 30)
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, crop, (gh, gw), t)
    rope = (jnp.asarray(cos), jnp.asarray(sin))

    params = model.init(jax.random.PRNGKey(0), lat, ts, txt, rope)
    out = model.apply(params, lat, ts, txt, rope)
    assert out.shape == (b, cfg.out_channels, t, h, w)

    cfg2 = dataclasses.replace(cfg, scan_layers=False)
    m2 = EasyAnimateTransformer3D(cfg2)
    flat = flax.traverse_util.flatten_dict(params["params"])
    flat_loop = {}
    for k, v in flat.items():
        if k[0] == "blocks":
            for i in range(cfg.num_layers):
                flat_loop[(f"block{i}",) + k[2:]] = v[i]
        else:
            flat_loop[k] = v
    p2 = {"params": flax.traverse_util.unflatten_dict(flat_loop)}
    out2 = m2.apply(p2, lat, ts, txt, rope)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               atol=1e-5, rtol=1e-5)


def test_model_inpaint_channel_concat(rng):
    cfg = dataclasses.replace(PRESETS["tiny"], in_channels=9)
    model = EasyAnimateTransformer3D(cfg)
    b, t, h, w = 1, 3, 8, 8
    lat = jnp.zeros((b, 4, t, h, w))
    inp = jnp.zeros((b, 5, t, h, w))
    ts = jnp.array([10.0])
    txt = jnp.zeros((b, 7, cfg.text_embed_dim))
    params = model.init(jax.random.PRNGKey(0), lat, ts, txt, None,
                        inpaint_latents=inp)
    out = model.apply(params, lat, ts, txt, None, inpaint_latents=inp)
    assert out.shape == (b, cfg.out_channels, t, h, w)

def test_v5_dual_text_with_norm(rng):
    """V5 path: Bert + mT5 dual text streams with RMSNorm projections
    (transformer3d.py:1405-1418, add_norm_text_encoder)."""
    import dataclasses as dc

    cfg = dc.replace(PRESETS["tiny"], out_channels=4,
                     text_embed_dim=24, text_embed_dim_t5=36,
                     add_norm_text_encoder=True)
    model = EasyAnimateTransformer3D(cfg)
    lat = jnp.asarray(rng.standard_normal((1, 4, 2, 8, 8)).astype(np.float32))
    bert = jnp.asarray(rng.standard_normal((1, 6, 24)).astype(np.float32))
    t5 = jnp.asarray(rng.standard_normal((1, 5, 36)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), bert,
                        None, encoder_hidden_states_t5=t5)
    out = model.apply(params, lat, jnp.array([1.0]), bert, None,
                      encoder_hidden_states_t5=t5)
    assert out.shape == (1, 4, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"], sep="/")
    assert any("text_proj_t5" in k for k in flat)
