"""Full-forward golden test: the complete EasyAnimateTransformer3D vs an
independent torch reimplementation of the reference forward
(transformer3d.py:1496-1689), sharing weights through the converter's
reference-layout state dict. This is the per-step-latent parity anchor."""
import dataclasses
import math

import flax
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from easyanimate_tpu.models.convert import convert_mmdit_state_dict
from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
from easyanimate_tpu.ops.rope import (
    get_3d_rotary_pos_embed,
    get_resize_crop_region_for_grid,
)
from tests.test_mmdit import _torch_block


def _sd(cfg, rng):
    from tests.test_convert import _synth_mmdit_sd

    return _synth_mmdit_sd(cfg, rng)


def _torch_timestep_embedding(t, dim):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    emb = t[:, None].double() * torch.exp(exponent)[None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1).float()


def _torch_full_forward(sd, cfg, lat, t, txt, cos, sin):
    heads, hd = cfg.num_attention_heads, cfg.attention_head_dim
    dim = cfg.inner_dim
    p = cfg.patch_size
    b, c, f, hh, ww = lat.shape

    lin = lambda x, k: F.linear(x, sd[k + ".weight"], sd[k + ".bias"])
    # time embedding
    temb = _torch_timestep_embedding(t, dim)
    temb = lin(temb, "time_embedding.linear_1")
    temb = lin(F.silu(temb), "time_embedding.linear_2")
    # patchify
    x = lat.permute(0, 2, 1, 3, 4).reshape(b * f, c, hh, ww)
    x = F.conv2d(x, sd["proj.weight"], sd["proj.bias"], stride=p)
    gh, gw = hh // p, ww // p
    x = x.reshape(b, f, dim, gh, gw).permute(0, 2, 1, 3, 4)
    vid = x.flatten(2).transpose(1, 2)
    txt_tok = lin(txt, "text_proj")
    # blocks
    for i in range(cfg.num_layers):
        pp = {}
        pre = f"transformer_blocks.{i}."
        for k in sd:
            if k.startswith(pre):
                kk = (k[len(pre):]
                      .replace("norm1.linear.weight", "norm1.linear.k")
                      .replace("norm1.linear.bias", "norm1.linear.b")
                      .replace("norm2.linear.weight", "norm2.linear.k")
                      .replace("norm2.linear.bias", "norm2.linear.b")
                      .replace("norm1.norm.weight", "norm1.norm_scale")
                      .replace("norm1.norm.bias", "norm1.norm_bias")
                      .replace("norm2.norm.weight", "norm2.norm_scale")
                      .replace("norm2.norm.bias", "norm2.norm_bias"))
                for attn in ("attn1", "attn2"):
                    for q_ in ("q", "k", "v"):
                        kk = kk.replace(f"{attn}.to_{q_}.weight",
                                        f"{attn}.to_{q_}.k")
                        kk = kk.replace(f"{attn}.to_{q_}.bias",
                                        f"{attn}.to_{q_}.b")
                    kk = (kk.replace(f"{attn}.norm_q.weight", f"{attn}.norm_q_scale")
                          .replace(f"{attn}.norm_q.bias", f"{attn}.norm_q_bias")
                          .replace(f"{attn}.norm_k.weight", f"{attn}.norm_k_scale")
                          .replace(f"{attn}.norm_k.bias", f"{attn}.norm_k_bias")
                          .replace(f"{attn}.to_out.0.weight", f"{attn}_out.k")
                          .replace(f"{attn}.to_out.0.bias", f"{attn}_out.b"))
                for ff in ("ff", "txt_ff"):
                    kk = (kk.replace(f"{ff}.net.0.proj.weight", f"{ff}.wi.k")
                          .replace(f"{ff}.net.0.proj.bias", f"{ff}.wi.b")
                          .replace(f"{ff}.net.2.weight", f"{ff}.wo.k")
                          .replace(f"{ff}.net.2.bias", f"{ff}.wo.b"))
                pp[kk] = sd[k].T if kk.endswith(".k") else sd[k]
        vid, txt_tok = _torch_block(pp, vid, txt_tok, temb, cos, sin, heads, hd)
    # final norm over concat, video slice
    joint = torch.cat([txt_tok, vid], dim=1)
    joint = F.layer_norm(joint, (dim,), sd["norm_final.weight"],
                         sd["norm_final.bias"], cfg.norm_eps)
    vid = joint[:, txt_tok.shape[1]:]
    # AdaLN out (shift first)
    mods = lin(F.silu(temb), "norm_out.linear")
    shift, scale = mods.chunk(2, dim=1)
    vid = F.layer_norm(vid, (dim,), sd["norm_out.norm.weight"],
                       sd["norm_out.norm.bias"], cfg.norm_eps)
    vid = vid * (1 + scale[:, None]) + shift[:, None]
    vid = lin(vid, "proj_out")
    out = vid.reshape(b, f, gh, gw, cfg.out_channels, p, p)
    out = out.permute(0, 4, 1, 2, 5, 3, 6).flatten(5, 6).flatten(3, 4)
    return out


def test_full_model_matches_torch_reimplementation(rng):
    cfg = dataclasses.replace(PRESETS["tiny"], text_embed_dim_t5=None)
    sd = _sd(cfg, rng)
    variables = convert_mmdit_state_dict(sd, cfg)
    model = EasyAnimateTransformer3D(cfg)

    b, c, f, hh, ww = 1, cfg.in_channels, 3, 8, 8
    lat = rng.standard_normal((b, c, f, hh, ww)).astype(np.float32)
    t = np.array([421.0], np.float32)
    txt = rng.standard_normal((b, 5, cfg.text_embed_dim)).astype(np.float32)

    gh, gw = hh // 2, ww // 2
    crop = get_resize_crop_region_for_grid((gh, gw), 45, 30)
    cos, sin = get_3d_rotary_pos_embed(cfg.attention_head_dim, crop, (gh, gw), f)

    got = model.apply(variables, jnp.asarray(lat), jnp.asarray(t),
                      jnp.asarray(txt), (jnp.asarray(cos), jnp.asarray(sin)))

    sdt = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    want = _torch_full_forward(
        sdt, cfg, torch.from_numpy(lat), torch.from_numpy(t),
        torch.from_numpy(txt), torch.from_numpy(cos), torch.from_numpy(sin))
    np.testing.assert_allclose(np.asarray(got), want.numpy(),
                               atol=5e-4, rtol=5e-4)
