"""VideoCLIP-XL flax towers vs an independent torch implementation of the
reference architecture (viclip_vision.py / model_longclip.py semantics),
plus the BPE tokenizer."""
import gzip

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from easyanimate_tpu.video_caption.videoclip_xl import (
    LongCLIPText,
    LongCLIPTextConfig,
    SimpleBPETokenizer,
    ViCLIPVision,
    ViCLIPVisionConfig,
    VideoCLIPXL,
    convert_videoclip_xl_state_dict,
)

VIS = ViCLIPVisionConfig(input_resolution=16, patch_size=4, width=16,
                         layers=2, heads=2, output_dim=8, num_frames=3)
TXT = LongCLIPTextConfig(context_length=12, keep_len=3, vocab_size=50,
                         width=16, heads=2, layers=2, embed_dim=8)


class _TorchBlock(tnn.Module):
    """Reference ResidualAttentionBlock semantics (pre-LN, QuickGELU),
    written independently for the golden check."""

    def __init__(self, w, h):
        super().__init__()
        self.attn = tnn.MultiheadAttention(w, h)
        self.ln_1 = tnn.LayerNorm(w)
        self.ln_2 = tnn.LayerNorm(w)
        self.mlp = tnn.Sequential()
        self.mlp.add_module("c_fc", tnn.Linear(w, 4 * w))
        self.mlp.add_module("c_proj", tnn.Linear(4 * w, w))

    def forward(self, x, attn_mask=None):  # x: (L, N, D)
        y = self.ln_1(x)
        a, _ = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)
        x = x + a
        y = self.ln_2(x)
        y = self.mlp.c_fc(y)
        y = y * torch.sigmoid(1.702 * y)
        return x + self.mlp.c_proj(y)


def _torch_vision(sd_prefix, video):
    """viclip_vision.py:160-198 forward at B==1 in plain torch."""
    g = torch.Generator().manual_seed(0)
    conv = tnn.Conv3d(3, VIS.width, (1, VIS.patch_size, VIS.patch_size),
                      (1, VIS.patch_size, VIS.patch_size), bias=False)
    blocks = tnn.ModuleList([_TorchBlock(VIS.width, VIS.heads)
                             for _ in range(VIS.layers)])
    ln_pre, ln_post = tnn.LayerNorm(VIS.width), tnn.LayerNorm(VIS.width)
    n_pos = (VIS.input_resolution // VIS.patch_size) ** 2 + 1
    cls = torch.randn(VIS.width, generator=g) * 0.2
    pos = torch.randn(n_pos, VIS.width, generator=g) * 0.2
    tpos = torch.randn(1, VIS.num_frames, VIS.width, generator=g) * 0.2
    proj = torch.randn(VIS.width, VIS.output_dim, generator=g) * 0.2
    for m in (conv, *blocks, ln_pre, ln_post):
        for p in m.parameters():
            p.data = torch.randn(p.shape, generator=g) * 0.2

    with torch.no_grad():
        x = conv(video)                       # B W T H' W'
        b, c, t, hh, ww = x.shape
        x = x.permute(0, 2, 3, 4, 1).reshape(b * t, hh * ww, c)
        x = torch.cat([cls + torch.zeros(x.shape[0], 1, c), x], dim=1)
        x = x + pos
        cls_tok = x[:b, :1, :]
        x = x[:, 1:]
        n = hh * ww
        x = x.reshape(b, t, n, c).permute(0, 2, 1, 3).reshape(b * n, t, c)
        x = x + tpos
        x = x.reshape(b, n, t, c).reshape(b, n * t, c)
        x = torch.cat([cls_tok, x], dim=1)
        x = ln_pre(x).permute(1, 0, 2)
        for blk in blocks:
            x = blk(x)
        x = ln_post(x.permute(1, 0, 2))
        out = x[:, 0] @ proj

    sd = {sd_prefix + "conv1.weight": conv.weight,
          sd_prefix + "class_embedding": cls,
          sd_prefix + "positional_embedding": pos,
          sd_prefix + "temporal_positional_embedding": tpos,
          sd_prefix + "ln_pre.weight": ln_pre.weight,
          sd_prefix + "ln_pre.bias": ln_pre.bias,
          sd_prefix + "ln_post.weight": ln_post.weight,
          sd_prefix + "ln_post.bias": ln_post.bias,
          sd_prefix + "proj": proj}
    for i, blk in enumerate(blocks):
        p = sd_prefix + f"transformer.resblocks.{i}."
        sd.update({
            p + "attn.in_proj_weight": blk.attn.in_proj_weight,
            p + "attn.in_proj_bias": blk.attn.in_proj_bias,
            p + "attn.out_proj.weight": blk.attn.out_proj.weight,
            p + "attn.out_proj.bias": blk.attn.out_proj.bias,
            p + "ln_1.weight": blk.ln_1.weight, p + "ln_1.bias": blk.ln_1.bias,
            p + "ln_2.weight": blk.ln_2.weight, p + "ln_2.bias": blk.ln_2.bias,
            p + "mlp.c_fc.weight": blk.mlp.c_fc.weight,
            p + "mlp.c_fc.bias": blk.mlp.c_fc.bias,
            p + "mlp.c_proj.weight": blk.mlp.c_proj.weight,
            p + "mlp.c_proj.bias": blk.mlp.c_proj.bias,
        })
    return out, sd


def _torch_text(sd_prefix, ids):
    """model_longclip.py:360-374 encode_text in plain torch."""
    g = torch.Generator().manual_seed(1)
    blocks = tnn.ModuleList([_TorchBlock(TXT.width, TXT.heads)
                             for _ in range(TXT.layers)])
    ln_final = tnn.LayerNorm(TXT.width)
    emb = torch.randn(TXT.vocab_size, TXT.width, generator=g) * 0.2
    pos = torch.randn(TXT.context_length, TXT.width, generator=g) * 0.1
    pos_res = torch.randn(TXT.context_length, TXT.width, generator=g) * 0.1
    tproj = torch.randn(TXT.width, TXT.embed_dim, generator=g) * 0.2
    for m in (*blocks, ln_final):
        for p in m.parameters():
            p.data = torch.randn(p.shape, generator=g) * 0.2
    mask1 = torch.zeros(TXT.context_length, 1)
    mask1[:TXT.keep_len] = 1
    mask2 = 1 - mask1
    s = ids.shape[1]
    attn_mask = torch.full((s, s), float("-inf")).triu(1)

    with torch.no_grad():
        x = emb[ids] + (pos * mask1)[:s] + (pos_res * mask2)[:s]
        x = x.permute(1, 0, 2)
        for blk in blocks:
            x = blk(x, attn_mask=attn_mask)
        x = ln_final(x.permute(1, 0, 2))
        out = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)] @ tproj

    sd = {sd_prefix + "token_embedding.weight": emb,
          sd_prefix + "positional_embedding": pos,
          sd_prefix + "positional_embedding_res": pos_res,
          sd_prefix + "ln_final.weight": ln_final.weight,
          sd_prefix + "ln_final.bias": ln_final.bias,
          sd_prefix + "text_projection": tproj}
    for i, blk in enumerate(blocks):
        p = sd_prefix + f"transformer.resblocks.{i}."
        sd.update({
            p + "attn.in_proj_weight": blk.attn.in_proj_weight,
            p + "attn.in_proj_bias": blk.attn.in_proj_bias,
            p + "attn.out_proj.weight": blk.attn.out_proj.weight,
            p + "attn.out_proj.bias": blk.attn.out_proj.bias,
            p + "ln_1.weight": blk.ln_1.weight, p + "ln_1.bias": blk.ln_1.bias,
            p + "ln_2.weight": blk.ln_2.weight, p + "ln_2.bias": blk.ln_2.bias,
            p + "mlp.c_fc.weight": blk.mlp.c_fc.weight,
            p + "mlp.c_fc.bias": blk.mlp.c_fc.bias,
            p + "mlp.c_proj.weight": blk.mlp.c_proj.weight,
            p + "mlp.c_proj.bias": blk.mlp.c_proj.bias,
        })
    return out, sd


def test_videoclip_xl_golden(rng):
    video = rng.standard_normal((1, 3, 3, 16, 16)).astype(np.float32)
    ids = np.array([[2, 7, 5, 49, 0, 0, 0, 0, 0, 0, 0, 0],
                    [2, 11, 8, 3, 49, 0, 0, 0, 0, 0, 0, 0]], np.int64)

    vout, vsd = _torch_vision("viclip_model.vision_encoder.",
                              torch.from_numpy(video))
    tout, tsd = _torch_text("model.", torch.from_numpy(ids))
    params = convert_videoclip_xl_state_dict(
        {k: v.detach().numpy() for k, v in {**vsd, **tsd}.items()},
        vision_cfg=VIS, text_cfg=TXT)

    model = VideoCLIPXL(vision_cfg=VIS, text_cfg=TXT)
    v = model.apply({"params": params}, jnp.asarray(video),
                    method=VideoCLIPXL.video_features)
    t = model.apply({"params": params}, jnp.asarray(ids),
                    method=VideoCLIPXL.text_features)
    vref = vout.numpy() / np.linalg.norm(vout.numpy(), axis=-1, keepdims=True)
    tref = tout.numpy() / np.linalg.norm(tout.numpy(), axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(v), vref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(t), tref, atol=2e-5)

    sims = model.apply({"params": params}, jnp.asarray(video),
                       jnp.asarray(ids))
    assert sims.shape == (2, 1)
    np.testing.assert_allclose(np.asarray(sims), tref @ vref.T, atol=2e-5)


def _toy_vocab(tmp_path):
    path = tmp_path / "bpe_vocab.txt.gz"
    lines = ["#version: toy"]
    lines += ["h e", "he l", "l o</w>", "hel lo</w>",
              "w o", "wo r", "l d</w>", "wor ld</w>"]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return str(path)


def test_bpe_tokenizer_merges_and_layout(tmp_path):
    tok = SimpleBPETokenizer(_toy_vocab(tmp_path))
    # known merge chain: hello -> single token, world -> single token
    ids = tok(["Hello world", "hello"], context_length=8)
    assert ids.shape == (2, 8)
    assert ids[0, 0] == tok.sot
    hello = tok.encoder["hello</w>"]
    world = tok.encoder["world</w>"]
    assert list(ids[0, 1:4]) == [hello, world, tok.eot]
    assert ids[0, 4:].max() == 0
    assert list(ids[1, 1:3]) == [hello, tok.eot]
    # truncation pins EOT at the end
    long = tok(["hello " * 50], context_length=6, truncate=True)
    assert long[0, -1] == tok.eot
    with pytest.raises(ValueError):
        tok(["hello " * 50], context_length=6, truncate=False)


def test_bpe_tokenizer_against_reference_vocab():
    """Golden vs the published OpenAI vocab when available (read-only)."""
    import os

    ref = ("/root/reference/easyanimate/video_caption/utils/longclip/"
           "bpe_simple_vocab_16e6.txt.gz")
    if not os.path.exists(ref):
        pytest.skip("reference vocab not present")
    tok = SimpleBPETokenizer(ref)
    assert tok.sot == 49406 and tok.eot == 49407
    ids = tok(["a photo of a cat"], context_length=77)
    # published CLIP tokenization of this canonical phrase
    assert list(ids[0, :7]) == [49406, 320, 1125, 539, 320, 2368, 49407]
