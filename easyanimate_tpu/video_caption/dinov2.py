"""DINOv2 vision tower (flax) for the semantic-consistency filter.

Parity target: reference video_caption/compute_semantic_consistency.py:21-23
offers dinov2-small/base/large next to the CLIP backends; the score is the
adjacent-keyframe cosine over `last_hidden_state.mean(dim=1)`
(compute_semantic_consistency.py:192). This is a faithful flax port of HF
`Dinov2Model` (pre-norm ViT with LayerScale) plus a torch→flax state-dict
converter, so published DINOv2 weights load 1:1 — the same pattern as
videoclip_xl.py / reward/mps.py (layer math must mirror the published
checkpoint; everything around it is original).

Golden test: tests/test_dinov2.py builds a random-weight torch Dinov2Model
(transformers is in the image) and pins the flax forward against it.
"""
import dataclasses
from typing import Any, Dict, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class Dinov2Config:
    hidden_size: int = 384          # dinov2-small
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch_size: int = 14
    image_size: int = 518           # position-table native size
    layer_norm_eps: float = 1e-6
    layerscale_value: float = 1.0


PRESETS = {
    "dinov2-small": Dinov2Config(384, 12, 6),
    "dinov2-base": Dinov2Config(768, 12, 12),
    "dinov2-large": Dinov2Config(1024, 24, 16),
}


class _Attention(nn.Module):
    cfg: Dinov2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d_head = c.hidden_size // c.num_heads
        b, s, _ = x.shape

        def proj(name):
            y = nn.Dense(c.hidden_size, name=name)(x)
            return y.reshape(b, s, c.num_heads, d_head).transpose(0, 2, 1, 3)

        q, k, v = proj("query"), proj("key"), proj("value")
        a = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (d_head ** -0.5)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, c.hidden_size)
        return nn.Dense(c.hidden_size, name="out")(o)


class _Block(nn.Module):
    cfg: Dinov2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        ls1 = self.param("layer_scale1", nn.initializers.constant(
            c.layerscale_value), (c.hidden_size,))
        ls2 = self.param("layer_scale2", nn.initializers.constant(
            c.layerscale_value), (c.hidden_size,))
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm1")(x)
        x = x + ls1 * _Attention(c, name="attn")(h)
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, name="norm2")(x)
        h = nn.Dense(c.hidden_size * c.mlp_ratio, name="fc1")(h)
        h = nn.gelu(h, approximate=False)  # HF "gelu" is the erf form
        h = nn.Dense(c.hidden_size, name="fc2")(h)
        return x + ls2 * h


def _interpolate_pos(pos, grid_hw, cfg):
    """HF Dinov2Embeddings.interpolate_pos_encoding: bicubic-resize the
    patch position table when the input grid differs from the native one
    (upscaling in practice, where antialias is a no-op)."""
    native = cfg.image_size // cfg.patch_size
    gh, gw = grid_hw
    if (gh, gw) == (native, native):
        return pos
    cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
    patch_pos = patch_pos.reshape(1, native, native, cfg.hidden_size)
    patch_pos = jax.image.resize(
        patch_pos, (1, gh, gw, cfg.hidden_size), method="bicubic")
    return jnp.concatenate(
        [cls_pos, patch_pos.reshape(1, gh * gw, cfg.hidden_size)], axis=1)


class Dinov2Vision(nn.Module):
    """HF Dinov2Model forward: returns the final-layernormed hidden states
    [B, 1 + gh*gw, D] (CLS first)."""

    cfg: Dinov2Config

    @nn.compact
    def __call__(self, pixels):
        """pixels: [B, H, W, 3], already imagenet-normalized."""
        c = self.cfg
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size),
                    name="patch_embed")(pixels)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, c.hidden_size))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, c.hidden_size)), x],
                            axis=1)
        native = c.image_size // c.patch_size
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, 1 + native * native, c.hidden_size))
        x = x + _interpolate_pos(pos, (gh, gw), c)
        for i in range(c.num_layers):
            x = _Block(c, name=f"layer{i}")(x)
        return nn.LayerNorm(epsilon=c.layer_norm_eps, name="final_norm")(x)


# -- torch -> flax weight conversion ------------------------------------------


def _dense(sd, pre):
    return {"kernel": np.asarray(sd[pre + ".weight"]).T,
            "bias": np.asarray(sd[pre + ".bias"])}


def _ln(sd, pre):
    return {"scale": np.asarray(sd[pre + ".weight"]),
            "bias": np.asarray(sd[pre + ".bias"])}


def convert_dinov2_state_dict(sd: Dict[str, Any],
                              cfg: Dinov2Config) -> Dict[str, Any]:
    """HF Dinov2Model state_dict (torch tensors or numpy) -> flax params for
    Dinov2Vision. Fails loudly on any unconsumed encoder weight."""
    sd = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
              np.asarray(v)) for k, v in sd.items()}
    p: Dict[str, Any] = {}
    p["patch_embed"] = {
        # torch conv OIHW -> flax HWIO
        "kernel": sd["embeddings.patch_embeddings.projection.weight"
                     ].transpose(2, 3, 1, 0),
        "bias": sd["embeddings.patch_embeddings.projection.bias"],
    }
    p["cls_token"] = sd["embeddings.cls_token"]
    p["pos_embed"] = sd["embeddings.position_embeddings"]
    for i in range(cfg.num_layers):
        pre = f"encoder.layer.{i}"
        p[f"layer{i}"] = {
            "norm1": _ln(sd, f"{pre}.norm1"),
            "norm2": _ln(sd, f"{pre}.norm2"),
            "layer_scale1": sd[f"{pre}.layer_scale1.lambda1"],
            "layer_scale2": sd[f"{pre}.layer_scale2.lambda1"],
            "attn": {
                "query": _dense(sd, f"{pre}.attention.attention.query"),
                "key": _dense(sd, f"{pre}.attention.attention.key"),
                "value": _dense(sd, f"{pre}.attention.attention.value"),
                "out": _dense(sd, f"{pre}.attention.output.dense"),
            },
            "fc1": _dense(sd, f"{pre}.mlp.fc1"),
            "fc2": _dense(sd, f"{pre}.mlp.fc2"),
        }
    p["final_norm"] = _ln(sd, "layernorm")
    used = {"embeddings.mask_token"}  # inference never masks
    leftovers = [k for k in sd
                 if k not in used and not k.startswith("pooler")
                 and "encoder.layer." not in k
                 and not k.startswith("embeddings.")
                 and k != "layernorm.weight" and k != "layernorm.bias"]
    if leftovers:
        raise ValueError(f"unconsumed DINOv2 weights: {leftovers[:5]}")
    return p


def preprocess_frames(frames: Sequence[np.ndarray], size: int = 224,
                      resize_to: int = 256) -> np.ndarray:
    """AutoImageProcessor(dinov2) protocol: shortest edge -> resize_to,
    center-crop size x size, scale to [0,1], imagenet-normalize.
    frames: uint8 RGB HWC. Returns [N, size, size, 3] float32."""
    import cv2

    out = []
    for f in frames:
        h, w = f.shape[:2]
        scale = resize_to / min(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        f = cv2.resize(f, (nw, nh), interpolation=cv2.INTER_CUBIC)
        top, left = (nh - size) // 2, (nw - size) // 2
        f = f[top:top + size, left:left + size]
        f = f.astype(np.float32) / 255.0
        f = (f - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        out.append(f)
    return np.stack(out).astype(np.float32)


def dinov2_image_embed_fn(model_path: Optional[str] = None,
                          params=None, cfg: Optional[Dinov2Config] = None):
    """Frame -> feature callable for compute_semantic_consistency
    (model="dinov2" backend): feature = last_hidden_state.mean(axis=1),
    matching reference compute_semantic_consistency.py:192.

    Either pass a local HF checkpoint dir (`model_path`) or pre-converted
    flax `params` + `cfg`."""
    if params is None:
        if model_path is None:
            raise ValueError(
                "DINOv2 semantic consistency needs model_path (a local HF "
                "dinov2 checkpoint) or pre-converted params")
        import torch
        from transformers import Dinov2Config as HFCfg, Dinov2Model

        hf = Dinov2Model.from_pretrained(model_path)
        hcfg: HFCfg = hf.config
        cfg = Dinov2Config(
            hidden_size=hcfg.hidden_size, num_layers=hcfg.num_hidden_layers,
            num_heads=hcfg.num_attention_heads,
            mlp_ratio=int(hcfg.mlp_ratio), patch_size=hcfg.patch_size,
            image_size=hcfg.image_size,
            layer_norm_eps=hcfg.layer_norm_eps)
        with torch.no_grad():
            params = convert_dinov2_state_dict(hf.state_dict(), cfg)
    model = Dinov2Vision(cfg)
    fwd = jax.jit(lambda px: model.apply({"params": params}, px).mean(axis=1))

    def embed(frame_rgb: np.ndarray) -> np.ndarray:
        px = preprocess_frames([frame_rgb])
        return np.asarray(fwd(jnp.asarray(px)))[0]

    return embed
