"""Rotary position embeddings (1D/2D/3D) for video DiTs.

Behavioral parity with the diffusers helpers the reference consumes:
  - get_3d_rotary_pos_embed / get_2d_rotary_pos_embed as used by
    pipeline_easyanimate.py:998-1019 (3D grid: dim_t = d/4, dim_h = dim_w =
    3d/8; h/w positions come from an aspect-preserving crop of a base
    720x480 grid; temporal positions are 0..T-1).
  - apply_rotary_emb in interleaved-real form ("flux/cogvideox" layout):
    pairs (x0,x1) rotate as (x0*cos - x1*sin, x1*cos + x0*sin) with cos/sin
    repeat-interleaved by 2 along the feature axis.

Tables are built host-side in numpy once per (resolution, frames) bucket and
passed into jit as constants — they never recompute inside the denoise scan.
"""
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def get_resize_crop_region_for_grid(src, tgt_width, tgt_height):
    """Aspect-preserving crop region of a (tgt_height, tgt_width) base grid
    for a (h, w) target grid. Mirrors the reference pipeline helper."""
    h, w = src
    r = h / w
    if r > (tgt_height / tgt_width):
        resize_height = tgt_height
        resize_width = int(round(tgt_height / h * w))
    else:
        resize_width = tgt_width
        resize_height = int(round(tgt_width / w * h))
    crop_top = int(round((tgt_height - resize_height) / 2.0))
    crop_left = int(round((tgt_width - resize_width) / 2.0))
    return (crop_top, crop_left), (crop_top + resize_height, crop_left + resize_width)


def get_1d_rotary_pos_embed(
    dim: int, pos: np.ndarray, theta: float = 10000.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (cos, sin), each [len(pos), dim], repeat-interleaved by 2."""
    assert dim % 2 == 0
    freqs = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    angles = np.outer(np.asarray(pos, dtype=np.float64), freqs)  # [S, dim/2]
    cos = np.repeat(np.cos(angles), 2, axis=1).astype(np.float32)
    sin = np.repeat(np.sin(angles), 2, axis=1).astype(np.float32)
    return cos, sin


def get_2d_rotary_pos_embed(embed_dim, crops_coords, grid_size, theta=10000.0):
    """2D RoPE over an (h, w) grid; dim split half/half between axes."""
    (top, left), (bottom, right) = crops_coords
    gh, gw = grid_size
    grid_h = np.linspace(top, bottom, gh, endpoint=False, dtype=np.float32)
    grid_w = np.linspace(left, right, gw, endpoint=False, dtype=np.float32)
    h_cos, h_sin = get_1d_rotary_pos_embed(embed_dim // 2, grid_h, theta)
    w_cos, w_sin = get_1d_rotary_pos_embed(embed_dim // 2, grid_w, theta)

    def combine(h_part, w_part):
        h_b = np.broadcast_to(h_part[:, None, :], (gh, gw, h_part.shape[-1]))
        w_b = np.broadcast_to(w_part[None, :, :], (gh, gw, w_part.shape[-1]))
        return np.concatenate([h_b, w_b], axis=-1).reshape(gh * gw, -1)

    return combine(h_cos, w_cos), combine(h_sin, w_sin)


def get_3d_rotary_pos_embed(
    embed_dim: int,
    crops_coords,
    grid_size: Tuple[int, int],
    temporal_size: int,
    theta: float = 10000.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """3D RoPE: feature dim split (t: d/4, h: 3d/8, w: 3d/8); token order is
    (t, h, w) row-major, matching the patchified video token layout.

    Returns (cos, sin), each [T*H*W, embed_dim] float32 numpy.
    """
    (top, left), (bottom, right) = crops_coords
    gh, gw = grid_size
    grid_h = np.linspace(top, bottom, gh, endpoint=False, dtype=np.float32)
    grid_w = np.linspace(left, right, gw, endpoint=False, dtype=np.float32)
    grid_t = np.linspace(0, temporal_size, temporal_size, endpoint=False, dtype=np.float32)

    dim_t = embed_dim // 4
    dim_h = embed_dim // 8 * 3
    dim_w = embed_dim // 8 * 3

    t_cos, t_sin = get_1d_rotary_pos_embed(dim_t, grid_t, theta)
    h_cos, h_sin = get_1d_rotary_pos_embed(dim_h, grid_h, theta)
    w_cos, w_sin = get_1d_rotary_pos_embed(dim_w, grid_w, theta)

    def combine(tp, hp, wp):
        t_b = np.broadcast_to(tp[:, None, None, :], (temporal_size, gh, gw, tp.shape[-1]))
        h_b = np.broadcast_to(hp[None, :, None, :], (temporal_size, gh, gw, hp.shape[-1]))
        w_b = np.broadcast_to(wp[None, None, :, :], (temporal_size, gh, gw, wp.shape[-1]))
        out = np.concatenate([t_b, h_b, w_b], axis=-1)
        return out.reshape(temporal_size * gh * gw, -1)

    return combine(t_cos, h_cos, w_cos), combine(t_sin, h_sin, w_sin)


def apply_rotary_emb(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate interleaved pairs of the last axis of x.

    x: [..., S, D]; cos/sin: [S, D] (repeat-interleaved). fp32 math, cast back.

    NOTE: interleaved pair access (minor dim 2) forces cross-lane shuffles on
    the TPU VPU -- measured 2x slower than the half-split form below. The
    MMDiT hot path therefore de-interleaves q/k through the *projection
    weights* (see blocks.py PermutedDense) and uses apply_rotary_emb_split;
    this interleaved form remains for paths that keep the reference feature
    order (Hunyuan V4, generic callers).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    # pairs (x0, x1) -> rotated (-x1, x0)
    xr = x32.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    rot = jnp.stack([-xr[..., 1], xr[..., 0]], axis=-1).reshape(x.shape)
    out = x32 * cos.astype(jnp.float32) + rot * sin.astype(jnp.float32)
    return out.astype(dtype)


def deinterleave_perm(d: int) -> np.ndarray:
    """Permutation mapping interleaved rope features to half-split layout:
    [x0, x1, x2, x3, ...] -> [x0, x2, ..., x1, x3, ...]. Attention scores are
    invariant under any fixed permutation applied to BOTH q and k, so this
    can be folded into the q/k projection weights at zero runtime cost."""
    return np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])


def apply_rotary_emb_split(
    x: jnp.ndarray, cos_half: jnp.ndarray, sin_half: jnp.ndarray
) -> jnp.ndarray:
    """Half-split rotation for de-interleaved features (TPU fast path).

    x: [..., S, D] with features in deinterleave_perm order; cos_half /
    sin_half: [S, D/2] (= interleaved tables sliced [:, ::2]). fp32 math.
    Mathematically identical scores to apply_rotary_emb on interleaved x.
    """
    d = x.shape[-1]
    x32 = x.astype(jnp.float32)
    x1, x2 = x32[..., : d // 2], x32[..., d // 2:]
    c = cos_half.astype(jnp.float32)
    s = sin_half.astype(jnp.float32)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s],
                           axis=-1).astype(x.dtype)
