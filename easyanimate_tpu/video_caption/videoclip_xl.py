"""VideoCLIP-XL text-video alignment scorer (flax).

Parity targets (reference video_caption/):
  utils/video_evaluator.py::VideoCLIPXLScore  -- ViCLIP-L vision tower +
    LongCLIP-L text tower, cosine scores text @ video.T
  utils/viclip/viclip_vision.py:160-198       -- spatiotemporal ViT forward
  utils/longclip/model_longclip.py:294-374    -- dual positional embedding
    (trained first-20 + interpolated residual) and EOT-pooled text features

This is a from-scratch flax re-derivation (the repo's mps.py pattern): the
math must match so the published VideoCLIP-XL-v2.bin weights load through
`convert_videoclip_xl_state_dict`, but the code is jit-compiled JAX -- the
towers run batched on TPU for stage-2 dataset filtering instead of the
reference's per-video CPU/GPU loop.

Deviation noted: the reference vision forward takes `x[:B, :1]` as the CLS
rows of a (B*T, ...) tensor (viclip_vision.py:168-171), which picks frame-0
CLS per video only at B==1 -- exactly how video_evaluator.py drives it
(one video per get_vid_features call). This implementation indexes frame 0
per video, which is identical at B==1 and correct for B>1.

Tokenization: the CLIP BPE algorithm is reimplemented below
(`SimpleBPETokenizer`); pass the path of any standard
`bpe_simple_vocab_16e6.txt.gz` (ships with every OpenAI-CLIP
checkpoint/install -- NOT bundled here).
"""
import dataclasses
import gzip
import html
from functools import lru_cache
from typing import Any, Dict, List, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# -- shared transformer tower --------------------------------------------------


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN CLIP block; params mirror torch nn.MultiheadAttention
    (fused in_proj) + mlp.c_fc/c_proj for 1:1 weight conversion."""

    width: int
    heads: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        w, h = self.width, self.heads
        hd = w // h
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        qkv = nn.Dense(3 * w, name="in_proj")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s, _ = q.shape
        shp = (b, s, h, hd)
        q = q.reshape(shp).transpose(0, 2, 1, 3) * (hd ** -0.5)
        k = k.reshape(shp).transpose(0, 2, 1, 3)
        v = v.reshape(shp).transpose(0, 2, 1, 3)
        sc = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        if self.causal:
            mask = jnp.tril(jnp.ones((s, s), bool))
            sc = jnp.where(mask, sc, -jnp.inf)
        p = jax.nn.softmax(sc, axis=-1)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, w)
        x = x + nn.Dense(w, name="out_proj")(o)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * w, name="c_fc")(y)
        y = QuickGELU()(y)
        x = x + nn.Dense(w, name="c_proj")(y)
        return x


# -- ViCLIP vision tower -------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class ViCLIPVisionConfig:
    # ViT-L/14 (viclip_vision.py clip_joint_l14)
    input_resolution: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    output_dim: int = 768
    kernel_size: int = 1      # tubelet depth
    num_frames: int = 8


class ViCLIPVision(nn.Module):
    """Spatiotemporal joint-attention ViT (viclip_vision.py:160-198):
    per-frame patchify + CLS/spatial pos, temporal pos on patch tokens,
    one CLS (frame 0) + all T*N patch tokens attend jointly."""

    cfg: ViCLIPVisionConfig = ViCLIPVisionConfig()

    @nn.compact
    def __call__(self, video_bcthw):
        cfg = self.cfg
        x = jnp.transpose(video_bcthw, (0, 2, 3, 4, 1))  # B T H W C
        x = nn.Conv(cfg.width,
                    (cfg.kernel_size, cfg.patch_size, cfg.patch_size),
                    strides=(cfg.kernel_size, cfg.patch_size, cfg.patch_size),
                    padding="VALID", use_bias=False, name="conv1")(x)
        b, t, hh, ww, c = x.shape
        n = hh * ww
        x = x.reshape(b, t, n, c)

        cls = self.param("class_embedding",
                         nn.initializers.normal(cfg.width ** -0.5),
                         (cfg.width,))
        pos = self.param("positional_embedding",
                         nn.initializers.normal(cfg.width ** -0.5),
                         ((cfg.input_resolution // cfg.patch_size) ** 2 + 1,
                          cfg.width))
        x = x + pos[None, None, 1:, :]
        cls_tok = cls[None, None, :] + pos[None, :1, :]       # (1, 1, C)
        cls_tok = jnp.broadcast_to(cls_tok, (b, 1, c))

        tpos = self.param("temporal_positional_embedding",
                          nn.initializers.zeros, (1, cfg.num_frames, cfg.width))
        if t == 1:
            x = x + jnp.mean(tpos, axis=1)[:, None]
        else:
            x = x + tpos[:, :t, None, :]
        # token order (n major, t minor): '(b n) t m -> b (n t) m'
        x = x.transpose(0, 2, 1, 3).reshape(b, n * t, c)
        x = jnp.concatenate([cls_tok, x], axis=1)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x)
        proj = self.param("proj", nn.initializers.normal(cfg.width ** -0.5),
                          (cfg.width, cfg.output_dim))
        return x[:, 0] @ proj


# -- LongCLIP text tower -------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LongCLIPTextConfig:
    # LongCLIP-L (model_longclip.py ViT-L/14 text tower, 248 context)
    context_length: int = 248
    keep_len: int = 20        # first positions use the trained table
    vocab_size: int = 49408
    width: int = 768
    heads: int = 12
    layers: int = 12
    embed_dim: int = 768


class LongCLIPText(nn.Module):
    """Causal CLIP text tower with LongCLIP's dual positional embedding:
    positions < keep_len come from the trained 77-ctx table, the rest from
    the interpolated residual table (model_longclip.py:294-308, 360-374)."""

    cfg: LongCLIPTextConfig = LongCLIPTextConfig()

    @nn.compact
    def __call__(self, token_ids):
        cfg = self.cfg
        emb = self.param("token_embedding", nn.initializers.normal(0.02),
                         (cfg.vocab_size, cfg.width))
        x = emb[token_ids]
        pos = self.param("positional_embedding", nn.initializers.normal(0.01),
                         (cfg.context_length, cfg.width))
        pos_res = self.param("positional_embedding_res",
                             nn.initializers.normal(0.01),
                             (cfg.context_length, cfg.width))
        s = x.shape[1]
        idx = jnp.arange(s)
        blend = jnp.where((idx < cfg.keep_len)[:, None],
                          pos[:s], pos_res[:s])
        x = x + blend[None]
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, causal=True,
                                       name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)
        tproj = self.param("text_projection",
                           nn.initializers.normal(cfg.width ** -0.5),
                           (cfg.width, cfg.embed_dim))
        eot = jnp.argmax(token_ids, axis=-1)  # EOT id is the vocab max
        return x[jnp.arange(x.shape[0]), eot] @ tproj


# -- scorer --------------------------------------------------------------------


class VideoCLIPXL(nn.Module):
    vision_cfg: ViCLIPVisionConfig = ViCLIPVisionConfig()
    text_cfg: LongCLIPTextConfig = LongCLIPTextConfig()

    def setup(self):
        self.vision = ViCLIPVision(self.vision_cfg)
        self.text = LongCLIPText(self.text_cfg)

    def __call__(self, video_bcthw, token_ids):
        """-> (videos, texts) cosine score matrix (video_evaluator.py:92-101:
        both towers L2-normalized, no logit scale)."""
        v = self.vision(video_bcthw)
        t = self.text(token_ids)
        v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
        t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
        return t @ v.T

    def video_features(self, video_bcthw):
        v = self.vision(video_bcthw)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def text_features(self, token_ids):
        t = self.text(token_ids)
        return t / jnp.linalg.norm(t, axis=-1, keepdims=True)


def preprocess_frames(frames: Sequence[np.ndarray], size: int = 224,
                      bgr: bool = True) -> np.ndarray:
    """uint8 RGB frames -> (1, 3, T, size, size) float32, replicating
    video_evaluator.py:84-90: cv2 resize, ImageNet mean/std -- and (bgr=True)
    the reference's RGB->BGR conversion before scoring (its demo quirk;
    disable for true-RGB scoring)."""
    import cv2

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    out = []
    for f in frames:
        if bgr:
            f = f[..., ::-1]
        f = cv2.resize(f, (size, size)).astype(np.float32)
        out.append((f / 255.0 - mean) / std)
    return np.stack(out).transpose(3, 0, 1, 2)[None]  # 1 C T H W


# -- weight conversion ---------------------------------------------------------


def _block_params(sd: Dict[str, np.ndarray], pre: str) -> Dict[str, Any]:
    t = lambda k: np.asarray(sd.pop(pre + k), np.float32)
    return {
        "ln_1": {"scale": t("ln_1.weight"), "bias": t("ln_1.bias")},
        "ln_2": {"scale": t("ln_2.weight"), "bias": t("ln_2.bias")},
        "in_proj": {"kernel": t("attn.in_proj_weight").T,
                    "bias": t("attn.in_proj_bias")},
        "out_proj": {"kernel": t("attn.out_proj.weight").T,
                     "bias": t("attn.out_proj.bias")},
        "c_fc": {"kernel": t("mlp.c_fc.weight").T, "bias": t("mlp.c_fc.bias")},
        "c_proj": {"kernel": t("mlp.c_proj.weight").T,
                   "bias": t("mlp.c_proj.bias")},
    }


def convert_videoclip_xl_state_dict(
        sd: Dict[str, np.ndarray],
        vision_cfg: ViCLIPVisionConfig = ViCLIPVisionConfig(),
        text_cfg: LongCLIPTextConfig = LongCLIPTextConfig()) -> Dict:
    """VideoCLIP-XL-v2.bin layout -> flax params: "model.*" is the LongCLIP
    text tower (visual deleted, video_evaluator.py:60), "viclip_model.
    vision_encoder.*" the ViCLIP vision tower (text_encoder deleted)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    vis: Dict[str, Any] = {}
    vp = "viclip_model.vision_encoder."
    # torch conv3d (out, in, kt, kh, kw) -> flax (kt, kh, kw, in, out)
    vis["conv1"] = {"kernel": np.transpose(
        np.asarray(sd.pop(vp + "conv1.weight"), np.float32), (2, 3, 4, 1, 0))}
    vis["class_embedding"] = np.asarray(sd.pop(vp + "class_embedding"),
                                        np.float32)
    vis["positional_embedding"] = np.asarray(
        sd.pop(vp + "positional_embedding"), np.float32)
    vis["temporal_positional_embedding"] = np.asarray(
        sd.pop(vp + "temporal_positional_embedding"), np.float32)
    for ln in ("ln_pre", "ln_post"):
        vis[ln] = {"scale": np.asarray(sd.pop(vp + ln + ".weight"), np.float32),
                   "bias": np.asarray(sd.pop(vp + ln + ".bias"), np.float32)}
    vis["proj"] = np.asarray(sd.pop(vp + "proj"), np.float32)
    for i in range(vision_cfg.layers):
        vis[f"resblocks_{i}"] = _block_params(
            sd, vp + f"transformer.resblocks.{i}.")

    txt: Dict[str, Any] = {}
    tp = "model."
    txt["token_embedding"] = np.asarray(
        sd.pop(tp + "token_embedding.weight"), np.float32)
    txt["positional_embedding"] = np.asarray(
        sd.pop(tp + "positional_embedding"), np.float32)
    txt["positional_embedding_res"] = np.asarray(
        sd.pop(tp + "positional_embedding_res"), np.float32)
    txt["ln_final"] = {
        "scale": np.asarray(sd.pop(tp + "ln_final.weight"), np.float32),
        "bias": np.asarray(sd.pop(tp + "ln_final.bias"), np.float32)}
    txt["text_projection"] = np.asarray(
        sd.pop(tp + "text_projection"), np.float32)
    for i in range(text_cfg.layers):
        txt[f"resblocks_{i}"] = _block_params(
            sd, tp + f"transformer.resblocks.{i}.")
    # unused leftovers (logit scales, frozen temp, deleted-tower stragglers)
    return {"vision": vis, "text": txt}


# -- CLIP BPE tokenizer (reimplemented; pass any standard vocab gz) ------------


@lru_cache()
def _bytes_to_unicode():
    """Reversible byte <-> printable-unicode table (GPT-2/CLIP scheme)."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


class SimpleBPETokenizer:
    """CLIP byte-pair tokenizer over a standard bpe_simple_vocab_16e6.txt.gz
    merges file (the public OpenAI vocab that ships with every CLIP
    checkpoint). Original implementation of the published algorithm."""

    def __init__(self, vocab_path: str):
        with gzip.open(vocab_path, "rt", encoding="utf-8") as f:
            merges = f.read().split("\n")
        merges = [tuple(m.split()) for m in merges[1: 49152 - 256 - 2 + 1]]
        self.byte_enc = _bytes_to_unicode()
        chars = list(self.byte_enc.values())
        vocab = chars + [c + "</w>" for c in chars]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.ranks = {m: i for i, m in enumerate(merges)}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache: Dict[str, List[int]] = {}

    def _bpe(self, word: str) -> List[str]:
        parts = list(word[:-1]) + [word[-1] + "</w>"]
        while len(parts) > 1:
            pairs = [(parts[i], parts[i + 1]) for i in range(len(parts) - 1)]
            best = min(pairs, key=lambda p: self.ranks.get(p, 1 << 30))
            if best not in self.ranks:
                break
            merged, i = [], 0
            while i < len(parts):
                if (i < len(parts) - 1
                        and (parts[i], parts[i + 1]) == best):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        return parts

    def encode(self, text: str) -> List[int]:
        import re

        text = html.unescape(html.unescape(text))
        text = re.sub(r"\s+", " ", text).strip().lower()
        pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[^\s\d\W]+|\d|[^\s\w\d]+", re.IGNORECASE)
        ids: List[int] = []
        for tok in pat.findall(text):
            if tok in ("<|startoftext|>", "<|endoftext|>"):
                ids.append(self.encoder[tok])
                continue
            if tok not in self._cache:
                word = "".join(self.byte_enc[b] for b in tok.encode("utf-8"))
                self._cache[tok] = [self.encoder[p] for p in self._bpe(word)]
            ids.extend(self._cache[tok])
        return ids

    def __call__(self, texts: Sequence[str], context_length: int = 248,
                 truncate: bool = True) -> np.ndarray:
        out = np.zeros((len(texts), context_length), np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot] + self.encode(t) + [self.eot]
            if len(ids) > context_length:
                if not truncate:
                    raise ValueError(f"text {i} too long: {len(ids)}")
                ids = ids[:context_length]
                ids[-1] = self.eot
            out[i, :len(ids)] = ids
        return out


def videoclip_xl_score_fn(checkpoint_path: str, vocab_path: str,
                          num_frames: int = 8, bgr: bool = True):
    """(video_paths, texts) -> per-pair scores, VideoCLIPXLScore parity
    (per-pair diagonal; the reference returns the full row at batch 1)."""
    import torch

    from .filters import _sample_frames

    sd = torch.load(checkpoint_path, map_location="cpu")
    params = convert_videoclip_xl_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    model = VideoCLIPXL()
    tokenizer = SimpleBPETokenizer(vocab_path)
    vid_fn = jax.jit(lambda v: model.apply(
        {"params": params}, v, method=VideoCLIPXL.video_features))
    txt_fn = jax.jit(lambda t: model.apply(
        {"params": params}, t, method=VideoCLIPXL.text_features))

    def score(video_paths: Sequence[str], texts: Sequence[str]) -> List[float]:
        assert len(video_paths) == len(texts)
        vids = np.concatenate([
            preprocess_frames(_sample_frames(p, num=num_frames), bgr=bgr)
            for p in video_paths])
        v = np.asarray(vid_fn(jnp.asarray(vids)))
        t = np.asarray(txt_fn(jnp.asarray(tokenizer(list(texts)))))
        return [float(x) for x in (t * v).sum(-1)]

    return score
