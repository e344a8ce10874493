"""Stage 2: data-quality filters.

Parity targets in video_caption/:
  compute_motion_score.py      optical-flow mean magnitude
  compute_text_score.py        OCR text-area fraction (easyocr)
  compute_semantic_consistency.py  CLIP/DINO keyframe cosine similarity
  utils/image_evaluator.py     aesthetic predictor (siglip head)

Deps policy: optical flow runs on cv2 (present). The OCR text score has a
weight-free cv2 default (default_text_boxes) with easyocr as the pluggable
upgrade; CLIP/aesthetic need model weights, so they accept a pluggable
embed callable and raise a clear error when none is given.
"""
from typing import Callable, List, Optional, Sequence

import numpy as np


def _sample_frames(video_path: str, num: int = 8) -> List[np.ndarray]:
    import cv2

    cap = cv2.VideoCapture(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) or 1
    idxs = np.linspace(0, max(total - 1, 0), num).astype(int)
    frames = []
    for i in idxs:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ok, f = cap.read()
        if ok:
            frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def compute_motion_score(video_path: str, sample_fps: int = 2,
                         size: int = 256) -> float:
    """Mean Farneback optical-flow magnitude between sampled frame pairs
    (compute_motion_score.py parity)."""
    import cv2

    frames = _sample_frames(video_path, num=max(sample_fps * 4, 4))
    if len(frames) < 2:
        return 0.0
    mags = []
    prev = None
    for f in frames:
        g = cv2.cvtColor(cv2.resize(f, (size, size)), cv2.COLOR_RGB2GRAY)
        if prev is not None:
            flow = cv2.calcOpticalFlowFarneback(
                prev, g, None, 0.5, 3, 15, 3, 5, 1.2, 0)
            mags.append(float(np.linalg.norm(flow, axis=-1).mean()))
        prev = g
    return float(np.mean(mags)) if mags else 0.0


def default_text_boxes(frame_rgb: np.ndarray) -> List[tuple]:
    """Weight-free text-line detection: morphological gradient (stroke
    edges) -> Otsu binarize -> wide horizontal close (connect glyphs into
    lines) -> connected components filtered by text-line geometry.

    This is the in-repo default behind compute_text_score so the reference's
    text-area filter (video_caption/compute_text_score.py) runs without
    easyocr weights; easyocr (or any ocr_fn) remains the drop-in upgrade.
    Returns (x0, y0, x1, y1) line boxes.

    Gap vs the reference's easyocr/CRAFT detector (compute_text_score.py
    :4-23, downloads CRAFT weights): CRAFT detects curved / rotated /
    low-contrast scene text and rejects high-frequency textures by
    learned character-ness; this detector only finds horizontal
    high-contrast text LINES and can fire on line-like textures (fences,
    window grids). For the filter's actual decision — drop clips whose
    overlay-text area exceeds ~2% (filter_meta_train.py) — both agree on
    the dominant case (burned-in captions/banners are horizontal and
    high-contrast); the side-by-side on synthetic overlay vs clean clips
    is pinned in tests/test_video_caption.py::
    test_text_score_side_by_side_overlay_vs_clean."""
    import cv2

    gray = cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2GRAY)
    h, _ = gray.shape
    grad = cv2.morphologyEx(
        gray, cv2.MORPH_GRADIENT,
        cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3)))
    _, bw = cv2.threshold(grad, 0, 255, cv2.THRESH_BINARY | cv2.THRESH_OTSU)
    closed = cv2.morphologyEx(
        bw, cv2.MORPH_CLOSE,
        cv2.getStructuringElement(cv2.MORPH_RECT, (15, 3)))
    n, _, stats, _ = cv2.connectedComponentsWithStats(closed, 8)
    out = []
    for i in range(1, n):
        x, y, bw_, bh, area = stats[i]
        if bh < 8 or bh > 0.2 * h:        # not text-line sized
            continue
        if bw_ < 2.0 * bh:                # lines are wide
            continue
        if area / float(bw_ * bh) < 0.3:  # sparse component = texture
            continue
        out.append((int(x), int(y), int(x + bw_), int(y + bh)))
    return out


def compute_text_score(video_path: str,
                       ocr_fn: Optional[Callable] = None) -> float:
    """Mean fraction of frame area covered by detected text boxes
    (compute_text_score.py parity).

    ocr_fn(frame_rgb) -> list of (x0, y0, x1, y1) boxes; defaults to easyocr
    when importable, else the weight-free morphological text-line detector
    (default_text_boxes: gradient + Otsu + close + connected components)."""
    if ocr_fn is None:
        try:
            import easyocr  # type: ignore

            reader = easyocr.Reader(["en"], gpu=False)

            def ocr_fn(frame):
                out = []
                for box, _, _ in reader.readtext(frame):
                    xs = [p[0] for p in box]
                    ys = [p[1] for p in box]
                    out.append((min(xs), min(ys), max(xs), max(ys)))
                return out
        except ImportError:
            ocr_fn = default_text_boxes
    fracs = []
    for f in _sample_frames(video_path, num=4):
        area = f.shape[0] * f.shape[1]
        boxes = ocr_fn(f)
        covered = sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in boxes)
        fracs.append(covered / area)
    return float(np.mean(fracs)) if fracs else 0.0


def compute_semantic_consistency(video_path: str,
                                 embed_fn: Callable,
                                 num_keyframes: int = 8) -> float:
    """Mean adjacent-keyframe cosine similarity of embed_fn features
    (CLIP/DINOv2 in the reference)."""
    frames = _sample_frames(video_path, num=num_keyframes)
    if len(frames) < 2:
        return 1.0
    embs = np.stack([np.asarray(embed_fn(f), np.float32) for f in frames])
    embs = embs / np.maximum(np.linalg.norm(embs, axis=-1, keepdims=True),
                             1e-8)
    sims = (embs[:-1] * embs[1:]).sum(-1)
    return float(sims.mean())


def filter_manifest(entries: Sequence[dict], *,
                    min_motion: float = 2.0,
                    max_motion: float = 14.0,
                    max_text: float = 0.02,
                    min_semantic: float = 0.8) -> List[dict]:
    """Threshold filter over precomputed scores
    (filter_meta_train.py / utils/filter.py parity)."""
    out = []
    for e in entries:
        if not (min_motion <= e.get("motion_score", min_motion) <= max_motion):
            continue
        if e.get("text_score", 0.0) > max_text:
            continue
        if e.get("semantic_consistency", 1.0) < min_semantic:
            continue
        out.append(e)
    return out


def semantic_embed_fn(model: str = "clip", model_path: Optional[str] = None,
                      **kw):
    """Backend selector for compute_semantic_consistency, mirroring the
    reference's ALL_MODEL_NAME list (compute_semantic_consistency.py:21-28):
    model="dinov2" uses the flax DINOv2 tower (dinov2.py, feature =
    last_hidden_state.mean over tokens), anything else the CLIP image
    tower (feature = get_image_features)."""
    if model.startswith("dinov2"):
        from .dinov2 import dinov2_image_embed_fn

        return dinov2_image_embed_fn(model_path, **kw)
    return clip_image_embed_fn(model_path, **kw)


def clip_image_embed_fn(clip_path: Optional[str] = None, model=None):
    """CLIP image-embedding callable for compute_semantic_consistency,
    running on the in-repo FlaxCLIP stack (same tower the reward functions
    use, reward/reward_fn.py). Pass either a local CLIP directory or an
    already-built FlaxCLIPModel (compute_semantic_consistency.py parity)."""
    import jax.numpy as jnp

    if model is None:
        from transformers import FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(clip_path, from_pt=True)
    size = model.config.vision_config.image_size

    def embed(frame_rgb: np.ndarray) -> np.ndarray:
        import cv2

        f = cv2.resize(frame_rgb, (size, size)).astype(np.float32) / 255.0
        mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
        std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
        pix = ((f - mean) / std).transpose(2, 0, 1)[None]
        emb = model.get_image_features(pixel_values=jnp.asarray(pix))
        return np.asarray(emb[0])

    return embed


def aesthetic_score_fn(clip_path: Optional[str] = None,
                       head_state_dict=None, model=None, head_params=None):
    """Per-video aesthetic score via the reward stack's AestheticReward
    (utils/image_evaluator.py parity: CLIP tower + linear aesthetic head)."""
    import jax.numpy as jnp

    from ..reward.reward_fn import AestheticReward, convert_aesthetic_head

    if model is None:
        from transformers import FlaxCLIPModel

        model = FlaxCLIPModel.from_pretrained(clip_path, from_pt=True)
    if head_params is None:
        head_params = convert_aesthetic_head(head_state_dict)
    scorer = AestheticReward(model=model, head_params=head_params)

    def score(video_path: str, num_frames: int = 4) -> float:
        frames = _sample_frames(video_path, num=num_frames)
        if not frames:
            return 0.0
        clip = np.stack([f.astype(np.float32) / 255.0 for f in frames])
        clip = clip[None]  # (B=1, T, H, W, C) in [0, 1]
        _, reward = scorer(jnp.asarray(clip))
        return float(reward)

    return score
