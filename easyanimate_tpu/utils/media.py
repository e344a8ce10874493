"""Video/image IO helpers + I2V/V2V input builders.

Parity target: easyanimate/utils/utils.py --
  save_videos_grid (:49-73)              gif/mp4 export of (B,C,T,H,W) videos
  get_image_to_video_latent (:75-169)    start/end images -> input video+mask
  get_video_to_video_latent (:171-222)   source video -> input video+mask
Host-side numpy/imageio; no torch.
"""
import os
from typing import NamedTuple, Optional, Tuple, Union

import numpy as np


def _to_thwc_uint8(video: np.ndarray, rescale: bool = False) -> np.ndarray:
    """(C,T,H,W) float -> (T,H,W,C) uint8."""
    v = np.asarray(video)
    if rescale:
        v = v / 2 + 0.5
    v = np.clip(v, 0, 1)
    return (np.transpose(v, (1, 2, 3, 0)) * 255).astype(np.uint8)


class YUV420Video(NamedTuple):
    """Device-subsampled 4:2:0 generation result (controller
    `fetch_yuv420=True`): y (B, T, H, W) uint8, u/v (B, T, H/2, W/2) uint8,
    full-range BT.601. Carried instead of (B, 3, T, H, W) RGB so the
    device->host fetch moves 1.5 bytes/pixel instead of 3; the API server
    reconstructs RGB host-side (yuv420_to_rgb) only to feed the mp4
    encoder, whose output is 4:2:0 anyway."""
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Inverse of the pipeline's device-side 4:2:0 output
    (EasyAnimatePipeline.decode_latents_yuv420): y (B,T,H,W) uint8 +
    u/v (B,T,H/2,W/2) uint8, full-range BT.601 -> (B,3,T,H,W) uint8 RGB.
    Chroma is nearest-upsampled; the only loss vs the RGB decode path is
    ordinary 4:2:0 subsampling (none at all once the frames land in an
    mp4, which is 4:2:0 itself)."""
    yf = y.astype(np.float32) / 255.0
    up = lambda p: np.repeat(np.repeat(p, 2, axis=-2), 2, axis=-1)
    uf = up(u.astype(np.float32) / 255.0 - 0.5)
    vf = up(v.astype(np.float32) / 255.0 - 0.5)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgb = np.stack([r, g, b], axis=1)
    return np.clip(np.round(rgb * 255.0), 0, 255).astype(np.uint8)


def color_transfer(src: np.ndarray, ref: np.ndarray) -> np.ndarray:
    """Match src's per-channel LAB mean/std to ref's (reference
    utils.py:21-47). uint8 HWC RGB in, uint8 HWC RGB out. Used to pin
    later frames' color statistics to frame 0 against slow drift in long
    sliding-window generations."""
    import cv2

    s = cv2.cvtColor(src, cv2.COLOR_RGB2LAB).astype(np.float64)
    r = cv2.cvtColor(ref, cv2.COLOR_RGB2LAB).astype(np.float64)
    s_mean = s.mean(axis=(0, 1))
    s_std = s.std(axis=(0, 1))
    r_mean = r.mean(axis=(0, 1))
    r_std = r.std(axis=(0, 1))
    out = (s - s_mean) * (r_std / np.maximum(s_std, 1e-6)) + r_mean
    out = np.clip(out, 0, 255).astype(np.uint8)
    return cv2.cvtColor(out, cv2.COLOR_LAB2RGB)


def save_videos_grid(videos: np.ndarray, path: str, fps: int = 8,
                     rescale: bool = False,
                     color_transfer_post_process: bool = False):
    """videos (B,C,T,H,W) in [0,1] (or [-1,1] with rescale) -> mp4/gif.
    color_transfer_post_process pins every frame's color statistics to
    frame 0 (reference utils.py:60-62)."""
    import imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    b = videos.shape[0]
    frames_per_t = [
        np.concatenate([_to_thwc_uint8(videos[i], rescale)[t] for i in range(b)],
                       axis=1)
        for t in range(videos.shape[2])
    ]
    if color_transfer_post_process and len(frames_per_t) > 1:
        frames_per_t = [frames_per_t[0]] + [
            color_transfer(f, frames_per_t[0]) for f in frames_per_t[1:]]
    if path.endswith(".gif"):
        imageio.mimsave(path, frames_per_t, duration=1000 / fps, loop=0)
        return
    try:
        imageio.mimsave(path, frames_per_t, fps=fps)
    except Exception:
        # no ffmpeg backend in this image; cv2 ships its own codecs
        import cv2

        h, w = frames_per_t[0].shape[:2]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        for f in frames_per_t:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()


def _load_and_resize(image, size: Tuple[int, int]) -> np.ndarray:
    """image path/PIL/array -> (H, W, 3) float32 in [0, 1]."""
    from PIL import Image

    if isinstance(image, str):
        image = Image.open(image).convert("RGB")
    if not isinstance(image, np.ndarray):
        image = image.convert("RGB").resize((size[1], size[0]), Image.LANCZOS)
        return np.asarray(image, np.float32) / 255.0
    image = np.asarray(image)
    if np.issubdtype(image.dtype, np.floating):
        # float arrays are [0, 1] (e.g. decode_image_b64); a plain uint8
        # cast would truncate 0.x to 0 and condition on a black frame
        image = np.clip(np.round(image * 255.0), 0, 255)
    img = Image.fromarray(image.astype(np.uint8))
    img = img.resize((size[1], size[0]), Image.LANCZOS)
    return np.asarray(img, np.float32) / 255.0


def get_image_to_video_latent(
    validation_image_start,
    validation_image_end,
    video_length: int,
    sample_size: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray]:
    """Build (input_video, input_video_mask) for the inpaint pipeline.

    Returns video (1,C,T,H,W) in [0,1] and mask (1,1,T,H,W) in {0,1} where
    1 marks frames to generate (reference uses 255).
    """
    h, w = sample_size
    video = np.zeros((1, 3, video_length, h, w), np.float32)
    mask = np.ones((1, 1, video_length, h, w), np.float32)
    if validation_image_start is not None:
        start = _load_and_resize(validation_image_start, sample_size)
        video[0, :, 0] = np.transpose(start, (2, 0, 1))
        mask[0, :, 0] = 0.0
    if validation_image_end is not None and video_length > 1:
        end = _load_and_resize(validation_image_end, sample_size)
        video[0, :, -1] = np.transpose(end, (2, 0, 1))
        mask[0, :, -1] = 0.0
    return video, mask


def get_video_to_video_latent(
    input_video: Union[str, np.ndarray],
    video_length: int,
    sample_size: Tuple[int, int],
    validation_video_mask: Optional[np.ndarray] = None,
    fps: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Source video -> (video (1,C,T,H,W) [0,1], mask (1,1,T,H,W))."""
    if isinstance(input_video, str):
        try:
            import imageio

            reader = imageio.get_reader(input_video)
            frames = [f for _, f in zip(range(video_length), reader)]
            reader.close()
            arr = np.stack(frames)
        except Exception:  # no ffmpeg backend: cv2 decodes its own codecs
            import cv2

            cap = cv2.VideoCapture(input_video)
            frames = []
            while len(frames) < video_length:
                ok, f = cap.read()
                if not ok:
                    break
                frames.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
            cap.release()
            arr = np.stack(frames)
    else:
        arr = np.asarray(input_video)[:video_length]
    arr = _resize_frames(arr, sample_size)
    t = arr.shape[0]
    video = np.zeros((1, 3, video_length, *sample_size), np.float32)
    video[0, :, :t] = np.transpose(arr, (3, 0, 1, 2))
    if validation_video_mask is not None:
        mask = np.asarray(validation_video_mask, np.float32)[None, None]
        mask = np.repeat(mask[:, :, None], video_length, axis=2)
    else:
        mask = np.ones((1, 1, video_length, *sample_size), np.float32)
    return video, mask


def _resize_frames(frames: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    from PIL import Image

    h, w = size
    out = np.empty((frames.shape[0], h, w, 3), np.float32)
    for i, f in enumerate(frames):
        img = Image.fromarray(np.asarray(f, np.uint8)).convert("RGB")
        out[i] = np.asarray(img.resize((w, h), Image.LANCZOS), np.float32) / 255
    return out
