"""Stage 1: cutscene detection + clip splitting.

Parity target: video_caption/cutscene_detect.py (PySceneDetect
ContentDetector) + video_splitting.py (ffmpeg). PySceneDetect/ffmpeg are not
in this image, so the default path is a cv2 HSV content detector with the
same threshold semantics (mean per-pixel HSV delta > threshold -> cut) and
cv2-based splitting; PySceneDetect is used when importable.
"""
from typing import List, Optional, Tuple

import numpy as np


def detect_cutscenes(video_path: str, threshold: float = 27.0,
                     min_scene_len: int = 15) -> List[Tuple[int, int]]:
    """Returns [(start_frame, end_frame)] scene spans."""
    try:
        from scenedetect import ContentDetector, detect  # type: ignore

        scenes = detect(video_path, ContentDetector(threshold=threshold))
        return [(s[0].get_frames(), s[1].get_frames()) for s in scenes]
    except ImportError:
        pass
    import cv2

    cap = cv2.VideoCapture(video_path)
    cuts = [0]
    prev = None
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        hsv = cv2.cvtColor(cv2.resize(frame, (256, 144)),
                           cv2.COLOR_BGR2HSV).astype(np.float32)
        if prev is not None:
            delta = float(np.abs(hsv - prev).mean())
            if delta > threshold and idx - cuts[-1] >= min_scene_len:
                cuts.append(idx)
        prev = hsv
        idx += 1
    cap.release()
    cuts.append(idx)
    return [(cuts[i], cuts[i + 1]) for i in range(len(cuts) - 1)
            if cuts[i + 1] - cuts[i] >= min_scene_len]


def split_video(video_path: str, scenes: List[Tuple[int, int]],
                out_dir: str, min_seconds: float = 3.0,
                max_seconds: float = 10.0) -> List[str]:
    """Writes one clip per scene (length-clamped); returns written paths."""
    import os

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    cap = cv2.VideoCapture(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 24.0
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    base = os.path.splitext(os.path.basename(video_path))[0]
    written = []
    for si, (s, e) in enumerate(scenes):
        if (e - s) / fps < min_seconds:
            continue
        e = min(e, s + int(max_seconds * fps))
        out = os.path.join(out_dir, f"{base}_scene{si}.mp4")
        vw = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        cap.set(cv2.CAP_PROP_POS_FRAMES, s)
        for _ in range(e - s):
            ok, frame = cap.read()
            if not ok:
                break
            vw.write(frame)
        vw.release()
        written.append(out)
    cap.release()
    return written
