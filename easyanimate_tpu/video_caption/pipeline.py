"""Stage 3 + orchestration: recaption hooks and the end-to-end
preprocessing driver producing a training manifest json.

Parity targets: internvl2_video_recaptioning.py / caption_rewrite.py /
beautiful_prompt.py (caption generation & rewrite -- pluggable callables
here, since VLM/LLM weights aren't in this image) and the stage_{1,2,3}.sh
orchestration (one python driver instead of three shell stages).
"""
import json
import os
from typing import Callable, List, Optional

from .cutscene import detect_cutscenes, split_video
from .filters import compute_motion_score, filter_manifest

REWRITE_PROMPT = (
    "Rewrite this video caption into one fluent, detailed English sentence "
    "describing the subject, action, scene and style: {caption}"
)


def run_preprocessing(
    video_dir: str,
    out_dir: str,
    caption_fn: Optional[Callable[[str], str]] = None,
    rewrite_fn: Optional[Callable[[str], str]] = None,
    embed_fn: Optional[Callable] = None,
    ocr_fn: Optional[Callable] = None,
    videoclip_score_fn: Optional[Callable] = None,
    min_motion: float = 2.0,
    max_motion: float = 14.0,
    min_videoclip_score: float = 0.2,
) -> str:
    """videos -> scene clips -> scored + filtered -> captioned manifest.

    videoclip_score_fn: (video_paths, texts) -> scores; build one with
    `videoclip_xl.videoclip_xl_score_fn(ckpt, vocab)` to replicate the
    reference's compute_video_quality.py text-video alignment filter
    (applied after captioning, which provides the texts).

    Returns the path of the written train.json (ImageVideoDataset format).
    """
    os.makedirs(out_dir, exist_ok=True)
    clips_dir = os.path.join(out_dir, "clips")

    # stage 1: cutscene split
    clips: List[str] = []
    for name in sorted(os.listdir(video_dir)):
        if not name.lower().endswith((".mp4", ".mov", ".mkv", ".avi",
                                      ".webm")):
            continue
        path = os.path.join(video_dir, name)
        scenes = detect_cutscenes(path)
        clips.extend(split_video(path, scenes, clips_dir))

    # stage 2: scores + filters
    entries = []
    for clip in clips:
        e = {"file_path": clip, "type": "video",
             "motion_score": compute_motion_score(clip)}
        if embed_fn is not None:
            from .filters import compute_semantic_consistency

            e["semantic_consistency"] = compute_semantic_consistency(
                clip, embed_fn)
        if ocr_fn is not None:
            from .filters import compute_text_score

            e["text_score"] = compute_text_score(clip, ocr_fn)
        entries.append(e)
    entries = filter_manifest(entries, min_motion=min_motion,
                              max_motion=max_motion)

    # stage 3: recaption + rewrite
    for e in entries:
        caption = caption_fn(e["file_path"]) if caption_fn else ""
        if rewrite_fn and caption:
            caption = rewrite_fn(REWRITE_PROMPT.format(caption=caption))
        e["text"] = caption

    # stage 2b: text-video alignment (needs captions; VideoCLIP-XL parity)
    if videoclip_score_fn is not None:
        captioned = [e for e in entries if e["text"]]
        if captioned:
            scores = videoclip_score_fn([e["file_path"] for e in captioned],
                                        [e["text"] for e in captioned])
            for e, s in zip(captioned, scores):
                e["videoclipxl_score"] = float(s)
            entries = [e for e in entries
                       if e.get("videoclipxl_score", 1.0)
                       >= min_videoclip_score]

    out_path = os.path.join(out_dir, "train.json")
    with open(out_path, "w") as f:
        json.dump(entries, f, indent=1)
    return out_path
