"""Stage-3 caption tooling: LLM rewrite, beautiful prompt, recaption hook.

Parity target: video_caption/caption_rewrite.py (json-ish output extraction
:16-34, prompt-template batch rewrite), beautiful_prompt.py (user-prompt
beautification via an OpenAI-compatible or local LLM), and
internvl2_video_recaptioning.py (VLM recaption — model-dependent, so exposed
as a pluggable callable here; vllm/InternVL2 are not in this image).

All functions take `llm_fn: prompt_text -> completion_text` so any backend
(local flax LM, HTTP endpoint) plugs in without code changes.
"""
import json
import re
from typing import Callable, Iterable, List, Optional

REWRITE_TEMPLATE = (
    "You are a helpful assistant that rewrites video descriptions to be "
    "vivid, specific and grammatical while preserving all factual content. "
    'Respond ONLY with JSON: {{"rewritten description": "..."}}.\n'
    "Description: {caption}")

BEAUTIFUL_PROMPT_TEMPLATE = (
    "You are a prompt engineer for a text-to-video model. Expand the user "
    "prompt into a detailed cinematic description (camera, lighting, "
    "motion, style) in one paragraph. "
    'Respond ONLY with JSON: {{"detailed prompt": "..."}}.\n'
    "User prompt: {prompt}")


def extract_output(s: str, prefix: str = '"rewritten description": '
                   ) -> Optional[str]:
    """Tolerant parse of `{"rewritten description": "..."}` LLM output
    (caption_rewrite.py:16-34): regex the braces, strip the prefix, require
    surrounding double quotes."""
    match = re.search(r"{(.+?)}", s, re.DOTALL)
    if not match:
        return None
    output = match.group(1).strip()
    if not output.startswith(prefix):
        return None
    output = output[len(prefix):]
    if len(output) >= 2 and output[0] == '"' and output[-1] == '"':
        return output[1:-1]
    return None


def rewrite_caption(caption: str, llm_fn: Callable[[str], str],
                    template: str = REWRITE_TEMPLATE) -> Optional[str]:
    return extract_output(llm_fn(template.format(caption=caption)))


def beautiful_prompt(prompt: str, llm_fn: Callable[[str], str]) -> str:
    out = extract_output(
        llm_fn(BEAUTIFUL_PROMPT_TEMPLATE.format(prompt=prompt)),
        prefix='"detailed prompt": ')
    return out if out else prompt


def rewrite_manifest(entries: Iterable[dict], llm_fn: Callable[[str], str],
                     caption_key: str = "text") -> List[dict]:
    """Batch rewrite; entries whose rewrite fails keep the original."""
    out = []
    for e in entries:
        e = dict(e)
        new = rewrite_caption(e.get(caption_key, ""), llm_fn)
        if new:
            e[caption_key] = new
        out.append(e)
    return out


def recaption_videos(entries: Iterable[dict],
                     vlm_fn: Callable[[str], str],
                     path_key: str = "file_path",
                     caption_key: str = "text") -> List[dict]:
    """VLM recaption hook (internvl2_video_recaptioning.py): vlm_fn maps a
    video path to a caption (e.g. an InternVL2 server)."""
    out = []
    for e in entries:
        e = dict(e)
        try:
            e[caption_key] = vlm_fn(e[path_key])
        except Exception:
            pass
        out.append(e)
    return out


def gather_jsonl(paths: Iterable[str]) -> List[dict]:
    """utils/gather_jsonl.py: merge sharded jsonl outputs."""
    rows: List[dict] = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
    return rows


def filter_meta_train(entries: Iterable[dict], *,
                      min_motion: float = 2.0, max_motion: float = 14.0,
                      min_semantic: float = 0.80,
                      min_aesthetic: float = 4.0,
                      max_text_area: float = 0.02) -> List[dict]:
    """filter_meta_train.py: threshold every available score; missing scores
    pass."""
    keep = []
    for e in entries:
        m = e.get("motion_score")
        if m is not None and not (min_motion <= m <= max_motion):
            continue
        s = e.get("semantic_consistency")
        if s is not None and s < min_semantic:
            continue
        a = e.get("aesthetic_score")
        if a is not None and a < min_aesthetic:
            continue
        t = e.get("text_score")
        if t is not None and t > max_text_area:
            continue
        keep.append(e)
    return keep
