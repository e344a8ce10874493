"""Video preprocessing pipeline tests (synthetic videos via cv2)."""
import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from easyanimate_tpu.video_caption import (
    compute_motion_score,
    detect_cutscenes,
    run_preprocessing,
    split_video,
)
from easyanimate_tpu.video_caption.filters import filter_manifest


def _write_video(path, segments, size=64, fps=24):
    """segments: list of (num_frames, color or 'moving')."""
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                         (size, size))
    for n, kind in segments:
        for i in range(n):
            if kind == "moving":
                f = np.zeros((size, size, 3), np.uint8)
                x = (i * 3) % (size - 16)
                f[24:40, x:x + 16] = 255
            else:
                f = np.full((size, size, 3), kind, np.uint8)
            vw.write(f)
    vw.release()


def test_cutscene_detection_finds_hard_cut(tmp_path):
    p = str(tmp_path / "v.mp4")
    _write_video(p, [(30, 20), (30, 230)])
    scenes = detect_cutscenes(p, threshold=20.0)
    assert len(scenes) >= 2
    # the cut is near frame 30
    assert any(abs(s - 30) <= 2 for s, _ in scenes[1:])


def test_split_video_writes_clips(tmp_path):
    p = str(tmp_path / "v.mp4")
    _write_video(p, [(100, 40)])
    out = split_video(p, [(0, 100)], str(tmp_path / "clips"))
    assert len(out) == 1 and os.path.getsize(out[0]) > 0


def test_motion_score_orders_static_vs_moving(tmp_path):
    static = str(tmp_path / "s.mp4")
    moving = str(tmp_path / "m.mp4")
    _write_video(static, [(40, 128)])
    _write_video(moving, [(40, "moving")])
    assert compute_motion_score(moving) > compute_motion_score(static)


def test_filter_manifest_thresholds():
    entries = [
        {"file_path": "a", "motion_score": 5.0},
        {"file_path": "b", "motion_score": 0.1},          # too static
        {"file_path": "c", "motion_score": 50.0},         # too shaky
        {"file_path": "d", "motion_score": 5.0, "text_score": 0.5},  # texty
    ]
    kept = filter_manifest(entries)
    assert [e["file_path"] for e in kept] == ["a"]


def test_run_preprocessing_end_to_end(tmp_path):
    vdir = tmp_path / "videos"
    vdir.mkdir()
    _write_video(str(vdir / "clip.mp4"), [(120, "moving")])
    out = run_preprocessing(str(vdir), str(tmp_path / "out"),
                            caption_fn=lambda p: "a white square moves",
                            min_motion=0.01)
    data = json.load(open(out))
    assert len(data) >= 1
    assert data[0]["text"] == "a white square moves"
    assert os.path.exists(data[0]["file_path"])

def test_run_preprocessing_videoclip_filter(tmp_path):
    """Stage-2b text-video alignment filter drops low-scoring clips and
    records the score (compute_video_quality.py parity)."""
    vdir = tmp_path / "videos"
    vdir.mkdir()
    _write_video(str(vdir / "clip.mp4"), [(120, "moving")])

    def scorer(paths, texts):
        assert len(paths) == len(texts) and texts[0]
        return [0.9] * len(paths)

    out = run_preprocessing(str(vdir), str(tmp_path / "out"),
                            caption_fn=lambda p: "a white square moves",
                            videoclip_score_fn=scorer, min_motion=0.01)
    data = json.load(open(out))
    assert data and all(e["videoclipxl_score"] == 0.9 for e in data)

    out = run_preprocessing(str(vdir), str(tmp_path / "out2"),
                            caption_fn=lambda p: "a white square moves",
                            videoclip_score_fn=lambda p, t: [0.0] * len(p),
                            min_motion=0.01)
    assert json.load(open(out)) == []


def test_caption_rewrite_extraction_and_manifest():
    from easyanimate_tpu.video_caption.recaption import (
        beautiful_prompt,
        extract_output,
        filter_meta_train,
        rewrite_manifest,
    )

    ok = '{"rewritten description": "A vivid scene."}'
    assert extract_output(ok) == "A vivid scene."
    assert extract_output("not json") is None
    assert extract_output('{"wrong key": "x"}') is None
    assert extract_output('{"rewritten description": unquoted}') is None

    llm = lambda p: '{"rewritten description": "REWRITTEN"}'
    out = rewrite_manifest([{"text": "a cat"}], llm)
    assert out[0]["text"] == "REWRITTEN"
    bad_llm = lambda p: "garbage"
    out = rewrite_manifest([{"text": "a cat"}], bad_llm)
    assert out[0]["text"] == "a cat"   # failure keeps the original

    bp = lambda p: '{"detailed prompt": "A cinematic shot."}'
    assert beautiful_prompt("cat", bp) == "A cinematic shot."

    entries = [
        {"motion_score": 5.0, "semantic_consistency": 0.9},
        {"motion_score": 0.5},                       # too static
        {"motion_score": 5.0, "text_score": 0.5},    # too much text
        {"aesthetic_score": 2.0},                    # ugly
    ]
    kept = filter_meta_train(entries)
    assert len(kept) == 1 and kept[0]["motion_score"] == 5.0


def _tiny_clip_model():
    from transformers import CLIPConfig, FlaxCLIPModel

    cfg = CLIPConfig(
        text_config={"vocab_size": 49408, "hidden_size": 16,
                     "num_hidden_layers": 1, "num_attention_heads": 2,
                     "intermediate_size": 32, "projection_dim": 8},
        vision_config={"hidden_size": 16, "num_hidden_layers": 1,
                       "num_attention_heads": 2, "intermediate_size": 32,
                       "image_size": 32, "patch_size": 16,
                       "projection_dim": 8},
        projection_dim=8)
    return FlaxCLIPModel(cfg, seed=0)


def test_semantic_consistency_with_flax_clip(tmp_path):
    """CLIP keyframe cosine similarity on the in-repo Flax tower
    (compute_semantic_consistency.py parity): a static clip scores higher
    than a hard-cut color-flip clip."""
    from easyanimate_tpu.video_caption.filters import (
        clip_image_embed_fn, compute_semantic_consistency)

    static = str(tmp_path / "static.mp4")
    _write_video(static, [(16, 120)])
    cuts = str(tmp_path / "cuts.mp4")
    _write_video(cuts, [(4, 0), (4, 250), (4, 10), (4, 200)])

    embed = clip_image_embed_fn(model=_tiny_clip_model())
    s_static = compute_semantic_consistency(static, embed, num_keyframes=4)
    s_cuts = compute_semantic_consistency(cuts, embed, num_keyframes=4)
    assert -1.0 <= s_cuts <= 1.0 and -1.0 <= s_static <= 1.0001
    assert s_static > s_cuts


def test_aesthetic_score_fn_runs(tmp_path):
    import numpy as np

    from easyanimate_tpu.video_caption.filters import aesthetic_score_fn

    path = str(tmp_path / "v.mp4")
    _write_video(path, [(8, "moving")])
    head = {"w0": np.zeros((8, 4), np.float32) + 0.1,
            "b0": np.zeros((4,), np.float32),
            "w1": np.zeros((4, 1), np.float32) + 0.2,
            "b1": np.ones((1,), np.float32)}
    score = aesthetic_score_fn(model=_tiny_clip_model(), head_params=head)
    v = score(path)
    assert np.isfinite(v)


def test_default_text_boxes_detects_captions():
    """Weight-free OCR default (compute_text_score.py parity without
    easyocr): caption-covered frames score text area, clean frames zero."""
    import cv2

    from easyanimate_tpu.video_caption.filters import default_text_boxes

    plain = np.full((240, 320, 3), 128, np.uint8)
    noise = np.random.default_rng(0).integers(
        100, 156, (240, 320, 3)).astype(np.uint8)
    text = plain.copy()
    for i, line in enumerate(["HELLO WORLD 123", "EASYANIMATE TPU",
                              "SOME CAPTION TEXT"]):
        cv2.putText(text, line, (10, 60 + 60 * i),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.9, (255, 255, 255), 2)

    def frac(f):
        area = f.shape[0] * f.shape[1]
        boxes = default_text_boxes(f)
        return sum((x1 - x0) * (y1 - y0) for x0, y0, x1, y1 in boxes) / area

    assert frac(plain) == 0.0
    assert frac(noise) == 0.0
    assert frac(text) > 0.05


def test_compute_text_score_uses_default_detector(tmp_path):
    """compute_text_score runs end-to-end on an mp4 with no easyocr."""
    import cv2

    from easyanimate_tpu.video_caption.filters import compute_text_score

    path = str(tmp_path / "t.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8, (320, 240))
    for _ in range(8):
        f = np.full((240, 320, 3), 128, np.uint8)
        cv2.putText(f, "BREAKING NEWS TONIGHT", (10, 120),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        wr.write(f)
    wr.release()
    score = compute_text_score(path)
    assert score > 0.01


def test_text_score_side_by_side_overlay_vs_clean(tmp_path):
    """The side-by-side the cv2-vs-CRAFT gap note in filters.py cites: on
    the filter's ACTUAL decision (drop clips with burned-in overlay text,
    keep clean footage at the reference's 0.02 area threshold,
    filter_meta_train.py), the weight-free detector separates the two
    classes with margin — the overlay clip scores above the threshold,
    realistic clean content (gradients, blobs, moving texture) scores
    below it."""
    import cv2

    from easyanimate_tpu.video_caption.filters import compute_text_score

    rng = np.random.default_rng(3)

    def write(path, overlay):
        wr = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                             8, (320, 240))
        for t in range(8):
            # clean "footage": smooth gradient + soft moving blobs
            yy, xx = np.mgrid[0:240, 0:320].astype(np.float32)
            f = (80 + 60 * np.sin(xx / 64 + t / 3) * np.cos(yy / 48))
            f = cv2.GaussianBlur(f.astype(np.uint8), (31, 31), 0)
            f = np.stack([f] * 3, -1)
            for cx, cy in [(80 + 10 * t, 60), (200, 150 - 5 * t)]:
                cv2.circle(f, (cx, cy), 40, (150, 120, 90), -1)
            f = cv2.GaussianBlur(f, (15, 15), 0)
            if overlay:
                cv2.putText(f, "SUBSCRIBE NOW", (30, 220),
                            cv2.FONT_HERSHEY_SIMPLEX, 1.0,
                            (255, 255, 255), 2)
                cv2.putText(f, "LIVE | CHANNEL 5 NEWS", (30, 30),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.7,
                            (255, 255, 0), 2)
            wr.write(f.astype(np.uint8))
        wr.release()

    write(tmp_path / "overlay.mp4", True)
    write(tmp_path / "clean.mp4", False)
    s_text = compute_text_score(str(tmp_path / "overlay.mp4"))
    s_clean = compute_text_score(str(tmp_path / "clean.mp4"))
    threshold = 0.02  # the reference pipeline's filter value
    assert s_text > threshold, s_text
    assert s_clean < threshold, s_clean
    assert s_text > 3 * max(s_clean, 1e-6)


def test_openai_compatible_vlm_recaption_end_to_end(tmp_path):
    """Recorded-fixture test (VERDICT r3 #10): a local stdlib HTTP server
    mimics an OpenAI-compatible multimodal /chat/completions endpoint;
    recaption_videos runs end to end through openai_compatible_vlm_fn with
    a real tiny mp4, and the request protocol is asserted (data-URL
    image_url parts + text prompt, bearer auth)."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import cv2
    import numpy as np

    from easyanimate_tpu.video_caption.recaption import (
        openai_compatible_llm_fn, openai_compatible_vlm_fn,
        recaption_videos)

    recorded = {}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(n))
            recorded["path"] = self.path
            recorded["auth"] = self.headers.get("Authorization")
            recorded["body"] = req
            content = req["messages"][0]["content"]
            if isinstance(content, list):  # multimodal
                n_img = sum(1 for p in content if p["type"] == "image_url")
                text = f"A tiny synthetic clip ({n_img} frames seen)."
            else:
                text = '{"detailed prompt": "expanded"}'
            resp = json.dumps({"choices": [{"message": {
                "role": "assistant", "content": text}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_port}/v1"
    try:
        vid = tmp_path / "clip.mp4"
        vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"),
                             8, (48, 48))
        for i in range(8):
            vw.write(np.full((48, 48, 3), i * 20, np.uint8))
        vw.release()

        vlm = openai_compatible_vlm_fn(base, api_key="k", model="internvl2",
                                       num_frames=4)
        out = recaption_videos([{"file_path": str(vid), "text": "old"}], vlm)
        assert out[0]["text"].startswith("A tiny synthetic clip")
        assert recorded["path"].endswith("/chat/completions")
        assert recorded["auth"] == "Bearer k"
        parts = recorded["body"]["messages"][0]["content"]
        imgs = [p for p in parts if p["type"] == "image_url"]
        assert len(imgs) == 4
        assert imgs[0]["image_url"]["url"].startswith(
            "data:image/jpeg;base64,")
        assert parts[-1]["type"] == "text"
        assert recorded["body"]["model"] == "internvl2"

        # the text llm_fn rides the same server (beautiful_prompt backend)
        llm = openai_compatible_llm_fn(base, api_key="k")
        from easyanimate_tpu.video_caption.recaption import beautiful_prompt
        assert beautiful_prompt("a cat", llm) == "expanded"
    finally:
        srv.shutdown()


def test_openai_compatible_vlm_full_schema_and_error_paths(tmp_path):
    """Pins the FULL request/response contract of openai_compatible_vlm_fn
    beyond the happy path (VERDICT r4 #9): every image part carries a
    decodable JPEG (magic bytes + cv2 round trip at the source frame size),
    max_tokens rides in the body, and server-side failures (HTTP 500,
    non-JSON body, missing choices) surface as exceptions from vlm_fn that
    recaption_videos absorbs, keeping the original caption."""
    import base64
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    import cv2
    import numpy as np

    from easyanimate_tpu.video_caption.recaption import (
        openai_compatible_vlm_fn, recaption_videos)

    recorded = {}
    mode = {"value": "ok"}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            recorded["body"] = json.loads(self.rfile.read(n))
            if mode["value"] == "http500":
                self.send_error(500, "boom")
                return
            if mode["value"] == "not_json":
                resp = b"<html>gateway error</html>"
            elif mode["value"] == "no_choices":
                resp = json.dumps({"error": "overloaded"}).encode()
            else:
                resp = json.dumps({"choices": [{"message": {
                    "role": "assistant", "content": " fresh caption "}}],
                    "usage": {"total_tokens": 10}}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(resp)))
            self.end_headers()
            self.wfile.write(resp)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        vid = tmp_path / "clip.mp4"
        vw = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"),
                             8, (64, 48))
        for i in range(8):
            f = np.zeros((48, 64, 3), np.uint8)
            f[:, : (i + 1) * 8] = 255
            vw.write(f)
        vw.release()

        vlm = openai_compatible_vlm_fn(
            f"http://127.0.0.1:{srv.server_port}/v1", num_frames=3,
            max_tokens=77, jpeg_quality=90)
        assert vlm(str(vid)) == "fresh caption"  # .strip() applied
        body = recorded["body"]
        assert body["max_tokens"] == 77
        parts = body["messages"][0]["content"]
        assert [p["type"] for p in parts] == ["image_url"] * 3 + ["text"]
        for p in parts[:-1]:
            url = p["image_url"]["url"]
            prefix = "data:image/jpeg;base64,"
            assert url.startswith(prefix)
            raw = base64.b64decode(url[len(prefix):], validate=True)
            assert raw[:2] == b"\xff\xd8"  # JPEG SOI marker
            img = cv2.imdecode(np.frombuffer(raw, np.uint8),
                               cv2.IMREAD_COLOR)
            assert img.shape == (48, 64, 3)

        # failure modes: vlm_fn raises; recaption_videos keeps the original
        for bad in ("http500", "not_json", "no_choices"):
            mode["value"] = bad
            import pytest
            with pytest.raises(Exception):
                vlm(str(vid))
            out = recaption_videos(
                [{"file_path": str(vid), "text": "orig"}], vlm)
            assert out[0]["text"] == "orig"
    finally:
        srv.shutdown()


def _tiny_qwen2vl():
    """Tiny random-weight Qwen2-VL: byte-alphabet BPE tokenizer + 28x28
    vision grid + 2-layer LM. Exercises the REAL transformers
    vision-conditioned generate path local_hf_vlm_fn drives."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, decoders, models, pre_tokenizers
    from transformers import (Qwen2TokenizerFast, Qwen2VLConfig,
                              Qwen2VLForConditionalGeneration,
                              Qwen2VLImageProcessor)
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    alphabet = list(bytes_to_unicode().values())
    raw = Tokenizer(models.BPE(vocab={c: i for i, c in enumerate(alphabet)},
                               merges=[]))
    raw.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    raw.decoder = decoders.ByteLevel()
    tok = Qwen2TokenizerFast(tokenizer_object=raw)
    specials = ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                "<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
                "<|video_pad|>"]
    tok.add_special_tokens({"additional_special_tokens": specials,
                            "eos_token": "<|im_end|>",
                            "pad_token": "<|endoftext|>"})
    ids = {s: tok.convert_tokens_to_ids(s) for s in specials}
    ip = Qwen2VLImageProcessor(min_pixels=28 * 28, max_pixels=28 * 28)
    cfg = Qwen2VLConfig(
        vocab_size=len(tok), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512,
        rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]},
        image_token_id=ids["<|image_pad|>"],
        video_token_id=ids["<|video_pad|>"],
        vision_start_token_id=ids["<|vision_start|>"],
        vision_end_token_id=ids["<|vision_end|>"],
        bos_token_id=ids["<|endoftext|>"], eos_token_id=ids["<|im_end|>"],
        vision_config=dict(depth=2, embed_dim=32, hidden_size=32,
                           num_heads=4, in_chans=3, spatial_merge_size=2,
                           patch_size=14, temporal_patch_size=2,
                           mlp_ratio=2))
    torch.manual_seed(0)
    model = Qwen2VLForConditionalGeneration(cfg).eval()
    return model, tok, ip


def test_local_hf_vlm_recaption_in_process(tmp_path):
    """In-process VLM recaption (internvl2_video_recaptioning.py class):
    frames -> vision tower -> autoregressive caption, no server. The tiny
    random model's caption is gibberish but must be a deterministic
    non-special-token string threaded into the manifest."""
    from easyanimate_tpu.video_caption.recaption import (local_hf_vlm_fn,
                                                         recaption_videos)

    vid = str(tmp_path / "v.mp4")
    _write_video(vid, [(12, "moving")], size=32)
    model, tok, ip = _tiny_qwen2vl()
    vlm = local_hf_vlm_fn(model, tok, ip, num_frames=4, max_new_tokens=6)
    cap1, cap2 = vlm(vid), vlm(vid)
    assert isinstance(cap1, str) and cap1 == cap2  # greedy => deterministic
    assert "<|" not in cap1                        # specials stripped
    out = recaption_videos([{"file_path": vid, "text": "orig"},
                            {"file_path": str(tmp_path / "missing.mp4"),
                             "text": "keep"}], vlm)
    assert out[0]["text"] == cap1
    assert out[1]["text"] == "keep"  # failed entries keep original
