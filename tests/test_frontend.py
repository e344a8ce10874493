"""Front-end layer tests: media IO, HTTP API protocol, long-video windowing."""
import dataclasses
import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from easyanimate_tpu.api.server import (
    EasyAnimateAPIServer,
    encode_video_b64,
    infer_forward,
)
from easyanimate_tpu.models.mmdit import PRESETS, EasyAnimateTransformer3D
from easyanimate_tpu.models.vae import AutoencoderKLMagvit, MagvitVAEConfig
from easyanimate_tpu.pipeline import EasyAnimateInpaintPipeline
from easyanimate_tpu.ui.controller import EasyAnimateController, generate_long_video
from easyanimate_tpu.utils.media import (
    get_image_to_video_latent,
    save_videos_grid,
)

TINY_VAE = MagvitVAEConfig(
    latent_channels=4,
    block_out_channels=(8, 16),
    down_block_types=("SpatialTemporalDownBlock3D", "SpatialDownBlock3D"),
    up_block_types=("SpatialTemporalUpBlock3D", "SpatialUpBlock3D"),
    layers_per_block=1,
    norm_num_groups=4,
    mini_batch_encoder=2,
    mini_batch_decoder=1,
    scaling_factor=0.5,
)


def _tiny_inpaint_pipe():
    cfg = dataclasses.replace(PRESETS["tiny"], in_channels=9, out_channels=4)
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    lat = jnp.zeros((1, 4, 2, 16, 16))
    inp = jnp.zeros((1, 5, 2, 16, 16))
    txt = jnp.zeros((1, 6, cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None, inpaint_latents=inp)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    return EasyAnimateInpaintPipeline(
        transformer=transformer, vae=vae, transformer_params=tp,
        vae_params=vp), cfg


def test_save_videos_grid_mp4_and_gif(tmp_path, rng):
    video = rng.random((1, 3, 4, 16, 16)).astype(np.float32)
    save_videos_grid(video, str(tmp_path / "out.gif"), fps=4)
    save_videos_grid(video, str(tmp_path / "out.mp4"), fps=4)
    assert (tmp_path / "out.gif").stat().st_size > 0
    assert (tmp_path / "out.mp4").stat().st_size > 0


def test_get_image_to_video_latent(rng):
    start = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
    video, mask = get_image_to_video_latent(start, None, 5, (16, 16))
    assert video.shape == (1, 3, 5, 16, 16)
    assert mask[0, 0, 0].max() == 0.0 and mask[0, 0, 1].min() == 1.0


class _FakeController:
    def generate(self, **kw):
        self.last = kw
        t = kw["video_length"]
        return np.zeros((1, 3, t, kw["height"], kw["width"]), np.float32)


def test_infer_forward_protocol():
    ctl = _FakeController()
    out = infer_forward(ctl, {"prompt_textbox": "a cat", "length_slider": 5,
                              "width_slider": 32, "height_slider": 32})
    assert out["message"] == "Success"
    assert len(out["base64_encoding"]) > 0
    assert ctl.last["prompt"] == "a cat"


def test_long_video_generation_method(rng):
    """generation_method='Long Video Generation' dispatches the controller
    to the sliding-window path (reference ui.py:449,822): length_slider is
    the TOTAL length, partial/overlap arrive as request fields."""
    pipe, cfg = _tiny_inpaint_pipe()

    def encode_text(prompts):
        return {"text": jnp.ones((len(prompts), 6, cfg.text_embed_dim),
                                 jnp.float32) * 0.01}

    ctl = EasyAnimateController(pipeline=pipe, encode_text=encode_text)
    out = infer_forward(ctl, {
        "prompt_textbox": "a cat", "length_slider": 8, "width_slider": 16,
        "height_slider": 16, "sample_step_slider": 2, "cfg_scale_slider": 2.0,
        "generation_method": "Long Video Generation",
        "partial_video_length": 5, "overlap_video_length": 2})
    assert out["message"] == "Success"
    assert len(out["base64_encoding"]) > 0
    # V2V + long video is refused like the reference (ui.py:487)
    with pytest.raises(ValueError, match="Long Video"):
        ctl.generate(prompt="x", video_length=8, width=16, height=16,
                     sample_steps=2, cfg_scale=2.0,
                     generation_method="Long Video Generation",
                     source_video=np.zeros((1, 3, 5, 16, 16), np.float32))


def test_long_video_validation_and_end_image(rng):
    """Bad overlap values (from untrusted HTTP fields) raise instead of
    looping forever; end_image conditions the final window (ref
    ui.py:505-507)."""
    pipe, cfg = _tiny_inpaint_pipe()
    pos = jnp.asarray(
        rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    # 3 passes the range check but violates partial >= 2*overlap (the raw
    # chunk tail used for next-window conditioning must lie outside the
    # blended head region, ADVICE r4)
    for bad in (5, 6, -1, 3):
        with pytest.raises(ValueError, match="overlap"):
            generate_long_video(pipe, pos, neg, total_length=20,
                                partial_video_length=5,
                                overlap_video_length=bad,
                                height=16, width=16, num_inference_steps=2,
                                guidance_scale=2.0)
    end = np.random.RandomState(0).rand(3, 16, 16).astype(np.float32)
    out = generate_long_video(pipe, pos, neg, total_length=8,
                              partial_video_length=5, overlap_video_length=2,
                              height=16, width=16, num_inference_steps=2,
                              guidance_scale=2.0, end_image=end)
    assert out.shape == (1, 3, 8, 16, 16) and np.isfinite(out).all()


def test_load_and_resize_float_input():
    """[0,1] float arrays (decode_image_b64 output) must not be truncated
    to a black frame by a uint8 cast."""
    from easyanimate_tpu.utils.media import _load_and_resize

    img = np.full((20, 20, 3), 0.5, np.float32)
    out = _load_and_resize(img, (16, 16))
    assert out.shape == (16, 16, 3)
    assert abs(float(out.mean()) - 0.5) < 0.01
    # uint8 input unchanged
    out8 = _load_and_resize((img * 255).astype(np.uint8), (16, 16))
    assert abs(float(out8.mean()) - 0.5) < 0.01


def test_http_server_roundtrip():
    ctl = _FakeController()
    srv = EasyAnimateAPIServer(ctl)
    srv.serve(port=8765, background=True)
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:8765/easyanimate/infer_forward",
            data=json.dumps({"prompt_textbox": "x", "length_slider": 5,
                             "width_slider": 32, "height_slider": 32}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            body = json.loads(r.read())
        assert body["message"] == "Success"
    finally:
        srv.shutdown()


def test_generate_long_video(rng):
    pipe, cfg = _tiny_inpaint_pipe()
    pos = jnp.asarray(rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    out = generate_long_video(
        pipe, pos, neg, total_length=8, partial_video_length=5,
        overlap_video_length=2, height=16, width=16,
        num_inference_steps=2, guidance_scale=2.0)
    assert out.shape == (1, 3, 8, 16, 16)
    assert np.isfinite(out).all()


def test_generate_long_video_zero_overlap(rng):
    """overlap_video_length=0 abuts windows without blending (ADVICE r4:
    the deferred blend loop used to TypeError on w_new=None with >=2
    chunks)."""
    pipe, cfg = _tiny_inpaint_pipe()
    pos = jnp.asarray(
        rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    out = generate_long_video(
        pipe, pos, neg, total_length=10, partial_video_length=5,
        overlap_video_length=0, height=16, width=16,
        num_inference_steps=2, guidance_scale=2.0)
    assert out.shape == (1, 3, 10, 16, 16)
    assert np.isfinite(out).all()


def test_long_video_start_image_first_window_only():
    """start_image conditions frame 0 of the FIRST window only. With
    overlap_video_length=0 last_tail stays None every iteration, and an
    unguarded `elif start_image` branch used to hard-condition the start
    image into frame 0 of EVERY window (i.e. the middle of the video)."""
    masks = []

    class _FakePipe:
        def __call__(self, pos, neg, *, video, mask_video, height, width,
                     video_length, rng=None, **kw):
            masks.append(np.asarray(mask_video))
            return np.zeros((1, 3, video_length, height, width), np.float32)

    pos = np.zeros((1, 4, 8), np.float32)
    start = np.full((3, 8, 8), 0.7, np.float32)
    generate_long_video(
        _FakePipe(), pos, pos, total_length=13, partial_video_length=5,
        overlap_video_length=0, height=8, width=8,
        num_inference_steps=2, guidance_scale=2.0, start_image=start)
    assert len(masks) >= 2
    assert masks[0][0, 0, 0].min() == 0.0      # first window: conditioned
    for m in masks[1:]:                        # later windows: unconditioned
        assert m.min() == 1.0


def test_post_infer_client_roundtrip(tmp_path):
    from easyanimate_tpu.api.client import post_infer

    ctl = _FakeController()
    srv = EasyAnimateAPIServer(ctl)
    srv.serve(port=8766, background=True)
    try:
        out = post_infer("http://127.0.0.1:8766", prompt="hi", length=5,
                         width=32, height=32,
                         save_path=str(tmp_path / "out.mp4"))
        assert out["message"] == "Success"
        assert (tmp_path / "out.mp4").stat().st_size > 0
    finally:
        srv.shutdown()


def test_prompt_through_server_with_text_encoder():
    """End-to-end: POST a *prompt* (not embeds) -> encoder -> pipeline ->
    base64 video (VERDICT: serving must encode prompts internally)."""
    pipe, cfg = _tiny_inpaint_pipe()

    def encode_text(prompts):
        # deterministic fake encoder with the loader's dict interface
        return {"text": jnp.ones((len(prompts), 6, cfg.text_embed_dim),
                                 jnp.float32) * 0.01}

    ctl = EasyAnimateController(pipeline=pipe, encode_text=encode_text)
    server = EasyAnimateAPIServer(ctl)
    server.serve(port=7912, background=True)
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:7912/easyanimate/infer_forward",
            data=json.dumps({
                "prompt_textbox": "a cat walks on the grass",
                "length_slider": 5, "width_slider": 32, "height_slider": 32,
                "sample_step_slider": 2, "cfg_scale_slider": 1.0,
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert out["message"] == "Success", out
        assert len(out["base64_encoding"]) > 0
    finally:
        server.shutdown()


def test_sampler_switch_not_sticky(rng):
    """A request naming a sampler must not leak it into the next request:
    omitting sampler_dropdown restores the model-default scheduler (the
    reference dropdown sends a value every request, so its scheduler is
    rebuilt per request)."""
    from easyanimate_tpu.pipeline.schedulers import (
        EulerAncestralConfig,
        FlowMatchEulerConfig,
    )

    pipe, cfg = _tiny_inpaint_pipe()

    def encode_text(prompts):
        return {"text": jnp.ones((len(prompts), 6, cfg.text_embed_dim),
                                 jnp.float32) * 0.01}

    ctl = EasyAnimateController(pipeline=pipe, encode_text=encode_text)
    default = pipe.scheduler
    assert isinstance(default, FlowMatchEulerConfig)
    kw = dict(prompt="a cat", sample_steps=2, width=32, height=32,
              video_length=5, cfg_scale=1.0)
    ctl.generate(**kw, sampler="Euler A")
    assert isinstance(ctl.pipeline.scheduler, EulerAncestralConfig)
    ctl.generate(**kw)  # no sampler -> model default, not Euler A
    assert ctl.pipeline.scheduler is default


def test_web_ui_served_and_lora_endpoint():
    """GET / returns the browser app; POST /update_lora hits the controller."""

    class Ctl(_FakeController):
        def update_lora(self, path, scale):
            self.lora = (path, scale)

    ctl = Ctl()
    srv = EasyAnimateAPIServer(ctl)
    srv.serve(port=8767, background=True)
    try:
        with urllib.request.urlopen("http://127.0.0.1:8767/", timeout=30) as r:
            page = r.read().decode()
            assert r.headers["Content-Type"].startswith("text/html")
        # the app drives the same endpoints as post_infer
        for needle in ("infer_forward", "update_diffusion_transformer",
                       "update_edition", "update_lora", "prompt_textbox",
                       "base64_encoding"):
            assert needle in page, needle
        req = urllib.request.Request(
            "http://127.0.0.1:8767/easyanimate/update_lora",
            data=json.dumps({"lora_model_path": "/x.safetensors",
                             "lora_alpha_slider": 0.55}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert json.loads(r.read())["message"] == "Success"
        assert ctl.lora == ("/x.safetensors", 0.55)
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen("http://127.0.0.1:8767/nope", timeout=30)
        assert ei.value.code == 404
    finally:
        srv.shutdown()


def test_update_edition_switches_config():
    pipe, _ = _tiny_inpaint_pipe()
    ctl = EasyAnimateController(pipeline=pipe)
    cfg = ctl.update_edition("EasyAnimateV5.1")
    assert ctl.edition == "v5.1"
    assert isinstance(cfg, dict) and cfg
    cfg4 = ctl.update_edition("v4")
    assert ctl.edition == "v4"
    assert cfg4 != cfg
    with pytest.raises(ValueError):
        ctl.update_edition("v99")


def test_color_transfer_post_process(tmp_path):
    """color_transfer matches frame color statistics to frame 0 (reference
    utils.py:49-73 save_videos_grid color_transfer_post_process)."""
    import numpy as np

    from easyanimate_tpu.utils.media import color_transfer, save_videos_grid

    rng = np.random.RandomState(0)
    ref = rng.randint(0, 255, (16, 16, 3), np.uint8)
    # src: same content, globally brightened -> transfer restores stats
    src = np.clip(ref.astype(np.int32) + 60, 0, 255).astype(np.uint8)
    out = color_transfer(src, ref)
    assert out.shape == ref.shape and out.dtype == np.uint8
    assert abs(out.astype(float).mean() - ref.astype(float).mean()) < 6.0

    video = rng.rand(1, 3, 4, 16, 16).astype(np.float32)
    p = tmp_path / "v.gif"
    save_videos_grid(video, str(p), color_transfer_post_process=True)
    assert p.exists()


def test_controller_update_lora_safetensors(tmp_path, rng):
    """The controller's kohya-checkpoint branch (reference ui.py
    update_lora_model -> merge_lora on a .safetensors file): merging a
    reference-format LoRA changes generation, clearing restores it."""
    from easyanimate_tpu.models.convert import save_lora_reference
    from easyanimate_tpu.pipeline import EasyAnimatePipeline
    from easyanimate_tpu.training.lora import LoRAConfig, lora_init

    cfg = dataclasses.replace(PRESETS["tiny"], in_channels=4, out_channels=4)
    transformer = EasyAnimateTransformer3D(cfg)
    vae = AutoencoderKLMagvit(TINY_VAE)
    lat = jnp.zeros((1, 4, 2, 16, 16))
    txt = jnp.zeros((1, 6, cfg.text_embed_dim))
    tp = transformer.init(jax.random.PRNGKey(0), lat, jnp.array([1.0]), txt,
                          None)
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 8, 8, 3)))
    pipe = EasyAnimatePipeline(transformer=transformer, vae=vae,
                               transformer_params=tp, vae_params=vp)
    ctl = EasyAnimateController(pipeline=pipe)

    pos = jnp.asarray(
        rng.standard_normal((1, 6, cfg.text_embed_dim)).astype(np.float32))
    neg = jnp.zeros_like(pos)
    kw = dict(height=16, width=16, video_length=5, num_inference_steps=2,
              guidance_scale=2.0, output_type="latent")
    base = np.asarray(ctl.pipeline(pos, neg, rng=jax.random.PRNGKey(7), **kw))

    lcfg = LoRAConfig(rank=2)
    lora = lora_init(tp["params"], lcfg, jax.random.PRNGKey(2))
    lora = jax.tree.map(lambda x: jnp.asarray(
        rng.standard_normal(x.shape).astype(np.float32) * 0.2), lora)
    path = str(tmp_path / "lora_diffusion_pytorch_model.safetensors")
    save_lora_reference(path, jax.device_get(lora), lcfg.alpha, cfg)

    ctl.update_lora(path, scale=1.0)
    assert ctl.lora_cfg.rank == 2
    with_lora = np.asarray(
        ctl.pipeline(pos, neg, rng=jax.random.PRNGKey(7), **kw))
    assert np.abs(with_lora - base).max() > 1e-3

    ctl.update_lora(None)
    restored = np.asarray(
        ctl.pipeline(pos, neg, rng=jax.random.PRNGKey(7), **kw))
    np.testing.assert_allclose(restored, base, atol=1e-5)


def test_long_video_decode_overlaps_next_denoise(rng):
    """Pipelining guard (VERDICT r3 #5): generate_long_video must DISPATCH
    chunk i+1 before it fetches (np.asarray) chunk i's decoded frames, so
    on an async backend the device->host transfer + host blend of chunk i
    run under chunk i+1's denoise. Pinned by recording the dispatch/fetch
    order with a fake pipeline whose outputs log their materialization."""
    events = []

    class _LazyChunk:
        """Stands in for the pipeline's async device array."""

        def __init__(self, tag, arr):
            self.tag, self.arr = tag, arr
            self.shape = arr.shape

        def __getitem__(self, idx):   # device-side tail slice: NOT a fetch
            return _LazyChunk(self.tag + "/slice", np.asarray(self.arr[idx]))

        def __array__(self, dtype=None, copy=None):
            events.append(("fetch", self.tag))
            return self.arr.astype(dtype) if dtype else self.arr

    class _FakePipe:
        def __init__(self):
            self.calls = 0

        def __call__(self, pos, neg, *, video, mask_video, height, width,
                     video_length, rng=None, **kw):
            self.calls += 1
            events.append(("dispatch", f"chunk{self.calls}"))
            out = np.full((1, 3, video_length, height, width),
                          0.1 * self.calls, np.float32)
            return _LazyChunk(f"chunk{self.calls}", out)

    pos = np.zeros((1, 4, 8), np.float32)
    out = generate_long_video(
        _FakePipe(), pos, pos, total_length=11, partial_video_length=5,
        overlap_video_length=2, height=8, width=8,
        num_inference_steps=2, guidance_scale=2.0)
    assert out.shape == (1, 3, 11, 8, 8)
    # at least 3 chunks; every fetch of chunk i happens after chunk i+1's
    # dispatch (except the final chunk, which has nothing to overlap)
    dispatches = [e for e in events if e[0] == "dispatch"]
    assert len(dispatches) >= 3
    for i in range(1, len(dispatches)):
        d_next = events.index(("dispatch", f"chunk{i + 1}"))
        f_prev = events.index(("fetch", f"chunk{i}"))
        assert d_next < f_prev, (
            f"chunk{i} was fetched before chunk{i+1} was dispatched: "
            f"{events}")
    # blending math unchanged: overlap regions are linear mixes
    assert np.isfinite(out).all()


# -- hosted deployment variants (reference ui.py modelscope :1019-1410 /
# EAS :1771-1840) ------------------------------------------------------------

def test_hosted_controller_locks_and_caps(tmp_path):
    from easyanimate_tpu.ui.hosted import HostedController, LockedError

    inner = _FakeController()
    inner.update_lora = lambda path, scale=1.0: setattr(
        inner, "lora", (path, scale))
    host = HostedController(inner, personalized_model_dir=str(tmp_path),
                            max_height=64, max_width=64,
                            max_video_length=9, max_steps=10)
    with pytest.raises(LockedError):
        host.update_diffusion_transformer("/anything")
    with pytest.raises(LockedError):
        host.update_edition("v5.1")
    # LoRA: only names inside the personalized dir resolve; traversal and
    # unknown names are refused
    (tmp_path / "style.safetensors").write_bytes(b"x")
    assert host.refresh_personalized_models() == ["style.safetensors"]
    with pytest.raises(LockedError):
        host.update_lora("/etc/../evil.safetensors")
    host.update_lora("style.safetensors", 0.5)
    assert inner.lora == (str(tmp_path / "style.safetensors"), 0.5)
    # generation guard: resolution/length hard-refused, steps clamped
    with pytest.raises(ValueError):
        host.generate(height=128, width=64, video_length=5)
    with pytest.raises(ValueError):
        host.generate(height=64, width=64, video_length=13)
    out = host.generate(height=64, width=64, video_length=5,
                        sample_steps=99)
    assert out.shape == (1, 3, 5, 64, 64)
    assert inner.last["sample_steps"] == 10


def test_remote_controller_against_live_server():
    """EAS-variant thin client: generate() round-trips through a real local
    HTTP server (same protocol as the remote TPU host) and decodes the
    base64 mp4 back to frames; management ops forward too."""
    from easyanimate_tpu.ui.hosted import RemoteController

    class Ctl(_FakeController):
        def update_edition(self, edition, model_path=None):
            self.edition = edition

    ctl = Ctl()
    srv = EasyAnimateAPIServer(ctl)
    srv.serve(port=8767, background=True)
    try:
        remote = RemoteController("http://127.0.0.1:8767")
        video = remote.generate(prompt="a dog", height=32, width=32,
                                video_length=5, sample_steps=3,
                                start_image=np.full((32, 32, 3), 0.5,
                                                    np.float32))
        assert video.shape[:3] == (1, 3, 5) and video.shape[3:] == (32, 32)
        assert 0.0 <= float(video.min()) and float(video.max()) <= 1.0
        assert ctl.last["prompt"] == "a dog"
        assert ctl.last["start_image"].shape == (32, 32, 3)
        remote.update_edition("v4")
        assert ctl.edition == "v4"
        with pytest.raises(RuntimeError):
            remote.update_lora("missing.safetensors")  # _FakeController: no op
    finally:
        srv.shutdown()


def test_yuv420_fetch_serving_path():
    """The API server engages the halved device->host 4:2:0 fetch by
    default on controllers that implement it (controller fetch_yuv420 ->
    pipeline decode_latents_yuv420 -> host yuv420_to_rgb before the mp4
    encoder). Checks the plane shapes, reconstruction closeness to the
    full-RGB path at the same seed (luma exact up to rounding/clipping;
    chroma up to 2x2 subsampling), the protocol-level default-on/opt-out,
    and that stub controllers without the capability take the RGB path."""
    from easyanimate_tpu.utils.media import YUV420Video, yuv420_to_rgb

    pipe, cfg = _tiny_inpaint_pipe()

    def encode_text(prompts):
        return {"text": jnp.ones((len(prompts), 6, cfg.text_embed_dim),
                                 jnp.float32) * 0.01}

    ctl = EasyAnimateController(pipeline=pipe, encode_text=encode_text)
    kw = dict(prompt="a cat", sample_steps=2, width=32, height=32,
              video_length=5, cfg_scale=1.0, seed=7)
    out = ctl.generate(**kw, fetch_yuv420=True)
    assert isinstance(out, YUV420Video)
    assert out.y.shape == (1, 5, 32, 32) and out.y.dtype == np.uint8
    assert out.u.shape == out.v.shape == (1, 5, 16, 16)

    rgb_ref = np.asarray(ctl.generate(**kw))  # same seed, full-RGB path
    rec = yuv420_to_rgb(out.y, out.u, out.v).astype(np.float32) / 255.0
    assert rec.shape == rgb_ref.shape == (1, 3, 5, 32, 32)
    # luma survives the round trip almost exactly (the y plane is full
    # resolution; error = uint8 rounding + clipping of chroma overshoot)
    def luma(x):
        return 0.299 * x[:, 0] + 0.587 * x[:, 1] + 0.114 * x[:, 2]
    assert np.mean(np.abs(luma(rec) - luma(rgb_ref))) < 0.02
    # the fetched planes ARE the NumPy re-derivation of the RGB-path output
    # (same decode, BT.601 + 2x2 box chroma in float, then quantize) up to
    # float/uint8 rounding — i.e. the ONLY loss vs the RGB path is the
    # 4:2:0 subsample the delivered mp4 applies anyway
    r, g, b = rgb_ref[:, 0], rgb_ref[:, 1], rgb_ref[:, 2]
    ny = 0.299 * r + 0.587 * g + 0.114 * b
    nu = -0.168736 * r - 0.331264 * g + 0.5 * b + 0.5
    nv = 0.5 * r - 0.418688 * g - 0.081312 * b + 0.5
    sub = lambda p: 0.25 * (p[..., 0::2, 0::2] + p[..., 1::2, 0::2]
                            + p[..., 0::2, 1::2] + p[..., 1::2, 1::2])
    to8 = lambda p: np.round(np.clip(p, 0, 1) * 255.0)
    assert np.max(np.abs(to8(ny) - out.y.astype(np.float64))) <= 1
    assert np.max(np.abs(to8(sub(nu)) - out.u.astype(np.float64))) <= 1
    assert np.max(np.abs(to8(sub(nv)) - out.v.astype(np.float64))) <= 1

    # protocol layer: default-on for capable controllers, opt-out honored
    payload = {"prompt_textbox": "a cat", "length_slider": 5,
               "width_slider": 32, "height_slider": 32,
               "sample_step_slider": 2, "cfg_scale_slider": 1.0,
               "seed_textbox": 7}
    r_yuv = infer_forward(ctl, dict(payload))
    r_rgb = infer_forward(ctl, dict(payload, yuv420_fetch=False))
    assert r_yuv["message"] == r_rgb["message"] == "Success"
    assert len(r_yuv["base64_encoding"]) > 0

    # stub controller without the capability: no fetch_yuv420 kwarg leaks
    fake = _FakeController()
    assert infer_forward(fake, dict(payload))["message"] == "Success"
    assert "fetch_yuv420" not in fake.last
