"""Generation controller + sliding-window long video.

Parity target: easyanimate/ui/ui.py EasyAnimateController --
  generate() dispatch over T2V / I2V / V2V (:368-680)
  model / LoRA hot-swapping (:106-366)
  sliding-window long video: generate `partial_video_length` frames, blend
  `overlap_video_length` overlap linearly, feed the tail frames as the next
  chunk's start condition (:485-546).
The gradio front-end is optional (not present in this image); the controller
is UI-agnostic and also backs the HTTP API (api/server.py).
"""
import dataclasses
import threading
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..pipeline import EasyAnimateInpaintPipeline, EasyAnimatePipeline
from ..training.lora import LoRAConfig, load_lora, merge_lora, unmerge_lora
from ..utils.media import get_image_to_video_latent


@dataclasses.dataclass
class EasyAnimateController:
    pipeline: EasyAnimatePipeline
    # text -> (embeds, mask); plug a Qwen2TextEncoder closure or leave None
    # to accept precomputed embeddings
    encode_text: Optional[Callable] = None
    # reference controller flags (ui.py:69,99-100): TeaCache applied to
    # every generate() when enabled
    enable_teacache: bool = False
    teacache_threshold: float = 0.1
    lora_cfg: Optional[LoRAConfig] = None
    _lora_merged: bool = dataclasses.field(default=False, init=False)
    _lora: Optional[dict] = dataclasses.field(default=None, init=False)
    #: the model's own scheduler, captured before any runtime sampler
    #: switch so a request without a sampler gets the model default (the
    #: switch must not leak across requests)
    _default_scheduler: Optional[object] = dataclasses.field(
        default=None, init=False)
    #: generate() serializes: the API server is threaded, but requests
    #: mutate pipeline.scheduler and share one accelerator (two concurrent
    #: device programs would also break the single-chip TPU runtime)
    _gen_lock: object = dataclasses.field(
        default_factory=threading.Lock, init=False)

    #: the API server checks this before passing fetch_yuv420=True (plain
    #: class attribute, not a dataclass field); stub/remote controllers
    #: without it get the RGB path
    supports_yuv420_fetch = True

    # -- model management ---------------------------------------------------

    def update_diffusion_transformer(self, path: str):
        """Hot-swap the checkpoint, preserving the live pipeline's serving
        mode (W8A8 int8 linears survive the swap)."""
        from ..loader import load_pipeline

        tcfg = getattr(self.pipeline.transformer, "cfg", None)
        quant = getattr(tcfg, "linear_quant", None)
        # fp8 storage is a property of the loaded params, not the config —
        # detect it so an fp8-served 12B does not come back as bf16 (2x
        # resident memory) after a swap
        fp8 = any(
            getattr(leaf, "dtype", None) == jnp.float8_e4m3fn
            for leaf in jax.tree.leaves(self.pipeline.transformer_params))
        new = load_pipeline(
            path,
            pipeline_type="inpaint"
            if isinstance(self.pipeline, EasyAnimateInpaintPipeline)
            else "t2v",
            fp8_weights=fp8,
            int8_linears=quant == "int8",
            int4_weights=quant in ("int4", "w4a8"),
            # W4A16 ("int4") must not silently become W4A8 across a swap
            int4_compute="bf16" if quant == "int4" else "int8")
        self.pipeline = new
        self._default_scheduler = None  # new pipeline, new default

    #: edition name -> config yaml (reference ui.py update_edition table)
    EDITION_CONFIGS = {
        "v1": "config/easyanimate_video_v1_motion_module.yaml",
        "v2": "config/easyanimate_video_v2_magvit_motion_module.yaml",
        "v3": "config/easyanimate_video_v3_slicevae_motion_module.yaml",
        "v4": "config/easyanimate_video_v4_slicevae_multi_text_encoder.yaml",
        "v5": "config/easyanimate_video_v5_magvit_multi_text_encoder.yaml",
        "v5.1": "config/easyanimate_video_v5.1_magvit_qwen.yaml",
    }

    def update_edition(self, edition: str, model_path: Optional[str] = None):
        """Switch editions (reference ui.py:137-178): load the edition's
        yaml config, and when a checkpoint directory is given rebuild the
        pipeline from it. Returns the edition config dict so a front end can
        sync its widgets (resolution choices etc.)."""
        import os

        from ..utils.config import load_yaml_config

        key = edition.lower().replace("easyanimate", "").strip("-_ ")
        if key not in self.EDITION_CONFIGS:
            raise ValueError(
                f"unknown edition {edition!r}; one of "
                f"{sorted(self.EDITION_CONFIGS)}")
        cfg_path = self.EDITION_CONFIGS[key]
        root = os.path.join(os.path.dirname(__file__), "..", "..")
        cfg = load_yaml_config(os.path.join(root, cfg_path)
                               if not os.path.isabs(cfg_path) else cfg_path)
        self.edition = key
        self.edition_config = cfg
        if model_path:
            self.update_diffusion_transformer(model_path)
        return cfg

    def update_lora(self, path: Optional[str], scale: float = 1.0):
        """Merge (or clear) a LoRA into the live transformer params."""
        if self._lora_merged:
            self.pipeline.transformer_params = {
                "params": unmerge_lora(
                    self.pipeline.transformer_params["params"], self._lora,
                    self.lora_cfg)}
            self._lora_merged = False
        if path:
            if path.endswith(".safetensors"):
                # reference-ecosystem (kohya) LoRA checkpoint, as the
                # reference ui loads via merge_lora (ui.py update_lora_model)
                from ..models.convert import (convert_lora_state_dict,
                                              load_safetensors)

                self._lora, self.lora_cfg = convert_lora_state_dict(
                    load_safetensors(path), self.pipeline.transformer.cfg)
            else:
                self._lora, self.lora_cfg = load_lora(path)
            self.pipeline.transformer_params = {
                "params": merge_lora(
                    self.pipeline.transformer_params["params"], self._lora,
                    self.lora_cfg, scale=scale)}
            self._lora_merged = True

    # -- generation -----------------------------------------------------------

    def _embeds(self, prompt, negative_prompt, batch=1):
        """Returns (pos, neg, extra_kwargs). encode_text may be a
        loader.load_text_encoders callable (prompts -> dict with "text" and
        optionally "text_t5") or a legacy (prompt) -> (embeds, mask) pair."""
        if self.encode_text is None:
            raise ValueError("no text encoder attached; pass prompt embeds "
                             "to the pipeline directly")
        pos = self.encode_text([prompt])
        neg = self.encode_text([negative_prompt or ""])
        if isinstance(pos, dict):
            extra = {}
            if pos.get("text_t5") is not None:
                extra = {"prompt_embeds_t5": pos["text_t5"],
                         "negative_prompt_embeds_t5": neg["text_t5"]}
            return pos["text"], neg["text"], extra
        if isinstance(pos, tuple):  # legacy (embeds, mask)
            return pos[0], neg[0], {}
        return pos, neg, {}

    def generate(self, *args, **kwargs) -> np.ndarray:
        """Serialized entry point: the API server is threaded, but requests
        mutate pipeline.scheduler and share one accelerator, so generations
        run one at a time."""
        with self._gen_lock:
            return self._generate(*args, **kwargs)

    def _generate(
        self,
        prompt: str = "",
        negative_prompt: str = "",
        sample_steps: int = 25,
        width: int = 672,
        height: int = 384,
        video_length: int = 49,
        cfg_scale: float = 6.0,
        seed: int = 43,
        generation_method: str = "Video Generation",
        start_image: Optional[np.ndarray] = None,
        end_image: Optional[np.ndarray] = None,
        source_video: Optional[np.ndarray] = None,
        denoise_strength: float = 0.7,
        sampler: Optional[str] = None,
        fetch_yuv420: bool = False,
        **kw,
    ) -> np.ndarray:
        if self._default_scheduler is None:
            self._default_scheduler = self.pipeline.scheduler
        if sampler:
            # runtime sampler switch (reference ui.py:472: the dropdown
            # rebuilds the scheduler from the model scheduler's config).
            # Per-request, from the model default — a request that omits
            # the sampler must not inherit the previous request's choice.
            from ..pipeline.schedulers import make_scheduler

            self.pipeline.scheduler = make_scheduler(
                sampler, base=self._default_scheduler)
        else:
            self.pipeline.scheduler = self._default_scheduler
        pos, neg, extra = self._embeds(prompt, negative_prompt)
        kw = {**extra, **kw}
        if self.enable_teacache:
            kw.setdefault("teacache_threshold", self.teacache_threshold)
        rng = jax.random.PRNGKey(seed)
        if generation_method == "Image Generation":
            video_length = 1
        elif generation_method == "Long Video Generation":
            # sliding-window ultra-long video (reference ui.py:449,485-546;
            # video_length is the TOTAL length). V2V does not support it
            # there either (ui.py:487).
            if source_video is not None:
                raise ValueError(
                    "Video to Video does not support Long Video Generation")
            assert isinstance(self.pipeline, EasyAnimateInpaintPipeline), \
                "Long Video Generation needs an inpaint pipeline"
            from ..utils.media import _load_and_resize

            def frame(img):
                # one scale convention for every image input (path / PIL /
                # uint8 / [0,1] float): (H, W, 3) [0,1] -> (3, H, W)
                if img is None:
                    return None
                return _load_and_resize(
                    img, (height, width)).transpose(2, 0, 1)

            return generate_long_video(
                self.pipeline, pos, neg, total_length=video_length,
                partial_video_length=int(kw.pop("partial_video_length", 49)),
                overlap_video_length=int(kw.pop("overlap_video_length", 4)),
                height=height, width=width, start_image=frame(start_image),
                end_image=frame(end_image), rng=rng,
                num_inference_steps=sample_steps, guidance_scale=cfg_scale,
                **kw)
        kw.pop("partial_video_length", None)
        kw.pop("overlap_video_length", None)
        # device-subsampled 4:2:0 fetch (pipeline decode_latents_yuv420):
        # halves the device->host bytes, lossless in the delivered 4:2:0
        # mp4. Engaged by the API server by default; needs even spatial
        # dims (always true for the /8-multiple generation sizes)
        use_yuv = fetch_yuv420 and height % 2 == 0 and width % 2 == 0

        def run_pipe(**pkw):
            if not use_yuv:
                return self.pipeline(**pkw)
            latents = self.pipeline(**pkw, decode=False,
                                    output_type="latent")
            from ..utils.media import YUV420Video

            return YUV420Video(*self.pipeline.decode_latents_yuv420(latents))

        if start_image is None and source_video is None:
            return run_pipe(
                prompt_embeds=pos, negative_prompt_embeds=neg,
                height=height, width=width,
                video_length=video_length, num_inference_steps=sample_steps,
                guidance_scale=cfg_scale, rng=rng, **kw)
        assert isinstance(self.pipeline, EasyAnimateInpaintPipeline), \
            "image/video conditioning needs an inpaint pipeline"
        if source_video is not None:
            video = jnp.asarray(source_video)
            mask = jnp.ones((1, 1, video.shape[2], height, width))
            strength = denoise_strength
        else:
            v, m = get_image_to_video_latent(
                start_image, end_image, video_length, (height, width))
            video, mask, strength = jnp.asarray(v), jnp.asarray(m), 1.0
        return run_pipe(
            prompt_embeds=pos, negative_prompt_embeds=neg,
            video=video, mask_video=mask, strength=strength,
            height=height, width=width, video_length=video_length,
            num_inference_steps=sample_steps, guidance_scale=cfg_scale,
            rng=rng, **kw)




def generate_long_video(
    pipeline: EasyAnimateInpaintPipeline,
    prompt_embeds,
    negative_prompt_embeds,
    *,
    total_length: int,
    partial_video_length: int = 49,
    overlap_video_length: int = 4,
    height: int = 384,
    width: int = 672,
    start_image: Optional[np.ndarray] = None,
    end_image: Optional[np.ndarray] = None,
    rng: Optional[jax.Array] = None,
    **pipe_kw,
) -> np.ndarray:
    """Sliding-window long-video generation with linear overlap blending
    (reference ui.py:485-546). start_image/end_image are (3, H, W) [0, 1]
    frames conditioning the first / final window (ref ui.py:505-507).
    Returns (1, C, total, H, W) in [0, 1]."""
    # these can arrive from untrusted HTTP fields: a bad overlap would
    # otherwise loop forever (windows that never add net frames) or crash
    # the blend
    norm_partial = ((max(partial_video_length - 1, 1)) // 4) * 4 + 1
    if total_length < 1:
        raise ValueError(f"total_length must be >= 1, got {total_length}")
    if not 0 <= overlap_video_length < norm_partial:
        raise ValueError(
            f"need 0 <= overlap_video_length < partial_video_length "
            f"(4k+1-normalized {norm_partial}), got {overlap_video_length}")
    if overlap_video_length and norm_partial < 2 * overlap_video_length:
        # guarantees every NON-final chunk spans >= 2*overlap frames, so its
        # raw tail (used to condition the next window) is disjoint from the
        # blended head region — the invariant the deferred host blend below
        # relies on (ADVICE r4). Only the final chunk may be shorter, and
        # its tail is never reused.
        raise ValueError(
            f"need partial_video_length >= 2*overlap_video_length for "
            f"sliding-window generation (got {norm_partial} < "
            f"{2 * overlap_video_length})")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # Decode-off-the-critical-path pipelining: each chunk is requested with
    # output_type="device" so the pipeline's decode stays an ASYNC device
    # value; the next chunk's conditioning tail is built from that device
    # array directly (a device-side slice — no host round trip), and the
    # expensive np.asarray (device->host transfer of the full decoded
    # chunk, ~150 MB at 49x384x672) + host blending of chunk i run only
    # AFTER chunk i+1's denoise has been dispatched. On an async backend
    # the fetch and blend of chunk i thus overlap chunk i+1's compute.
    # (tests/test_controller.py pins the dispatch-before-fetch ordering.)
    init_frames = 0
    last_tail = None        # device array (1, 3, overlap, H, W) or None
    pending = None          # device array: latest chunk, not yet fetched
    host_chunks = []        # fetched + blended numpy prefix
    pipe_kw = dict(pipe_kw)
    pipe_kw.setdefault("output_type", "device")
    while init_frames < total_length:
        remaining = total_length - init_frames
        if init_frames > 0:
            remaining += overlap_video_length  # regenerate the blend region
        this_len = min(partial_video_length, remaining)
        this_len = ((max(this_len - 1, 0)) // 4) * 4 + 1  # 4k+1 constraint
        if init_frames > 0 and this_len <= overlap_video_length:
            break  # tail window would add no net frames (< 4 left over)
        if this_len <= 1 and init_frames > 0:
            break
        video = jnp.zeros((1, 3, this_len, height, width), jnp.float32)
        mask = np.ones((1, 1, this_len, height, width), np.float32)
        if last_tail is not None:
            n = last_tail.shape[2]
            video = video.at[:, :, :n].set(last_tail)
            mask[:, :, :n] = 0.0
        elif start_image is not None and init_frames == 0:
            # first window only: with overlap_video_length=0 last_tail stays
            # None on every iteration, and without the init_frames guard the
            # start image would be hard-conditioned into frame 0 of EVERY
            # window (i.e. into the middle of the output)
            video = video.at[0, :, 0].set(jnp.asarray(start_image))
            mask[:, :, 0] = 0.0
        if end_image is not None:
            # condition the window that covers the final output frame
            start_pos = (0 if init_frames == 0
                         else init_frames - overlap_video_length)
            idx = total_length - 1 - start_pos
            if 0 <= idx < this_len:
                video = video.at[0, :, idx].set(jnp.asarray(end_image))
                mask[:, :, idx] = 0.0
        rng, sub = jax.random.split(rng)
        sample = pipeline(
            prompt_embeds, negative_prompt_embeds,
            video=video, mask_video=jnp.asarray(mask),
            height=height, width=width, video_length=this_len,
            rng=sub, **pipe_kw)
        # the conditioning tail for the NEXT window is a device-side slice;
        # blended output tails equal the raw chunk tail (the blend only
        # touches the first `overlap` frames of a chunk)
        last_tail = sample[:, :, -overlap_video_length:] \
            if overlap_video_length else None
        if pending is not None:
            host_chunks.append(np.asarray(pending))  # overlaps `sample`
        pending = sample
        new_frames = (this_len if init_frames == 0
                      else this_len - overlap_video_length)
        init_frames += new_frames
    if pending is not None:
        host_chunks.append(np.asarray(pending))

    out = host_chunks[0]
    n = overlap_video_length
    w_new = np.linspace(0, 1, n).reshape(1, 1, n, 1, 1) if n else None
    for chunk in host_chunks[1:]:
        if n == 0:  # no overlap requested: windows are simply abutted
            out = np.concatenate([out, chunk], axis=2)
            continue
        blended = out[:, :, -n:] * (1 - w_new) + chunk[:, :, :n] * w_new
        out = np.concatenate([out[:, :, :-n], blended, chunk[:, :, n:]],
                             axis=2)
    return out[:, :, :total_length]
