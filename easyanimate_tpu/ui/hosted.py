"""Hosted-deployment controller variants.

Parity target: easyanimate/ui/ui.py's platform deployments --
  EasyAnimateController_Modelscope (:1019-1410) / ui_modelscope (:1412):
    a fixed-model public demo: the served checkpoint/edition are chosen at
    launch and the switching dropdowns are locked (interactive=False);
    LoRAs come only from a local personalized-model directory; resolution
    and length choices are capped for shared-resource serving.
  EasyAnimateController_EAS (:1771-1840) / ui_eas (:1842):
    a thin client with NO local model: generate() POSTs the request to a
    remote serving endpoint (post_eas) and decodes the base64 result.

Both map onto the same controller interface the API server and browser UI
already speak (generate / update_diffusion_transformer / update_edition /
update_lora), so `EasyAnimateAPIServer(HostedController(...))` is the
modelscope-style deployment and `EasyAnimateAPIServer(RemoteController(...))`
is the EAS-style one (local UI, remote backend).
"""
import base64
import io
import json
import os
import tempfile
import urllib.request
from typing import Optional

import numpy as np


class LockedError(PermissionError):
    """Raised for management operations a hosted deployment disables."""


class HostedController:
    """Fixed-model hosted demo wrapper (modelscope-variant parity).

    Wraps a live EasyAnimateController and
      * refuses checkpoint / edition switching (the reference renders these
        dropdowns interactive=False with a single launch-time choice),
      * resolves LoRA names ONLY against `personalized_model_dir`
        (reference :1023-1026 refresh_personalized_model) -- arbitrary
        filesystem paths from the network are rejected,
      * clamps resolution / video length / steps to launch-time caps
        (hosted GPU/TPU-time guard; the reference caps the slider ranges).
    """

    def __init__(self, controller, personalized_model_dir: str = "models",
                 max_height: int = 768, max_width: int = 1344,
                 max_video_length: int = 49, max_steps: int = 50):
        self._inner = controller
        self.personalized_model_dir = personalized_model_dir
        self.max_height = max_height
        self.max_width = max_width
        self.max_video_length = max_video_length
        self.max_steps = max_steps

    @property
    def supports_yuv420_fetch(self) -> bool:
        """Delegated: the API server may use the halved 4:2:0 fetch iff the
        wrapped controller implements it."""
        return getattr(self._inner, "supports_yuv420_fetch", False)

    # -- locked management ops ---------------------------------------------

    def update_diffusion_transformer(self, path: str):
        raise LockedError(
            "checkpoint switching is disabled on this hosted deployment")

    def update_edition(self, edition: str, model_path: Optional[str] = None):
        raise LockedError(
            "edition switching is disabled on this hosted deployment")

    def refresh_personalized_models(self):
        """List the LoRA safetensors available to update_lora (reference
        refresh_personalized_model, ui.py:1030-1034)."""
        d = self.personalized_model_dir
        if not os.path.isdir(d):
            return []
        return sorted(f for f in os.listdir(d) if f.endswith(".safetensors"))

    def update_lora(self, path: Optional[str], scale: float = 1.0):
        if path:
            name = os.path.basename(path)  # no directory traversal
            if name not in self.refresh_personalized_models():
                raise LockedError(
                    f"unknown personalized model {name!r}; available: "
                    f"{self.refresh_personalized_models()}")
            path = os.path.join(self.personalized_model_dir, name)
        return self._inner.update_lora(path, scale)

    # -- guarded generation -------------------------------------------------

    def generate(self, **kwargs) -> np.ndarray:
        height = int(kwargs.get("height", 384))
        width = int(kwargs.get("width", 672))
        length = int(kwargs.get("video_length", 49))
        steps = int(kwargs.get("sample_steps", 25))
        if height > self.max_height or width > self.max_width:
            raise ValueError(
                f"resolution {width}x{height} exceeds this deployment's cap "
                f"{self.max_width}x{self.max_height}")
        if length > self.max_video_length:
            raise ValueError(
                f"video_length {length} exceeds cap {self.max_video_length}")
        kwargs["sample_steps"] = min(steps, self.max_steps)
        return self._inner.generate(**kwargs)


class RemoteController:
    """Thin-client controller forwarding to a remote serving endpoint
    (EAS-variant parity: ui.py post_eas/:1776-1840 -- no local model; the
    browser UI and API server run anywhere, generation happens on the
    remote TPU host speaking the same /easyanimate/infer_forward protocol).

    generate() returns the decoded video as (B, C, T, H, W) float [0, 1] so
    the local API server re-encodes it exactly like a local controller's
    output (the reference instead saves the base64 payload straight to
    disk; returning frames keeps the controller interface uniform).
    """

    def __init__(self, url: str, timeout: float = 3600.0):
        self.url = url.rstrip("/")
        self.timeout = timeout

    def _post(self, route: str, payload: dict) -> dict:
        req = urllib.request.Request(
            self.url + route, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                out = json.loads(r.read())
        except urllib.error.HTTPError as e:  # surface the server's message
            try:
                msg = json.loads(e.read()).get("message", str(e))
            except Exception:  # noqa: BLE001
                msg = str(e)
            raise RuntimeError(f"remote: {msg}") from e
        if out.get("message") not in (None, "Success"):
            raise RuntimeError(f"remote: {out['message']}")
        return out

    def update_diffusion_transformer(self, path: str):
        self._post("/easyanimate/update_diffusion_transformer",
                   {"diffusion_transformer_path": path})

    def update_edition(self, edition: str, model_path: Optional[str] = None):
        self._post("/easyanimate/update_edition", {"edition": edition})

    def update_lora(self, path: Optional[str], scale: float = 1.0):
        self._post("/easyanimate/update_lora",
                   {"lora_model_path": path, "lora_alpha_slider": scale})

    def generate(self, **kwargs) -> np.ndarray:
        payload = {
            "prompt_textbox": kwargs.get("prompt", ""),
            "negative_prompt_textbox": kwargs.get("negative_prompt", ""),
            "generation_method": kwargs.get("generation_method",
                                            "Video Generation"),
            "width_slider": kwargs.get("width", 672),
            "height_slider": kwargs.get("height", 384),
            "length_slider": kwargs.get("video_length", 49),
            "sample_step_slider": kwargs.get("sample_steps", 25),
            "cfg_scale_slider": kwargs.get("cfg_scale", 6.0),
            "seed_textbox": kwargs.get("seed", 43),
        }
        for opt in ("sampler", "denoise_strength", "cfg_skip_ratio",
                    "partial_video_length", "overlap_video_length",
                    "teacache_threshold"):
            if kwargs.get(opt) is not None:
                key = {"sampler": "sampler_dropdown"}.get(opt, opt)
                payload[key] = kwargs[opt]
        for img_key in ("start_image", "end_image"):
            img = kwargs.get(img_key)
            if img is not None:
                payload[img_key] = _encode_image_b64(np.asarray(img))
        out = self._post("/easyanimate/infer_forward", payload)
        return _decode_video_b64(out["base64_encoding"])


def _encode_image_b64(img: np.ndarray) -> str:
    """float [0,1] or uint8 (H,W,3) -> base64 png."""
    from PIL import Image

    if img.dtype != np.uint8:
        img = np.clip(np.asarray(img, np.float32) * 255.0, 0, 255
                      ).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _decode_video_b64(data: str) -> np.ndarray:
    """base64 mp4 -> (1, C, T, H, W) float [0, 1] (cv2 reader)."""
    import cv2

    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
        f.write(base64.b64decode(data))
        f.flush()
        cap = cv2.VideoCapture(f.name)
        frames = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
        cap.release()
    video = np.stack(frames).astype(np.float32) / 255.0  # (T, H, W, C)
    return np.transpose(video, (3, 0, 1, 2))[None]
