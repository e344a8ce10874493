"""HTTP inference API.

Parity target: easyanimate/api/api.py -- POST endpoints
  /easyanimate/infer_forward             (:86-176) generate video from json
  /easyanimate/update_diffusion_transformer  (:60-84) hot-swap checkpoint
  /easyanimate/update_edition            switch model generation
payloads/returns use base64-encoded media like the reference's post_infer.py.

fastapi isn't available in this image, so the server is a dependency-free
stdlib ThreadingHTTPServer speaking the same JSON protocol; the heavy work
is delegated to a controller object (ui.controller.EasyAnimateController or
any object with the same generate()/update_* methods).
"""
import base64
import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def encode_video_b64(video: np.ndarray, fps: int = 8,
                     color_transfer_post_process: bool = False) -> str:
    """(C,T,H,W) [0,1] -> base64 mp4 bytes (cv2 encoder; no ffmpeg here)."""
    import tempfile

    from ..utils.media import save_videos_grid

    with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
        save_videos_grid(
            np.asarray(video)[None], f.name, fps=fps,
            color_transfer_post_process=color_transfer_post_process)
        f.seek(0)
        return base64.b64encode(f.read()).decode()


def decode_image_b64(data: str) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(data))).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


def infer_forward(controller, payload: dict) -> dict:
    """Shared request handler (used by both the HTTP server and tests)."""
    kwargs = dict(
        prompt=payload.get("prompt_textbox", payload.get("prompt", "")),
        negative_prompt=payload.get("negative_prompt_textbox", ""),
        sample_steps=int(payload.get("sample_step_slider", 25)),
        width=int(payload.get("width_slider", 672)),
        height=int(payload.get("height_slider", 384)),
        video_length=int(payload.get("length_slider", 49)),
        cfg_scale=float(payload.get("cfg_scale_slider", 6.0)),
        seed=int(payload.get("seed_textbox", 43)),
        generation_method=payload.get("generation_method", "Video Generation"),
    )
    if payload.get("partial_video_length"):
        # Long Video Generation sliders (reference ui.py:823-827)
        kwargs["partial_video_length"] = int(payload["partial_video_length"])
        kwargs["overlap_video_length"] = int(
            payload.get("overlap_video_length", 4))
    if payload.get("sampler_dropdown"):
        kwargs["sampler"] = payload["sampler_dropdown"]
    if payload.get("denoise_strength") is not None:
        kwargs["denoise_strength"] = float(payload["denoise_strength"])
    if payload.get("enable_teacache"):
        thr = payload.get("teacache_threshold")
        kwargs["teacache_threshold"] = float(thr) if thr is not None else 0.1
    if payload.get("cfg_skip_ratio"):
        # run the last ratio of the steps cond-only (VideoX-Fun's knob)
        kwargs["cfg_skip_ratio"] = float(payload["cfg_skip_ratio"])
    if payload.get("start_image"):
        kwargs["start_image"] = decode_image_b64(payload["start_image"])
    if payload.get("end_image"):
        kwargs["end_image"] = decode_image_b64(payload["end_image"])
    if (payload.get("yuv420_fetch", True)
            and getattr(controller, "supports_yuv420_fetch", False)):
        # default-on when the controller implements it: the video comes
        # back as device-subsampled BT.601 4:2:0 planes (half the
        # device->host bytes — the dominant decode-side cost on tunneled
        # chips) and RGB is reconstructed host-side below, feeding an mp4
        # encoder that is 4:2:0 anyway. `"yuv420_fetch": false` opts a
        # request back into the full-RGB fetch. Long-video / stub / remote
        # controllers simply return RGB and take the plain path.
        kwargs["fetch_yuv420"] = True
    video = controller.generate(**kwargs)
    from ..utils.media import YUV420Video, yuv420_to_rgb

    if isinstance(video, YUV420Video):
        video = yuv420_to_rgb(video.y, video.u, video.v
                              ).astype(np.float32) / 255.0
    return {
        "message": "Success",
        "base64_encoding": encode_video_b64(
            np.asarray(video)[0],
            # pin per-frame color stats to frame 0 on export (reference
            # utils.py:49-62 save_videos_grid flag) -- useful for long
            # sliding-window generations that drift in tone
            color_transfer_post_process=bool(
                payload.get("color_transfer_post_process"))),
    }


class _Handler(BaseHTTPRequestHandler):
    controller = None

    def log_message(self, *a):
        pass

    def _reply(self, code: int, obj: dict):
        body = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        """Serve the browser front end (ui/web.py) at /."""
        if self.path in ("/", "/index.html"):
            from ..ui.web import INDEX_HTML

            body = INDEX_HTML.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._reply(404, {"message": f"unknown path {self.path}"})

    def do_POST(self):
        try:
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n) or b"{}")
            if self.path == "/easyanimate/infer_forward":
                self._reply(200, infer_forward(self.controller, payload))
            elif self.path == "/easyanimate/update_diffusion_transformer":
                self.controller.update_diffusion_transformer(
                    payload["diffusion_transformer_path"])
                self._reply(200, {"message": "Success"})
            elif self.path == "/easyanimate/update_edition":
                self.controller.update_edition(payload["edition"])
                self._reply(200, {"message": "Success"})
            elif self.path == "/easyanimate/update_lora":
                self.controller.update_lora(
                    payload.get("lora_model_path"),
                    float(payload.get("lora_alpha_slider", 1.0)))
                self._reply(200, {"message": "Success"})
            else:
                self._reply(404, {"message": f"unknown path {self.path}"})
        except Exception as e:  # noqa: BLE001 - report to client
            self._reply(500, {"message": f"{type(e).__name__}: {e}"})


class EasyAnimateAPIServer:
    """`EasyAnimateAPIServer(controller).serve(port)`; thread-safe."""

    def __init__(self, controller):
        handler = type("BoundHandler", (_Handler,), {"controller": controller})
        self._handler = handler
        self._server: Optional[ThreadingHTTPServer] = None

    def serve(self, port: int = 7860, background: bool = False):
        self._server = ThreadingHTTPServer(("0.0.0.0", port), self._handler)
        if background:
            t = threading.Thread(target=self._server.serve_forever, daemon=True)
            t.start()
            return t
        self._server.serve_forever()

    def shutdown(self):
        if self._server:
            self._server.shutdown()
