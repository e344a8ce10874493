"""ComfyUI node wrappers (reference comfyui/comfyui_nodes.py parity).

Thin adapters over the TPU pipelines: loader nodes build pipelines from
model directories, sampler nodes call them per generation mode, and the
LoRA node hot-merges factors. ComfyUI is not installed in this image; the
module degrades to a clear error outside a ComfyUI runtime while the
NODE_CLASS_MAPPINGS stay importable for registry checks.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


class LoadEasyAnimateTPUModel:
    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("EASYANIMATE_TPU_PIPE",)
    FUNCTION = "load"

    #: serving mode -> load_pipeline kwargs (the reference node's
    #: GPU_memory_mode analog: precision/quantization of the resident model)
    SERVING_MODES = {
        "bf16": {},
        "fp8": {"fp8_weights": True},
        "int8": {"int8_linears": True},
        "fp8+int8": {"fp8_weights": True, "int8_linears": True},
        "int4_w4a8": {"int4_weights": True, "int4_compute": "int8"},
        "int4_w4a16": {"int4_weights": True, "int4_compute": "bf16"},
    }

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_path": ("STRING", {"default": ""}),
            "pipeline_type": (["t2v", "inpaint", "control"],),
            "serving_mode": (list(cls.SERVING_MODES), {"default": "fp8"}),
        }}

    def load(self, model_path, pipeline_type, serving_mode):
        from easyanimate_tpu.loader import load_pipeline

        return (load_pipeline(model_path, pipeline_type,
                              **self.SERVING_MODES[serving_mode]),)


class LoadEasyAnimateTPULora:
    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("EASYANIMATE_TPU_PIPE",)
    FUNCTION = "apply"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "pipe": ("EASYANIMATE_TPU_PIPE",),
            "lora_path": ("STRING", {"default": ""}),
            "strength": ("FLOAT", {"default": 1.0}),
        }}

    def apply(self, pipe, lora_path, strength):
        from easyanimate_tpu.training.lora import load_lora, merge_lora

        lora, cfg = load_lora(lora_path)
        pipe.transformer_params = {"params": merge_lora(
            pipe.transformer_params["params"], lora, cfg, scale=strength)}
        return (pipe,)


class EasyAnimateTPUSampler:
    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "sample"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "pipe": ("EASYANIMATE_TPU_PIPE",),
            "prompt_embeds": ("CONDITIONING",),
            "negative_embeds": ("CONDITIONING",),
            "width": ("INT", {"default": 672}),
            "height": ("INT", {"default": 384}),
            "video_length": ("INT", {"default": 49}),
            "steps": ("INT", {"default": 50}),
            "cfg": ("FLOAT", {"default": 6.0}),
            "seed": ("INT", {"default": 43}),
            "scheduler": (["Flow", "Euler", "Euler A", "DPM++", "PNDM",
                           "DDIM"], {"default": "Flow"}),
            "teacache_threshold": ("FLOAT", {"default": 0.0}),
            "cfg_skip_ratio": ("FLOAT", {"default": 0.0}),
        }}

    def sample(self, pipe, prompt_embeds, negative_embeds, width, height,
               video_length, steps, cfg, seed, scheduler="Flow",
               teacache_threshold=0.0, cfg_skip_ratio=0.0):
        import jax

        from easyanimate_tpu.pipeline import make_scheduler

        # per-call scheduler selection (reference comfyui_nodes.py:443,478),
        # always rebuilt from the MODEL's scheduler so switching away from
        # Flow and back does not lose shift/use_dynamic_shifting config
        default = getattr(pipe, "_default_scheduler", None)
        if default is None:
            default = pipe.scheduler
            pipe._default_scheduler = default
        pipe.scheduler = make_scheduler(scheduler, base=default)
        video = pipe(
            prompt_embeds, negative_embeds, height=height, width=width,
            video_length=video_length, num_inference_steps=steps,
            guidance_scale=cfg, rng=jax.random.PRNGKey(seed),
            teacache_threshold=teacache_threshold or None,
            cfg_skip_ratio=cfg_skip_ratio or None)
        # ComfyUI IMAGE: (T, H, W, C) float in [0, 1]
        return (np.transpose(np.asarray(video)[0], (1, 2, 3, 0)),)


NODE_CLASS_MAPPINGS = {
    "LoadEasyAnimateTPUModel": LoadEasyAnimateTPUModel,
    "LoadEasyAnimateTPULora": LoadEasyAnimateTPULora,
    "EasyAnimateTPUSampler": EasyAnimateTPUSampler,
}
NODE_DISPLAY_NAME_MAPPINGS = {
    "LoadEasyAnimateTPUModel": "Load EasyAnimate-TPU Model",
    "LoadEasyAnimateTPULora": "Load EasyAnimate-TPU LoRA",
    "EasyAnimateTPUSampler": "EasyAnimate-TPU Sampler",
}


class EasyAnimateTPUTextBox:
    """Prompt passthrough (reference TextBox, comfyui_nodes.py:368-400)."""

    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("STRING_PROMPT",)
    FUNCTION = "process"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"prompt": ("STRING", {"multiline": True})}}

    def process(self, prompt):
        return (prompt,)


class CreateTrajectoryTPU:
    """Track-point coordinates -> gaussian trajectory control video
    (comfyui_nodes.py:1078-1135)."""

    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("IMAGE",)
    FUNCTION = "createtrajectory"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"coordinates": ("STRING", {"forceInput": True}),
                             "masks": ("MASK", {"forceInput": True})}}

    def createtrajectory(self, coordinates, masks):
        import json

        from camera_utils import trajectory_images

        if isinstance(coordinates, str):
            coordinates = [coordinates]
        coords_list = [
            [(c["x"], c["y"]) for c in json.loads(cs.replace("'", '"'))]
            for cs in coordinates]
        _, h, w = np.asarray(masks).shape
        return (trajectory_images(coords_list, h, w),)


class CameraBasicTPU:
    """Preset camera motion -> trajectory (comfyui_nodes.py:1164-1196)."""

    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("CameraPose",)
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        from camera_utils import CAMERA

        motions = [k for k in CAMERA if not k.startswith("base_")]
        return {"required": {"camera_pose": (motions,),
                             "speed": ("FLOAT", {"default": 1.0}),
                             "video_length": ("INT", {"default": 16})}}

    def run(self, camera_pose, speed, video_length):
        from camera_utils import CAMERA, get_camera_motion

        p = CAMERA[camera_pose]
        return (get_camera_motion(p["angle"], p["T"], speed, video_length),)


class CameraJoinTPU:
    """Concatenate two trajectories (comfyui_nodes.py:1225-1244)."""

    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("CameraPose",)
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"camera_pose1": ("CameraPose",),
                             "camera_pose2": ("CameraPose",)}}

    def run(self, camera_pose1, camera_pose2):
        from camera_utils import combine_camera_motion

        return (combine_camera_motion(camera_pose1, camera_pose2),)


class CameraCombineTPU:
    """Sum up to four preset motions into one trajectory
    (comfyui_nodes.py:1198-1223)."""

    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("CameraPose",)
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        from camera_utils import CAMERA

        motions = [k for k in CAMERA if not k.startswith("base_")]
        req = {f"camera_pose{i}": (motions,) for i in range(1, 5)}
        req.update({"speed": ("FLOAT", {"default": 1.0}),
                    "video_length": ("INT", {"default": 16})})
        return {"required": req}

    def run(self, camera_pose1, camera_pose2, camera_pose3, camera_pose4,
            speed, video_length):
        from camera_utils import CAMERA, get_camera_motion

        angle = np.sum([CAMERA[p]["angle"] for p in
                        (camera_pose1, camera_pose2, camera_pose3,
                         camera_pose4)], axis=0)
        T = np.sum([CAMERA[p]["T"] for p in
                    (camera_pose1, camera_pose2, camera_pose3,
                     camera_pose4)], axis=0)
        return (get_camera_motion(angle, T, speed, video_length),)


class CameraTrajectoryTPU:
    """[R|T] trajectory -> per-frame pose rows (RealEstate10K layout) ready
    for plucker_embedding (comfyui_nodes.py:1246-1264)."""

    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("STRING", "INT")
    FUNCTION = "run"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {"camera_pose": ("CameraPose",),
                             "fx": ("FLOAT", {"default": 0.474812}),
                             "fy": ("FLOAT", {"default": 0.844111}),
                             "cx": ("FLOAT", {"default": 0.5}),
                             "cy": ("FLOAT", {"default": 0.5})}}

    def run(self, camera_pose, fx, fy, cx, cy):
        import json

        traj = [[fx, fy, cx, cy, 0, 0] + pose.ravel().tolist()
                for pose in np.asarray(camera_pose)]
        return (json.dumps(traj), len(traj))


NODE_CLASS_MAPPINGS.update({
    "EasyAnimateTPUTextBox": EasyAnimateTPUTextBox,
    "CreateTrajectoryTPU": CreateTrajectoryTPU,
    "CameraBasicTPU": CameraBasicTPU,
    "CameraJoinTPU": CameraJoinTPU,
    "CameraCombineTPU": CameraCombineTPU,
    "CameraTrajectoryTPU": CameraTrajectoryTPU,
})
