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

import numpy as np


class LoadEasyAnimateTPUModel:
    CATEGORY = "EasyAnimateTPU"
    RETURN_TYPES = ("EASYANIMATE_TPU_PIPE",)
    FUNCTION = "load"

    @classmethod
    def INPUT_TYPES(cls):
        return {"required": {
            "model_path": ("STRING", {"default": ""}),
            "pipeline_type": (["t2v", "inpaint", "control"],),
            "fp8": ("BOOLEAN", {"default": True}),
        }}

    def load(self, model_path, pipeline_type, fp8):
        from easyanimate_tpu.loader import load_pipeline

        return (load_pipeline(model_path, pipeline_type, fp8_weights=fp8),)


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
            "teacache_threshold": ("FLOAT", {"default": 0.0}),
        }}

    def sample(self, pipe, prompt_embeds, negative_embeds, width, height,
               video_length, steps, cfg, seed, teacache_threshold):
        import jax

        video = pipe(
            prompt_embeds, negative_embeds, height=height, width=width,
            video_length=video_length, num_inference_steps=steps,
            guidance_scale=cfg, rng=jax.random.PRNGKey(seed),
            teacache_threshold=teacache_threshold or None)
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
