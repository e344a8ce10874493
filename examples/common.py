"""Shared CLI surface for the predict_* examples.

One definition of the serving-mode / sampler / export knobs every predict
script offers (the reference predict scripts share the same header block of
knobs: GPU_memory_mode, sampler_name, transformer_path, fps, ...).
"""
import argparse


def add_common_flags(ap: argparse.ArgumentParser) -> None:
    ap.add_argument("--fp8", action="store_true",
                    help="store transformer weights as fp8-e4m3")
    ap.add_argument("--int8", action="store_true",
                    help="W8A8 int8 block linears (1.5x MXU; ops/quant.py)")
    ap.add_argument("--int4", action="store_true",
                    help="packed int4 block linears (memory mode, ~6.7 GB "
                         "resident for the 12B; compute per --int4_compute)")
    ap.add_argument("--int4_compute", default="int8",
                    choices=["int8", "bf16"],
                    help="matmul path for --int4: int8 = W4A8 (default), "
                         "bf16 = W4A16 dequant")
    ap.add_argument("--teacache", type=float, default=None,
                    help="TeaCache rel-L1 threshold (e.g. 0.08)")
    ap.add_argument("--cfg_skip", type=float, default=None,
                    help="run the last RATIO of the steps cond-only "
                         "(deterministic ~ratio/2 denoise saving)")
    ap.add_argument("--sampler", default=None,
                    help="Flow | Euler | 'Euler A' | DPM++ | PNDM | DDIM "
                         "(reference sampler_dropdown)")
    ap.add_argument("--transformer_path", default=None,
                    help="safetensors overlay for the transformer "
                         "(reference predict scripts' transformer_path)")
    ap.add_argument("--vae_path", default=None,
                    help="safetensors overlay for the VAE")
    ap.add_argument("--fps", type=int, default=8)
    ap.add_argument("--color_transfer", action="store_true",
                    help="pin per-frame color stats to frame 0 on export "
                         "(reference save_videos_grid flag)")


def load_pipe_from_args(args, pipeline_type: str):
    """load_pipeline + optional runtime sampler switch, from common flags."""
    from easyanimate_tpu.loader import load_pipeline

    pipe = load_pipeline(args.model_path, pipeline_type,
                         fp8_weights=args.fp8, int8_linears=args.int8,
                         int4_weights=args.int4,
                         int4_compute=args.int4_compute,
                         transformer_path=args.transformer_path,
                         vae_path=args.vae_path)
    if args.sampler:
        from easyanimate_tpu.pipeline import make_scheduler

        pipe.scheduler = make_scheduler(args.sampler, base=pipe.scheduler)
    return pipe
