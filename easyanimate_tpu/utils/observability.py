"""Tracing, metrics, and failure-detection utilities.

The reference's observability is tqdm + Lightning CUDACallback (epoch time,
peak VRAM) + tensorboard grad-norm dumps (SURVEY.md §5.1/.5). TPU-native
equivalents:
  - profile_trace(): jax.profiler xplane capture around a block
  - StepTimer: per-step wall-clock + device-memory stats via
    jax.local_devices()[0].memory_stats()
  - MetricLogger: tensorboard scalars through tensorboardX/tf.summary when
    available, JSONL fallback otherwise (always works in this image)
  - grad_norm_report(): per-parameter gradient norms for abnormal-step
    debugging (train.py:2128-2137 parity)
"""
import contextlib
import json
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Capture a profiler trace (view with tensorboard or xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, int]:
    dev = jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        stats = {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", -1),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
    }


class StepTimer:
    """Rolling steps/sec + memory; CUDACallback-equivalent numbers."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        self._times.append(now)
        self._times = self._times[-self.window:]
        out = dict(device_memory_stats())
        if len(self._times) >= 2:
            dt = (self._times[-1] - self._times[0]) / (len(self._times) - 1)
            out["sec_per_step"] = dt
            out["steps_per_sec"] = 1.0 / dt
        return out


class MetricLogger:
    """Tensorboard when available, JSONL always."""

    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            try:
                import tensorflow as tf  # type: ignore

                self._tb = tf.summary.create_file_writer(logdir)
                self._tb_is_tf = True
            except Exception:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, Any]):
        clean = {k: float(np.asarray(v)) for k, v in metrics.items()
                 if np.ndim(v) == 0}
        self._jsonl.write(json.dumps({"step": int(step), **clean}) + "\n")
        self._jsonl.flush()
        if self._tb is None:
            return
        if getattr(self, "_tb_is_tf", False):
            import tensorflow as tf  # type: ignore

            with self._tb.as_default():
                for k, v in clean.items():
                    tf.summary.scalar(k, v, step=step)
        else:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)

    def close(self):
        self._jsonl.close()


def grad_norm_report(grads, top_k: int = 20) -> Dict[str, float]:
    """Per-parameter gradient norms, largest first (abnormal-step debug)."""
    import flax

    flat = flax.traverse_util.flatten_dict(grads, sep="/")
    norms = {k: float(np.linalg.norm(np.asarray(v, np.float32)))
             for k, v in flat.items()}
    return dict(sorted(norms.items(), key=lambda kv: -kv[1])[:top_k])
