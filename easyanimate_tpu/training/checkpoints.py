"""Checkpoint save/resume with orbax.

Parity target (train.py:1119-1170, 2152-2176): periodic `save_state` with
rotation to a total limit, sampler-cursor persistence for exact data-order
resume, and latest-checkpoint discovery with fallback to the second-latest
on a corrupt load (train.py:1564-1626).
"""
import json
import os
import shutil
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"checkpoint-{step}")

    def steps(self):
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("checkpoint-"):
                try:
                    out.append(int(name.split("-")[1]))
                except ValueError:
                    pass
        return sorted(out)

    def save(self, step: int, state: Any, sampler_state: Optional[dict] = None):
        """Save a snapshot. Multi-host: call from EVERY process -- orbax
        serialization of globally-sharded arrays is a collective (each host
        writes its addressable shards); host-side file ops run on process 0
        with barriers around them."""
        import jax

        multihost = jax.process_count() > 1
        path = self._path(step)
        # re-saving the same step (restart/retry) replaces the old snapshot;
        # orbax refuses to overwrite otherwise
        if jax.process_index() == 0 and os.path.exists(
                os.path.join(path, "state")):
            shutil.rmtree(path, ignore_errors=True)
        if multihost:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ckpt_pre_save")
        self._ckpt.save(os.path.join(path, "state"), state)
        self._ckpt.wait_until_finished()
        if sampler_state is not None and jax.process_index() == 0:
            with open(os.path.join(path, "sampler.json"), "w") as f:
                json.dump(sampler_state, f)
        if jax.process_index() == 0:
            self._rotate()
        if multihost:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ckpt_post_save")

    def _rotate(self):
        steps = self.steps()
        while len(steps) > self.max_to_keep:
            victim = steps.pop(0)
            shutil.rmtree(self._path(victim), ignore_errors=True)

    def save_reference_format(self, step: int, transformer_variables,
                              mmdit_cfg, ema_variables=None):
        """Additionally export the transformer in the REFERENCE's
        diffusers-layout format (config.json + safetensors shards) so
        TPU-trained weights flow straight back into the reference ecosystem
        (predict scripts / ComfyUI / HF hub). Mirrors the reference save
        hook writing `transformer/` (+ `transformer_ema/`) subfolders
        (scripts/train.py:1121-1167)."""
        from ..models.convert import (_mmdit_config_json,
                                      export_mmdit_state_dict,
                                      save_reference_checkpoint)

        path = self._path(step)
        os.makedirs(path, exist_ok=True)
        cfg_json = _mmdit_config_json(mmdit_cfg)
        save_reference_checkpoint(
            os.path.join(path, "transformer"),
            export_mmdit_state_dict(transformer_variables, mmdit_cfg),
            cfg_json)
        if ema_variables is not None:
            save_reference_checkpoint(
                os.path.join(path, "transformer_ema"),
                export_mmdit_state_dict(ema_variables, mmdit_cfg), cfg_json)

    def restore_latest(self, template: Any):
        """Returns (state, sampler_state, step) or (None, None, None).
        Falls back to the previous checkpoint if the latest fails to load."""
        for step in reversed(self.steps()):
            try:
                state = self._ckpt.restore(
                    os.path.join(self._path(step), "state"), template)
                sampler = None
                spath = os.path.join(self._path(step), "sampler.json")
                if os.path.exists(spath):
                    with open(spath) as f:
                        sampler = json.load(f)
                return state, sampler, step
            except Exception:
                continue
        return None, None, None
