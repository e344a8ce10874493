"""Multi-host (multi-process) training support.

The reference trains multi-node via `accelerate launch
--deepspeed_multinode_launcher` (scripts/train.sh:4-9); the TPU-native
equivalent is one JAX process per host joined through
`jax.distributed.initialize`, with a global mesh spanning all hosts and
per-host data feeding (each process loads its own shard of the batch and
`jax.make_array_from_process_local_data` assembles the global array).

Launch (per host):
  python examples/train.py ... --distributed \
      [--coordinator_address host0:1234 --num_processes N --process_id i]

On Cloud TPU the three values are auto-detected from the metadata server, so
bare `--distributed` suffices; on CPU/GPU clusters pass them explicitly (or
via JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars).
"""
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with explicit or auto-detected topology."""
    kw = {}
    if coordinator_address is not None:
        kw["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)


def local_batch_size(global_batch: int) -> int:
    """Per-process batch share (reference: DeepSpeed splits the global batch
    across ranks; here each process loads global/num_processes samples)."""
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n


def make_global_batch(mesh: Mesh, batch: Dict, specs: Dict) -> Dict:
    """Assemble per-process local arrays into global sharded arrays.

    batch: dict of process-local numpy/jax arrays (each holding this
    process's slice of the global batch along the dp axis).
    specs: dict of PartitionSpecs keyed like batch (missing -> replicated).
    """
    out = {}
    for k, v in batch.items():
        spec = specs.get(k, P())
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            out[k] = jax.device_put(v, sharding)
        else:
            out[k] = jax.make_array_from_process_local_data(
                sharding, np.asarray(v))
    return out
