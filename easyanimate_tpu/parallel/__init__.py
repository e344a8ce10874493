from .context import (
    current_sp,
    make_sp_attention,
    sequence_parallel,
    sp_constraint,
)
from .mesh import create_mesh, MeshConfig
from .multihost import init_distributed, local_batch_size, make_global_batch
from .sharding import (
    mmdit_param_specs,
    named_sharding,
    shard_params,
    zero_param_specs,
    data_spec,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "current_sp",
    "make_sp_attention",
    "sequence_parallel",
    "sp_constraint",
    "init_distributed",
    "local_batch_size",
    "make_global_batch",
    "mmdit_param_specs",
    "named_sharding",
    "shard_params",
    "zero_param_specs",
    "data_spec",
]
