from .mesh import create_mesh, MeshConfig
from .sharding import (
    mmdit_param_specs,
    named_sharding,
    shard_params,
    data_spec,
)

__all__ = [
    "MeshConfig",
    "create_mesh",
    "mmdit_param_specs",
    "named_sharding",
    "shard_params",
    "data_spec",
]
