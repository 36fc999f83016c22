from igdm_tpu.parallel.mesh import make_mesh, DATA_AXIS
from igdm_tpu.parallel.sharding import (
    data_sharding,
    replicated,
    shard_batch,
    replicate_tree,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
]
