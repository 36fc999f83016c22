from igdm_tpu.parallel.mesh import make_mesh, DATA_AXIS
from igdm_tpu.parallel.sharding import (
    data_sharding,
    replicated,
    shard_batch,
    replicate_tree,
)
from igdm_tpu.parallel.zero import (
    build_zero1_train_step,
    shard_opt_state_zero1,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "data_sharding",
    "replicated",
    "shard_batch",
    "replicate_tree",
    "build_zero1_train_step",
    "shard_opt_state_zero1",
]
