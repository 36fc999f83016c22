"""Sharding helpers: NamedShardings for the data-parallel recipe.

Params are replicated, batches sharded along the leading axis over the 'data'
mesh axis; XLA inserts the ICI collectives (the pmean in the loss becomes an
all-reduce riding ICI). This is the TPU-native replacement for the reference's
absent NCCL/MPI layer (SURVEY.md section 2.4/5.8).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from igdm_tpu.parallel.mesh import DATA_AXIS


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with its leading axis sharded over the mesh."""
    return jax.device_put(batch, data_sharding(mesh))


def replicate_tree(mesh: Mesh, tree):
    """Replicate a pytree (params / opt state) over every device of the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
