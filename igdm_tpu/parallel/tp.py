"""Tensor-parallel shardings for the U-Net (demonstration-grade).

The reference has no TP and this model family doesn't need it (847K params —
replication is optimal, SURVEY.md section 2.4). This module makes the
reserved 'model' mesh axis real anyway: conv kernels shard along their
output-channel (last) dimension and biases/norm params along channels, so
XLA partitions every conv's output feature dimension across the axis and
inserts the ICI collectives where channels are contracted (the next conv's
input). Scales to wide U-Nets (base_ch >= 256) where weights and activations
stop fitting a single chip's HBM.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from igdm_tpu.parallel.mesh import MODEL_AXIS


def tp_spec_for(path: tuple, leaf) -> P:
    """PartitionSpec for one U-Net param leaf: shard the channel (last) dim."""
    if leaf.ndim == 4:  # conv kernel HWIO -> shard O
        return P(None, None, None, MODEL_AXIS)
    if leaf.ndim == 2:  # dense (in, out) -> shard out
        return P(None, MODEL_AXIS)
    if leaf.ndim == 1:  # bias / norm vectors -> shard channels
        return P(MODEL_AXIS)
    return P()


def shard_params_tp(mesh: Mesh, params):
    """Place a params pytree with channel dimensions sharded over 'model'.

    Leaves whose channel dim isn't divisible by the axis size stay
    replicated (e.g. the 1-channel final conv).
    """
    axis = mesh.shape[MODEL_AXIS]

    def place(path, leaf):
        spec = tp_spec_for(path, leaf)
        # replicate anything that doesn't divide evenly
        for dim, name in enumerate(spec):
            if name == MODEL_AXIS and leaf.shape[dim] % axis != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
