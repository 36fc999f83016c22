"""Multi-host data delivery and coordinated checkpoints.

The reference is single-process CPU (SURVEY.md section 2.4); this module is
the multi-HOST half of the framework's distribution story (the in-process
multi-chip half lives in mesh.py/sharding.py and the trainers). Two
capabilities the north star's DP row names:

* **Per-host sharded batch delivery** — each process loads ONLY its slice
  of the global batch (``process_local_slice``) and the slices are stitched
  into one global ``jax.Array`` sharded over the mesh's ``data`` axis with
  ``jax.make_array_from_process_local_data`` (``global_from_local``). No
  host ever materializes the full dataset, and nothing crosses DCN at load
  time — the collectives XLA inserts for the loss/grad means are the only
  cross-host traffic.

* **Coordinated checkpoint save/restore** — ``save_checkpoint_multihost``
  gathers any non-addressable (cross-host-sharded) leaves with
  ``process_allgather``, writes the npz from process 0 only, and barriers
  so no rank races ahead of the file (single-writer + barrier: the
  standard pattern for shared-filesystem pods). ``load_checkpoint_multihost``
  loads on every process (shared filesystem) into the caller's TrainState
  template — combined with the trainers' step-derived RNG this keeps
  multi-host resume bit-exact, like the single-host resume test pins.

Exercised with two REAL ``jax.distributed`` CPU processes in
tests/test_parallel.py (train 2 steps on per-process data, save, resume,
losses match the uninterrupted run).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from igdm_tpu.parallel.mesh import DATA_AXIS


def process_local_slice(n: int) -> slice:
    """Rows of a length-``n`` global batch axis owned by this process
    (equal contiguous split; ``n`` must divide evenly — pad the dataset to
    a multiple of ``jax.process_count()`` like the trainers pad batches)."""
    k = jax.process_count()
    if n % k:
        raise ValueError(f"global size {n} not divisible by {k} processes")
    per = n // k
    p = jax.process_index()
    return slice(p * per, (p + 1) * per)


def global_from_local(mesh, local: np.ndarray, *, global_rows: int | None = None):
    """Stitch per-process arrays into a global jax.Array sharded over the
    mesh's ``data`` axis (rows split across hosts AND their local devices)."""
    spec = P(DATA_AXIS, *([None] * (np.ndim(local) - 1)))
    sharding = NamedSharding(mesh, spec)
    global_shape = None
    if global_rows is not None:
        global_shape = (global_rows,) + tuple(np.shape(local)[1:])
    return jax.make_array_from_process_local_data(sharding, np.asarray(local), global_shape)


def _leaf_to_host(x):
    if not isinstance(x, jax.Array):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def save_checkpoint_multihost(path: str, state, *, epoch: int | None = None, **configs) -> str:
    """Gather-to-host + single-writer checkpoint save with a barrier.

    Works for replicated DP states (gather is a no-op view) and for
    cross-host-sharded leaves (ZeRO-style optimizer shards) alike.
    Process 0 writes ``path``; every process returns after the barrier, so
    a subsequent load on any rank sees the complete file.
    """
    from igdm_tpu.checkpoint.pytree_io import save_checkpoint

    host_state = jax.tree_util.tree_map(_leaf_to_host, state)
    if jax.process_index() == 0:
        save_checkpoint(path, host_state, epoch=epoch, **configs)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("igdm_ckpt_save:" + str(path))
    return path


def load_checkpoint_multihost(path: str, template):
    """Load a coordinated checkpoint on every process (shared filesystem),
    slotting arrays into ``template``'s structure/shardings. Returns
    (state, meta) like pytree_io.load_checkpoint."""
    from igdm_tpu.checkpoint.pytree_io import load_checkpoint

    state, meta = load_checkpoint(path, template)

    def replace_like(loaded, like):
        if not isinstance(like, jax.Array) or like.is_fully_addressable:
            return loaded
        # re-shard a host-replicated value back onto the template's sharding
        return jax.make_array_from_callback(
            np.shape(loaded), like.sharding, lambda idx: np.asarray(loaded)[idx]
        )

    state = jax.tree_util.tree_map(replace_like, state, template)
    return state, meta
