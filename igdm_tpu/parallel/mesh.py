"""Device-mesh construction.

The reference is single-process CPU with a ``device(x) = x`` shim as its
entire backend layer (src/train_brain.jl:36) — no collectives, no process
groups (SURVEY.md section 2.4). Here distribution is first-class: a 1-D
``data`` mesh axis over ICI for data parallelism (gradients pmean-reduced
inside the jitted step), with a ``model`` axis reserved so tensor-parallel
shardings can be layered on via pjit partition specs without API changes.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, *, model_parallel: int = 1) -> Mesh:
    """Build a (data[, model]) mesh over the first n_devices.

    With model_parallel == 1 the mesh is 1-D over 'data' (the right choice for
    a <1M-param U-Net: replicate params, shard batch). model_parallel > 1
    carves an inner 'model' axis for future TP shardings.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model_parallel:
        raise ValueError(f"n_devices={n} not divisible by model_parallel={model_parallel}")
    dev_array = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    if model_parallel == 1:
        return Mesh(dev_array[:, 0], (DATA_AXIS,))
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def initialize_distributed() -> bool:
    """Multi-host initialization (jax.distributed). No-op on a single host.

    Launch convention (tested with two real CPU processes in
    tests/test_parallel.py): every process sets

      JAX_COORDINATOR_ADDRESS=<host:port of process 0>
      JAX_NUM_PROCESSES=<world size>
      JAX_PROCESS_ID=<this process's rank>

    and calls this before make_mesh(); after it returns True,
    ``jax.devices()`` spans all hosts and make_mesh() builds the global
    mesh. Returns False when the env vars are absent (single-host mode).
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return False
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(num) if num else None,
        process_id=int(pid) if pid else None,
    )
    return True
