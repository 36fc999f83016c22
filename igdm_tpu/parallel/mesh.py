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


def initialize_distributed():
    """Multi-host initialization (jax.distributed). No-op on a single host;
    call before make_mesh() in multi-host launches."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()
