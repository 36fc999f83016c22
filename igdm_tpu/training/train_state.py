"""Training state pytree.

Unlike the reference's checkpoints — which save only the Adam *rule* (lr/betas)
and silently drop the moment state, making true resume impossible
(SURVEY.md section 5.4, src/train_brain.jl:295-300) — this state carries
everything needed for deterministic resume: params, model (BatchNorm) state,
optimizer state, step counter, and the PRNG key.
"""

from __future__ import annotations

from typing import Any

from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    model_state: Any  # BatchNorm running stats ({} for stateless models)
    opt_state: Any
    step: int
    rng: Any  # jax PRNG key
    ema_params: Any = None  # exponential moving average of params (optional)

    def next_rng(self):
        import jax

        key = jax.random.fold_in(self.rng, self.step)
        return key
