"""The scanned-epoch training engine — one implementation of the TPU
training loop shared by every trainer in the framework.

Round 2 grew four trainers (ddpm / conditional / superres / distill) that
each carried a near-identical copy of the same scaffolding: per-epoch
permutation, ``fold_in(key, b+1)`` batch RNG, minibatch ``lax.scan``,
optax update, ramped EMA, multi-epoch dispatch, donated state, and the
host-side early-stopping loop. This module is that scaffolding, extracted
once; a trainer is now just a **batch loss function** plus checkpoint
metadata.

Bit-exactness contract: the RNG derivation (epoch key from
``fold_in(state.rng, state.step)``; per-batch ``fold_in(key, b+1)``; the
trainer splits the batch key) and the update algebra are copied verbatim
from the round-2 trainers, so every pinned parity test (k=1 vs k>1
dispatch equality, sharded == unsharded, bit-exact resume) holds unchanged.

TPU shape (the design, unchanged): the whole dataset lives on device; an
entire epoch — or ``epochs_per_dispatch`` of them — is ONE compiled XLA
program; the host sees one scalar per epoch. Under a ``data`` mesh the
batch axis is sharded and the loss/grad means compile to ICI all-reduces
(asserted structurally in tests/test_parallel.py's HLO collective counts).

Reference counterpart: the hand-written per-batch Julia loops at
src/train_brain.jl:263-292 and last_desperate_attempt/src/train_net.jl:183-238.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from igdm_tpu.config import TrainConfig
from igdm_tpu.training.train_state import TrainState

# batch_loss(params, model_state, kb, idx, mask, *data)
#   -> (loss, new_model_state)
# kb:   the per-batch PRNG key (trainers split it exactly as before)
# idx:  (batch_size,) gather indices into each data array
# mask: (batch_size,) 1.0 for real examples, 0.0 for the tail-batch padding
BatchLoss = Callable[..., tuple[jax.Array, Any]]


def build_scanned_epoch(
    tx: optax.GradientTransformation,
    n_images: int,
    batch_size: int,
    batch_loss: BatchLoss,
    *,
    ema_decay: float = 0.0,
    epochs_per_dispatch: int = 1,
    use_scan: bool | None = None,
    drop_remainder: bool = False,
    per_epoch_lr: bool = False,
) -> Callable:
    """Compile ``epoch_fn(state, *data) -> (state, loss)``.

    ``drop_remainder`` truncates to full batches (the modern recipe's
    behavior, last_desperate_attempt/src/train_net.jl:202 consumes exactly
    N//bs batches per pass); the default pads the tail batch and hands the
    trainer a validity ``mask``.

    ``per_epoch_lr`` adds a scalar argument after ``state`` —
    ``epoch_fn(state, lr, *data)`` — forwarded to ``tx.update(..., lr=lr)``:
    the Flux.adjust! equivalent (train_net.jl:200) that lets a host-computed
    LR schedule drive an injected-hyperparams optimizer. Incompatible with
    ``epochs_per_dispatch`` > 1 (the scalar is per-dispatch).

    With ``epochs_per_dispatch`` > 1 the returned function scans k epochs
    inside ONE jitted call and returns the per-epoch loss vector — the same
    numbers as k sequential calls (per-epoch RNG derives from
    ``state.step``), minus k-1 host round-trips (measured 7.8x on the dev
    relay, BASELINE.md). Bit-identical on CPU (test-pinned); on TPU the two
    programs compile to different fusions and agree to ~1e-3 relative after
    several epochs of rounding amplification (measured on chip against the
    round-2 implementation: both produce digit-for-digit the same losses,
    so the effect is XLA's, not this scaffolding's).

    On TPU (``use_scan`` default) the epoch is a single ``lax.scan`` over
    minibatches. On CPU the identical per-step body runs as one jitted step
    driven by a tiny host loop (XLA:CPU runs scanned convs without intra-op
    parallelism, ~44x slower; measured round 1) — both paths derive RNG the
    same way and agree to float rounding (they are different compiled
    programs; loss ~1e-6 relative, test-pinned — identical behavior
    measured on the pre-engine round-2 code).
    """
    if per_epoch_lr and epochs_per_dispatch > 1:
        raise ValueError("per_epoch_lr requires epochs_per_dispatch == 1")
    n_batches = n_images // batch_size if drop_remainder else -(-n_images // batch_size)
    grad_fn = jax.value_and_grad(batch_loss, has_aux=True)

    def step_body(st: TrainState, key, perm, b, lr, data):
        kb = jax.random.fold_in(key, b + 1)
        pos = b * batch_size + jnp.arange(batch_size)
        idx = perm[pos % n_images]
        mask = (pos < n_images).astype(jnp.float32)
        (loss, new_mstate), grads = grad_fn(
            st.params, st.model_state, kb, idx, mask, *data
        )
        if per_epoch_lr:
            updates, new_opt = tx.update(grads, st.opt_state, st.params, lr=lr)
        else:
            updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        new_ema = st.ema_params
        if ema_decay > 0:
            # ramped decay min(decay, (1+t)/(10+t)): without it a short run's
            # EMA is still mostly the random init (0.999^680 = 0.51)
            t = st.step.astype(jnp.float32) + 1.0
            d = jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, st.ema_params, new_params
            )
        return (
            st.replace(
                params=new_params, model_state=new_mstate, opt_state=new_opt,
                step=st.step + 1, ema_params=new_ema,
            ),
            loss,
        )

    if use_scan is None:
        use_scan = jax.default_backend() != "cpu"

    if use_scan:

        def one_epoch(state: TrainState, lr, *data):
            key = jax.random.fold_in(state.rng, state.step)
            perm = jax.random.permutation(key, n_images)

            def body(carry, b):
                return step_body(carry, key, perm, b, lr, data)

            state, losses = jax.lax.scan(body, state, jnp.arange(n_batches))
            return state, jnp.mean(losses)

        if epochs_per_dispatch > 1:

            @partial(jax.jit, donate_argnums=(0,))
            def multi_epoch_fn(state: TrainState, *data):
                def eb(st, _):
                    return one_epoch(st, None, *data)

                return jax.lax.scan(eb, state, None, length=epochs_per_dispatch)

            return multi_epoch_fn

        if per_epoch_lr:

            @partial(jax.jit, donate_argnums=(0,))
            def epoch_fn_lr(state: TrainState, lr, *data):
                return one_epoch(state, lr, *data)

            return epoch_fn_lr

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state: TrainState, *data):
            return one_epoch(state, None, *data)

        return epoch_fn

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state, key, perm, b, lr, *data):
        return step_body(state, key, perm, b, lr, data)

    @jax.jit
    def epoch_setup(state):
        key = jax.random.fold_in(state.rng, state.step)
        return key, jax.random.permutation(key, n_images)

    def _host_epoch(state: TrainState, lr, *data):
        key, perm = epoch_setup(state)
        losses = []
        for b in range(n_batches):
            state, loss = step_fn(state, key, perm, jnp.asarray(b), lr, *data)
            losses.append(loss)
        return state, jnp.mean(jnp.stack(losses))

    if per_epoch_lr:
        return _host_epoch

    def epoch_fn(state: TrainState, *data):
        return _host_epoch(state, None, *data)

    return epoch_fn


def dispatch_k(train_cfg: TrainConfig) -> int:
    """Epochs per compiled dispatch: the config value on TPU, 1 on CPU
    (where the epoch is a host loop already — see build_scanned_epoch)."""
    k = max(1, int(train_cfg.epochs_per_dispatch))
    return 1 if jax.default_backend() == "cpu" else k


def run_epoch_loop(
    state: TrainState,
    data: Sequence[jax.Array],
    epoch_fn: Callable,
    epoch_fn_single: Callable,
    k: int,
    train_cfg: TrainConfig,
    result,
    *,
    log: Callable[[str], None] | None = print,
    start_epoch: int = 0,
    best: float = float("inf"),
    no_improve: int = 0,
    on_block_end: Callable[[int, int, TrainState, float, int], None] | None = None,
    epoch_lr: Callable[[int], float] | None = None,
):
    """The host-side driver: dispatch epochs (k at a time when possible),
    track losses, early-stop on patience/min_delta (src/train_brain.jl:282-292),
    and hand each completed block to ``on_block_end`` (checkpointing).

    ``epoch_lr(epoch)`` (1-based), when given, computes the scalar passed to
    a ``per_epoch_lr`` epoch function — the host side of the Flux.adjust!
    schedule (train_net.jl:57-68,200); requires k == 1.

    Mutates and returns ``result`` (a TrainResult). With k > 1 a mid-block
    stop is detected here but the state has already advanced to the block
    end — documented trade (the dispatch saving is the point).
    """
    if epoch_lr is not None and k > 1:
        raise ValueError("epoch_lr requires k == 1 (the scalar is per-epoch)")
    result.state = state
    result.epochs_run = start_epoch
    t0 = time.time()
    epoch = start_epoch
    while epoch < train_cfg.epochs and not result.stopped_early:
        remaining = train_cfg.epochs - epoch
        if k > 1 and remaining >= k:
            state, losses_vec = epoch_fn(state, *data)
            block = [float(x) for x in np.asarray(losses_vec)]
        elif epoch_lr is not None:
            lr = epoch_lr(epoch + 1)
            state, loss = epoch_fn_single(
                state, jnp.asarray(lr, jnp.float32), *data
            )
            block = [float(loss)]
        else:
            state, loss = epoch_fn_single(state, *data)
            block = [float(loss)]
        result.state = state

        for loss in block:
            epoch += 1
            result.losses.append(loss)
            result.epochs_run = epoch
            if log:
                log(f"Epoch {epoch} | avg loss = {loss:.6f}")
            if loss < best - train_cfg.min_delta:
                best, no_improve = loss, 0
            else:
                no_improve += 1
            if no_improve > train_cfg.patience:
                if log:
                    log(
                        f"Early stopping: no improvement for {train_cfg.patience + 1} epochs"
                    )
                result.stopped_early = True
                break

        if not result.stopped_early and on_block_end is not None:
            on_block_end(epoch, len(block), state, best, no_improve)

    result.wall_seconds = time.time() - t0
    result.early_stop_best = best
    result.early_stop_no_improve = no_improve
    return result


def build_step_runner(
    tx: optax.GradientTransformation,
    grad_fn: Callable,
    batch_size: int,
    ts_upper: int,
    steps_per_dispatch: int,
):
    """Compile a step-based (not epoch-based) training runner: the
    distillation loops' shared scaffolding. ``grad_fn`` is a
    ``value_and_grad`` of ``loss(params, teacher_params, x0, t, eps)``;
    per-step RNG derives from ``fold_in(key, step0 + k)`` and ``t`` is
    drawn uniformly from {1..ts_upper} (timesteps for the conversion
    pre-phase, grid indices for the halving phases)."""

    @partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, teacher_params, imgs, key, step0):
        n_images = imgs.shape[0]

        def body(carry, k):
            params, opt_state = carry
            kb = jax.random.fold_in(key, step0 + k)
            k_i, k_t, k_eps = jax.random.split(kb, 3)
            idx = jax.random.randint(k_i, (batch_size,), 0, n_images)
            x0 = jnp.take(imgs, idx, axis=0)
            t = jax.random.randint(k_t, (batch_size,), 1, ts_upper + 1)
            eps = jax.random.normal(k_eps, x0.shape, jnp.float32)
            loss, grads = grad_fn(params, teacher_params, x0, t, eps)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), jnp.arange(steps_per_dispatch)
        )
        return params, opt_state, losses

    return run
