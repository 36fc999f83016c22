"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from igdm_tpu.parallel.mesh import make_mesh
from igdm_tpu.parallel.sharding import data_sharding, replicate_tree, shard_batch


def test_virtual_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_1d():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8}


def test_make_mesh_2d():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_shard_batch_places_shards():
    mesh = make_mesh(8)
    x = jnp.arange(16 * 4, dtype=jnp.float32).reshape(16, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding == data_sharding(mesh)
    np.testing.assert_array_equal(np.asarray(xs), np.asarray(x))


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 32, 32, 1)


@pytest.mark.slow
def test_data_parallel_epoch_matches_single_device():
    """The sharded epoch must compute the same result as unsharded (same
    program, XLA inserts collectives)."""
    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.training.ddpm import build_epoch_fn, init_train_state

    diff = DiffusionConfig(num_steps=5)
    tr = TrainConfig(batch_size=8)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (32, 32, 32, 1), jnp.float32)

    def run(mesh):
        state, tx = init_train_state(jax.random.PRNGKey(0), diff, tr)
        epoch_fn = build_epoch_fn(tx, diff, tr.batch_size, 32)
        x = imgs
        if mesh is not None:
            x = shard_batch(mesh, x)
            state = state.replace(params=replicate_tree(mesh, state.params))
        state, loss = epoch_fn(state, x)
        return float(loss)

    loss_single = run(None)
    loss_sharded = run(make_mesh(8))
    assert np.isfinite(loss_single) and np.isfinite(loss_sharded)
    # same math, different reduction orders: expect near-identical losses
    assert abs(loss_single - loss_sharded) < 1e-4


def test_sharded_sampling_matches_unsharded():
    from igdm_tpu.config import DiffusionConfig
    from igdm_tpu.models import unet_small
    from igdm_tpu.sampling.ancestral import sample_ddpm, sample_ddpm_sharded

    params, state = unet_small.init(jax.random.PRNGKey(0))
    cfg = DiffusionConfig(num_steps=5)
    key = jax.random.PRNGKey(9)
    mesh = make_mesh(8)
    a = np.asarray(sample_ddpm(params, state, key, num_images=16, cfg=cfg))
    b = np.asarray(
        sample_ddpm_sharded(params, state, key, mesh, num_images=16, cfg=cfg)
    )
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_sampling_rejects_indivisible_batch():
    from igdm_tpu.config import DiffusionConfig
    from igdm_tpu.models import unet_small
    from igdm_tpu.sampling.ancestral import sample_ddpm_sharded

    params, state = unet_small.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        sample_ddpm_sharded(
            params, state, jax.random.PRNGKey(0), make_mesh(8),
            num_images=10, cfg=DiffusionConfig(num_steps=5),
        )


@pytest.mark.slow
def test_train_ddpm_full_loop_on_mesh(tmp_path):
    """The complete training loop (epochs, checkpoints, early-stop counters)
    over a data-parallel mesh."""
    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.training.ddpm import train_ddpm

    rng = np.random.default_rng(7)
    imgs = rng.standard_normal((32, 32, 32, 1)).astype(np.float32)
    res = train_ddpm(
        imgs,
        DiffusionConfig(num_steps=5),
        TrainConfig(batch_size=16, epochs=2, patience=50, checkpoint_every=0),
        mesh=make_mesh(8),
        out_dir=str(tmp_path),
        log=None,
    )
    assert res.epochs_run == 2
    assert all(np.isfinite(l) for l in res.losses)
    assert (tmp_path / "trained_model.npz").is_file()


def test_tensor_parallel_forward_matches_replicated():
    """Channel-sharded (TP) U-Net forward over a data x model mesh must equal
    the replicated forward — XLA inserts the collectives."""
    from igdm_tpu.models import unet_small
    from igdm_tpu.models.embeddings import timestep_embedding
    from igdm_tpu.parallel.tp import shard_params_tp

    mesh = make_mesh(8, model_parallel=4)
    params, state = unet_small.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 1))
    t_emb = timestep_embedding(jnp.arange(1.0, 5.0), 128)

    want, _ = unet_small.apply(params, state, x, t_emb, train=False)

    params_tp = shard_params_tp(mesh, params)
    state_tp = shard_params_tp(mesh, state)
    got, _ = jax.jit(lambda p, s, x, t: unet_small.apply(p, s, x, t, train=False))(
        params_tp, state_tp, x, t_emb
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    # weights really are sharded
    w = params_tp["down1"]["conv1"]["w"]
    assert not w.sharding.is_fully_replicated


@pytest.mark.distributed
def test_initialize_distributed_two_processes(tmp_path):
    import os
    """initialize_distributed with two REAL jax.distributed CPU processes
    (VERDICT.md round-1 task 6): both ranks must see a 2-device global view
    and agree on a cross-process collective result."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = f"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon
sys.path.insert(0, {repo!r})
from igdm_tpu.parallel.mesh import initialize_distributed, make_mesh
assert initialize_distributed() is True
assert jax.process_count() == 2
assert len(jax.local_devices()) == 1
assert jax.device_count() == 2
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = make_mesh(2)
# rank-dependent shard -> global sum must see both processes' data
local = jnp.full((1, 4), float(jax.process_index() + 1))
arr = jax.make_array_from_single_device_arrays(
    (2, 4), NamedSharding(mesh, P("data")), [jax.device_put(local, jax.local_devices()[0])])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 12.0, float(total)  # (1+2) * 4
print("RANK", jax.process_index(), "OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    procs = []
    for rank in range(2):
        e = dict(env, JAX_PROCESS_ID=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", worker],
                env=e,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-2000:]}"
        assert f"RANK {rank} OK" in out


def test_data_parallel_conditional_epoch_matches_single_device():
    """The conditional (label-dropout) trainer under a data mesh computes the
    same loss as unsharded — labels ride the same sharded batch axis."""
    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.models import unet4
    from igdm_tpu.training.conditional import build_cond_epoch_fn
    from igdm_tpu.training.ddpm import make_optimizer
    from igdm_tpu.training.train_state import TrainState

    diff = DiffusionConfig(num_steps=5)
    tr = TrainConfig(batch_size=8)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (32, 16, 16, 1), jnp.float32)
    labels = jnp.arange(32, dtype=jnp.int32) % 4

    def run(mesh):
        params = unet4.init(jax.random.PRNGKey(0), base_ch=8, num_classes=4)
        tx = make_optimizer(tr)
        state = TrainState(
            params=params, model_state={}, opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(1),
            ema_params=None,
        )
        epoch_fn = build_cond_epoch_fn(tx, diff, tr.batch_size, 32, 4)
        x, lab = imgs, labels
        if mesh is not None:
            x = shard_batch(mesh, x)
            lab = shard_batch(mesh, lab)
            state = state.replace(
                params=replicate_tree(mesh, state.params),
                opt_state=replicate_tree(mesh, state.opt_state),
            )
        state, loss = epoch_fn(state, x, lab)
        return float(loss)

    loss_single = run(None)
    loss_sharded = run(make_mesh(8))
    assert np.isfinite(loss_single) and np.isfinite(loss_sharded)
    assert abs(loss_single - loss_sharded) < 1e-4


@pytest.mark.slow
def test_data_parallel_distill_step_matches_single_device():
    """One distillation dispatch under a data mesh == unsharded: the
    teacher's two DDIM steps, the student update, and the optax step all
    ride the sharded batch axis (params replicated)."""
    import optax

    from igdm_tpu.config import DiffusionConfig
    from igdm_tpu.models import unet4
    from igdm_tpu.training.distill import _phase_grids, make_distill_step_fn

    diff = DiffusionConfig(num_steps=32)
    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (16, 16, 16, 1), jnp.float32, -1, 1)
    (sgrid, tgrid), = _phase_grids(32, (4,))

    def run(mesh):
        tx = optax.adam(1e-4)
        student = jax.tree_util.tree_map(jnp.array, params)
        opt_state = tx.init(student)
        fn = make_distill_step_fn(
            tx, diff, 8, sgrid, tgrid, "eps", model_kind="unet4",
            compute_dtype=None, steps_per_dispatch=4,
        )
        x, st, opt = imgs, student, opt_state
        if mesh is not None:
            x = shard_batch(mesh, x)
            st = replicate_tree(mesh, st)
            opt = replicate_tree(mesh, opt)
        _, _, losses = fn(st, opt, replicate_tree(mesh, params) if mesh else params,
                          x, jax.random.PRNGKey(2), jnp.asarray(0, jnp.int32))
        return np.asarray(losses)

    a = run(None)
    b = run(make_mesh(8))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)


# ---------------------------------------------------------------------------
# Compiled communication structure (VERDICT r2 task 4): output-equality tests
# above would also pass if XLA silently gathered everything onto one device.
# These assert the collectives the compiled HLO actually contains.
# ---------------------------------------------------------------------------

_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute", "all-to-all")


def _collective_counts(hlo_text: str) -> dict:
    import re

    return {
        n: len(re.findall(rf"{n}(?:-start)?\(", hlo_text)) for n in _COLLECTIVES
    }


@pytest.mark.parametrize("model_kind", ["unet4", "unet_small"])
def test_dp_train_epoch_compiles_to_exactly_one_all_reduce(model_kind):
    """One fused gradient all-reduce per DP step — and nothing else. XLA
    merges the loss mean, every parameter gradient, and (for unet_small)
    the BatchNorm batch statistics into a single fused all-reduce inside
    the scan body; any all-gather would mean the partitioner fell back to
    collecting the batch onto every device."""
    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.training.ddpm import build_epoch_fn, init_train_state

    mesh = make_mesh(8)
    diff = DiffusionConfig(num_steps=8)
    tr = TrainConfig(batch_size=16)
    kw = {"base_ch": 8} if model_kind == "unet4" else {}
    state, tx = init_train_state(
        jax.random.PRNGKey(0), diff, tr, model_kind=model_kind, **kw
    )
    epoch_fn = build_epoch_fn(tx, diff, tr.batch_size, 32, model_kind=model_kind, use_scan=True)
    imgs = shard_batch(mesh, jnp.zeros((32, 32, 32, 1), jnp.float32))
    state = state.replace(
        params=replicate_tree(mesh, state.params),
        model_state=replicate_tree(mesh, state.model_state),
        opt_state=replicate_tree(mesh, state.opt_state),
    )
    counts = _collective_counts(epoch_fn.lower(state, imgs).compile().as_text())
    assert counts["all-reduce"] == 1, counts
    for other in _COLLECTIVES[1:]:
        assert counts[other] == 0, counts


def test_sharded_sampling_compiles_to_zero_collectives():
    """The claim at sampling/ancestral.py sample_ddpm_sharded: every chip
    runs its shard of the trajectory scan independently — the compiled
    program must contain NO collectives at all (linear scaling by
    construction, not by measurement)."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from igdm_tpu.config import DiffusionConfig
    from igdm_tpu.models import unet_small
    from igdm_tpu.sampling.ancestral import _alpha_bar, _sample_ddpm_impl

    mesh = make_mesh(8)
    cfg = DiffusionConfig(num_steps=8)
    params, state = unet_small.init(jax.random.PRNGKey(0))
    repl = NamedSharding(mesh, P())
    params = jax.device_put(params, repl)
    state = jax.device_put(state, repl)
    key = jax.device_put(jax.random.PRNGKey(0), repl)
    ab = jax.device_put(_alpha_bar(cfg), repl)
    fn = jax.jit(
        partial(
            _sample_ddpm_impl.__wrapped__, num_images=16, image_size=(32, 32),
            num_steps=cfg.num_steps, embed_dim=cfg.embed_dim, channels=1,
        ),
        out_shardings=NamedSharding(mesh, P("data")),
    )
    counts = _collective_counts(fn.lower(params, state, key, ab, None).compile().as_text())
    assert counts == {n: 0 for n in _COLLECTIVES}, counts


def test_tp_forward_compiles_with_channel_collectives():
    """Tensor-parallel forward on a 2-D (data x model) mesh: channel
    contractions must produce real cross-device communication (all-gather /
    all-to-all / all-reduce of partial sums) — exact counts are a compiler
    choice, but zero would mean the 'model' axis sharding was silently
    dropped."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from igdm_tpu.models import unet4
    from igdm_tpu.parallel.tp import shard_params_tp

    mesh = make_mesh(8, model_parallel=4)
    params = shard_params_tp(mesh, unet4.init(jax.random.PRNGKey(0), in_channels=1, base_ch=8))
    x = jax.device_put(jnp.zeros((4, 32, 32, 1)), NamedSharding(mesh, P("data")))
    ts = jax.device_put(jnp.ones((4,), jnp.int32), NamedSharding(mesh, P("data")))
    fwd = jax.jit(lambda p, a, t: unet4.apply(p, a, t, final_sigmoid=False))
    counts = _collective_counts(fwd.lower(params, x, ts).compile().as_text())
    assert sum(counts.values()) >= 1, counts


# ---------------------------------------------------------------------------
# ZeRO-1: optimizer-state sharding over the data axis (parallel/zero.py)
# ---------------------------------------------------------------------------


def _zero1_setup(tx=None):
    """A unet4 eps-regression step; returns (params, tx, opt_state, batch, loss)."""
    import optax

    from igdm_tpu.models import unet4

    params = unet4.init(jax.random.PRNGKey(0), base_ch=8)
    tx = tx or optax.adam(1e-3)
    opt_state = tx.init(params)
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (16, 16, 16, 1), jnp.float32)
    ts = jnp.arange(1, 17, dtype=jnp.int32)
    eps = jax.random.normal(jax.random.fold_in(k, 1), x.shape, jnp.float32)

    def batch_loss(p, x, ts, eps):
        pred = unet4.apply(p, x, ts, final_sigmoid=False)
        return jnp.mean(jnp.square(pred - eps))

    return params, tx, opt_state, (x, ts, eps), batch_loss


def test_zero1_step_matches_replicated():
    """The ZeRO-1 sharded step computes the same update as a plain
    single-device step (same math, redistributed). SGD+momentum: its
    trace is real shardable optimizer state but the update stays LINEAR
    in the gradient, so cross-program reduction-order noise (~1e-7)
    can't amplify — Adam at step 1 is update ~ lr*sign(g), where a
    1e-7 difference on a near-zero gradient flips a full-lr update
    (measured; that's an optimizer property, not a sharding bug)."""
    import optax

    from igdm_tpu.parallel.zero import (
        build_zero1_train_step, shard_opt_state_zero1,
    )

    params, tx, opt_state, batch, batch_loss = _zero1_setup(
        optax.sgd(1e-2, momentum=0.9)
    )

    # plain baseline
    def plain_step(p, o, *b):
        loss, grads = jax.value_and_grad(batch_loss)(p, *b)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p_ref, _, loss_ref = jax.jit(plain_step)(params, opt_state, *batch)

    mesh = make_mesh(8)
    step = build_zero1_train_step(tx, batch_loss, mesh, params)
    p_sh = replicate_tree(mesh, params)
    o_sh = shard_opt_state_zero1(mesh, opt_state)
    b_sh = tuple(shard_batch(mesh, b) for b in batch)
    p_new, o_new, loss = step(p_sh, o_sh, *b_sh)

    assert abs(float(loss) - float(loss_ref)) < 1e-5
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        p_new, p_ref,
    )


def test_zero1_compiles_to_reduce_scatter_and_all_gather():
    """The point of ZeRO-1: the gradient reduction must compile to a
    reduce-scatter (each device reduces only its moment shard) and the
    parameter update to an all-gather — not a plain all-reduce plus a
    replicated update."""
    from igdm_tpu.parallel.zero import (
        build_zero1_train_step, shard_opt_state_zero1,
    )

    params, tx, opt_state, batch, batch_loss = _zero1_setup()
    mesh = make_mesh(8)
    step = build_zero1_train_step(tx, batch_loss, mesh, params)
    p_sh = replicate_tree(mesh, params)
    o_sh = shard_opt_state_zero1(mesh, opt_state)
    b_sh = tuple(shard_batch(mesh, b) for b in batch)
    counts = _collective_counts(
        step.lower(p_sh, o_sh, *b_sh).compile().as_text()
    )
    assert counts["reduce-scatter"] >= 1, counts
    assert counts["all-gather"] >= 1, counts


def test_zero1_opt_state_bytes_drop_per_device():
    """Adam moments for divisible tensors occupy 1/8 the bytes per device;
    the whole opt-state tree lands well under 1/4 of replicated size
    (small norm vectors stay replicated by design)."""
    from igdm_tpu.parallel.zero import (
        opt_state_bytes_per_device, shard_opt_state_zero1,
    )

    params, tx, opt_state, _, _ = _zero1_setup()
    replicated_bytes = opt_state_bytes_per_device(opt_state)
    mesh = make_mesh(8)
    o_sh = shard_opt_state_zero1(mesh, opt_state)
    sharded_bytes = opt_state_bytes_per_device(o_sh)
    assert sharded_bytes < replicated_bytes / 4, (sharded_bytes, replicated_bytes)


def test_data_parallel_flow_epoch_matches_single_device():
    """The flow family rides the same engine: a sharded flow epoch must
    compute the same loss as unsharded (XLA inserts the collectives)."""
    from igdm_tpu.config import TrainConfig
    from igdm_tpu.models import unet4
    from igdm_tpu.training.ddpm import make_optimizer
    from igdm_tpu.training.flow import build_flow_epoch_fn
    from igdm_tpu.training.train_state import TrainState

    tr = TrainConfig(batch_size=8)
    tx = make_optimizer(tr)
    imgs = jax.random.normal(jax.random.PRNGKey(3), (32, 16, 16, 1), jnp.float32)

    def run(mesh):
        kp, kr = jax.random.split(jax.random.PRNGKey(0))
        params = unet4.init(kp, base_ch=8)
        state = TrainState(
            params=params, model_state={}, opt_state=tx.init(params),
            step=jnp.asarray(0, jnp.int32), rng=kr,
        )
        epoch_fn = build_flow_epoch_fn(tx, tr.batch_size, 32)
        x = imgs
        if mesh is not None:
            x = shard_batch(mesh, x)
            state = state.replace(params=replicate_tree(mesh, state.params))
        state, loss = epoch_fn(state, x)
        return float(loss)

    loss_single = run(None)
    loss_sharded = run(make_mesh(8))
    assert np.isfinite(loss_single) and np.isfinite(loss_sharded)
    assert abs(loss_single - loss_sharded) < 1e-4


@pytest.mark.distributed
def test_multihost_data_and_checkpoint_two_processes(tmp_path):
    """Round-4 multi-host readiness (VERDICT r3 task 7), with two REAL
    jax.distributed CPU processes: each process loads ONLY its slice of the
    dataset (process_local_slice + global_from_local), trains 2 steps on the
    globally-sharded batch, checkpoints via the single-writer+barrier path,
    resumes from it, and the resumed losses match the uninterrupted run
    exactly on both ranks."""
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "mh_ckpt.npz")
    worker = f"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from igdm_tpu.parallel.mesh import initialize_distributed, make_mesh
from igdm_tpu.parallel.multihost import (
    global_from_local, load_checkpoint_multihost, process_local_slice,
    save_checkpoint_multihost,
)
from igdm_tpu.training.train_state import TrainState

assert initialize_distributed() is True
mesh = make_mesh(2)

# per-host data: the global dataset is never materialized on one host;
# each rank generates exactly its slice (deterministic global content)
N, D = 8, 4
sl = process_local_slice(N)
full = np.arange(N * D, dtype=np.float32).reshape(N, D) / (N * D)
local = full[sl]
assert local.shape == (4, 4)
imgs = global_from_local(mesh, local, global_rows=N)
assert imgs.shape == (N, D) and not imgs.sharding.is_fully_replicated

tx = optax.adam(1e-2)

def make_state():
    params = {{"w": jnp.eye(D) * 0.5}}
    return TrainState(params=params, model_state={{}}, opt_state=tx.init(params),
                      step=jnp.asarray(0, jnp.int32), rng=jax.random.PRNGKey(0))

rep = NamedSharding(mesh, P())

@jax.jit
def step(state, data):
    def loss_fn(p):
        pred = jnp.dot(data, p["w"], preferred_element_type=jnp.float32)
        return jnp.mean(jnp.square(pred - data))
    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    grads = jax.lax.with_sharding_constraint(grads, rep)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    return state.replace(params=optax.apply_updates(state.params, updates),
                         opt_state=new_opt, step=state.step + 1), loss

# uninterrupted 4-step run
state_a = make_state()
losses_a = []
for _ in range(4):
    state_a, l = step(state_a, imgs)
    losses_a.append(float(l))

# 2 steps -> coordinated save -> resume -> 2 more steps
state_b = make_state()
for _ in range(2):
    state_b, l = step(state_b, imgs)
save_checkpoint_multihost({ckpt!r}, state_b, epoch=2, note={{"kind": "mh-test"}})
if jax.process_index() == 0:
    assert os.path.isfile({ckpt!r})

state_c, meta = load_checkpoint_multihost({ckpt!r}, make_state())
assert meta["epoch"] == 2 and meta["note"]["kind"] == "mh-test"
assert int(np.asarray(state_c.step)) == 2
losses_c = []
for _ in range(2):
    state_c, l = step(state_c, imgs)
    losses_c.append(float(l))

np.testing.assert_array_equal(np.asarray(losses_c), np.asarray(losses_a[2:]))
print("RANK", jax.process_index(), "OK")
"""
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = "2"
    procs = []
    for rank in range(2):
        e = dict(env, JAX_PROCESS_ID=str(rank))
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", worker], env=e,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=300) for p in procs]
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-2000:]}"
        assert f"RANK {rank} OK" in out


@pytest.mark.slow
def test_latent_ddpm_sharded_matches_unsharded(tmp_path):
    """The latent family inherits data parallelism from the shared trainer:
    a latent DDPM epoch under the 8-device data mesh computes the same
    losses as unsharded (the round-1 DP contract, extended to round 4's
    newest family)."""
    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.parallel.mesh import make_mesh
    from igdm_tpu.training.latent import train_autoencoder, train_latent_ddpm

    rng = np.random.default_rng(0)
    base = rng.standard_normal((32, 4, 4, 1)).astype(np.float32)
    imgs = np.clip(np.repeat(np.repeat(base, 4, axis=1), 4, axis=2) * 0.5, -1, 1)
    ae = str(tmp_path / "ae.npz")
    train_autoencoder(imgs, epochs=2, batch_size=8, base_ch=8, latent_ch=4,
                      out_path=ae, log=None)

    def run(mesh, sub):
        d = tmp_path / sub
        d.mkdir()
        res, _ = train_latent_ddpm(
            imgs, ae, DiffusionConfig(num_steps=4),
            TrainConfig(batch_size=8, epochs=2, patience=50, checkpoint_every=0),
            base_ch=8, levels=2, mesh=mesh, out_dir=str(d), log=None,
        )
        return res.losses

    unsharded = run(None, "u")
    sharded = run(make_mesh(8), "s")
    np.testing.assert_allclose(unsharded, sharded, rtol=2e-5, atol=2e-6)
