"""Benchmark: 32x32 DDPM sampling throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Headline metric (BASELINE.json): 32x32 samples/sec/chip at T=500 ancestral
DDPM sampling. The reference publishes no numbers (BASELINE.md) — its
committed config is a host-side Julia loop on CPU; vs_baseline is measured
against a conservative estimate of that loop's throughput (see
BASELINE.md: the reference makes T-1 sequential single-threaded CPU U-Net
calls; measured-equivalent CPU throughput recorded in BENCH_NOTES).
Secondary metrics go to stderr for the record.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def _sync(x):
    """Force true completion. On the axon relay backend block_until_ready
    returns early for queued dispatches; only a host fetch really syncs."""
    import numpy as np

    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def _median(xs):
    s = sorted(xs)
    return s[len(s) // 2]


def _device_ms_from_trace(logdir: str) -> float:
    """Total on-device time (ms) — XLA module spans on the device lanes
    (BASELINE.md round-2 methodology; wall minus this is dispatch/fetch
    overhead)."""
    from igdm_tpu.utils.prof import device_module_ms

    return device_module_ms(logdir)


def bench_null_call(iters: int = 15) -> float:
    """Median round-trip of an empty jitted call (ms): the dev relay's
    dispatch constant (~27 ms here, ~0 on co-located TPU). Carried in the
    bench JSON so cross-round wall-time deltas can be split into
    environment noise vs real change (VERDICT r2 task 3)."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.float32(0.0)
    _sync(f(x))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(f(x))
        times.append(time.perf_counter() - t0)
    return _median(times) * 1e3


def bench_sampling(batch: int = 64, T: int = 500, iters: int = 5, profile_dir=None):
    from igdm_tpu.config import DiffusionConfig
    from igdm_tpu.models import unet_small
    from igdm_tpu.sampling.ancestral import make_sampler

    cfg = DiffusionConfig(num_steps=T)
    params, state = unet_small.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(42)
    # serving config: weights baked as XLA constants (~15%), BN folded +
    # bf16 conv compute (+19%, outputs within bf16 rounding of the f32 path
    # — tests/test_sampling.py pins the agreement)
    fn = make_sampler(
        params, state, cfg=cfg, num_images=batch, compute_dtype=jnp.bfloat16
    )

    _sync(fn(key))  # warmup/compile
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _sync(fn(jax.random.fold_in(key, i)))
        times.append(time.perf_counter() - t0)
    device_step_ms = None
    if profile_dir:
        from igdm_tpu.utils.prof import profile_trace

        with profile_trace(profile_dir):
            _sync(fn(jax.random.fold_in(key, 999)))
        device_step_ms = _device_ms_from_trace(profile_dir) / (T - 1)
    return batch / min(times), min(times), _median(times), device_step_ms


def bench_train_step(
    batch: int = 64, T: int = 500, iters: int = 5, n_images: int = 8192,
    profile_dir=None,
):
    """Steady-state train-step throughput.

    n_images=8192 (64-128 steps per jitted epoch) amortizes this dev
    environment's ~27 ms remote-relay dispatch latency per epoch call —
    measured per-step DEVICE time is identical at n=512 vs n=8192; only the
    relay round-trips differ (BASELINE.md). Mixed precision (bf16 convs,
    f32 master params/BN stats) is the production training config.
    """
    from igdm_tpu.config import DiffusionConfig, TrainConfig
    from igdm_tpu.training.ddpm import build_epoch_fn, init_train_state

    diff_cfg = DiffusionConfig(num_steps=T)
    train_cfg = TrainConfig(batch_size=batch)
    state, tx = init_train_state(jax.random.PRNGKey(0), diff_cfg, train_cfg)
    epoch_fn = build_epoch_fn(tx, diff_cfg, batch, n_images, compute_dtype="bfloat16")
    imgs = jax.random.normal(jax.random.PRNGKey(1), (n_images, 32, 32, 1), jnp.float32)
    steps_per_epoch = -(-n_images // batch)

    state, loss = epoch_fn(state, imgs)  # compile
    _sync(loss)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        state, loss = epoch_fn(state, imgs)
        _sync(loss)
        times.append(time.perf_counter() - t0)
    device_step_ms = None
    if profile_dir:
        from igdm_tpu.utils.prof import profile_trace

        with profile_trace(profile_dir):
            state, loss = epoch_fn(state, imgs)
            _sync(loss)
        device_step_ms = _device_ms_from_trace(profile_dir) / steps_per_epoch
    return steps_per_epoch / min(times), steps_per_epoch / _median(times), device_step_ms


def _time_scan_repeat(fn, batch: int, R: int) -> float:
    """samples/s of ``fn(key) -> images``: R trajectories scanned inside ONE
    jitted program (amortizes the relay dispatch), scalar-only fetch,
    best-of-3 timing — the docs/design.md methodology, shared by every
    few-step serving bench."""

    @jax.jit
    def multi(key):
        def body(acc, i):
            return acc + jnp.mean(fn(jax.random.fold_in(key, i))), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(R))
        return acc

    key = jax.random.PRNGKey(0)
    _sync(multi(key))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        _sync(multi(jax.random.fold_in(key, 100 + i)))
        times.append(time.perf_counter() - t0)
    return batch / (min(times) / R)


def bench_distilled(path: str, batch: int = 256, R: int = 20):
    """Distilled-student serving throughput (8 deterministic steps/traj).

    Timing per docs/design.md: R trajectories scanned INSIDE one program
    (amortizes the relay dispatch), scalar-only fetch. Round-5 config:
    int8 MXU convs, static calibrated scales — measured +18.8% over bf16
    (7,909 vs 6,656 samples/s) at statistically identical 512x3 quality
    (nn_mse 0.0655+-0.0015 vs 0.0676+-0.0014; BASELINE.md round-5 int8
    section)."""
    import jax.lax as lax

    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.config import DiffusionConfig, config_from_dict
    from igdm_tpu.sampling.ancestral import make_distilled_sampler

    params, _, meta = load_for_sampling(path, prefer_ema=False)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    grid = meta["distill"]["grid"]
    kind = meta.get("model", "unet4")
    fn = make_distilled_sampler(
        params, grid, cfg=cfg, num_images=batch, model_kind=kind,
        # int8 is unet4-only; other kinds keep the prior bf16 config
        compute_dtype="int8" if kind == "unet4" else jnp.bfloat16,
    )

    return _time_scan_repeat(fn, batch, R), len(grid) - 1


def bench_latent(path: str, batch: int = 1024, R: int = 8):
    """Latent-diffusion serving throughput: full T=500 ancestral trajectory
    in the 8x8x4 latent space + VAE decode (BASELINE.md round-4 latent
    section). Round-5 serving config (measured sweep, BASELINE.md latent
    roofline): make_latent_sampler (decode fused into the trajectory
    program), f32 compute — bf16 is a measured NEGATIVE at 8x8 latent conv
    shapes (-6.6%) — and batch 1024 (the sweep's optimum; 256 -> 2530,
    1024 -> 2656, 4096 -> 2305 samples/s). Same in-program-repeat harness
    as bench_distilled."""
    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.config import DiffusionConfig, config_from_dict
    from igdm_tpu.sampling.auto import _lmeta_scale
    from igdm_tpu.sampling.latent import make_latent_sampler
    from igdm_tpu.training.latent import load_autoencoder, resolve_ae_path

    params, state, meta = load_for_sampling(path, prefer_ema=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    lmeta = meta["latent"]
    ae_params, _ = load_autoencoder(resolve_ae_path(path, lmeta))
    cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    dm = meta.get("data", {})
    fn = make_latent_sampler(
        params, ae_params, cfg=cfg, scale=_lmeta_scale(lmeta),
        num_images=batch, latent_size=tuple(dm.get("image_size", (8, 8))),
        latent_ch=int(dm.get("channels", 4)), method="ancestral",
        model_state=state, compute_dtype=None,
    )

    return _time_scan_repeat(fn, batch, R)


def bench_lcm(path: str, batch: int = 1024, R: int = 50):
    """Latent-consistency-model serving: ONE student call in latent space +
    VAE decode per batch (BASELINE.md LCM section) — the framework's
    fastest operating point. Round-5 config: batch 1024 + bf16 decode
    (the 1-call batch sweep's optimum — the decoder's 32x32 conv is the
    biggest single op and runs 2x at bf16 there; BASELINE.md latent
    roofline). Same in-program-repeat harness."""
    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.config import DiffusionConfig, config_from_dict
    from igdm_tpu.models import autoencoder
    from igdm_tpu.sampling.auto import _lmeta_scale
    from igdm_tpu.sampling.consistency import make_consistency_sampler
    from igdm_tpu.training.latent import load_autoencoder, resolve_ae_path

    params, state, meta = load_for_sampling(path)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    ae_params, _ = load_autoencoder(resolve_ae_path(path, meta["latent"]))
    cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    dm = meta.get("data", {})
    scale = _lmeta_scale(meta["latent"])
    zfn = make_consistency_sampler(
        params, meta["consistency"]["grid"], cfg=cfg, num_images=batch,
        steps=1, image_size=tuple(dm.get("image_size", (8, 8))),
        channels=int(dm.get("channels", 4)),
        model_kind=meta.get("model", "unet4"),
        model_state=state or None,
        sigma_data=float(meta["consistency"].get("sigma_data", 0.5)),
        compute_dtype=jnp.bfloat16,
    )

    def fn(key):
        # decode traces into the same jitted repeat-program as the student
        # call (bf16 decoder convs — the round-5 fused serving epilogue)
        return autoencoder.decode(
            ae_params, zfn(key) / scale, compute_dtype=jnp.bfloat16
        )

    return _time_scan_repeat(fn, batch, R)


def bench_latent_reflow(path: str, batch: int = 1024, R: int = 50):
    """Latent-reflow 1-call serving: one euler step in latent space + VAE
    decode (BASELINE.md latent-flow section — the recommended 1-call
    operating point). Round-5 config: batch 1024 + bf16 decode (measured
    +15% and +11% respectively; BASELINE.md latent roofline)."""
    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.models import autoencoder
    from igdm_tpu.sampling.auto import _lmeta_scale
    from igdm_tpu.sampling.flow import make_flow_sampler
    from igdm_tpu.training.latent import load_autoencoder, resolve_ae_path

    params, _, meta = load_for_sampling(path, prefer_ema=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    ae_params, _ = load_autoencoder(resolve_ae_path(path, meta["latent"]))
    dm = meta.get("data", {})
    scale = _lmeta_scale(meta["latent"])
    zfn = make_flow_sampler(
        params, num_images=batch, steps=1, method="euler",
        time_scale=float(meta["flow"].get("time_scale", 1000.0)),
        image_size=tuple(dm.get("image_size", (8, 8))),
        channels=int(dm.get("channels", 4)), compute_dtype=jnp.bfloat16,
    )

    def fn(key):
        return autoencoder.decode(
            ae_params, zfn(key) / scale, compute_dtype=jnp.bfloat16
        )

    return _time_scan_repeat(fn, batch, R)


def bench_reflow(path: str, batch: int = 256, R: int = 100, steps: int = 1):
    """Reflowed rectified-flow serving throughput (1 model call/traj —
    BASELINE.md reflow table). Same in-program-repeat harness as
    bench_distilled. Round-5 config: int8 MXU convs with static calibrated
    activation scales — measured +18% over bf16 at statistically identical
    512x3 quality (nn_mse 0.01466+-0.00042 vs 0.01460+-0.00040, coverage
    0.426 both; BASELINE.md round-5 int8 section)."""
    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.sampling.flow import make_flow_sampler

    params, _, meta = load_for_sampling(path, prefer_ema=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    fn = make_flow_sampler(
        params, num_images=batch, steps=steps, method="euler",
        time_scale=float(meta["flow"].get("time_scale", 1000.0)),
        compute_dtype="int8",
    )

    return _time_scan_repeat(fn, batch, R)


def bench_consistency(path: str, batch: int = 256, R: int = 100):
    """Consistency-distilled 1-call serving throughput (same in-program
    repeat harness as bench_distilled/bench_reflow). Round-5 config: int8
    MXU convs, static calibrated scales — measured +17.5% over bf16 at
    statistically identical 512x3 quality (nn_mse 0.06116+-0.00055 vs
    0.06102+-0.00056; BASELINE.md round-5 int8 section)."""
    from igdm_tpu.checkpoint.pytree_io import load_for_sampling
    from igdm_tpu.config import DiffusionConfig, config_from_dict
    from igdm_tpu.sampling.consistency import make_consistency_sampler

    params, _, meta = load_for_sampling(path, prefer_ema=False)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    kind = meta.get("model", "unet4")
    fn = make_consistency_sampler(
        params, meta["consistency"]["grid"], cfg=cfg, num_images=batch,
        steps=1, model_kind=kind,
        sigma_data=float(meta["consistency"].get("sigma_data", 0.5)),
        # int8 is unet4-only; other kinds keep the prior bf16 config
        compute_dtype="int8" if kind == "unet4" else jnp.bfloat16,
    )

    return _time_scan_repeat(fn, batch, R)


def main():
    import tempfile

    # persistent compile cache: the relay's remote-compile latency is
    # multi-minute per cold program this session (round-4 note); warm
    # cache entries from prior runs make the bench start in seconds
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    explicit_profile = os.environ.get("IGDM_PROFILE")
    tmp_root = tempfile.mkdtemp(prefix="igdm_bench_prof_")
    samp_prof = explicit_profile or os.path.join(tmp_root, "sampling")
    train_prof = os.path.join(tmp_root, "train128")

    null_ms = bench_null_call()

    # batch 256 ~1.8x batch-64 throughput (measured 2026-08-16); samples/s/chip
    # is the metric, batch is free to choose
    samples_per_sec, wall, wall_median, samp_device_ms = bench_sampling(
        batch=256, profile_dir=samp_prof
    )
    train_steps_64, _, _ = bench_train_step(batch=64)
    train_steps_128, train_steps_128_median, train_device_ms = bench_train_step(
        batch=128, profile_dir=train_prof
    )
    per_step_ms = wall / 499 * 1e3  # T-1 denoise steps per trajectory
    if explicit_profile:
        print(f"[bench] profiler trace written to {explicit_profile}", file=sys.stderr)

    print(
        f"[bench] sampling: {samples_per_sec:.2f} samples/s (batch 256, T=500, {wall:.3f}s/traj), "
        f"per-denoise-step {per_step_ms:.3f} ms wall / {samp_device_ms:.3f} ms device, "
        f"train {train_steps_64:.2f} steps/s (batch 64) / {train_steps_128:.2f} steps/s (batch 128, "
        f"{train_device_ms:.3f} ms/step device), null call {null_ms:.1f} ms",
        file=sys.stderr,
    )

    # The reference publishes no baseline (BASELINE.md). vs_baseline uses a
    # measured CPU-equivalent of its committed pipeline: the same 847K-param
    # U-Net, T=500 ancestral loop, batch 64, on this host's CPU (JAX CPU
    # backend — generous vs the reference's single-threaded Julia loop):
    # 0.22 samples/s measured 2026-08-16 (see BASELINE.md).
    baseline_samples_per_sec = 0.22
    # All BASELINE.json metrics ride the single parsed JSON line (VERDICT r1
    # task 7). Device-time fields + null-call latency + medians make
    # cross-round deltas falsifiable: wall spread at identical binaries was
    # 362.8 -> 288 samples/s across a day (relay/tenancy, BASELINE.md);
    # device_step_ms is the chip-state-independent number (VERDICT r2 task 3).
    record = {
        "metric": "ddpm_32x32_samples_per_sec_per_chip_T500",
        "value": round(samples_per_sec, 3),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / baseline_samples_per_sec, 2),
        "per_denoise_step_ms": round(per_step_ms, 4),
        "sampling_device_step_ms": round(samp_device_ms, 4) if samp_device_ms else None,
        "sampling_samples_per_sec_median": round(256.0 / wall_median, 3),
        "null_call_ms": round(null_ms, 2),
        "train_steps_per_sec_batch64": round(train_steps_64, 2),
        "train_steps_per_sec_batch128": round(train_steps_128, 2),
        "train_steps_per_sec_batch128_median": round(train_steps_128_median, 2),
        "train_device_step_ms_batch128": round(train_device_ms, 4) if train_device_ms else None,
        "train_imgs_per_sec_batch128": round(train_steps_128 * 128, 1),
    }
    distilled_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "distilled8_model.npz"
    )
    if os.path.exists(distilled_ckpt):  # serving operating point (BASELINE.md)
        try:
            sps, n_steps = bench_distilled(distilled_ckpt)
            record[f"distilled{n_steps}_samples_per_sec"] = round(sps, 1)
        except Exception as e:  # bench must never fail on an optional metric
            print(f"[bench] distilled bench skipped: {e}", file=sys.stderr)
    reflow_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "reflow64_model.npz"
    )
    if os.path.exists(reflow_ckpt):  # 1-call serving operating point
        try:
            record["reflow1_samples_per_sec"] = round(bench_reflow(reflow_ckpt), 1)
        except Exception as e:
            print(f"[bench] reflow bench skipped: {e}", file=sys.stderr)
    lref_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "latent_reflow_model.npz"
    )
    if os.path.exists(lref_ckpt):  # recommended 1-call operating point
        try:
            record["latent_reflow1_samples_per_sec"] = round(bench_latent_reflow(lref_ckpt), 1)
        except Exception as e:
            print(f"[bench] latent-reflow bench skipped: {e}", file=sys.stderr)
    lcm_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "lcm_model.npz"
    )
    if os.path.exists(lcm_ckpt):  # 1-call latent operating point (fastest)
        try:
            record["lcm1_samples_per_sec"] = round(bench_lcm(lcm_ckpt), 1)
        except Exception as e:
            print(f"[bench] lcm bench skipped: {e}", file=sys.stderr)
    latent_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "latent_model.npz"
    )
    if os.path.exists(latent_ckpt):  # full-T latent-space operating point
        try:
            record["latent_t500_samples_per_sec"] = round(bench_latent(latent_ckpt), 1)
        except Exception as e:
            print(f"[bench] latent bench skipped: {e}", file=sys.stderr)
    l64_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "latent64_model.npz"
    )
    if os.path.exists(l64_ckpt):  # 64x64 stretch: full-T latent (16x16 latents)
        try:
            # batch 256 is the measured 64x64 optimum (BASELINE.md r5 64x64
            # latent section: 256 -> 711.5, 1024 -> 607.0 samples/s)
            record["latent64_t500_samples_per_sec"] = round(
                bench_latent(l64_ckpt, batch=256, R=8), 1
            )
        except Exception as e:
            print(f"[bench] latent64 bench skipped: {e}", file=sys.stderr)
    l64r_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "latent64_reflow_model.npz"
    )
    if os.path.exists(l64r_ckpt):  # 64x64 1-call operating point
        try:
            record["latent64_reflow1_samples_per_sec"] = round(
                bench_latent_reflow(l64r_ckpt, batch=1024, R=30), 1
            )
        except Exception as e:
            print(f"[bench] latent64-reflow bench skipped: {e}", file=sys.stderr)
    cd_ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "consistency_model.npz"
    )
    if os.path.exists(cd_ckpt):  # consistency-distilled 1-call operating point
        try:
            record["consistency1_samples_per_sec"] = round(bench_consistency(cd_ckpt), 1)
        except Exception as e:
            print(f"[bench] consistency bench skipped: {e}", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
