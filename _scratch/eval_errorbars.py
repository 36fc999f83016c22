"""Round-4 error-bar quality evaluation: the headline table rows re-scored
with 512 samples x 3 seeds (utils.quality.evaluate_sampler). Also re-scores
CD-2/CD-4 after the _mid_indices interior-placement fix (round-3 advisor).

Writes artifacts/quality_errorbars.json. Run on chip."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.config import DiffusionConfig, config_from_dict
from igdm_tpu.data.mat import load_synthetic_images
from igdm_tpu.utils.quality import evaluate_sampler

print(jax.devices(), flush=True)
raw = load_synthetic_images("/root/repo/SyntheticImages500.mat")
d01 = np.clip(raw[..., 0], 0.0, 1.0)  # frame-matched (round-5 correction, BASELINE.md)

A = "/root/repo/artifacts"


def disp(o):
    return np.clip((np.asarray(o)[..., 0] + 1.0) / 2.0, 0.0, 1.0)


def load(path, prefer_ema=True):
    params, state, meta = load_for_sampling(path, prefer_ema=prefer_ema)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = config_from_dict(DiffusionConfig, meta.get("diff_cfg", {}))
    return params, state, meta, cfg


def runs():
    # quality3 flagship (unet4-64 cosine T=500 eps, EMA)
    q_params, q_state, _, q_cfg = load(f"{A}/quality3_model_sampling.npz")

    from igdm_tpu.sampling.ancestral import make_textbook_sampler, sample_dpmpp2m

    tb = make_textbook_sampler(
        q_params, q_state, cfg=q_cfg, num_images=256, model_kind="unet4",
        compute_dtype=jnp.bfloat16,
    )
    yield "textbook-500", lambda key, n: disp(tb(key)[:n])
    for steps in (10, 50):
        yield f"dpmpp-{steps}", (
            lambda key, n, s=steps: disp(sample_dpmpp2m(
                q_params, q_state, key, num_images=n, cfg=q_cfg,
                num_sample_steps=s, model_kind="unet4"))
        )

    # progressive distillation student (8-step DDIM)
    from igdm_tpu.sampling.ancestral import make_distilled_sampler

    d_params, d_state, d_meta, d_cfg = load(f"{A}/distilled8_model.npz", prefer_ema=False)
    dfn = make_distilled_sampler(
        d_params, d_meta["distill"]["grid"], cfg=d_cfg, num_images=256,
        model_kind=d_meta.get("model", "unet4"), model_state=d_state,
        compute_dtype=jnp.bfloat16,
    )
    yield "distilled-8", lambda key, n: disp(dfn(key)[:n])

    # flow + reflow (euler few-step)
    from igdm_tpu.sampling.flow import sample_flow

    f_params, _, _, _ = load(f"{A}/flow64_model.npz")
    r_params, _, _, _ = load(f"{A}/reflow64_model.npz")
    yield "flow euler-8", lambda key, n: disp(sample_flow(
        f_params, key, num_images=n, steps=8, method="euler"))
    for s in (1, 2):
        yield f"reflow euler-{s}", (
            lambda key, n, s=s: disp(sample_flow(
                r_params, key, num_images=n, steps=s, method="euler"))
        )

    # consistency student (1/2/4 calls; 2/4 use the FIXED interior mids)
    from igdm_tpu.sampling.consistency import sample_consistency

    c_params, c_state, c_meta, c_cfg = load(f"{A}/consistency_model.npz", prefer_ema=False)
    grid = c_meta["consistency"]["grid"]
    for s in (1, 2, 4):
        yield f"cd-{s}", (
            lambda key, n, s=s: disp(sample_consistency(
                c_params, grid, key, num_images=n, steps=s, cfg=c_cfg,
                model_kind="unet4", model_state=c_state or None))
        )


out = {}
for name, fn in runs():
    t0 = time.time()
    rep = None
    for attempt in range(3):  # the relay's remote_compile endpoint is flaky
        try:
            rep = evaluate_sampler(fn, d01, n_samples=512, seeds=(0, 1, 2), batch=256)
            break
        except Exception as e:
            print(f"{name}: attempt {attempt} failed: {e}", flush=True)
            time.sleep(5)
    if rep is None:
        print(f"{name}: SKIPPED after 3 failures", flush=True)
        continue
    out[name] = rep
    m = {k: f"{rep[k]['mean']:.4f}±{rep[k]['std']:.4f}"
         for k in ("nn_mse", "coverage", "pairwise_diversity")}
    print(f"{name:16s} {m}  ({time.time()-t0:.0f}s)", flush=True)
    with open(f"{A}/quality_errorbars.json", "w") as f:
        json.dump(out, f, indent=1)

# real-data ceiling with the same protocol (512 random real images x 3 draws)
rngs = [np.random.default_rng(s) for s in (0, 1, 2)]
ceil = evaluate_sampler(
    lambda key, n: d01[np.random.default_rng(
        int(np.asarray(jax.random.key_data(key)).astype(np.int64).sum()) % 2**31
    ).choice(len(d01), n, replace=True)],
    d01, n_samples=512, seeds=(0, 1, 2), batch=256,
)
out["real-images"] = ceil
with open(f"{A}/quality_errorbars.json", "w") as f:
    json.dump(out, f, indent=1)
print("done", flush=True)
