"""Corrected few-step quality ladder for flow64 (teacher) vs reflow64
(2-rectified student), distill-ladder protocol: d01 from RAW data, samples
clip01((x+1)/2)."""
import json
import numpy as np
import jax, jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from igdm_tpu.data.mat import load_synthetic_images
from igdm_tpu.utils.quality import evaluate_samples
from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.sampling.flow import sample_flow

raw = load_synthetic_images()
d01 = (raw[..., 0] + 1.0) / 2.0

out = {}
for name, path in (("teacher", "artifacts/flow64_model.npz"),
                   ("reflow", "artifacts/reflow64_model.npz")):
    params, _, meta = load_for_sampling(path, prefer_ema=True)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    rows = {}
    for n in (1, 2, 4, 8, 16):
        o = sample_flow(params, jax.random.PRNGKey(11), num_images=64,
                        steps=n, method="euler")
        s01 = np.clip((np.asarray(o)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
        m = evaluate_samples(s01, d01)
        rows[f"euler-{n}"] = {k: round(float(v), 4) for k, v in m.items()}
        print(f"{name} euler-{n}:", rows[f"euler-{n}"], flush=True)
    out[name] = rows

from igdm_tpu.data.images import save_sample_grid
params, _, _ = load_for_sampling("artifacts/reflow64_model.npz", prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
o = sample_flow(params, jax.random.PRNGKey(11), num_images=64, steps=2, method="euler")
s01 = np.clip((np.asarray(o)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
save_sample_grid(s01, "/root/repo/artifacts/samples_reflow_euler2.png")
o = sample_flow(params, jax.random.PRNGKey(11), num_images=64, steps=1, method="euler")
s01 = np.clip((np.asarray(o)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
save_sample_grid(s01, "/root/repo/artifacts/samples_reflow_euler1.png")

with open("/root/repo/artifacts/reflow_quality2.json", "w") as f:
    json.dump(out, f, indent=1)
print("done")
