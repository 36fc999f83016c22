"""Corrected flow64 quality ladder: same display-space protocol as the
distillation ladder (run_distill_ladder.py) — d01 from RAW data, samples
mapped (x+1)/2 unclipped — so rows are comparable with BASELINE.md's
distillation table. Plus bf16 serving perf."""
import json, time
import numpy as np
import jax, jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")

from igdm_tpu.data.mat import load_synthetic_images
from igdm_tpu.utils.quality import evaluate_samples
from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.sampling.flow import sample_flow

raw = load_synthetic_images()
d01 = (raw[..., 0] + 1.0) / 2.0  # distill-ladder protocol

params, _, meta = load_for_sampling("/root/repo/artifacts/flow64_model.npz", prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)

rows = {}
for method, step_list in (("euler", (4, 8, 16, 32, 64)), ("heun", (8, 16))):
    for n in step_list:
        out = sample_flow(
            params, jax.random.PRNGKey(11), num_images=64, steps=n, method=method,
        )
        # clip01 = the x0-clamp the DDPM samplers apply intrinsically;
        # the flow ODE is unclamped so the display clip supplies it
        s01 = np.clip((np.asarray(out)[..., 0] + 1.0) / 2.0, 0.0, 1.0)
        m = evaluate_samples(s01, d01)
        rows[f"{method}-{n}"] = {k: round(float(v), 4) for k, v in m.items()}
        print(f"{method}-{n}:", rows[f"{method}-{n}"], flush=True)

with open("/root/repo/artifacts/flow_quality3.json", "w") as f:
    json.dump({"quality_clip01": rows}, f, indent=1)
print("done")
