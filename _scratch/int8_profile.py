"""Profile the int8-static vs bf16 decode serving program: where do the
extra ~0.5 ms/call go?  summarize_trace top ops for each variant."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
jax.config.update("jax_compilation_cache_dir", os.path.join(ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from igdm_tpu.checkpoint.pytree_io import load_for_sampling
from igdm_tpu.models import autoencoder
from igdm_tpu.models.autoencoder import calibrate_decode_int8
from igdm_tpu.sampling.auto import _lmeta_scale
from igdm_tpu.sampling.flow import make_flow_sampler
from igdm_tpu.training.latent import load_autoencoder, resolve_ae_path
from igdm_tpu.utils.prof import profile_trace, summarize_trace

path = os.path.join(ROOT, "artifacts", "latent_reflow_model.npz")
params, _, meta = load_for_sampling(path, prefer_ema=True)
params = jax.tree_util.tree_map(jnp.asarray, params)
ae_params, _ = load_autoencoder(resolve_ae_path(path, meta["latent"]))
dm = meta.get("data", {})
scale = _lmeta_scale(meta["latent"])
B = 1024
zfn = make_flow_sampler(
    params, num_images=B, steps=1, method="euler",
    time_scale=float(meta["flow"].get("time_scale", 1000.0)),
    image_size=tuple(dm.get("image_size", (8, 8))),
    channels=int(dm.get("channels", 4)), compute_dtype=jnp.bfloat16,
)
z = zfn(jax.random.PRNGKey(7)) / scale
cal = calibrate_decode_int8(ae_params, z)

dec_bf16 = jax.jit(lambda z: autoencoder.decode(ae_params, z, compute_dtype=jnp.bfloat16))
dec_i8 = jax.jit(
    lambda z: autoencoder.decode(ae_params, z, compute_dtype="int8", act_scales=cal))

for name, fn in [("bf16", dec_bf16), ("int8-static", dec_i8)]:
    np.asarray(fn(z))  # compile
    logdir = f"/tmp/prof_{name}"
    with profile_trace(logdir):
        for _ in range(10):
            out = fn(z)
        np.asarray(out)
    print(f"=== {name} top device ops (ms over 10 calls) ===")
    for op, ms in summarize_trace(logdir, top=14):
        print(f"  {ms:8.3f}  {op}")
