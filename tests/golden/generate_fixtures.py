"""Regenerate the golden parity fixtures (run on the JAX CPU backend).

    JAX_PLATFORMS=cpu python tests/golden/generate_fixtures.py

Produces:
  tests/golden/ref_epoch95_T5.npz   — x_init + per-step noises + expected output
                                      of /root/reference/ddpm_epoch_95.bson via
                                      the T=5 ancestral sampler
  tests/golden/ref_trained_T5.npz   — same for /root/reference/trained_model.bson
                                      (the artifact the reference's own main()
                                      loads, /root/reference/src/generate_images.jl:250)
  tests/golden/ref_trained_T500.npz — key-driven T=500 trajectory spot check on
                                      trained_model.bson; stores only the final
                                      image (noise derives from PRNGKey(42),
                                      stable threefry stream).

These are the executable form of the BASELINE.json parity gate: same
checkpoint + same injected noise -> same images within float tolerance
(reference sampler semantics at /root/reference/src/generate_images.jl:174-245).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# Match tests/conftest.py EXACTLY (platform + XLA flags): fusion decisions
# depend on --xla_force_host_platform_device_count, and flag drift between
# generation and test moves outputs by ~1e-6 — above the 1e-7 gate.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from igdm_tpu.checkpoint.bson_import import import_simple_unet
from igdm_tpu.config import DiffusionConfig
from igdm_tpu.sampling.ancestral import sample_ddpm

HERE = os.path.dirname(os.path.abspath(__file__))


def _as_jnp(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def gen_explicit(ckpt_path: str, out_name: str, *, seed: int, T: int = 5, n: int = 2):
    params, state, _ = import_simple_unet(ckpt_path)
    rng = np.random.default_rng(seed)
    x_init = rng.standard_normal((n, 32, 32, 1)).astype(np.float32)
    noises = rng.standard_normal((T - 1, n, 32, 32, 1)).astype(np.float32)
    out = sample_ddpm(
        _as_jnp(params), _as_jnp(state), jax.random.PRNGKey(0),
        num_images=n, cfg=DiffusionConfig(num_steps=T),
        x_init=x_init, noises=noises,
    )
    path = os.path.join(HERE, out_name)
    np.savez_compressed(path, x_init=x_init, noises=noises,
                        expected=np.asarray(out, np.float32))
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


def gen_key_driven_t500(ckpt_path: str, out_name: str):
    params, state, _ = import_simple_unet(ckpt_path)
    out = sample_ddpm(
        _as_jnp(params), _as_jnp(state), jax.random.PRNGKey(42),
        num_images=2, cfg=DiffusionConfig(num_steps=500),
    )
    path = os.path.join(HERE, out_name)
    np.savez_compressed(path, expected=np.asarray(out, np.float32))
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    assert jax.default_backend() == "cpu", "generate fixtures on the CPU backend"
    gen_explicit("/root/reference/ddpm_epoch_95.bson", "ref_epoch95_T5.npz", seed=1234)
    gen_explicit("/root/reference/trained_model.bson", "ref_trained_T5.npz", seed=5678)
    gen_key_driven_t500("/root/reference/trained_model.bson", "ref_trained_T500.npz")
