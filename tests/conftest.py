"""Test configuration: force JAX onto a virtual 8-device CPU platform BEFORE
jax is imported anywhere, so multi-chip sharding tests run without hardware
(the standard JAX answer to multi-node-without-a-cluster; SURVEY.md section 4).
"""

import os
import sys

# force-set: the environment's sitecustomize pins JAX_PLATFORMS=axon (TPU)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin's sitecustomize may have already imported jax and set
# jax_platforms="axon,cpu"; override it before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat test runs skip XLA recompiles
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def dataset():
    from igdm_tpu.data.mat import load_synthetic_images

    return load_synthetic_images()


@pytest.fixture(autouse=True)
def _tmp_cwd(tmp_path, monkeypatch):
    """Artifact-writing API functions save PNGs relative to CWD (reference
    behavior); isolate each test in a tmp dir."""
    monkeypatch.chdir(tmp_path)
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
