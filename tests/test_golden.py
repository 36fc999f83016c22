"""Golden-output regression tests.

tests/golden/ref_epoch95_T5.npz holds injected noise + the sampled output of
the reference's ddpm_epoch_95.bson checkpoint through the T=5 ancestral
sampler (generated on the JAX CPU backend). Any change to the BSON importer,
the U-Net forward, or the sampler algebra that shifts outputs shows up here.
This is the executable form of the BASELINE.json parity gate: same
checkpoint + same noise -> same images within float tolerance.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ref_epoch95_T5.npz")
REF_CKPT = "/root/reference/ddpm_epoch_95.bson"

pytestmark = pytest.mark.skipif(
    not (os.path.isfile(GOLDEN) and os.path.isfile(REF_CKPT)),
    reason="golden file or reference checkpoint unavailable",
)


def test_reference_checkpoint_sampling_matches_golden():
    from igdm_tpu.checkpoint.bson_import import import_simple_unet
    from igdm_tpu.config import DiffusionConfig
    from igdm_tpu.sampling.ancestral import sample_ddpm

    data = np.load(GOLDEN)
    params, state, _ = import_simple_unet(REF_CKPT)
    out = sample_ddpm(
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, state),
        jax.random.PRNGKey(0),
        num_images=2,
        cfg=DiffusionConfig(num_steps=5),
        x_init=data["x_init"],
        noises=data["noises"],
    )
    np.testing.assert_allclose(np.asarray(out), data["expected"], atol=2e-3)
