"""A/B training-step variants on the real chip, relay-safe (one dispatch per epoch)."""
import functools, time
import jax, jax.numpy as jnp
import igdm_tpu.training.ddpm as ddpm
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.models import unet_small
from igdm_tpu.models.embeddings import timestep_embedding

B, N = 128, 8192
dc = DiffusionConfig()
tc = TrainConfig(batch_size=B, compute_dtype="bfloat16")
imgs = jax.random.normal(jax.random.PRNGKey(1), (N, 32, 32, 1), jnp.float32)
steps = -(-N // B)


def make_apply(decompose):
    def apply_fn(params, model_state, x_t, ts, train):
        t_emb = timestep_embedding(ts.astype(jnp.float32), 128)
        return unet_small.apply(
            params, model_state, x_t, t_emb, train=train,
            decompose_time_conv=decompose, compute_dtype=jnp.bfloat16,
        )
    return apply_fn


def bench(name, apply_fn):
    orig = ddpm.make_apply_fn
    ddpm.make_apply_fn = lambda *a, **k: apply_fn
    try:
        key = jax.random.PRNGKey(0)
        state, tx = ddpm.init_train_state(key, dc, tc)
        fn = ddpm.build_epoch_fn(tx, dc, B, N, compute_dtype="bfloat16")
    finally:
        ddpm.make_apply_fn = orig
    state, loss = jax.block_until_ready(fn(state, imgs))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, loss = jax.block_until_ready(fn(state, imgs))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"{name}: {best/steps*1e3:.3f} ms/step, {steps/best:.1f} steps/s (loss {float(jnp.mean(loss)):.4f})")


bench("decomposed conv1 (current)", make_apply(True))
bench("concat conv1", make_apply(False))
