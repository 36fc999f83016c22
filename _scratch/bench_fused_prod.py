import time
import jax, jax.numpy as jnp
import igdm_tpu.training.ddpm as ddpm
from igdm_tpu.config import DiffusionConfig, TrainConfig

B, N = 128, 8192
dc = DiffusionConfig()
imgs = jax.random.normal(jax.random.PRNGKey(1), (N, 32, 32, 1), jnp.float32)
steps = -(-N // B)
for B in (128, 64):
    tc = TrainConfig(batch_size=B, compute_dtype="bfloat16")
    steps = -(-N // B)
    state, tx = ddpm.init_train_state(jax.random.PRNGKey(0), dc, tc)
    fn = ddpm.build_epoch_fn(tx, dc, B, N, compute_dtype="bfloat16")
    state, loss = jax.block_until_ready(fn(state, imgs))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        state, loss = jax.block_until_ready(fn(state, imgs))
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(f"batch {B}: {best/steps*1e3:.3f} ms/step, {steps/best:.1f} steps/s, {steps*B/best:.0f} img/s (loss {float(jnp.mean(loss)):.4f})")
