"""Profile one steady-state training epoch (batch 128, bf16) and dump per-op device times."""
import jax, jax.numpy as jnp, numpy as np, time
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.training.ddpm import build_epoch_fn, init_train_state, make_optimizer
from igdm_tpu.utils.prof import profile_trace, summarize_trace, timed

B = 128
N = 8192  # steady-state epoch: 64 steps/dispatch
dc = DiffusionConfig()
tc = TrainConfig(batch_size=B, compute_dtype="bfloat16")
key = jax.random.PRNGKey(0)
state, tx = init_train_state(key, dc, tc)
imgs = jax.random.normal(jax.random.PRNGKey(1), (N, 32, 32, 1), jnp.float32)
epoch_fn = build_epoch_fn(tx, dc, B, N, compute_dtype="bfloat16")

# warmup/compile
state, loss = jax.block_until_ready(epoch_fn(state, imgs))
t0 = time.perf_counter()
state, loss = jax.block_until_ready(epoch_fn(state, imgs))
t1 = time.perf_counter()
steps = -(-N // B)
print(f"epoch wall {t1-t0:.4f}s, {steps} steps -> {(t1-t0)/steps*1e3:.3f} ms/step, {steps/(t1-t0):.1f} steps/s")

with profile_trace("/root/repo/_scratch/trace_train"):
    state, loss = jax.block_until_ready(epoch_fn(state, imgs))

for name, ms in summarize_trace("/root/repo/_scratch/trace_train", top=40):
    print(f"{ms/steps*1000:9.1f} us/step  {name[:130]}")
