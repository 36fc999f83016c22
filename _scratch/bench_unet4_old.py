"""Emulate the previous bf16 unet4 path (bf16 conv -> f32 bias-add -> f32 GN+SiLU)."""
import time
import jax, jax.numpy as jnp
import igdm_tpu.training.ddpm as ddpm
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.models import unet4
from igdm_tpu.models.embeddings import timestep_embedding
from igdm_tpu.ops.nn import conv2d, group_norm, max_pool_2x2, silu, upsample_bilinear_2x

B, N = 64, 4096
dc = DiffusionConfig(schedule="cosine")
imgs = jax.random.normal(jax.random.PRNGKey(1), (N, 32, 32, 1), jnp.float32)
steps = -(-N // B)
cdt = jnp.bfloat16

def old_block(p, x, groups=8):
    def conv(x, cp):
        return conv2d(x.astype(cdt), cp["w"].astype(cdt)).astype(jnp.float32) + cp["b"].reshape(1,1,1,-1)
    h = conv(x, p["conv1"])
    h = silu(group_norm(h, p["gn1"]["scale"], p["gn1"]["bias"], groups=groups))
    if "conv2" in p:
        h = conv(h, p["conv2"])
        h = silu(group_norm(h, p["gn2"]["scale"], p["gn2"]["bias"], groups=groups))
    return h

def old_apply(params, x, ts, time_dim=128):
    raw = timestep_embedding(ts, time_dim)
    t1 = params["time_mlp"]["dense1"]; t2 = params["time_mlp"]["dense2"]
    tfeat = silu(jnp.dot(raw, t1["w"], preferred_element_type=jnp.float32) + t1["b"])
    tfeat = jnp.dot(tfeat, t2["w"], preferred_element_type=jnp.float32) + t2["b"]
    def add_time(pl, h):
        b = jnp.dot(tfeat, pl["tbias"]["w"], preferred_element_type=jnp.float32) + pl["tbias"]["b"]
        return h + b[:, None, None, :]
    levels = sum(1 for k in params if k.startswith("down"))
    skips = []
    h = x
    for i in range(1, levels + 1):
        h = add_time(params[f"down{i}"], old_block(params[f"down{i}"]["block"], h))
        skips.append(h); h = max_pool_2x2(h)
    h = add_time(params["mid"], old_block(params["mid"]["block"], h))
    for i, skip in zip(range(levels - 1, -1, -1), reversed(skips)):
        h = upsample_bilinear_2x(h)
        h = jnp.concatenate([h, skip], axis=-1)
        h = add_time(params[f"up{i}"], old_block(params[f"up{i}"]["block"], h))
    return conv2d(h, params["final"]["w"])

def apply_old(params, model_state, x_t, ts_, train):
    return old_apply(params, x_t, ts_), model_state

def bench(name, apply_fn):
    orig = ddpm.make_apply_fn
    ddpm.make_apply_fn = lambda *a, **k: apply_fn
    try:
        tc = TrainConfig(batch_size=B, compute_dtype="bfloat16")
        state, tx = ddpm.init_train_state(jax.random.PRNGKey(0), dc, tc, model_kind="unet4", base_ch=64)
        fn = ddpm.build_epoch_fn(tx, dc, B, N, model_kind="unet4", compute_dtype="bfloat16")
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

bench("unet4-64 OLD bf16 path (emulated)", apply_old)
