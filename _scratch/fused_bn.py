"""Prototype: custom-VJP fused train-mode BatchNorm+ReLU with minimal-pass backward."""
import functools, time
import jax, jax.numpy as jnp
from jax import lax
import igdm_tpu.training.ddpm as ddpm
from igdm_tpu.config import DiffusionConfig, TrainConfig
from igdm_tpu.models import unet_small
from igdm_tpu.models.embeddings import timestep_embedding
from igdm_tpu.ops.nn import conv2d, batch_norm, max_pool_2x2, conv_transpose2d


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_relu_train(x, scale, bias, eps=1e-5):
    y, _, _, _ = _fwd_impl(x, scale, bias, eps)
    return y


def _fwd_impl(x, scale, bias, eps):
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x - mean.reshape(1, 1, 1, -1)), axis=(0, 1, 2))
    inv = lax.rsqrt(var + eps)
    x_hat = (x - mean.reshape(1, 1, 1, -1)) * inv.reshape(1, 1, 1, -1)
    y = jax.nn.relu(x_hat * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1))
    return y, x_hat, inv, (mean, var)


def _fwd(x, scale, bias, eps):
    y, x_hat, inv, _ = _fwd_impl(x, scale, bias, eps)
    # residuals: bf16 x_hat halves backward bandwidth
    return y, (x_hat.astype(jnp.bfloat16), inv, scale, bias)


def _bwd(eps, res, dy):
    x_hat_b, inv, scale, bias = res
    x_hat = x_hat_b.astype(jnp.float32)
    z_pos = (x_hat * scale.reshape(1, 1, 1, -1) + bias.reshape(1, 1, 1, -1)) > 0
    dz = jnp.where(z_pos, dy, 0.0)
    dbeta = jnp.sum(dz, axis=(0, 1, 2))
    dgamma = jnp.sum(dz * x_hat, axis=(0, 1, 2))
    n = dy.shape[0] * dy.shape[1] * dy.shape[2]
    k = (scale * inv).reshape(1, 1, 1, -1)
    dx = k * (dz - (dbeta / n).reshape(1, 1, 1, -1) - x_hat * (dgamma / n).reshape(1, 1, 1, -1))
    return dx, dgamma, dbeta


bn_relu_train.defvjp(_fwd, _bwd)


# --- correctness check vs autodiff of the existing path ---
def ref_fn(x, s, b):
    y, _, _ = batch_norm(x, s, b, jnp.zeros(x.shape[-1]), jnp.ones(x.shape[-1]), train=True)
    return jnp.sum(jnp.square(jax.nn.relu(y)))


def new_fn(x, s, b):
    return jnp.sum(jnp.square(bn_relu_train(x, s, b)))


key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (8, 16, 16, 32))
s = jax.random.normal(jax.random.PRNGKey(1), (32,)) * 0.1 + 1.0
b = jax.random.normal(jax.random.PRNGKey(2), (32,)) * 0.1
g1 = jax.grad(ref_fn, argnums=(0, 1, 2))(x, s, b)
g2 = jax.grad(new_fn, argnums=(0, 1, 2))(x, s, b)
for a, c, nm in zip(g1, g2, "x s b".split()):
    d = float(jnp.max(jnp.abs(a - c)))
    r = float(jnp.max(jnp.abs(a)))
    print(f"grad d{nm}: max|diff| {d:.3e} (scale {r:.3e})")


# --- training-step benchmark with the fused block ---
def fused_conv_bn_relu(p, s, name_conv, name_bn, x, compute_dtype):
    h = conv2d(x.astype(compute_dtype), p[name_conv]["w"].astype(compute_dtype))
    h = h.astype(jnp.float32) + p[name_conv]["b"].reshape(1, 1, 1, -1)
    y = bn_relu_train(h, p[name_bn]["scale"], p[name_bn]["bias"])
    # running stats recomputed outside the grad path (stop_gradient, cheap 2 reductions)
    hs = lax.stop_gradient(h)
    mean = jnp.mean(hs, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(hs - mean.reshape(1, 1, 1, -1)), axis=(0, 1, 2))
    n = h.shape[0] * h.shape[1] * h.shape[2]
    unb = var * (n / max(n - 1, 1))
    m, v = s[name_bn]["mean"], s[name_bn]["var"]
    return y, {name_bn: {"mean": 0.9 * m + 0.1 * mean, "var": 0.9 * v + 0.1 * unb}}


def fused_apply(params, state, x, t_emb, compute_dtype=jnp.bfloat16):
    def block(p, s, x):
        ns = {}
        for cn, bn in [("conv1", "bn1"), ("conv2", "bn2")]:
            x, upd = fused_conv_bn_relu(p, s, cn, bn, x, compute_dtype)
            ns.update(upd)
        return x, ns

    b_, h_, w_, _ = x.shape
    tmap = jnp.broadcast_to(t_emb[:, None, None, :], (b_, h_, w_, t_emb.shape[-1]))
    xin = jnp.concatenate([x, tmap], axis=-1)
    h1, s_d1 = block(params["down1"], state["down1"], xin)
    h2, s_d2 = block(params["down2"], state["down2"], max_pool_2x2(h1))
    h3, s_mid = block(params["mid"], state["mid"], h2)
    up = conv_transpose2d(h3, params["up2"]["convt"]["w"], params["up2"]["convt"]["b"], stride=2)
    up, s_u2 = block(params["up2"], state["up2"], up)
    hh, ww = up.shape[1], up.shape[2]
    cat = jnp.concatenate([up, h1[:, :hh, :ww, :]], axis=-1)
    out, s_u1 = block(params["up1"], state["up1"], cat)
    eps_ = conv2d(out, params["final"]["w"], params["final"]["b"])
    return eps_, {"down1": s_d1, "down2": s_d2, "mid": s_mid, "up2": s_u2, "up1": s_u1}


B, N = 128, 8192
dc = DiffusionConfig()
tc = TrainConfig(batch_size=B, compute_dtype="bfloat16")
imgs = jax.random.normal(jax.random.PRNGKey(1), (N, 32, 32, 1), jnp.float32)
steps = -(-N // B)


def bench(name, apply_fn):
    orig = ddpm.make_apply_fn
    ddpm.make_apply_fn = lambda *a, **k: apply_fn
    try:
        state, tx = ddpm.init_train_state(jax.random.PRNGKey(0), dc, tc)
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


def cur_apply(params, model_state, x_t, ts_, train):
    t_emb = timestep_embedding(ts_.astype(jnp.float32), 128)
    return unet_small.apply(params, model_state, x_t, t_emb, train=train,
                            decompose_time_conv=False, compute_dtype=jnp.bfloat16)


def new_apply(params, model_state, x_t, ts_, train):
    t_emb = timestep_embedding(ts_.astype(jnp.float32), 128)
    return fused_apply(params, model_state, x_t, t_emb)


bench("current concat path", cur_apply)
bench("fused custom-VJP BN+ReLU", new_apply)
bench("current concat path (again)", cur_apply)
