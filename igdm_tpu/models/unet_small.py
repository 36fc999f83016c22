"""SimpleUNet — the 2-level, time-conditioned DDPM noise predictor.

Topology matches the reference's 847,169-param model exactly so its BSON
checkpoints can be imported (src/train_brain.jl:89-179):

  down1: Conv3x3 (1+D)->64 +BN(relu), Conv3x3 64->64 +BN(relu)
  down2: MaxPool2x2, Conv3x3 64->128 +BN(relu), Conv3x3 128->128 +BN(relu)
  mid:   Conv3x3 128->128 +BN(relu) x2
  up2:   ConvT2x2 128->64 stride 2, Conv3x3 64->64 +BN(relu) x2
  up1:   Conv3x3 128->64 +BN(relu), Conv3x3 64->64 +BN(relu)  (after skip concat)
  final: Conv1x1 64->1

Time conditioning is the reference's input-concat scheme: the (B, D) sinusoidal
embedding broadcasts over H, W and concatenates onto the input channels
(src/train_brain.jl:163-168). In NHWC this broadcast fuses into the first conv;
nothing is materialized host-side.

Layout: activations NHWC, kernels HWIO, params a plain pytree. BatchNorm
running statistics live in a separate ``state`` pytree so the apply function
stays pure: ``apply(params, state, x, t_emb, train=...) -> (eps_hat, state')``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from igdm_tpu.ops.nn import (
    batch_norm,
    batch_norm_relu_train,
    conv2d,
    conv_transpose2d,
    max_pool_2x2,
)
from igdm_tpu.ops.quant import conv2d_int8_from_f32

EMBED_DIM = 128


def _conv_init(key, kh, kw, cin, cout):
    fan_in = kh * kw * cin
    fan_out = kh * kw * cout
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -limit, limit)


def _conv(key, kh, kw, cin, cout):
    return {"w": _conv_init(key, kh, kw, cin, cout), "b": jnp.zeros((cout,), jnp.float32)}


def _bn(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _bn_state(c):
    return {"mean": jnp.zeros((c,), jnp.float32), "var": jnp.ones((c,), jnp.float32)}


def init(key, channels: int = 1, embed_dim: int = EMBED_DIM, *, mid_attn: bool = False):
    """Initialize (params, state) pytrees.

    channels: image channels — both input and eps-prediction output (1 for
      the reference pipeline, 3 for the CIFAR stretch config).
    mid_attn: add a residual self-attention block after the bottleneck
      (standard DDPM practice for the 64x64 stretch; absent in the
      reference, so off by default — checkpoint-import structures match).
    """
    ks = jax.random.split(key, 12)
    params = {
        "down1": {
            "conv1": _conv(ks[0], 3, 3, channels + embed_dim, 64),
            "bn1": _bn(64),
            "conv2": _conv(ks[1], 3, 3, 64, 64),
            "bn2": _bn(64),
        },
        "down2": {
            "conv1": _conv(ks[2], 3, 3, 64, 128),
            "bn1": _bn(128),
            "conv2": _conv(ks[3], 3, 3, 128, 128),
            "bn2": _bn(128),
        },
        "mid": {
            "conv1": _conv(ks[4], 3, 3, 128, 128),
            "bn1": _bn(128),
            "conv2": _conv(ks[5], 3, 3, 128, 128),
            "bn2": _bn(128),
        },
        "up2": {
            "convt": _conv(ks[6], 2, 2, 128, 64),
            "conv1": _conv(ks[7], 3, 3, 64, 64),
            "bn1": _bn(64),
            "conv2": _conv(ks[8], 3, 3, 64, 64),
            "bn2": _bn(64),
        },
        "up1": {
            "conv1": _conv(ks[9], 3, 3, 128, 64),
            "bn1": _bn(64),
            "conv2": _conv(ks[10], 3, 3, 64, 64),
            "bn2": _bn(64),
        },
        "final": _conv(ks[11], 1, 1, 64, channels),
    }
    if mid_attn:
        from igdm_tpu.ops.attention import init_attention

        params["attn"] = init_attention(jax.random.fold_in(key, 99), 128)
    state = {
        "down1": {"bn1": _bn_state(64), "bn2": _bn_state(64)},
        "down2": {"bn1": _bn_state(128), "bn2": _bn_state(128)},
        "mid": {"bn1": _bn_state(128), "bn2": _bn_state(128)},
        "up2": {"bn1": _bn_state(64), "bn2": _bn_state(64)},
        "up1": {"bn1": _bn_state(64), "bn2": _bn_state(64)},
    }
    return params, state


def _conv_bn_relu(p, s, name_conv, name_bn, x, *, train, axis_name, compute_dtype=None):
    if compute_dtype is not None and train:
        # mixed-precision training block: bf16 conv (fwd and both backward
        # matmuls at the MXU bf16 rate) straight into the fused
        # BatchNorm+ReLU custom-VJP op — one-pass f32 statistics over the
        # raw bf16 conv output, conv bias folded into the running-mean
        # record only (train-mode BN is shift-invariant), bf16 activations
        # and cotangents end to end. See ops/nn.batch_norm_relu_train.
        h = conv2d(x.astype(compute_dtype), p[name_conv]["w"].astype(compute_dtype))
        y, m, v = batch_norm_relu_train(
            h,
            p[name_bn]["scale"],
            p[name_bn]["bias"],
            s[name_bn]["mean"],
            s[name_bn]["var"],
            conv_bias=p[name_conv]["b"],
            axis_name=axis_name,
        )
        return y, {name_bn: {"mean": m, "var": v}}
    if compute_dtype is not None:
        # mixed-precision eval: the f32 bias-add promotes the output so
        # BatchNorm uses f32 running statistics.
        h = conv2d(x.astype(compute_dtype), p[name_conv]["w"].astype(compute_dtype))
        h = h.astype(jnp.float32) + p[name_conv]["b"].reshape(1, 1, 1, -1)
    else:
        h = conv2d(x, p[name_conv]["w"], p[name_conv]["b"])
    h, m, v = batch_norm(
        h,
        p[name_bn]["scale"],
        p[name_bn]["bias"],
        s[name_bn]["mean"],
        s[name_bn]["var"],
        train=train,
        axis_name=axis_name,
    )
    return jax.nn.relu(h), {name_bn: {"mean": m, "var": v}}


def _block(p, s, x, names, *, train, axis_name, compute_dtype=None):
    new_s = {}
    for conv_name, bn_name in names:
        x, upd = _conv_bn_relu(
            p, s, conv_name, bn_name, x,
            train=train, axis_name=axis_name, compute_dtype=compute_dtype,
        )
        new_s.update(upd)
    return x, new_s


def _time_conv_contrib(w_t, t_emb, h, wd):
    """Spatial contribution of the (spatially constant) time map through a
    3x3 SAME conv: t_emb @ (sum of the kernel taps that land in-bounds) —
    9 border classes (corner/edge/interior) of summed (D,O) matrices.
    Returns a lazily-broadcast (B,H,W,O) f32 term (XLA fuses the gather and
    transpose into the consumer add)."""
    sets = [(1, 2), (0, 1, 2), (0, 1)]  # valid tap indices: first/interior/last
    ms = [
        sum(w_t[a, c] for a in rs for c in cs) for rs in sets for cs in sets
    ]  # 9 x (D, O)
    contrib = jnp.einsum(
        "bd,kdo->kbo", t_emb, jnp.stack(ms), preferred_element_type=jnp.float32
    )  # (9, B, O)
    rcls = jnp.asarray([0] + [1] * (h - 2) + [2])
    ccls = jnp.asarray([0] + [1] * (wd - 2) + [2])
    idx = rcls[:, None] * 3 + ccls[None, :]  # (H, W)
    return contrib[idx].transpose(2, 0, 1, 3)


def _conv1_time_decomposed(p_conv1, x, t_emb, compute_dtype=None):
    """conv1 applied to concat(x, broadcast(t_emb)) WITHOUT materializing the
    (B,H,W,D) time map or running the (C+D)-channel conv.

    Cuts conv1 FLOPs by ~99% (~16% of the whole forward); measured ~27%
    faster for the op at batch 256. Exact up to f32-vs-bf16 conv rounding
    (this path is the more accurate one). Only valid when t_emb is
    per-example constant across H, W — i.e. always, in this model family.

    compute_dtype: bf16 runs the conv and the summed activation in bf16
    (f32 einsum for the tiny time matrices) — halves this bandwidth-bound
    op's traffic AND its backward cotangent; without it the decomposed
    conv1 was the one f32 island in the mixed-precision train step (its
    f32 wgrad alone measured 104.8 us/step at batch 128, BASELINE.md
    round-3 training attribution).
    """
    w = p_conv1["w"]
    b = p_conv1["b"]
    cin = x.shape[-1]
    h, wd = x.shape[1], x.shape[2]
    contrib = _time_conv_contrib(w[:, :, cin:, :], t_emb, h, wd)
    if compute_dtype is not None:
        y = conv2d(x.astype(compute_dtype), w[:, :, :cin, :].astype(compute_dtype))
        return y + (contrib + b.reshape(1, 1, 1, -1)).astype(compute_dtype)
    return conv2d(x, w[:, :, :cin, :], b) + contrib


def apply(
    params,
    state,
    x,
    t_emb,
    *,
    train: bool = False,
    axis_name: str | None = None,
    decompose_time_conv: bool = False,
    compute_dtype=None,
):
    """Forward pass.

    Args:
      x: (B, H, W, C) noisy images.
      t_emb: (B, D) timestep embeddings.
      train: batch-stats mode for BatchNorm (updates running stats).
      axis_name: data-parallel mesh axis for cross-replica BN stats.
      decompose_time_conv: replace the (C+D)-channel first conv with the
        exact spatially-constant decomposition (see _conv1_time_decomposed);
        used by the serving sampler.
      compute_dtype: jnp.bfloat16 runs every conv (and under grad, its two
        backward matmuls) at the MXU bf16 rate with f32 BatchNorm stats and
        f32 master params — standard TPU mixed-precision training. None
        keeps everything f32 (bit-exact with round-1 behavior).

    Returns (eps_hat (B,H,W,1), new_state).
    """
    b, h, w, _ = x.shape

    kw = dict(train=train, axis_name=axis_name, compute_dtype=compute_dtype)
    names2 = [("conv1", "bn1"), ("conv2", "bn2")]

    if decompose_time_conv and h >= 3 and w >= 3:
        d1 = params["down1"]
        s1 = state["down1"]
        hx = _conv1_time_decomposed(
            d1["conv1"], x, t_emb,
            compute_dtype=compute_dtype if (train and compute_dtype is not None) else None,
        )
        if train and compute_dtype is not None:
            hx, mn, vr = batch_norm_relu_train(
                hx, d1["bn1"]["scale"], d1["bn1"]["bias"],
                s1["bn1"]["mean"], s1["bn1"]["var"], axis_name=axis_name,
            )
        else:
            hx, mn, vr = batch_norm(
                hx, d1["bn1"]["scale"], d1["bn1"]["bias"], s1["bn1"]["mean"], s1["bn1"]["var"],
                train=train, axis_name=axis_name,
            )
            hx = jax.nn.relu(hx)
        h1, upd = _conv_bn_relu(
            d1, s1, "conv2", "bn2", hx,
            train=train, axis_name=axis_name, compute_dtype=compute_dtype,
        )
        s_d1 = {"bn1": {"mean": mn, "var": vr}, **upd}
    else:
        tmap = jnp.broadcast_to(t_emb[:, None, None, :], (b, h, w, t_emb.shape[-1]))
        xin = jnp.concatenate([x, tmap], axis=-1)
        h1, s_d1 = _block(params["down1"], state["down1"], xin, names2, **kw)
    h2, s_d2 = _block(params["down2"], state["down2"], max_pool_2x2(h1), names2, **kw)
    h3, s_mid = _block(params["mid"], state["mid"], h2, names2, **kw)
    if "attn" in params:
        from igdm_tpu.ops.attention import spatial_self_attention

        h3 = spatial_self_attention(params["attn"], h3.astype(jnp.float32))

    up = conv_transpose2d(h3, params["up2"]["convt"]["w"], params["up2"]["convt"]["b"], stride=2)
    up, s_u2 = _block(params["up2"], state["up2"], up, names2, **kw)

    # crop skip to the upsampled size (identity for even H, W) and concat
    # (fused-train blocks emit bf16; jnp promotes the concat as needed)
    hh, ww = up.shape[1], up.shape[2]
    cat = jnp.concatenate([up, h1[:, :hh, :ww, :]], axis=-1)

    out, s_u1 = _block(params["up1"], state["up1"], cat, names2, **kw)
    eps = conv2d(out.astype(jnp.float32), params["final"]["w"], params["final"]["b"])

    new_state = {"down1": s_d1, "down2": s_d2, "mid": s_mid, "up2": s_u2, "up1": s_u1}
    return eps, new_state


@partial(jax.jit, static_argnames=("train",))
def apply_jit(params, state, x, t_emb, train: bool = False):
    return apply(params, state, x, t_emb, train=train)


def num_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Inference-specialized path: BatchNorm folded into conv weights
# ---------------------------------------------------------------------------


def fold_bn(params, state, *, eps: float = 1e-5):
    """Fold eval-mode BatchNorm affine+stats into the preceding conv.

    y = BN(conv(x)) with running stats is conv(x)*s + t per channel, where
    s = gamma/sqrt(var+eps), t = beta - mean*s. Folding gives w' = w*s,
    b' = b*s + t — the sampler then runs a pure conv+bias+relu chain: fewer
    ops, fewer HBM round-trips, and a cleaner graph for bf16 casting.

    Returns a folded params pytree for :func:`apply_folded`. Only valid for
    inference (training needs live batch statistics).
    """

    def fold_block(p, s, names):
        out = {}
        for conv_name, bn_name in names:
            w = p[conv_name]["w"]
            b = p[conv_name]["b"]
            scale = p[bn_name]["scale"] * jax.lax.rsqrt(s[bn_name]["var"] + eps)
            shift = p[bn_name]["bias"] - s[bn_name]["mean"] * scale
            out[conv_name] = {"w": w * scale.reshape(1, 1, 1, -1), "b": b * scale + shift}
        return out

    names2 = [("conv1", "bn1"), ("conv2", "bn2")]
    folded = {
        "down1": fold_block(params["down1"], state["down1"], names2),
        "down2": fold_block(params["down2"], state["down2"], names2),
        "mid": fold_block(params["mid"], state["mid"], names2),
        "up2": {
            "convt": dict(params["up2"]["convt"]),
            **fold_block(params["up2"], state["up2"], names2),
        },
        "up1": fold_block(params["up1"], state["up1"], names2),
        "final": dict(params["final"]),
    }
    if "attn" in params:
        # the mid_attn block has no BatchNorm to fold — carry it through so
        # the folded fast path computes the SAME function as apply() (a
        # dropped block would silently skip attention; round-5 review)
        folded["attn"] = params["attn"]
    return folded


def apply_folded(folded, x, t_emb, *, compute_dtype=None, decompose_time_conv=False,
                 act_scales=None, _tap=None):
    """Inference forward with BN pre-folded (see :func:`fold_bn`).

    compute_dtype: jnp.bfloat16 runs the convs on the MXU at 2x fp32 rate
    (measured 167 vs 82 TF/s for the 64-channel 3x3 convs at batch 256);
    the output is cast back to float32. The string "int8" runs the 3x3
    convs in int8 (s8 x s8 -> s32 on the MXU, ops/quant.py) with bf16 glue
    — requires `act_scales`, static per-conv activation scales from a
    calibration pass (`_tap(name, h)` is the recording hook; keys are
    "down1.conv2", "up1.conv1", ...). The ConvT and the 1x1 head stay bf16
    (pixel-shuffle einsum / image-writing head).
    decompose_time_conv: replace the (C+D)-channel first conv with the exact
    spatially-constant decomposition (see :func:`_conv1_time_decomposed`).
    """
    int8_mode = compute_dtype == "int8"
    if int8_mode and act_scales is None and _tap is None:
        raise ValueError("compute_dtype='int8' requires act_scales (calibrate first)")
    dt = jnp.bfloat16 if int8_mode else (compute_dtype or x.dtype)

    def cc(p):  # cast conv params
        return p["w"].astype(dt), p["b"].astype(jnp.float32)

    def conv_relu(p, h, name=None):
        if _tap is not None and name is not None:
            _tap(name, h)
        if int8_mode and name is not None and act_scales is not None:
            if name not in act_scales:
                raise KeyError(
                    f"act_scales missing {name!r} — recalibrate on this model"
                )
            y = conv2d_int8_from_f32(
                h.astype(jnp.float32), p["w"], p["b"], xscale=act_scales[name]
            )
            return jax.nn.relu(y).astype(dt)
        w, b = cc(p)
        return jax.nn.relu(conv2d(h, w, b).astype(dt))

    b_, h_, w_, cin = x.shape
    if decompose_time_conv and h_ >= 3 and w_ >= 3:
        p1 = folded["down1"]["conv1"]
        y = conv2d(x.astype(dt), p1["w"][:, :, :cin, :].astype(dt))
        contrib = _time_conv_contrib(p1["w"][:, :, cin:, :], t_emb, h_, w_)
        h1 = jax.nn.relu(
            (y.astype(jnp.float32) + contrib + p1["b"].reshape(1, 1, 1, -1)).astype(dt)
        )
    else:
        tmap = jnp.broadcast_to(t_emb[:, None, None, :], (b_, h_, w_, t_emb.shape[-1]))
        xin = jnp.concatenate([x, tmap], axis=-1).astype(dt)
        h1 = conv_relu(folded["down1"]["conv1"], xin)
    h1 = conv_relu(folded["down1"]["conv2"], h1, "down1.conv2")
    h = max_pool_2x2(h1)
    h = conv_relu(folded["down2"]["conv2"],
                  conv_relu(folded["down2"]["conv1"], h, "down2.conv1"), "down2.conv2")
    h = conv_relu(folded["mid"]["conv2"],
                  conv_relu(folded["mid"]["conv1"], h, "mid.conv1"), "mid.conv2")
    if "attn" in folded:  # mirror apply(): residual self-attention, f32
        from igdm_tpu.ops.attention import spatial_self_attention

        h = spatial_self_attention(folded["attn"], h.astype(jnp.float32)).astype(dt)
    wt, bt = cc(folded["up2"]["convt"])
    # bf16 end to end: the f32 default cost ~180 us/step in a 67 MB f32
    # pixel-shuffle intermediate + layout transpose (BASELINE.md round-3)
    h = conv_transpose2d(h, wt, bt.astype(dt), stride=2, preferred_dtype=dt).astype(dt)
    h = conv_relu(folded["up2"]["conv2"],
                  conv_relu(folded["up2"]["conv1"], h, "up2.conv1"), "up2.conv2")
    hh, ww = h.shape[1], h.shape[2]
    h = jnp.concatenate([h, h1[:, :hh, :ww, :]], axis=-1)
    h = conv_relu(folded["up1"]["conv2"],
                  conv_relu(folded["up1"]["conv1"], h, "up1.conv1"), "up1.conv2")
    wf, bf = cc(folded["final"])
    # the 1x1 head stays in conv form: the per-pixel-matmul einsum
    # formulation measured 2x SLOWER end-to-end (2435 vs 1224 us/step,
    # BASELINE.md round-3) — XLA's conv path tiles this reduction better
    return conv2d(h, wf, bf).astype(jnp.float32)
