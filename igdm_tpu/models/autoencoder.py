"""Convolutional VAE for latent diffusion.

The reference has no autoencoder and no latent-space anything (its three
model generations are pixel-space, SURVEY.md section 2); this module is
the compression half of a latent-diffusion pipeline (Rombach et al. 2022):
a small GroupNorm+SiLU conv encoder maps (H, W, C) images to a spatially
4x-downsampled latent (H/4, W/4, latent_ch) diagonal Gaussian, and the
decoder maps latents back. Trained with L2 reconstruction + a small KL
penalty toward N(0, I) (beta ~ 1e-4: a regularized autoencoder whose
latents are well-scaled for diffusion rather than a generative VAE — the
LDM recipe). Diffusion then runs on `z * scale` where scale = 1/std(z)
(stored in the checkpoint metadata, like LDM's scale_factor).

TPU shape: everything is jit-compiled convs on the MXU; the encoder and
decoder reuse ops/nn's fused-able GroupNorm+SiLU blocks. Training rides
the shared scanned-epoch engine (training/latent.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from igdm_tpu.ops.nn import conv2d, group_norm, max_pool_2x2, silu, upsample_bilinear_2x
from igdm_tpu.ops.quant import conv2d_int8_from_f32


def _glorot(key, shape, fan_in, fan_out):
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -limit, limit)


def _conv(key, kh, kw, cin, cout):
    return {
        "w": _glorot(key, (kh, kw, cin, cout), kh * kw * cin, kh * kw * cout),
        "b": jnp.zeros((cout,), jnp.float32),
    }


def _gn(c):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def init(key, *, in_channels: int = 1, base_ch: int = 32, latent_ch: int = 4,
         depth: int = 2):
    """Encoder: C -> base -> [pool -> wider conv] x depth -> 2*latent_ch head.
    Decoder mirrors with bilinear upsampling. Spatial compression 2**depth
    (depth=2 is the LDM-style 4x; depth=1 trades compute for fidelity —
    measured in the BASELINE.md latent sweep)."""
    k = lambda i: jax.random.fold_in(key, i)
    b2 = base_ch * 2
    enc = {"conv1": _conv(k(1), 3, 3, in_channels, base_ch), "gn1": _gn(base_ch)}
    c = base_ch
    for d in range(depth):
        enc[f"down{d + 1}"] = _conv(k(2 + d), 3, 3, c, b2)
        enc[f"dgn{d + 1}"] = _gn(b2)
        c = b2
    enc["mid"] = _conv(k(8), 3, 3, c, b2)
    enc["mgn"] = _gn(b2)
    enc["head"] = _conv(k(9), 1, 1, b2, 2 * latent_ch)

    dec = {"conv1": _conv(k(11), 3, 3, latent_ch, b2), "gn1": _gn(b2)}
    c = b2
    for d in range(depth):
        cout = b2 if d < depth - 1 else base_ch
        dec[f"up{d + 1}"] = _conv(k(12 + d), 3, 3, c, cout)
        dec[f"ugn{d + 1}"] = _gn(cout)
        c = cout
    dec["head"] = _conv(k(18), 1, 1, c, in_channels)
    return {"enc": enc, "dec": dec}


def _block(p, cn, gn, x, *, groups=8, compute_dtype=None, xscale=None):
    h = _conv_cd(p[cn], x, compute_dtype, xscale=xscale)
    return silu(group_norm(h, p[gn]["scale"], p[gn]["bias"], groups=groups))


def _conv_cd(cp, x, compute_dtype, *, xscale=None):
    """conv2d with optional reduced-precision compute: bf16 (MXU bf16 rate)
    or "int8" (symmetric per-channel weight + dynamic per-tensor activation
    quantization, int32 accumulation — ops/quant.py; the weight quantization
    constant-folds in baked samplers). Accumulation/bias stay f32, and the
    f32 GroupNorm statistics downstream re-center quantization error — the
    serving mixed-precision recipe shared with models/unet_small.apply_folded."""
    if compute_dtype is None:
        return conv2d(x, cp["w"], cp["b"])
    if compute_dtype == "int8":
        return conv2d_int8_from_f32(x, cp["w"], cp["b"], xscale=xscale)
    h = conv2d(x.astype(compute_dtype), cp["w"].astype(compute_dtype))
    return h.astype(jnp.float32) + cp["b"].reshape(1, 1, 1, -1)


def _depth(half: dict, prefix: str) -> int:
    return sum(1 for k in half if k.startswith(prefix) and k[len(prefix):].isdigit())


def encode(params, x):
    """(B, H, W, C) -> (mean, logvar), each (B, H/2^d, W/2^d, latent_ch)."""
    e = params["enc"]
    h = _block(e, "conv1", "gn1", x)
    for d in range(_depth(e, "down")):
        h = max_pool_2x2(h)
        h = _block(e, f"down{d + 1}", f"dgn{d + 1}", h)
    h = _block(e, "mid", "mgn", h)
    stats = conv2d(h, e["head"]["w"], e["head"]["b"])
    mean, logvar = jnp.split(stats, 2, axis=-1)
    return mean, jnp.clip(logvar, -20.0, 10.0)


def decode(params, z, *, compute_dtype=None, act_scales=None, _tap=None):
    """(B, H/2^d, W/2^d, latent_ch) -> (B, H, W, C) reconstruction (linear
    head; the data is [-1, 1]-ranged but unclamped, matching the samplers).

    compute_dtype: jnp.bfloat16 runs the decoder convs at the MXU bf16 rate
    (serving path — outputs differ from f32 only by bf16 rounding; GroupNorm
    statistics stay f32). "int8" runs the 3x3 blocks at the MXU int8 rate
    (ops/quant.py; measured +57% over bf16 at the hot 32x32 conv) — the 1x1
    output head stays f32 there, since it writes the image directly and its
    FLOP share is negligible.

    act_scales: optional {conv_name: static activation scale} from
    calibrate_decode_int8 — removes the per-conv dynamic abs-max pass, which
    is the difference between a win and a loss on this bandwidth-bound path
    (BASELINE.md round-5 int8 section). _tap(name, x) is the calibration
    recording hook."""
    d = params["dec"]

    def blk(name, gn_name, x):
        if _tap is not None:
            _tap(name, x)
        if act_scales is None:
            xs = None
        elif name in act_scales:
            xs = act_scales[name]
        else:  # a silent dynamic fallback would quietly lose the static-
            # scale speedup this parameter exists to provide
            raise KeyError(f"act_scales missing {name!r} — recalibrate "
                           "(calibrate_decode_int8) for this decoder")
        return _block(d, name, gn_name, x, compute_dtype=compute_dtype, xscale=xs)

    h = blk("conv1", "gn1", z)
    for i in range(_depth(d, "up")):
        h = upsample_bilinear_2x(h)
        h = blk(f"up{i + 1}", f"ugn{i + 1}", h)
    return _conv_cd(d["head"], h, None if compute_dtype == "int8" else compute_dtype)


def calibrate_decode_int8(params, z):
    """One-batch activation-scale calibration for int8 decode: record each
    conv input's abs-max on representative latents, return
    {conv_name: float scale} for decode(act_scales=...). Offline/eager —
    serving programs then carry the scales as compile-time constants."""
    scales = {}

    def tap(name, x):
        scales[name] = float(jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)) / 127.0

    decode(params, z, _tap=tap)
    return scales


def vae_loss(params, x, key, *, kl_weight: float = 1e-4):
    """L2 reconstruction + beta*KL(q(z|x) || N(0, I)); returns (loss, aux)."""
    mean, logvar = encode(params, x)
    eps = jax.random.normal(key, mean.shape, jnp.float32)
    z = mean + jnp.exp(0.5 * logvar) * eps
    recon = decode(params, z)
    rec = jnp.mean(jnp.square(recon - x))
    kl = 0.5 * jnp.mean(jnp.square(mean) + jnp.exp(logvar) - 1.0 - logvar)
    return rec + kl_weight * kl, {"rec": rec, "kl": kl}


def num_params(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
