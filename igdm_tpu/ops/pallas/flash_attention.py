"""Pallas TPU kernel: FlashAttention (non-causal, fwd + hand-written bwd).

Why this kernel exists: the bottleneck attention added for the stretch
configs (`ops/attention.py`; no attention exists in the reference —
SURVEY.md section 5.7) is three matmuls + a softmax. XLA materializes the
(N, N) logits tensor in HBM; at N = H*W = 4096 tokens (attention at the
64x64 level) that is 64 MB per (batch, head) in f32 — the op goes
bandwidth-bound on logits traffic exactly when attention gets expensive.
This kernel never materializes the logits: online-softmax tiles
(Dao et al. 2022, FlashAttention) keep a (block_q, block_k) tile plus the
running (max, sum) statistics in VMEM, so HBM traffic is O(N*d), not
O(N^2).

Layout decisions (TPU/Mosaic):
  * Row statistics (running max `m`, normalizer `l`, saved logsumexp) are
    kept LANES-REPLICATED as (block_q, 128) f32 — the Mosaic-friendly
    layout for per-row scalars (same convention as jax.experimental's TPU
    flash kernel); broadcasting to a (block_q, block_k) tile is a cheap
    lane tile.
  * K and V ride in VMEM as FULL (N, d) blocks per (batch*head) grid row;
    the BlockSpec index map ignores the q-block index, so Pallas's
    pipeline fetches them from HBM ONCE per row and the inner fori_loop
    slices chunks out of VMEM. Budget: N=8192, d=64, f32 is 2 MB each of
    the ~16 MB/core — fine up to N ~ 32k.
  * All tile math is f32 (`preferred_element_type`) regardless of input
    dtype; bf16 inputs are upcast tile-by-tile.

Backward is the standard FlashAttention recomputation split into two
kernels — one gridded over q blocks (produces dq), one over k blocks
(produces dk, dv) — each re-forming the probability tile from the saved
logsumexp, so nothing quadratic is ever stored.

Dispatch: `ops/attention.py` routes to this kernel on TPU for N >= 1024
(measured crossover, BASELINE.md round-3 flash table); the XLA einsum path
remains the reference and the small-N path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def mha_reference(q, k, v, *, scale: float):
    """XLA reference: plain softmax attention, materializes (..., N, N).

    q, k, v: (B, H, N, d)."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v).astype(q.dtype)


def _rep_lanes(x, width: int):
    """(bq, 128) lanes-replicated stat -> (bq, width) for tile broadcasts."""
    if width == _LANES:
        return x
    if width < _LANES:
        return x[:, :width]
    return jnp.tile(x, (1, width // _LANES))


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, block_k: int):
    q = q_ref[0].astype(jnp.float32)  # (bq, d)
    bq, d = q.shape
    n = k_ref.shape[1]

    def body(j, carry):
        acc, m, l = carry  # (bq, d), (bq, 128), (bq, 128)
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, block_k)
        m_new = jnp.maximum(m, jnp.max(s, axis=1)[:, None])
        p = jnp.exp(s - _rep_lanes(m_new, block_k))
        alpha = jnp.exp(m - m_new)  # (bq, 128)
        l_new = l * alpha + jnp.sum(p, axis=1)[:, None]
        acc_new = acc * _rep_lanes(alpha, d) + jnp.dot(
            p, v, preferred_element_type=jnp.float32
        )
        return acc_new, m_new, l_new

    init = (
        jnp.zeros((bq, d), jnp.float32),
        jnp.full((bq, _LANES), -jnp.inf, jnp.float32),
        jnp.zeros((bq, _LANES), jnp.float32),
    )
    acc, m, l = lax.fori_loop(0, n // block_k, body, init)
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (acc * _rep_lanes(l_inv, d)).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(jnp.maximum(l, jnp.finfo(jnp.float32).tiny))


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, scale: float, block_k: int
):
    q = q_ref[0].astype(jnp.float32)  # (bq, d)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (bq, 128) lanes-replicated
    delta = delta_ref[0]
    n = k_ref.shape[1]

    def body(j, dq):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - _rep_lanes(lse, block_k))
        dp = lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, block_k)
        ds = p * (dp - _rep_lanes(delta, block_k)) * scale
        return dq + jnp.dot(ds, k, preferred_element_type=jnp.float32)

    dq = lax.fori_loop(0, n // block_k, body, jnp.zeros(q.shape, jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale: float, block_q: int,
):
    k = k_ref[0].astype(jnp.float32)  # (bk, d)
    v = v_ref[0].astype(jnp.float32)
    bk = k.shape[0]
    n = q_ref.shape[1]

    def body(i, carry):
        dk, dv = carry
        sl = pl.ds(i * block_q, block_q)
        q = q_ref[0, sl, :].astype(jnp.float32)  # (block_q, d)
        do = do_ref[0, sl, :].astype(jnp.float32)
        lse = lse_ref[0, sl, :]  # (block_q, 128)
        delta = delta_ref[0, sl, :]
        s = lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, bk)
        p = jnp.exp(s - _rep_lanes(lse, bk))
        dv = dv + lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bk, d)
        dp = lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, bk)
        ds = p * (dp - _rep_lanes(delta, bk)) * scale
        dk = dk + lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    dk, dv = lax.fori_loop(
        0, n // block_q, body,
        (jnp.zeros(k.shape, jnp.float32), jnp.zeros(v.shape, jnp.float32)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _check_shapes(q, k, v, block_q, block_k):
    bh, n, d = q.shape
    if k.shape != (bh, n, d) or v.shape != (bh, n, d):
        raise ValueError(f"q/k/v shape mismatch: {q.shape} {k.shape} {v.shape}")
    if n % block_q or n % block_k:
        raise ValueError(f"N={n} must divide block_q={block_q} and block_k={block_k}")
    if block_q % _LANES or block_k % _LANES:
        raise ValueError(f"blocks must be multiples of {_LANES}")
    if d > _LANES and d % _LANES:
        raise ValueError(f"head dim {d} must be <= 128 or a multiple of 128")


def _pallas_fwd(q, k, v, scale, block_q, block_k, interpret):
    bh, n, d = q.shape
    grid = (bh, n // block_q)
    kv_spec = pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    out, lse = pl.pallas_call(
        partial(_fwd_kernel, scale=scale, block_k=block_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            kv_spec,
            kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, _LANES), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v)
    return out, lse


def _pallas_bwd(q, k, v, o, lse, do, scale, block_q, block_k, interpret):
    bh, n, d = q.shape
    # delta_i = sum_d do_i * o_i (rowsum), lanes-replicated like lse. XLA
    # fuses this into one elementwise+reduce pass.
    delta = jnp.broadcast_to(
        jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1, keepdims=True),
        (bh, n, _LANES),
    )

    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    stat_q_spec = pl.BlockSpec((1, block_q, _LANES), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)
    full_spec = pl.BlockSpec((1, n, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)
    full_stat_spec = pl.BlockSpec((1, n, _LANES), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        partial(_bwd_dq_kernel, scale=scale, block_k=block_k),
        grid=(bh, n // block_q),
        in_specs=[q_spec, full_spec, full_spec, q_spec, stat_q_spec, stat_q_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
        interpret=interpret,
    )(q, k, v, do, lse, delta)

    k_spec = pl.BlockSpec((1, block_k, d), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        partial(_bwd_dkv_kernel, scale=scale, block_q=block_q),
        grid=(bh, n // block_k),
        in_specs=[full_spec, k_spec, k_spec, full_spec, full_stat_spec, full_stat_spec],
        out_specs=[k_spec, k_spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n, d), v.dtype),
        ],
        interpret=interpret,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, interpret):
    out, _ = _pallas_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_fwd(q, k, v, scale, block_q, block_k, interpret):
    out, lse = _pallas_fwd(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    return _pallas_bwd(q, k, v, o, lse, do, scale, block_q, block_k, interpret)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q,
    k,
    v,
    *,
    scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
):
    """Tiled online-softmax attention; never materializes the (N, N) logits.

    Args:
      q, k, v: (B, H, N, d) with N a multiple of 128 and d <= 128 (or a
        multiple of 128).
      scale: logit scale; defaults to 1/sqrt(d) (matching
        `ops.attention.spatial_self_attention`).
      block_q / block_k: VMEM tile sizes (clamped to N).
      interpret: run the Pallas interpreter; defaults to True off-TPU so the
        same call works in CPU tests.

    Returns: (B, H, N, d), q.dtype. Differentiable (custom VJP, two
    recomputation kernels).
    """
    b, h, n, d = q.shape
    if scale is None:
        scale = float(1.0 / (d**0.5))
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    qf, kf, vf = (t.reshape(b * h, n, d) for t in (q, k, v))
    _check_shapes(qf, kf, vf, block_q, block_k)
    out = _flash(qf, kf, vf, scale, block_q, block_k, interpret)
    return out.reshape(b, h, n, d)
