"""Pallas TPU kernel: 3x3 SAME stride-1 convolution weight gradient.

Why this kernel exists: the round-3 training attribution (BASELINE.md)
showed the dominant sub-floor ops in the train step are the
weight-gradient convolutions — XLA serves the B*H*W=131k-row contraction
onto a (3*3*Ci, Co) output at 44-61% of the MXU floor, and the obvious
im2col-matmul reformulation needs a ~150 MB materialized patch tensor
(bandwidth-dead). This kernel is the implicit-im2col middle path: patch
columns are formed IN VMEM from 9 shifted views of the incoming-gradient
block, so HBM sees each operand exactly once and the MXU sees one
(K x Ci) . (K x 9*Co) contraction with both output dims >= 128 wide.

Math (channels-last, SAME, stride 1; reference conv semantics at
/root/reference/src/train_brain.jl:109-145 via ops/nn.py):

    dW[dh,dw,ci,co] = sum_{b,h,w} x_pad[b,h+dh-1,w+dw-1,ci] * dy[b,h,w,co]
                    = sum_{b,u,v} x[b,u,v,ci] * dy_pad[b,u+(2-dh),v+(2-dw),co]

— shifting the PADDED dy instead of x lets one un-shifted x block serve
all nine taps, and stacking the nine shifted dy views along the channel
axis turns the whole weight gradient into a single MXU contraction per
batch block (output (Ci, 9*Co): full lanes at Co=64, full sublanes at
Ci>=64 — the shapes XLA runs at half rate).

Grid: 1-D over batch blocks; the (Ci, 9*Co) f32 accumulator lives in VMEM
scratch across grid steps (sequential on a TPU core) and is written out
once by the last step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wgrad_kernel(x_ref, dyp_ref, out_ref, acc_ref, *, bb, H, W, Ci, Co):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x2 = x_ref[:].reshape(bb * H * W, Ci)
    cols = []
    for dh in range(3):
        for dw in range(3):
            a, b = 2 - dh, 2 - dw
            cols.append(dyp_ref[:, a : a + H, b : b + W, :].reshape(bb * H * W, Co))
    patches = jnp.concatenate(cols, axis=1)  # (K_blk, 9*Co), input dtype
    acc_ref[:] += lax.dot_general(
        x2, patches, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _pick_batch_block(B: int, H: int, W: int, Ci: int, Co: int) -> int:
    """Largest power-of-two batch block keeping the VMEM working set
    (x + padded dy + 9-column patch tensor + f32 accumulator, double
    buffered inputs) comfortably under ~8 MB."""
    for bb in (16, 8, 4, 2, 1):
        if B % bb:
            continue
        bytes_x = bb * H * W * Ci * 2
        bytes_dyp = bb * (H + 2) * (W + 2) * Co * 2
        bytes_patch = bb * H * W * 9 * Co * 2
        if 2 * (bytes_x + bytes_dyp) + bytes_patch + Ci * 9 * Co * 4 < 8 * 2**20:
            return bb
    return 1


@partial(jax.jit, static_argnames=("interpret",))
def conv3x3_wgrad(x, dy, *, interpret: bool = False):
    """Weight gradient of a 3x3 SAME stride-1 conv: (B,H,W,Ci), (B,H,W,Co)
    -> f32 (3, 3, Ci, Co). Inputs keep their dtype on the MXU (bf16 in the
    mixed-precision train step); accumulation is f32."""
    B, H, W, Ci = x.shape
    Co = dy.shape[-1]
    assert dy.shape == (B, H, W, Co)
    bb = _pick_batch_block(B, H, W, Ci, Co)
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))

    out = pl.pallas_call(
        partial(_wgrad_kernel, bb=bb, H=H, W=W, Ci=Ci, Co=Co),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H, W, Ci), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H + 2, W + 2, Co), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Ci, 9 * Co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ci, 9 * Co), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Ci, 9 * Co), jnp.float32)],
        interpret=interpret,
    )(x, dyp)
    # (Ci, 9*Co) columns ordered (dh, dw, co) -> HWIO (3, 3, Ci, Co)
    return out.reshape(Ci, 3, 3, Co).transpose(1, 2, 0, 3)


def conv3x3_wgrad_xla(x, dy):
    """XLA reference for the same quantity (dW in HWIO, f32): the
    batch-as-contracting conv reformulation XLA itself uses for wgrads."""
    out = lax.conv_general_dilated(
        x.astype(jnp.float32).transpose(3, 1, 2, 0),   # N=Ci, C=B
        dy.astype(jnp.float32).transpose(1, 2, 0, 3),  # HWIO with I=B, O=Co
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (Ci, 3, 3, Co)
    return out.transpose(1, 2, 0, 3)
