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


def _wgrad_kernel_split(x_ref, dyp_ref, out_ref, acc_ref, *, bb, H, W, Ci, Co):
    """Variant without the 9-column concat: one (K x Ci).(K x Co) dot per
    tap, accumulated into a (9, Ci, Co) scratch — no (K, 9*Co) VMEM
    intermediate, each dot's output written tile-aligned at acc[j]."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x2 = x_ref[:].reshape(bb * H * W, Ci)
    for j, (dh, dw) in enumerate((dh, dw) for dh in range(3) for dw in range(3)):
        a, b = 2 - dh, 2 - dw
        dyj = dyp_ref[:, a : a + H, b : b + W, :].reshape(bb * H * W, Co)
        acc_ref[j] += lax.dot_general(
            x2, dyj, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _wgrad_kernel_w3(x_ref, dyp_ref, out_ref, acc_ref, *, bb, H, W, Ci, Co):
    """Variant paying the expensive W-direction (sublane-dim) shifts ONCE
    per grid step: build w3 = lane-concat of the 3 W-shifted dy views
    (2 sublane relayouts instead of 6 across the taps), then take the 3
    free H-direction slices of w3 and run 3 (K x Ci).(K x 3*Co) dots into
    a (3, Ci, 3*Co) accumulator."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x2 = x_ref[:].reshape(bb * H * W, Ci)
    dyp = dyp_ref[:]  # (bb, H+2, W+2, Co)
    # w3[..., dw*Co:(dw+1)*Co] = dyp shifted by (2-dw) in W
    w3 = jnp.concatenate(
        [dyp[:, :, 2 - dw : 2 - dw + W, :] for dw in range(3)], axis=-1
    )  # (bb, H+2, W, 3*Co)
    for dh in range(3):
        a = 2 - dh
        dyj = w3[:, a : a + H, :, :].reshape(bb * H * W, 3 * Co)
        acc_ref[dh] += lax.dot_general(
            x2, dyj, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _pick_batch_block(B: int, H: int, W: int, Ci: int, Co: int, split: bool,
                      itemsize: int = 2) -> int:
    """Largest power-of-two batch block keeping the VMEM working set
    (x + padded dy [+ 9-column patch tensor] + f32 accumulator, double
    buffered inputs) comfortably under ~8 MB."""
    for bb in (16, 8, 4, 2, 1):
        if B % bb:
            continue
        bytes_x = bb * H * W * Ci * itemsize
        bytes_dyp = bb * (H + 2) * (W + 2) * Co * itemsize
        bytes_patch = 0 if split else bb * H * W * 9 * Co * itemsize
        if 2 * (bytes_x + bytes_dyp) + bytes_patch + Ci * 9 * Co * 4 < 8 * 2**20:
            return bb
    return 1


@partial(jax.jit, static_argnames=("interpret", "mode"))
def conv3x3_wgrad(x, dy, *, interpret: bool = False, mode: str = "concat"):
    """Weight gradient of a 3x3 SAME stride-1 conv: (B,H,W,Ci), (B,H,W,Co)
    -> f32 (3, 3, Ci, Co). Inputs keep their dtype on the MXU (bf16 in the
    mixed-precision train step); accumulation is f32.

    mode="concat": one (K x Ci).(K x 9*Co) dot per batch block (patch
    concat in VMEM). mode="split": nine (K x Ci).(K x Co) dots into a
    (9, Ci, Co) accumulator (no concat). mode="w3": W-shifts paid once per
    step (lane-concat), then 3 free H-slices and 3 N=3*Co dots.
    """
    B, H, W, Ci = x.shape
    Co = dy.shape[-1]
    assert dy.shape == (B, H, W, Co)
    bb = _pick_batch_block(B, H, W, Ci, Co, mode != "concat",
                           itemsize=jnp.dtype(x.dtype).itemsize)
    dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))

    kern, out_shape = {
        "concat": (_wgrad_kernel, (Ci, 9 * Co)),
        "split": (_wgrad_kernel_split, (9, Ci, Co)),
        "w3": (_wgrad_kernel_w3, (3, Ci, 3 * Co)),
    }[mode]
    out_index = (lambda i: (0,) * len(out_shape))
    out = pl.pallas_call(
        partial(kern, bb=bb, H=H, W=W, Ci=Ci, Co=Co),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec((bb, H, W, Ci), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, H + 2, W + 2, Co), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_shape, out_index, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM(out_shape, jnp.float32)],
        interpret=interpret,
    )(x, dyp)
    if mode == "split":
        return out.reshape(3, 3, Ci, Co)  # taps ordered (dh, dw)
    if mode == "w3":
        # (3, Ci, 3*Co): [dh][ci][dw*Co + co] -> HWIO
        return out.reshape(3, Ci, 3, Co).transpose(0, 2, 1, 3)
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
