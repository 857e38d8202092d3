"""Fused masked softmax cross-entropy kernel (class-major layout).

The per-step CE at 512² touches an [B,512,512,C] f32 logit tensor several
times in the jnp path (mask, logsumexp, gather, reduce). This kernel does
mask → logsumexp → label-pick → ignore-mask → reduce in ONE pass per pixel
tile, with the closed-form backward (softmax − one-hot)·mask/n as a second
fused kernel (custom VJP). Same contract and arithmetic as
``cl_tpu.losses.cross_entropy`` (oracle-equality tested).

Layout is the whole game. Pallas custom-call operands get a FORCED
row-major (8,128)-tiled layout, so a pixels×classes [P, C] operand is
lane-padded C→128: at 512²/19 classes that is 128/19 ≈ 6.7× physical HBM
traffic (~1 GB per pass), and per-pixel [P, 1] side inputs are padded
128× (~1 GB each). Measured on-chip, that layout cost ~18 ms of a 92 ms
train step. This kernel is therefore CLASS-MAJOR:

  * logits enter as z[C, P] — classes on SUBLANES (pad 19→24, 1.26×),
    pixels dense on LANES. 201 MB instead of 1.07 GB at 512².
  * labels enter as one s32[1, P] row (8-sublane pad ≈ 64 MB — noise).
  * the ignore-pixel mask and the label→0 remap of ignored pixels are
    computed IN the kernel from the label row: the [P, 1] operands (and
    the XLA fusions that wrote them) vanish.
  * softmax reductions run over sublanes at full 128-lane occupancy
    (the lane-major kernel wasted 109/128 lanes of every VPU op).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common

NEG_INF = -1e9
LANES = 128
BP = 8192  # pixels (lanes) per grid step; [C,BP] f32 block ≈ 0.8 MB VMEM


def _ce_kernel(ignore_index, z_ref, lbl_ref, valid_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    v = valid_ref[:]                                   # [C, 1] 1/0
    z = jnp.where(v > 0, z_ref[:].astype(jnp.float32), NEG_INF)  # [C, BP]
    m = jnp.max(z, axis=0, keepdims=True)              # [1, BP]
    logz = m + jnp.log(jnp.sum(jnp.exp(z - m), axis=0, keepdims=True))
    lbl = lbl_ref[:]                                   # [1, BP] s32
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    picked = jnp.sum(jnp.where(row == lbl0, z, 0.0), axis=0, keepdims=True)
    out_ref[0, 0] += jnp.sum((logz - picked) * pix)


def _ce_grad_kernel(ignore_index, z_ref, lbl_ref, valid_ref, scale_ref,
                    out_ref):
    v = valid_ref[:]
    z = jnp.where(v > 0, z_ref[:].astype(jnp.float32), NEG_INF)
    m = jnp.max(z, axis=0, keepdims=True)
    e = jnp.exp(z - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)
    lbl = lbl_ref[:]
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    onehot = (row == lbl0).astype(jnp.float32)
    g = scale_ref[0, 0] * pix * (p - onehot)
    out_ref[:] = jnp.where(v > 0, g, 0.0).astype(out_ref.dtype)


def _prep(logits, labels, valid_classes, ignore_index):
    """[B,H,W,C] → class-major [C, Pp] + label row [1, Pp]; lane padding
    carries ignore_index labels so padded pixels contribute nothing.
    The logit dtype is PRESERVED (bf16 stays bf16 — half the operand
    traffic); kernels upcast to f32 in-register, so the arithmetic is
    identical to feeding pre-upcast logits."""
    C = logits.shape[-1]
    z = logits.reshape(-1, C).T                        # [C, P]
    P = z.shape[1]
    bp = min(BP, common.round_up(P, LANES))
    Pp = common.round_up(P, bp)
    if Pp != P:
        z = jnp.pad(z, ((0, 0), (0, Pp - P)))
    lbl = labels.reshape(1, -1).astype(jnp.int32)
    if Pp != P:
        lbl = jnp.pad(lbl, ((0, 0), (0, Pp - P)),
                      constant_values=ignore_index)
    valid = valid_classes.astype(jnp.float32)[:, None]  # [C, 1]
    return z, lbl, valid, P, Pp, bp, C


def _specs(Pp, C, bp):
    zs = pl.BlockSpec((C, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    ls = pl.BlockSpec((1, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return zs, ls, vs, (Pp // bp,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ce_total(logits, labels, valid_classes, ignore_index):
    """UNNORMALIZED Σ per-pixel NLL — the 1/n mean is applied outside so
    the sharded variant can psum totals and counts independently."""
    return _ce_total_impl(logits, labels, valid_classes, ignore_index)


def _ce_total_impl(logits, labels, valid_classes, ignore_index):
    z, lbl, valid, P, Pp, bp, C = _prep(logits, labels, valid_classes,
                                        ignore_index)
    zs, ls, vs, grid = _specs(Pp, C, bp)
    return pl.pallas_call(
        functools.partial(_ce_kernel, ignore_index),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[zs, ls, vs],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=common.interpret_mode(),
    )(z, lbl, valid)[0, 0]


def _ce_fwd(logits, labels, valid_classes, ignore_index):
    return (_ce_total_impl(logits, labels, valid_classes, ignore_index),
            (logits, labels, valid_classes))


def _ce_bwd(ignore_index, res, g):
    logits, labels, valid_classes = res
    z, lbl, valid, P, Pp, bp, C = _prep(logits, labels, valid_classes,
                                        ignore_index)
    zs, ls, vs, grid = _specs(Pp, C, bp)
    scale = jnp.full((1, 1), g, jnp.float32)
    dz = pl.pallas_call(
        functools.partial(_ce_grad_kernel, ignore_index),
        # grad buffer in the logit dtype: same values as computing f32
        # then casting (the f32 math happens in-register either way).
        out_shape=jax.ShapeDtypeStruct((C, Pp), logits.dtype),
        grid=grid,
        in_specs=[zs, ls, vs,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=zs,
        interpret=common.interpret_mode(),
    )(z, lbl, valid, scale)
    dx = dz[:, :P].T.reshape(logits.shape).astype(logits.dtype)
    return (dx, np.zeros(labels.shape, jax.dtypes.float0),
            np.zeros(valid_classes.shape, jax.dtypes.float0))


_ce_total.defvjp(_ce_fwd, _ce_bwd)


def _n_pix(labels, ignore_index):
    return jnp.maximum(
        (labels != ignore_index).sum().astype(jnp.float32), 1.0)


def cross_entropy(logits, labels, valid_classes, *, ignore_index=255):
    """Fused variant of ``cl_tpu.losses.cross_entropy`` (same return:
    (mean NLL over non-ignored pixels, n_valid_pixels)). The 1/n division
    happens outside the custom VJP; AD feeds the grad kernel g/n — the
    same closed-form backward as before."""
    n = _n_pix(labels, ignore_index)
    return _ce_total(logits, labels, valid_classes, int(ignore_index)) / n, n


def cross_entropy_sharded(logits, labels, valid_classes, *, axis,
                          ignore_index=255):
    """Batch-sharded CE for use INSIDE ``jax.shard_map`` over ``axis``:
    each device runs the class-major kernel on its local pixels, then the
    global mean is Σ(local totals) / Σ(local counts) via psum. Exactly the
    single-device arithmetic up to f32 summation order (tested equal on
    the virtual mesh). Returns (loss, global n) — both replicated."""
    total = _ce_total(logits, labels, valid_classes, int(ignore_index))
    n_local = (labels != ignore_index).sum().astype(jnp.float32)
    total = jax.lax.psum(total, axis)
    n = jnp.maximum(jax.lax.psum(n_local, axis), 1.0)
    return total / n, n
