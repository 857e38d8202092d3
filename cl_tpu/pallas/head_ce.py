"""Fused 1×1-head + masked softmax cross-entropy kernel (class-major).

The UNet's last layer is a 1×1 conv: logits[B,H,W,C] = x[B,H,W,Cin]·W + b
(SURVEY.md §2.1 "UNet" — the ``OutConv`` head; §3.2). At 512²/19 classes
the logits tensor is 80 MB (bf16) and the step-attribution table
(DESIGN.md §8, ``benchmarks/attr_b8_512.json``) shows the head path
costing ~7.3 ms/step: XLA runs the head conv at <2% MFU (C_out=19 fills
19/128 MXU lanes; the dW backward is a [32,2M]@[2M,19] contraction it
runs at ~0.5% MFU) and the logits tensor makes four HBM round-trips
(head write, CE read, dlogits write, head-bwd read) plus layout copies.

This kernel never materializes logits in HBM. Features enter CLASS-MAJOR
(channels on sublanes, pixels dense on lanes — the layout rule proven by
``ce_loss.py``); each grid step computes its logit tile on the MXU in
VMEM, runs the same masked-CE arithmetic as ``ce_loss._ce_kernel``, and
accumulates the scalar total. The custom-VJP backward recomputes the
logit tile (one extra [C,Cin]@[Cin,BP] matmul — cheaper than an 80 MB
round-trip) and emits all three gradients in one pass:

  * dx[Cin, BP] = W · g       (MXU, written once, class-major)
  * dW[C, Cin] += g · x_blkᵀ  (f32 VMEM accumulator across the
                               sequential TPU grid)
  * db[C, 1]   += Σ_pixels g

Numerics match the unfused path's cast discipline: the matmuls run in
the feature dtype (bf16 under config 5) with f32 accumulation — exactly
what XLA's bf16 conv emitter does — and all softmax/CE math is f32
in-register (oracle-tested in ``tests/unit/test_pallas.py``).
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
BP = 8192  # pixels (lanes) per grid step


def _logits_tile(x_ref, wt_ref, b_ref):
    """[C, BP] f32 logit tile: Wᵀ·x on the MXU (f32 accumulation) + b."""
    x = x_ref[:]                                       # [Cin, BP]
    wt = wt_ref[:].astype(x.dtype)                     # [C, Cin]
    z = jax.lax.dot_general(wt, x, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return z + b_ref[:]                                # [C, BP] f32


def _fwd_kernel(ignore_index, x_ref, wt_ref, b_ref, lbl_ref, valid_ref,
                out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    v = valid_ref[:]                                   # [C, 1] 1/0
    z = jnp.where(v > 0, _logits_tile(x_ref, wt_ref, b_ref), NEG_INF)
    m = jnp.max(z, axis=0, keepdims=True)
    logz = m + jnp.log(jnp.sum(jnp.exp(z - m), axis=0, keepdims=True))
    lbl = lbl_ref[:]                                   # [1, BP] s32
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    picked = jnp.sum(jnp.where(row == lbl0, z, 0.0), axis=0, keepdims=True)
    out_ref[0, 0] += jnp.sum((logz - picked) * pix)


def _bwd_kernel(ignore_index, x_ref, wt_ref, w_ref, b_ref, lbl_ref,
                valid_ref, scale_ref, dx_ref, dw_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    v = valid_ref[:]
    z = jnp.where(v > 0, _logits_tile(x_ref, wt_ref, b_ref), NEG_INF)
    m = jnp.max(z, axis=0, keepdims=True)
    e = jnp.exp(z - m)
    p = e / jnp.sum(e, axis=0, keepdims=True)
    lbl = lbl_ref[:]
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    onehot = (row == lbl0).astype(jnp.float32)
    g = scale_ref[0, 0] * pix * (p - onehot)
    g = jnp.where(v > 0, g, 0.0)                       # [C, BP] f32
    # dlogits crosses the same dtype boundary as the unfused path (the
    # CE grad buffer is logits-dtype there), so the three matmuls below
    # see identical operand values.
    gc = g.astype(x_ref.dtype)
    dx_ref[:] = jax.lax.dot_general(
        w_ref[:].astype(x_ref.dtype), gc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    x = x_ref[:]
    dw_ref[:] += jax.lax.dot_general(
        gc, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(g, axis=1, keepdims=True)


def _prep(features, labels, valid_classes, ignore_index):
    """[B,H,W,Cin] → class-major [Cin, Pp]; labels → [1, Pp] (lane padding
    carries ignore_index so padded pixels contribute nothing)."""
    cin = features.shape[-1]
    x = features.reshape(-1, cin).T                    # [Cin, P]
    P = x.shape[1]
    bp = min(BP, common.round_up(P, LANES))
    Pp = common.round_up(P, bp)
    if Pp != P:
        x = jnp.pad(x, ((0, 0), (0, Pp - P)))
    lbl = labels.reshape(1, -1).astype(jnp.int32)
    if Pp != P:
        lbl = jnp.pad(lbl, ((0, 0), (0, Pp - P)),
                      constant_values=ignore_index)
    valid = valid_classes.astype(jnp.float32)[:, None]  # [C, 1]
    return x, lbl, valid, P, Pp, bp, cin


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _head_ce_total(features, w, b, labels, valid_classes, ignore_index):
    """UNNORMALIZED Σ per-pixel NLL of softmax(x·W + b) — 1/n outside,
    mirroring ``ce_loss._ce_total`` so the sharded variant can psum.

    ``w`` MUST already be [Cin, C] with C == len(valid_classes) (the
    public wrappers zero-pad grow-mode heads BEFORE this boundary so the
    VJP's dw/db cotangents match the primal shapes; pad's transpose then
    slices them back)."""
    return _head_ce_fwd(features, w, b, labels, valid_classes,
                        ignore_index)[0]


def _head_ce_fwd(features, w, b, labels, valid_classes, ignore_index):
    C = valid_classes.shape[0]
    x, lbl, valid, P, Pp, bp, cin = _prep(features, labels, valid_classes,
                                          ignore_index)
    grid = (Pp // bp,)
    xs = pl.BlockSpec((cin, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    wts = pl.BlockSpec((C, cin), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ls = pl.BlockSpec((1, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    total = pl.pallas_call(
        functools.partial(_fwd_kernel, ignore_index),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[xs, wts, bs, ls, bs],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=common.interpret_mode(),
    )(x, w.T, b[:, None], lbl, valid)[0, 0]
    return total, (features, w, b, labels, valid_classes)


def _head_ce_bwd(ignore_index, res, g):
    features, w, b, labels, valid_classes = res
    C = valid_classes.shape[0]
    x, lbl, valid, P, Pp, bp, cin = _prep(features, labels, valid_classes,
                                          ignore_index)
    grid = (Pp // bp,)
    xs = pl.BlockSpec((cin, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    wts = pl.BlockSpec((C, cin), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ws = pl.BlockSpec((cin, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ls = pl.BlockSpec((1, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    ss = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    scale = jnp.full((1, 1), g, jnp.float32)
    dx, dw, db = pl.pallas_call(
        functools.partial(_bwd_kernel, ignore_index),
        out_shape=(jax.ShapeDtypeStruct((cin, Pp), features.dtype),
                   jax.ShapeDtypeStruct((C, cin), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32)),
        grid=grid,
        in_specs=[xs, wts, ws, bs, ls, bs, ss],
        out_specs=(xs, wts, bs),
        interpret=common.interpret_mode(),
    )(x, w.T, w, b[:, None], lbl, valid, scale)
    dfeat = dx[:, :P].T.reshape(features.shape)
    return (dfeat, dw.T, db[:, 0],
            np.zeros(labels.shape, jax.dtypes.float0),
            np.zeros(valid_classes.shape, jax.dtypes.float0))


_head_ce_total.defvjp(_head_ce_fwd, _head_ce_bwd)


def _n_pix(labels, ignore_index):
    return jnp.maximum(
        (labels != ignore_index).sum().astype(jnp.float32), 1.0)


def head_cross_entropy(features, head_kernel, head_bias, labels,
                       valid_classes, *, ignore_index=255):
    """Fused head+CE: (mean NLL over non-ignored pixels, n_valid_pixels).

    ``head_kernel`` is the flax 1×1-conv param [1, 1, Cin, width] (f32);
    ``features`` the pre-head activations [B, H, W, Cin] in compute
    dtype. Same return contract as ``ce_loss.cross_entropy`` applied to
    the materialized logits (oracle-equality tested; never materializes
    them)."""
    cin = features.shape[-1]
    width = head_kernel.shape[-1]
    C = valid_classes.shape[0]
    w2 = head_kernel.reshape(cin, width)
    n = _n_pix(labels, ignore_index)
    if width != C:
        # custom_vjp sees the padded head so in-kernel shapes are fixed;
        # slice the grads back via a linear wrapper.
        w_pad = jnp.pad(w2, ((0, 0), (0, C - width)))
        b_pad = jnp.pad(head_bias, (0, C - width))
        total = _head_ce_total(features, w_pad, b_pad, labels,
                               valid_classes, int(ignore_index))
    else:
        total = _head_ce_total(features, w2, head_bias, labels,
                               valid_classes, int(ignore_index))
    return total / n, n


# ---------------------------------------------------------------------------
# Packed-view (pixel-major) variant — the packed-domain UNet's head
# ---------------------------------------------------------------------------
#
# The packed-domain UNet's features arrive lane-packed [B,H,G,L] with
# L = p*Cin (pixel-within-group u on the high lane bits).  The
# class-major kernel above wants [Cin, P]; doing that relayout in XLA
# costs ~4 ms/step at 512^2 of pure HBM traffic (reshape + transpose on
# BOTH sides of the step — DESIGN.md §8).  An earlier generation kept
# the packed layout end-to-end via a block-diagonal head matmul +
# SEGMENTED softmax (lane-block reductions); it measured net-negative
# twice (DESIGN.md §8 "packed head") because the segmented reductions
# cannot reach MXU rate.
#
# This generation instead converts each VMEM tile to class-major
# IN-KERNEL with p Mosaic 2-D transposes (~2 us/tile measured — the
# tile is already in VMEM for the head matmul, so the conversion adds
# ZERO HBM traffic) and then runs the EXACT same per-pixel CE math as
# the class-major kernels above.  dfeat is converted back in-kernel and
# leaves packed.  In-kernel column order is u-major: column j = u*tn + r
# for packed pixel (row i*tn + r, slot u); labels are pre-permuted
# OUTSIDE to match (one s32 [n//tn, tn, p] transpose — ~2 MB at 512^2,
# negligible next to the 134 MB feature relayout this kernel deletes).
# CE is an order-free sum over pixels, so the permutation cancels.


def _cm_from_packed(x, p, cin):
    """In-kernel [tn, p*cin] -> [cin, tn*p] (column = u*tn + r)."""
    return jnp.concatenate(
        [x[:, u * cin:(u + 1) * cin].T for u in range(p)], axis=-1)


def _packed_from_cm(d, p, tn):
    """In-kernel inverse of :func:`_cm_from_packed`:
    [cin, tn*p] -> [tn, p*cin]."""
    return jnp.concatenate(
        [d[:, u * tn:(u + 1) * tn].T for u in range(p)], axis=-1)


def _cm_logits(xcm, wt_ref, b_ref, v_ref):
    """[C, cols] masked f32 logits from a class-major feature tile."""
    wt = wt_ref[:].astype(xcm.dtype)
    z = jax.lax.dot_general(wt, xcm, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) + b_ref[:]
    return jnp.where(v_ref[:] > 0, z, NEG_INF)


def _pkcm_fwd_kernel(ignore_index, p, x_ref, wt_ref, b_ref, lbl_ref,
                     valid_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    cin = x_ref.shape[-1] // p
    xcm = _cm_from_packed(x_ref[...], p, cin)          # [cin, tn*p]
    z = _cm_logits(xcm, wt_ref, b_ref, valid_ref)
    m = jnp.max(z, axis=0, keepdims=True)
    logz = m + jnp.log(jnp.sum(jnp.exp(z - m), axis=0, keepdims=True))
    lbl = lbl_ref[:]                                   # [1, tn*p] s32
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    picked = jnp.sum(jnp.where(row == lbl0, z, 0.0), axis=0, keepdims=True)
    out_ref[0, 0] += jnp.sum((logz - picked) * pix)


def _pkcm_bwd_kernel(ignore_index, p, x_ref, wt_ref, w_ref, b_ref,
                     lbl_ref, valid_ref, scale_ref, dx_ref, dw_ref,
                     db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    cin = x_ref.shape[-1] // p
    tn = x_ref.shape[0]
    xcm = _cm_from_packed(x_ref[...], p, cin)
    z = _cm_logits(xcm, wt_ref, b_ref, valid_ref)
    m = jnp.max(z, axis=0, keepdims=True)
    e = jnp.exp(z - m)
    prob = e / jnp.sum(e, axis=0, keepdims=True)
    lbl = lbl_ref[:]
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    onehot = (row == lbl0).astype(jnp.float32)
    g = scale_ref[0, 0] * pix * (prob - onehot)
    g = jnp.where(valid_ref[:] > 0, g, 0.0)            # [C, tn*p] f32
    gc = g.astype(x_ref.dtype)
    dxcm = jax.lax.dot_general(
        w_ref[:].astype(gc.dtype), gc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dx_ref[...] = _packed_from_cm(dxcm, p, tn)
    dw_ref[:] += jax.lax.dot_general(
        gc, xcm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(g, axis=1, keepdims=True)


def _pick_rows(n: int, target: int = 2048) -> int:
    tn = min(n, target)
    while tn >= 8:
        if n % tn == 0:
            return tn
        tn -= 8
    return n


def _pkcm_prep(features, labels, p):
    """Packed features -> ([n, L] row view, permuted labels [1, n*p], n,
    tn).  The label permutation matches the kernel's u-major column
    order per tile (see module comment)."""
    lanes = features.shape[-1]
    x2 = features.reshape(-1, lanes)                   # [n, L] — free
    n = x2.shape[0]
    tn = _pick_rows(n, target=max(8, 8192 // p))
    lbl = labels.reshape(-1, p).astype(jnp.int32)      # [n, p] (w = g*p+u)
    lbl = (lbl.reshape(n // tn, tn, p).transpose(0, 2, 1)
           .reshape(1, n * p))                         # col = u*tn + r
    return x2, lbl, n, tn


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _head_ce_packed_total(features, w2, b, labels, valid_classes,
                          ignore_index, p):
    """UNNORMALIZED sum NLL on the packed feature view [B,H,G,p*Cin]."""
    return _head_ce_packed_fwd(features, w2, b, labels, valid_classes,
                               ignore_index, p)[0]


def _head_ce_packed_fwd(features, w2, b, labels, valid_classes,
                        ignore_index, p):
    C = valid_classes.shape[0]
    lanes = features.shape[-1]
    cin = lanes // p
    x2, lbl, n, tn = _pkcm_prep(features, labels, p)
    valid = valid_classes.astype(jnp.float32)[:, None]
    total = pl.pallas_call(
        functools.partial(_pkcm_fwd_kernel, int(ignore_index), p),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((C, cin), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, tn * p), lambda i: (0, i)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=common.interpret_mode(),
    )(x2, w2.T, b[:, None], lbl, valid)[0, 0]
    return total, (features, w2, b, labels, valid_classes)


def _head_ce_packed_bwd(ignore_index, p, res, gcot):
    features, w2, b, labels, valid_classes = res
    C = valid_classes.shape[0]
    lanes = features.shape[-1]
    cin = lanes // p
    x2, lbl, n, tn = _pkcm_prep(features, labels, p)
    valid = valid_classes.astype(jnp.float32)[:, None]
    scale = jnp.full((1, 1), gcot, jnp.float32)
    dx, dwt, db = pl.pallas_call(
        functools.partial(_pkcm_bwd_kernel, int(ignore_index), p),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((C, cin), lambda i: (0, 0)),
            pl.BlockSpec((cin, C), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, tn * p), lambda i: (0, i)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
                   pl.BlockSpec((C, cin), lambda i: (0, 0)),
                   pl.BlockSpec((C, 1), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n, lanes), features.dtype),
                   jax.ShapeDtypeStruct((C, cin), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32)),
        interpret=common.interpret_mode(),
    )(x2, w2.T, w2, b[:, None], lbl, valid, scale)
    dfeat = dx.reshape(features.shape)
    return (dfeat, dwt.T, db[:, 0],
            np.zeros(labels.shape, jax.dtypes.float0),
            np.zeros(valid_classes.shape, jax.dtypes.float0))


_head_ce_packed_total.defvjp(_head_ce_packed_fwd, _head_ce_packed_bwd)


# ---------------------------------------------------------------------------
# BN·ReLU prologue variant: consume the packed body's RAW last-conv output
# ---------------------------------------------------------------------------
#
# The packed UNet's final level defers its BatchNorm: it returns raw conv
# sums plus per-channel (scale, shift) vectors, and a separate eltwise
# kernel materializes z = relu(y·s + t) for the head (`eltwise_out`,
# ~1.0 ms/step at 512²/b8 — pure HBM round-trip, DESIGN.md §8).  These
# kernels apply that affine+ReLU in VMEM as a prologue instead, so z
# never exists in HBM.  Bit-compat with the unfused composition: z is
# computed in f32 and ROUNDED to the feature dtype before the logit dot
# (the eltwise kernel's store), and the backward rounds the feature
# cotangent to the feature dtype before the mask·scale (the unfused head
# kernel's dx store), so loss, dfeat, dW and db match the
# eltwise-then-head composition bit-for-bit; dscale/dshift agree to
# 1 f32 ulp (same colsum math, different surrounding kernel — XLA may
# reassociate the lane reduction) (tests/unit/test_pallas.py).
# The scale/shift cotangents use the eltwise VJP's math:
#     du = [t > 0]·dz,   dy = du·s,   ds_l = Σ du·y,   dt_l = Σ du.


def _pkbn_fwd_kernel(ignore_index, p, x_ref, s_ref, t_ref, wt_ref, b_ref,
                     lbl_ref, valid_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    cin = x_ref.shape[-1] // p
    zf = jnp.maximum(
        x_ref[...].astype(jnp.float32) * s_ref[0] + t_ref[0], 0.0)
    xcm = _cm_from_packed(zf.astype(x_ref.dtype), p, cin)
    z = _cm_logits(xcm, wt_ref, b_ref, valid_ref)
    m = jnp.max(z, axis=0, keepdims=True)
    logz = m + jnp.log(jnp.sum(jnp.exp(z - m), axis=0, keepdims=True))
    lbl = lbl_ref[:]
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    picked = jnp.sum(jnp.where(row == lbl0, z, 0.0), axis=0, keepdims=True)
    out_ref[0, 0] += jnp.sum((logz - picked) * pix)


def _pkbn_bwd_kernel(ignore_index, p, x_ref, s_ref, t_ref, wt_ref, w_ref,
                     b_ref, lbl_ref, valid_ref, scale_ref, dx_ref,
                     dst_ref, dw_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dst_ref[:] = jnp.zeros_like(dst_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    cin = x_ref.shape[-1] // p
    tn = x_ref.shape[0]
    yf = x_ref[...].astype(jnp.float32)
    t = yf * s_ref[0] + t_ref[0]
    zf = jnp.maximum(t, 0.0)
    xcm = _cm_from_packed(zf.astype(x_ref.dtype), p, cin)
    z = _cm_logits(xcm, wt_ref, b_ref, valid_ref)
    m = jnp.max(z, axis=0, keepdims=True)
    e = jnp.exp(z - m)
    prob = e / jnp.sum(e, axis=0, keepdims=True)
    lbl = lbl_ref[:]
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    onehot = (row == lbl0).astype(jnp.float32)
    g = scale_ref[0, 0] * pix * (prob - onehot)
    g = jnp.where(valid_ref[:] > 0, g, 0.0)
    gc = g.astype(x_ref.dtype)
    dzcm = jax.lax.dot_general(
        w_ref[:].astype(gc.dtype), gc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # rounding parity: the unfused head stores dz in the feature dtype
    dz = (_packed_from_cm(dzcm, p, tn).astype(x_ref.dtype)
          .astype(jnp.float32))
    du = jnp.where(t > 0, dz, 0.0)
    dx_ref[...] = (du * s_ref[0]).astype(dx_ref.dtype)
    dst_ref[0:1, :] += common.colsum(du * yf)
    dst_ref[1:2, :] += common.colsum(du)
    dw_ref[:] += jax.lax.dot_general(
        gc, xcm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(g, axis=1, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _head_ce_packed_bn_total(features, scale, shift, w2, b, labels,
                             valid_classes, ignore_index, p):
    """UNNORMALIZED sum NLL on the RAW packed view with the deferred
    BN·ReLU applied in-kernel (scale/shift are per-channel [C_in];
    lane-tiling and the p-fold of their cotangents live inside this VJP
    so both match ``bn_relu_packed``'s exactly)."""
    return _head_ce_packed_bn_fwd(features, scale, shift, w2, b, labels,
                                  valid_classes, ignore_index, p)[0]


def _head_ce_packed_bn_fwd(features, scale, shift, w2, b, labels,
                           valid_classes, ignore_index, p):
    C = valid_classes.shape[0]
    lanes = features.shape[-1]
    cin = lanes // p
    s_l, t_l = jnp.tile(scale, p), jnp.tile(shift, p)
    x2, lbl, n, tn = _pkcm_prep(features, labels, p)
    valid = valid_classes.astype(jnp.float32)[:, None]
    total = pl.pallas_call(
        functools.partial(_pkbn_fwd_kernel, int(ignore_index), p),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((C, cin), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, tn * p), lambda i: (0, i)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=common.interpret_mode(),
    )(x2, s_l.reshape(1, -1), t_l.reshape(1, -1), w2.T, b[:, None], lbl,
      valid)[0, 0]
    return total, (features, scale, shift, w2, b, labels, valid_classes)


def _head_ce_packed_bn_bwd(ignore_index, p, res, gcot):
    features, scale, shift, w2, b, labels, valid_classes = res
    C = valid_classes.shape[0]
    lanes = features.shape[-1]
    cin = lanes // p
    s_l, t_l = jnp.tile(scale, p), jnp.tile(shift, p)
    x2, lbl, n, tn = _pkcm_prep(features, labels, p)
    valid = valid_classes.astype(jnp.float32)[:, None]
    scale = jnp.full((1, 1), gcot, jnp.float32)
    dx, dst, dwt, db = pl.pallas_call(
        functools.partial(_pkbn_bwd_kernel, int(ignore_index), p),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((C, cin), lambda i: (0, 0)),
            pl.BlockSpec((cin, C), lambda i: (0, 0)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, tn * p), lambda i: (0, i)),
            pl.BlockSpec((C, 1), lambda i: (0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
                   pl.BlockSpec((2, lanes), lambda i: (0, 0)),
                   pl.BlockSpec((C, cin), lambda i: (0, 0)),
                   pl.BlockSpec((C, 1), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n, lanes), features.dtype),
                   jax.ShapeDtypeStruct((2, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((C, cin), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32)),
        interpret=common.interpret_mode(),
    )(x2, s_l.reshape(1, -1), t_l.reshape(1, -1), w2.T, w2, b[:, None],
      lbl, valid, scale)
    dfeat = dx.reshape(features.shape)
    dscale = dst[0].reshape(p, cin).sum(0)
    dshift = dst[1].reshape(p, cin).sum(0)
    return (dfeat, dscale, dshift, dwt.T, db[:, 0],
            np.zeros(labels.shape, jax.dtypes.float0),
            np.zeros(valid_classes.shape, jax.dtypes.float0))


_head_ce_packed_bn_total.defvjp(_head_ce_packed_bn_fwd,
                                _head_ce_packed_bn_bwd)


def _bn_head_args(head_kernel, head_bias, valid_classes):
    cin = head_kernel.shape[-2] if head_kernel.ndim == 4 else \
        head_kernel.shape[0]
    width = head_kernel.shape[-1]
    C = valid_classes.shape[0]
    w2 = head_kernel.reshape(cin, width)
    if width != C:
        w2 = jnp.pad(w2, ((0, 0), (0, C - width)))
        head_bias = jnp.pad(head_bias, (0, C - width))
    return w2, head_bias


def head_cross_entropy_packed_bn(features_raw, scale, shift, head_kernel,
                                 head_bias, labels, valid_classes, *, p,
                                 ignore_index=255):
    """Fused BN·ReLU + head + CE on the packed body's RAW output
    [B,H,G,p·Cin] with its deferred per-channel (scale, shift) — equals
    ``head_cross_entropy_packed(bn_relu_packed(raw, scale, shift, p), …)``
    bit-for-bit, without materializing z (oracle-equality tested)."""
    w2, hb = _bn_head_args(head_kernel, head_bias, valid_classes)
    n = _n_pix(labels, ignore_index)
    total = _head_ce_packed_bn_total(features_raw, scale, shift, w2, hb,
                                     labels, valid_classes,
                                     int(ignore_index), p)
    return total / n, n


def head_cross_entropy_packed_bn_sharded(features_raw, scale, shift,
                                         head_kernel, head_bias, labels,
                                         valid_classes, *, p, axis,
                                         ignore_index=255):
    """Batch-sharded :func:`head_cross_entropy_packed_bn` for use inside
    ``jax.shard_map`` (mirrors :func:`head_cross_entropy_packed_sharded`;
    scale/shift are replicated — the packed DP body psums BN stats)."""
    w2, hb = _bn_head_args(head_kernel, head_bias, valid_classes)
    total = _head_ce_packed_bn_total(features_raw, scale, shift, w2, hb,
                                     labels, valid_classes,
                                     int(ignore_index), p)
    n_local = (labels != ignore_index).sum().astype(jnp.float32)
    total = jax.lax.psum(total, axis)
    n = jnp.maximum(jax.lax.psum(n_local, axis), 1.0)
    return total / n, n


def head_cross_entropy_packed(features, head_kernel, head_bias, labels,
                              valid_classes, *, p, ignore_index=255):
    """Fused head+CE on the PACKED feature view [B,H,G,p·Cin] — same
    return contract as :func:`head_cross_entropy` on the unpacked
    features (oracle-equality tested); dfeat stays packed."""
    cin = features.shape[-1] // p
    width = head_kernel.shape[-1]
    C = valid_classes.shape[0]
    w2 = head_kernel.reshape(cin, width)
    if width != C:
        w2 = jnp.pad(w2, ((0, 0), (0, C - width)))
        head_bias = jnp.pad(head_bias, (0, C - width))
    n = _n_pix(labels, ignore_index)
    total = _head_ce_packed_total(features, w2, head_bias, labels,
                                  valid_classes, int(ignore_index), p)
    return total / n, n


def head_cross_entropy_packed_sharded(features, head_kernel, head_bias,
                                      labels, valid_classes, *, p, axis,
                                      ignore_index=255):
    """Batch-sharded packed head+CE for use inside ``jax.shard_map``
    (mirrors :func:`head_cross_entropy_sharded`)."""
    cin = features.shape[-1] // p
    width = head_kernel.shape[-1]
    C = valid_classes.shape[0]
    w2 = head_kernel.reshape(cin, width)
    if width != C:
        w2 = jnp.pad(w2, ((0, 0), (0, C - width)))
        head_bias = jnp.pad(head_bias, (0, C - width))
    total = _head_ce_packed_total(features, w2, head_bias, labels,
                                  valid_classes, int(ignore_index), p)
    n_local = (labels != ignore_index).sum().astype(jnp.float32)
    total = jax.lax.psum(total, axis)
    n = jnp.maximum(jax.lax.psum(n_local, axis), 1.0)
    return total / n, n


def head_cross_entropy_sharded(features, head_kernel, head_bias, labels,
                               valid_classes, *, axis, ignore_index=255):
    """Batch-sharded fused head+CE for use INSIDE ``jax.shard_map`` over
    ``axis`` (mirrors ``ce_loss.cross_entropy_sharded``): per-device
    kernel on local pixels, global mean via psum. The head-param grads
    psum automatically when shard_map transposes the replicated-in
    operands. Returns (loss, global n) — both replicated."""
    cin = features.shape[-1]
    width = head_kernel.shape[-1]
    C = valid_classes.shape[0]
    w2 = head_kernel.reshape(cin, width)
    if width != C:
        w2 = jnp.pad(w2, ((0, 0), (0, C - width)))
        head_bias = jnp.pad(head_bias, (0, C - width))
    total = _head_ce_total(features, w2, head_bias, labels, valid_classes,
                           int(ignore_index))
    n_local = (labels != ignore_index).sum().astype(jnp.float32)
    total = jax.lax.psum(total, axis)
    n = jnp.maximum(jax.lax.psum(n_local, axis), 1.0)
    return total / n, n
