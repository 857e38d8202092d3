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


def _dd(dtype):
    """Dot-operand dtype: the compute dtype on TPU; f32 in interpret
    mode. XLA:CPU's thunk runtime cannot execute bf16×bf16→f32 dots in
    some lowering contexts (surfaced by the KD kernels in the CPU
    dryrun). Operands are SEMANTICALLY rounded to the compute dtype
    first, then upcast — products and f32 accumulation are identical to
    the TPU MXU path, so results don't change."""
    return jnp.float32 if common.interpret_mode() else dtype


def _logits_tile(x_ref, wt_ref, b_ref):
    """[C, BP] f32 logit tile: Wᵀ·x on the MXU (f32 accumulation) + b."""
    dd = _dd(x_ref.dtype)
    x = x_ref[:].astype(dd)                            # [Cin, BP]
    wt = wt_ref[:].astype(x_ref.dtype).astype(dd)      # [C, Cin]
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
    dd = _dd(x_ref.dtype)
    gc = g.astype(x_ref.dtype).astype(dd)
    dx_ref[:] = jax.lax.dot_general(
        w_ref[:].astype(x_ref.dtype).astype(dd), gc,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    x = x_ref[:].astype(dd)
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
    dd = _dd(xcm.dtype)
    wt = wt_ref[:].astype(xcm.dtype).astype(dd)
    z = jax.lax.dot_general(wt, xcm.astype(dd), (((1,), (0,)), ((), ())),
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
    dd = _dd(x_ref.dtype)
    gc = g.astype(x_ref.dtype).astype(dd)
    dxcm = jax.lax.dot_general(
        w_ref[:].astype(x_ref.dtype).astype(dd), gc,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    dx_ref[...] = _packed_from_cm(dxcm, p, tn)
    dw_ref[:] += jax.lax.dot_general(
        gc, xcm.astype(dd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(g, axis=1, keepdims=True)


def _pick_rows(n: int, target: int = 2048) -> int:
    tn = min(n, target)
    while tn >= 8:
        if n % tn == 0:
            return tn
        tn -= 8
    return n


def _pkcm_prep(features, labels, p, row_target=8192):
    """Packed features -> ([n, L] row view, permuted labels [1, n*p], n,
    tn).  The label permutation matches the kernel's u-major column
    order per tile (see module comment).  ``row_target`` sets the dot-row
    tile budget; the KD path passes a smaller one (teacher tile + its f32
    intermediates live in the same VMEM)."""
    lanes = features.shape[-1]
    x2 = features.reshape(-1, lanes)                   # [n, L] — free
    n = x2.shape[0]
    tn = _pick_rows(n, target=max(8, row_target // p))
    # Permute labels to the kernel's u-major column order per tile
    # (col = u*tn + r) with NO gather and NO small-minor-dim temp.  Two
    # earlier forms both hit relay-compiler pathologies:
    #   * reshape(n//tn, tn, p).transpose(0, 2, 1) materializes an s32
    #     temp with minor dim p, which the (8,128) s32 tiling pads 32×
    #     at p=4 (72 MB logical → 2.25 GB, OOM'd baseline_5 under the
    #     2026-08-21 relay compile);
    #   * the flat 1-D jnp.take(flat, (t*tn+r)*p + u) gather compiles on
    #     that same relay generation to a ~15 ms serial kCustom gather
    #     in the backward — the whole r4 −26% headline regression
    #     (attr_b8_512_r5gen.json fusion.4).
    # Strided 1-D slices (one per packed sub-pixel u) followed by a
    # major-dim transpose keep every intermediate's minor dim ≥ tn, so
    # the result is pure vectorized copies on any compiler generation.
    flat = labels.reshape(-1).astype(jnp.int32)        # [n*p], idx = g*p+u
    if p == 1:
        return x2, flat.reshape(1, n), n, tn
    parts = [jax.lax.slice(flat, (u,), (n * p,), (p,)) for u in range(p)]
    a = jnp.stack(parts)                               # [p, n], minor n
    a = a.reshape(p, n // tn, tn)                      # minor tn
    lbl = a.transpose(1, 0, 2).reshape(1, n * p)       # [n//tn, p, tn]
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
    dd = _dd(x_ref.dtype)
    gc = g.astype(x_ref.dtype).astype(dd)
    dzcm = jax.lax.dot_general(
        w_ref[:].astype(x_ref.dtype).astype(dd), gc,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # rounding parity: the unfused head stores dz in the feature dtype
    dz = (_packed_from_cm(dzcm, p, tn).astype(x_ref.dtype)
          .astype(jnp.float32))
    du = jnp.where(t > 0, dz, 0.0)
    dx_ref[...] = (du * s_ref[0]).astype(dx_ref.dtype)
    dst_ref[0:1, :] += common.colsum(du * yf)
    dst_ref[1:2, :] += common.colsum(du)
    dw_ref[:] += jax.lax.dot_general(
        gc, xcm.astype(dd), (((1,), (1,)), ((), ())),
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


# ---------------------------------------------------------------------------
# KD-fused variants: CE + LwF distillation in the same tile pass
# ---------------------------------------------------------------------------
#
# LwF needs the distillation KL between teacher and student logits
# (losses.kd_loss_jnp; SURVEY.md §2.1 "LwF").  Round 2 therefore dropped
# the fused head whenever LwF was active (`use_fused_head = ... and not
# use_lwf`) and baseline_4 paid ~43% throughput for the unfused logits
# round-trips (VERDICT r2 weak #2 / next #4).  These kernels lift that:
# the TEACHER logit tile is one extra [C,Cin]@[Cin,cols] dot in VMEM
# from the teacher's (stop-gradient) pre-head features, the KD terms use
# the same in-register f32 softmax discipline as the CE math, and the
# backward folds d(kd)/dz = T·(p_new − p_old) into the same per-logit
# cotangent g that drives dx/dW/db — so neither student nor teacher
# logits ever exist in HBM.  Teacher inputs receive zero cotangents
# (they are stop_gradient'ed by the caller; the zeros are DCE'd).
#
# KD math (identical to losses.kd_loss_jnp): with z the student and zt
# the teacher logits, both masked to the OLD model's class set,
#   kd_pix = T² · Σ_c softmax(zt/T)_c · (log_softmax(zt/T)_c
#                                        − log_softmax(z/T)_c)
# summed over non-ignored pixels; 1/n and the α/weight gates are applied
# by the caller.  d(kd_pix)/dz_c = T·(softmax(z/T)_c − softmax(zt/T)_c)
# for c in the old set, 0 elsewhere.


def _kd_sum_tile(z, zt, pix, old_v, t):
    """Σ_pixels kd_pix from masked f32 logit tiles [C, cols]."""
    zo = jnp.where(old_v > 0, z, NEG_INF) / t
    zto = jnp.where(old_v > 0, zt, NEG_INF) / t
    mo = jnp.max(zto, axis=0, keepdims=True)
    eo = jnp.exp(zto - mo)
    so = jnp.sum(eo, axis=0, keepdims=True)
    p_old = eo / so
    logp_old = zto - mo - jnp.log(so)
    mn = jnp.max(zo, axis=0, keepdims=True)
    en = jnp.exp(zo - mn)
    sn = jnp.sum(en, axis=0, keepdims=True)
    logp_new = zo - mn - jnp.log(sn)
    kl = jnp.sum(p_old * (logp_old - logp_new), axis=0, keepdims=True)
    return (t * t) * jnp.sum(kl * pix)


def _kd_grad_tile(z, zt, pix, old_v, t):
    """d(Σ kd_pix)/dz — [C, cols] f32 (unscaled by the loss cotangent)."""
    zo = jnp.where(old_v > 0, z, NEG_INF) / t
    zto = jnp.where(old_v > 0, zt, NEG_INF) / t
    mo = jnp.max(zto, axis=0, keepdims=True)
    eo = jnp.exp(zto - mo)
    p_old = eo / jnp.sum(eo, axis=0, keepdims=True)
    mn = jnp.max(zo, axis=0, keepdims=True)
    en = jnp.exp(zo - mn)
    p_new = en / jnp.sum(en, axis=0, keepdims=True)
    g = t * (p_new - p_old) * pix
    return jnp.where(old_v > 0, g, 0.0)


def _kd_fwd_kernel(ignore_index, t, x_ref, wt_ref, b_ref, xt_ref, wtt_ref,
                   bt_ref, lbl_ref, valid_ref, ovalid_ref, ce_ref, kd_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ce_ref[0, 0] = jnp.float32(0.0)
        kd_ref[0, 0] = jnp.float32(0.0)

    v = valid_ref[:]
    z = jnp.where(v > 0, _logits_tile(x_ref, wt_ref, b_ref), NEG_INF)
    m = jnp.max(z, axis=0, keepdims=True)
    logz = m + jnp.log(jnp.sum(jnp.exp(z - m), axis=0, keepdims=True))
    lbl = lbl_ref[:]
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl0 = jnp.where(lbl == ignore_index, 0, lbl)
    row = jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    picked = jnp.sum(jnp.where(row == lbl0, z, 0.0), axis=0, keepdims=True)
    ce_ref[0, 0] += jnp.sum((logz - picked) * pix)
    ov = ovalid_ref[:]
    zt = _logits_tile(xt_ref, wtt_ref, bt_ref)
    kd_ref[0, 0] += _kd_sum_tile(z, zt, pix, ov, t)


def _kd_bwd_kernel(ignore_index, t, x_ref, wt_ref, w_ref, b_ref, xt_ref,
                   wtt_ref, bt_ref, lbl_ref, valid_ref, ovalid_ref,
                   gce_ref, gkd_ref, dx_ref, dw_ref, db_ref):
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
    g = gce_ref[0, 0] * pix * (p - onehot)
    g = jnp.where(v > 0, g, 0.0)
    ov = ovalid_ref[:]
    zt = _logits_tile(xt_ref, wtt_ref, bt_ref)
    g = g + gkd_ref[0, 0] * _kd_grad_tile(z, zt, pix, ov, t)
    dd = _dd(x_ref.dtype)
    gc = g.astype(x_ref.dtype).astype(dd)
    dx_ref[:] = jax.lax.dot_general(
        w_ref[:].astype(x_ref.dtype).astype(dd), gc,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    x = x_ref[:].astype(dd)
    dw_ref[:] += jax.lax.dot_general(
        gc, x, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(g, axis=1, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _head_ce_kd_total(features, w, b, tfeat, tw, tb, labels, vo_pair,
                      ignore_index, temperature):
    """(Σ per-pixel NLL, Σ per-pixel KD) — unnormalized, class-major.
    ``vo_pair`` = (valid_classes, old_valid). Teacher args get zero
    cotangents."""
    return _head_ce_kd_fwd(features, w, b, tfeat, tw, tb, labels, vo_pair,
                           ignore_index, temperature)[0]


def _head_ce_kd_fwd(features, w, b, tfeat, tw, tb, labels, vo_pair,
                    ignore_index, temperature):
    valid_classes, old_valid = vo_pair
    C = valid_classes.shape[0]
    x, lbl, valid, P, Pp, bp, cin = _prep(features, labels, valid_classes,
                                          ignore_index)
    xt = tfeat.reshape(-1, cin).T
    if Pp != xt.shape[1]:
        xt = jnp.pad(xt, ((0, 0), (0, Pp - xt.shape[1])))
    ovalid = old_valid.astype(jnp.float32)[:, None]
    grid = (Pp // bp,)
    xs = pl.BlockSpec((cin, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    wts = pl.BlockSpec((C, cin), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ls = pl.BlockSpec((1, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    ss = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    ce, kd = pl.pallas_call(
        functools.partial(_kd_fwd_kernel, ignore_index, temperature),
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        grid=grid,
        in_specs=[xs, wts, bs, xs, wts, bs, ls, bs, bs],
        out_specs=(ss, ss),
        interpret=common.interpret_mode(),
    )(x, w.T, b[:, None], xt, tw.T, tb[:, None], lbl, valid, ovalid)
    return ((ce[0, 0], kd[0, 0]),
            (features, w, b, tfeat, tw, tb, labels, vo_pair))


def _head_ce_kd_bwd(ignore_index, temperature, res, cots):
    features, w, b, tfeat, tw, tb, labels, vo_pair = res
    valid_classes, old_valid = vo_pair
    gce, gkd = cots
    C = valid_classes.shape[0]
    x, lbl, valid, P, Pp, bp, cin = _prep(features, labels, valid_classes,
                                          ignore_index)
    xt = tfeat.reshape(-1, cin).T
    if Pp != xt.shape[1]:
        xt = jnp.pad(xt, ((0, 0), (0, Pp - xt.shape[1])))
    ovalid = old_valid.astype(jnp.float32)[:, None]
    grid = (Pp // bp,)
    xs = pl.BlockSpec((cin, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    wts = pl.BlockSpec((C, cin), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ws = pl.BlockSpec((cin, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ls = pl.BlockSpec((1, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    ss = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dx, dw, db = pl.pallas_call(
        functools.partial(_kd_bwd_kernel, ignore_index, temperature),
        out_shape=(jax.ShapeDtypeStruct((cin, Pp), features.dtype),
                   jax.ShapeDtypeStruct((C, cin), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32)),
        grid=grid,
        in_specs=[xs, wts, ws, bs, xs, wts, bs, ls, bs, bs, ss, ss],
        out_specs=(xs, wts, bs),
        interpret=common.interpret_mode(),
    )(x, w.T, w, b[:, None], xt, tw.T, tb[:, None], lbl, valid, ovalid,
      jnp.full((1, 1), gce, jnp.float32), jnp.full((1, 1), gkd, jnp.float32))
    dfeat = dx[:, :P].T.reshape(features.shape)
    return (dfeat, dw.T, db[:, 0],
            jnp.zeros_like(tfeat), jnp.zeros_like(tw), jnp.zeros_like(tb),
            np.zeros(labels.shape, jax.dtypes.float0),
            (np.zeros(valid_classes.shape, jax.dtypes.float0),
             np.zeros(old_valid.shape, jax.dtypes.float0)))


_head_ce_kd_total.defvjp(_head_ce_kd_fwd, _head_ce_kd_bwd)


def head_cross_entropy_kd(features, head_kernel, head_bias, tfeatures,
                          t_kernel, t_bias, labels, valid_classes,
                          old_valid, *, temperature, ignore_index=255):
    """Fused head + CE + LwF-KD on plain NHWC features: returns
    (ce_mean, kd_mean, n).  ``kd_mean`` equals ``losses.kd_loss_jnp`` of
    the two materialized logit tensors (oracle-tested); α and the LwF
    weight gate are applied by the caller."""
    w2, hb = _bn_head_args(head_kernel, head_bias, valid_classes)
    tw2, tb2 = _bn_head_args(t_kernel, t_bias, valid_classes)
    n = _n_pix(labels, ignore_index)
    ce_t, kd_t = _head_ce_kd_total(
        features, w2, hb, tfeatures, tw2, tb2, labels,
        (valid_classes, old_valid), int(ignore_index), float(temperature))
    return ce_t / n, kd_t / n, n


def head_cross_entropy_kd_sharded(features, head_kernel, head_bias,
                                  tfeatures, t_kernel, t_bias, labels,
                                  valid_classes, old_valid, *, axis,
                                  temperature, ignore_index=255):
    """Batch-sharded :func:`head_cross_entropy_kd` for jax.shard_map."""
    w2, hb = _bn_head_args(head_kernel, head_bias, valid_classes)
    tw2, tb2 = _bn_head_args(t_kernel, t_bias, valid_classes)
    ce_t, kd_t = _head_ce_kd_total(
        features, w2, hb, tfeatures, tw2, tb2, labels,
        (valid_classes, old_valid), int(ignore_index), float(temperature))
    n_local = (labels != ignore_index).sum().astype(jnp.float32)
    ce_t = jax.lax.psum(ce_t, axis)
    kd_t = jax.lax.psum(kd_t, axis)
    n = jnp.maximum(jax.lax.psum(n_local, axis), 1.0)
    return ce_t / n, kd_t / n, n


# Packed-view BN-prologue KD kernels: the production baseline_4/5 path.


def _pkbn_kd_fwd_kernel(ignore_index, t, p, x_ref, s_ref, t_ref, wt_ref,
                        b_ref, xt_ref, st_ref, tt_ref, wtt_ref, bt_ref,
                        lbl_ref, valid_ref, ovalid_ref, ce_ref, kd_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ce_ref[0, 0] = jnp.float32(0.0)
        kd_ref[0, 0] = jnp.float32(0.0)

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
    ce_ref[0, 0] += jnp.sum((logz - picked) * pix)
    ztf = jnp.maximum(
        xt_ref[...].astype(jnp.float32) * st_ref[0] + tt_ref[0], 0.0)
    ddt = _dd(xt_ref.dtype)
    xtcm = _cm_from_packed(ztf.astype(xt_ref.dtype), p, cin).astype(ddt)
    wtt = wtt_ref[:].astype(xt_ref.dtype).astype(ddt)
    zt = jax.lax.dot_general(wtt, xtcm, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + bt_ref[:]
    kd_ref[0, 0] += _kd_sum_tile(z, zt, pix, ovalid_ref[:], t)


def _pkbn_kd_bwd_kernel(ignore_index, t, p, x_ref, s_ref, t_ref, wt_ref,
                        w_ref, b_ref, xt_ref, st_ref, tt_ref, wtt_ref,
                        bt_ref, lbl_ref, valid_ref, ovalid_ref, gce_ref,
                        gkd_ref, dx_ref, dst_ref, dw_ref, db_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dst_ref[:] = jnp.zeros_like(dst_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    cin = x_ref.shape[-1] // p
    tn = x_ref.shape[0]
    yf = x_ref[...].astype(jnp.float32)
    tpre = yf * s_ref[0] + t_ref[0]
    zf = jnp.maximum(tpre, 0.0)
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
    g = gce_ref[0, 0] * pix * (prob - onehot)
    g = jnp.where(valid_ref[:] > 0, g, 0.0)
    ztf = jnp.maximum(
        xt_ref[...].astype(jnp.float32) * st_ref[0] + tt_ref[0], 0.0)
    ddt = _dd(xt_ref.dtype)
    xtcm = _cm_from_packed(ztf.astype(xt_ref.dtype), p, cin).astype(ddt)
    wtt = wtt_ref[:].astype(xt_ref.dtype).astype(ddt)
    zt = jax.lax.dot_general(wtt, xtcm, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) + bt_ref[:]
    g = g + gkd_ref[0, 0] * _kd_grad_tile(z, zt, pix, ovalid_ref[:], t)
    dd = _dd(x_ref.dtype)
    gc = g.astype(x_ref.dtype).astype(dd)
    dzcm = jax.lax.dot_general(
        w_ref[:].astype(x_ref.dtype).astype(dd), gc,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz = (_packed_from_cm(dzcm, p, tn).astype(x_ref.dtype)
          .astype(jnp.float32))
    du = jnp.where(tpre > 0, dz, 0.0)
    dx_ref[...] = (du * s_ref[0]).astype(dx_ref.dtype)
    dst_ref[0:1, :] += common.colsum(du * yf)
    dst_ref[1:2, :] += common.colsum(du)
    dw_ref[:] += jax.lax.dot_general(
        gc, xcm.astype(dd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(g, axis=1, keepdims=True)


def _pkcm_prep_kd(features, labels, p):
    """:func:`_pkcm_prep` at half the row-tile target — the KD kernels
    hold a teacher tile + its f32 intermediates too."""
    return _pkcm_prep(features, labels, p, row_target=4096)


@functools.partial(jax.custom_vjp, nondiff_argnums=(12, 13, 14))
def _head_ce_kd_packed_bn_total(features, scale, shift, w2, b, tfeat,
                                tscale, tshift, tw2, tb, labels, vo_pair,
                                ignore_index, p, temperature):
    """(Σ NLL, Σ KD) on RAW packed views with deferred BN·ReLU applied
    in-kernel for BOTH student and teacher."""
    return _head_ce_kd_packed_bn_fwd(
        features, scale, shift, w2, b, tfeat, tscale, tshift, tw2, tb,
        labels, vo_pair, ignore_index, p, temperature)[0]


def _head_ce_kd_packed_bn_fwd(features, scale, shift, w2, b, tfeat,
                              tscale, tshift, tw2, tb, labels, vo_pair,
                              ignore_index, p, temperature):
    valid_classes, old_valid = vo_pair
    C = valid_classes.shape[0]
    lanes = features.shape[-1]
    cin = lanes // p
    s_l, t_l = jnp.tile(scale, p), jnp.tile(shift, p)
    ts_l, tt_l = jnp.tile(tscale, p), jnp.tile(tshift, p)
    x2, lbl, n, tn = _pkcm_prep_kd(features, labels, p)
    xt2 = tfeat.reshape(-1, lanes)
    valid = valid_classes.astype(jnp.float32)[:, None]
    ovalid = old_valid.astype(jnp.float32)[:, None]
    rows = pl.BlockSpec((tn, lanes), lambda i: (i, 0))
    vec = pl.BlockSpec((1, lanes), lambda i: (0, 0))
    wts = pl.BlockSpec((C, cin), lambda i: (0, 0))
    cb = pl.BlockSpec((C, 1), lambda i: (0, 0))
    ls = pl.BlockSpec((1, tn * p), lambda i: (0, i))
    ss = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    ce, kd = pl.pallas_call(
        functools.partial(_pkbn_kd_fwd_kernel, int(ignore_index),
                          temperature, p),
        grid=(n // tn,),
        in_specs=[rows, vec, vec, wts, cb, rows, vec, vec, wts, cb, ls,
                  cb, cb],
        out_specs=(ss, ss),
        out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, 1), jnp.float32)),
        interpret=common.interpret_mode(),
    )(x2, s_l.reshape(1, -1), t_l.reshape(1, -1), w2.T, b[:, None],
      xt2, ts_l.reshape(1, -1), tt_l.reshape(1, -1), tw2.T, tb[:, None],
      lbl, valid, ovalid)
    return ((ce[0, 0], kd[0, 0]),
            (features, scale, shift, w2, b, tfeat, tscale, tshift, tw2,
             tb, labels, vo_pair))


def _head_ce_kd_packed_bn_bwd(ignore_index, p, temperature, res, cots):
    (features, scale, shift, w2, b, tfeat, tscale, tshift, tw2, tb,
     labels, vo_pair) = res
    valid_classes, old_valid = vo_pair
    gce, gkd = cots
    C = valid_classes.shape[0]
    lanes = features.shape[-1]
    cin = lanes // p
    s_l, t_l = jnp.tile(scale, p), jnp.tile(shift, p)
    ts_l, tt_l = jnp.tile(tscale, p), jnp.tile(tshift, p)
    x2, lbl, n, tn = _pkcm_prep_kd(features, labels, p)
    xt2 = tfeat.reshape(-1, lanes)
    valid = valid_classes.astype(jnp.float32)[:, None]
    ovalid = old_valid.astype(jnp.float32)[:, None]
    rows = pl.BlockSpec((tn, lanes), lambda i: (i, 0))
    vec = pl.BlockSpec((1, lanes), lambda i: (0, 0))
    wts = pl.BlockSpec((C, cin), lambda i: (0, 0))
    ws = pl.BlockSpec((cin, C), lambda i: (0, 0))
    cb = pl.BlockSpec((C, 1), lambda i: (0, 0))
    ls = pl.BlockSpec((1, tn * p), lambda i: (0, i))
    ss = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dx, dst, dwt, db = pl.pallas_call(
        functools.partial(_pkbn_kd_bwd_kernel, int(ignore_index),
                          temperature, p),
        grid=(n // tn,),
        in_specs=[rows, vec, vec, wts, ws, cb, rows, vec, vec, wts, cb,
                  ls, cb, cb, ss, ss],
        out_specs=(rows, pl.BlockSpec((2, lanes), lambda i: (0, 0)),
                   wts, cb),
        out_shape=(jax.ShapeDtypeStruct((n, lanes), features.dtype),
                   jax.ShapeDtypeStruct((2, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((C, cin), jnp.float32),
                   jax.ShapeDtypeStruct((C, 1), jnp.float32)),
        interpret=common.interpret_mode(),
    )(x2, s_l.reshape(1, -1), t_l.reshape(1, -1), w2.T, w2, b[:, None],
      xt2, ts_l.reshape(1, -1), tt_l.reshape(1, -1), tw2.T, tb[:, None],
      lbl, valid, ovalid,
      jnp.full((1, 1), gce, jnp.float32), jnp.full((1, 1), gkd, jnp.float32))
    dfeat = dx.reshape(features.shape)
    dscale = dst[0].reshape(p, cin).sum(0)
    dshift = dst[1].reshape(p, cin).sum(0)
    return (dfeat, dscale, dshift, dwt.T, db[:, 0],
            jnp.zeros_like(tfeat), jnp.zeros_like(tscale),
            jnp.zeros_like(tshift), jnp.zeros_like(tw2),
            jnp.zeros_like(tb),
            np.zeros(labels.shape, jax.dtypes.float0),
            (np.zeros(valid_classes.shape, jax.dtypes.float0),
             np.zeros(old_valid.shape, jax.dtypes.float0)))


_head_ce_kd_packed_bn_total.defvjp(_head_ce_kd_packed_bn_fwd,
                                   _head_ce_kd_packed_bn_bwd)


def head_cross_entropy_kd_packed_bn(features_raw, scale, shift,
                                    head_kernel, head_bias, tfeat_raw,
                                    tscale, tshift, t_kernel, t_bias,
                                    labels, valid_classes, old_valid, *,
                                    p, temperature, ignore_index=255):
    """Fused BN·ReLU + head + CE + LwF-KD on the packed bodies' RAW
    outputs (student AND teacher, each with its own deferred
    scale/shift): returns (ce_mean, kd_mean, n).  Equals the
    bn_relu_packed → head → CE/KD composition (oracle-tested); student
    logits and teacher logits never exist in HBM."""
    w2, hb = _bn_head_args(head_kernel, head_bias, valid_classes)
    tw2, tb2 = _bn_head_args(t_kernel, t_bias, valid_classes)
    n = _n_pix(labels, ignore_index)
    ce_t, kd_t = _head_ce_kd_packed_bn_total(
        features_raw, scale, shift, w2, hb, tfeat_raw, tscale, tshift,
        tw2, tb2, labels, (valid_classes, old_valid), int(ignore_index),
        p, float(temperature))
    return ce_t / n, kd_t / n, n


def head_cross_entropy_kd_packed_bn_sharded(features_raw, scale, shift,
                                            head_kernel, head_bias,
                                            tfeat_raw, tscale, tshift,
                                            t_kernel, t_bias, labels,
                                            valid_classes, old_valid, *,
                                            p, axis, temperature,
                                            ignore_index=255):
    """Batch-sharded :func:`head_cross_entropy_kd_packed_bn` for
    jax.shard_map (BN vectors replicated — stats are psum'd)."""
    w2, hb = _bn_head_args(head_kernel, head_bias, valid_classes)
    tw2, tb2 = _bn_head_args(t_kernel, t_bias, valid_classes)
    ce_t, kd_t = _head_ce_kd_packed_bn_total(
        features_raw, scale, shift, w2, hb, tfeat_raw, tscale, tshift,
        tw2, tb2, labels, (valid_classes, old_valid), int(ignore_index),
        p, float(temperature))
    n_local = (labels != ignore_index).sum().astype(jnp.float32)
    ce_t = jax.lax.psum(ce_t, axis)
    kd_t = jax.lax.psum(kd_t, axis)
    n = jnp.maximum(jax.lax.psum(n_local, axis), 1.0)
    return ce_t / n, kd_t / n, n


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
