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
# The class-major kernel above wants [Cin, P], which costs the packed
# body an unpack relayout + transpose on BOTH sides of the step (~4 ms
# at 512², DESIGN.md §8).  This variant consumes the packed view
# [B,H,G,L] (L = p·Cin) DIRECTLY:
#
#   * the 1×1 head is a block-diagonal matmul: Wbd [L, p·Cp] with p
#     copies of W[Cin, Cp] on the diagonal (Cp = L/p ≥ C classes, padded
#     lanes masked invalid) — each lane group's p pixels get their own
#     Cp-lane logit block;
#   * softmax needs PER-PIXEL (segmented) reductions over Cp-lane
#     blocks: sums ride the MXU (z @ S, S[l,i] = [l and i in the same
#     block] — one dot is reduce AND broadcast), maxes ride it too via
#     an XOR-butterfly of lane-permutation dots (_block_max);
#   * labels enter packed [rows, p] (f32 — exact for class ids) and are
#     expanded to lanes the same way.
#
# dfeat leaves the kernel ALREADY PACKED — zero XLA ops touch the
# packed tensors on either side.


def _lane_dot(a, m, prefer=jnp.float32):
    return jax.lax.dot_general(a, m, (((1,), (0,)), ((), ())),
                               preferred_element_type=prefer)


def _block_sum(t, sblk_ref):
    """Per-cp-lane-block sum splatted back to every lane of its block —
    ONE full-width dot with the 0/1 block-membership matrix (the MXU
    performs segmented reduce+broadcast at full speed; the earlier
    slice→reduce→splat→concat form ran sub-width on the VPU and cost
    ~5 ms/step at 512², the reason packed_head_ce originally measured
    negative)."""
    return _lane_dot(t, sblk_ref[...])


def _block_max(t, pxor_ref, cp):
    """Per-cp-lane-block max splatted to every lane: XOR-butterfly of
    lane-permutation dots in bf16. Any m' works for the logsumexp
    identity logz = m' + log Σ exp(z − m') — bf16 rounding of the max
    estimate only perturbs intermediate rounding, not the result — so
    the permutation dots run at full bf16 MXU rate and stay exact
    (single nonzero term per output lane)."""
    mb = t.astype(jnp.bfloat16)
    for k in range(pxor_ref.shape[0]):
        # f32 accumulate (Mosaic requires 32-bit acc) then back to bf16
        # — exact: one nonzero term per output lane.
        mb = jnp.maximum(mb, _lane_dot(mb, pxor_ref[k])
                         .astype(jnp.bfloat16))
    return mb.astype(jnp.float32)


def _head_routing_mats(lanes, cp):
    """(sblk [L,L] f32, pxor [log2(cp),L,L] bf16) lane-routing constants
    (see _block_sum/_block_max)."""
    i = np.arange(lanes)
    sblk = (i[:, None] // cp == i[None, :] // cp).astype(np.float32)
    stages = []
    s = cp // 2
    while s >= 1:
        stages.append((i[:, None] == (i[None, :] ^ s)).astype(np.float32))
        s //= 2
    return (jnp.asarray(sblk, jnp.float32),
            jnp.asarray(np.stack(stages), jnp.bfloat16))


def _lbl_lanes(lbl_ref, cp, ignore_index):
    """Pre-expanded label block [rows, p·cp] (uint8, one label byte per
    LANE — see _pk_prep) → per-lane label + pixel mask."""
    li = lbl_ref[...].astype(jnp.int32)
    pix_l = (li != ignore_index).astype(jnp.float32)
    return jnp.where(li != ignore_index, li, 0), pix_l


def _packed_softmax_parts(x_ref, wbd_ref, bl_ref, vl_ref, lbl_ref,
                          sblk_ref, pxor_ref, ignore_index, p, cp):
    """Shared fwd/bwd tile math, all full-width [rows, L] f32: returns
    (zm, m_l, logs_l, e, pix_l, onehot)."""
    z = jax.lax.dot_general(
        x_ref[...], wbd_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bl_ref[0]
    zm = jnp.where(vl_ref[0] > 0, z, NEG_INF)
    m_l = _block_max(zm, pxor_ref, cp)
    e = jnp.exp(zm - m_l)
    logs_l = jnp.log(_block_sum(e, sblk_ref))
    lbl_l, pix_l = _lbl_lanes(lbl_ref, cp, ignore_index)
    cls_iota = jax.lax.broadcasted_iota(jnp.int32, zm.shape, 1) % cp
    onehot = (cls_iota == lbl_l)
    return zm, m_l, logs_l, e, pix_l, onehot


def _pk_fwd_kernel(ignore_index, p, cp, x_ref, wbd_ref, bl_ref, vl_ref,
                   lbl_ref, sblk_ref, pxor_ref, out_ref, acc):
    """Per-tile totals accumulate via MXU colsum into a lane vector; the
    single lane→scalar fold happens once at the last grid step.  The
    logz term is replicated cp× per pixel, hence the exact 1/cp scale
    (cp is a power of two)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    zm, m_l, logs_l, _, pix_l, onehot = _packed_softmax_parts(
        x_ref, wbd_ref, bl_ref, vl_ref, lbl_ref, sblk_ref, pxor_ref,
        ignore_index, p, cp)
    logz_l = m_l + logs_l
    contrib = (logz_l * (1.0 / cp) - jnp.where(onehot, zm, 0.0)) * pix_l
    acc[0:1] += common.colsum(contrib)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[0, 0] = jnp.sum(acc[0:1], axis=-1)[0]


def _pk_bwd_kernel(ignore_index, p, cp, x_ref, wbd_ref, wbdt_ref, bl_ref,
                   vl_ref, lbl_ref, sblk_ref, pxor_ref, scale_ref,
                   dx_ref, dw_ref, db_ref, dwacc, dbacc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dwacc[:] = jnp.zeros_like(dwacc)
        dbacc[:] = jnp.zeros_like(dbacc)

    zm, m_l, _, e, pix_l, onehot = _packed_softmax_parts(
        x_ref, wbd_ref, bl_ref, vl_ref, lbl_ref, sblk_ref, pxor_ref,
        ignore_index, p, cp)
    pvec = e / _block_sum(e, sblk_ref)
    g = scale_ref[0, 0] * pix_l * (pvec - onehot.astype(jnp.float32))
    g = jnp.where(vl_ref[0] > 0, g, 0.0)              # [rows, p·cp] f32
    gc = g.astype(x_ref.dtype)
    dx_ref[...] = jax.lax.dot_general(
        gc, wbdt_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)
    # ONE full-occupancy [L, L] contraction; the p diagonal (class-block,
    # cin-block) tiles are extracted outside the kernel (tiny).
    dwacc[:] += jax.lax.dot_general(
        gc, x_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbacc[:] += common.colsum(g)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = dwacc[:]
        db_ref[:] = dbacc[:]


def _bd_mats(w2, b, valid_classes, p, cp, cin, dtype):
    """Block-diagonal weights [p·cin, p·cp] (+ transpose), tiled bias and
    validity lane vectors."""
    C = valid_classes.shape[0]
    wp = jnp.pad(w2, ((0, 0), (0, cp - C)))           # [cin, cp]
    eye = jnp.eye(p, dtype=w2.dtype)
    wbd = jnp.einsum("ij,cd->icjd", eye, wp).reshape(p * cin, p * cp)
    wbdt = jnp.einsum("ij,cd->icjd", eye,
                      wp.T).reshape(p * cp, p * cin)
    bl = jnp.tile(jnp.pad(b, (0, cp - C)), p)[None, :]  # [1, p·cp] f32
    vl = jnp.tile(jnp.pad(valid_classes.astype(jnp.float32),
                          (0, cp - C)), p)[None, :]
    return wbd.astype(dtype), wbdt.astype(dtype), bl, vl


def _pk_prep(features, labels, p):
    b_, h, g, lanes = features.shape
    cp = lanes // p
    x2 = features.reshape(-1, lanes)                  # [rows, L] free
    # labels [B,H,W] → one uint8 label byte per FEATURE LANE (each
    # pixel's label repeated over its cp class lanes): a full-lane-width
    # block layout — a [rows, p] array would be lane-padded 128/p× in
    # the tiled HBM layout, multiplying both its footprint and the
    # kernel's DMA bytes.
    lblq = labels.reshape(b_, h, g, p, 1).astype(jnp.uint8)
    lbl_l = jnp.broadcast_to(lblq, (b_, h, g, p, cp))
    return x2, lbl_l.reshape(-1, p * cp)


def _pick_rows(n: int, target: int = 2048) -> int:
    tn = min(n, target)
    while tn >= 8:
        if n % tn == 0:
            return tn
        tn -= 8
    return n


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _head_ce_packed_total(features, w2, b, labels, valid_classes,
                          ignore_index, p):
    """UNNORMALIZED Σ NLL on the packed feature view [B,H,G,p·Cin]."""
    return _head_ce_packed_fwd(features, w2, b, labels, valid_classes,
                               ignore_index, p)[0]


def _head_ce_packed_fwd(features, w2, b, labels, valid_classes,
                        ignore_index, p):
    lanes = features.shape[-1]
    cin = lanes // p
    cp = lanes // p if lanes // p >= valid_classes.shape[0] else None
    assert cp is not None, "packed head needs classes <= lanes/p"
    wbd, wbdt, bl, vl = _bd_mats(w2, b, valid_classes, p, cp, cin,
                                 features.dtype)
    sblk, pxor = _head_routing_mats(lanes, cp)
    x2, lblp = _pk_prep(features, labels, p)
    n, _ = x2.shape
    tn = _pick_rows(n)
    total = pl.pallas_call(
        functools.partial(_pk_fwd_kernel, int(ignore_index), p, cp),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((lanes, p * cp), lambda i: (0, 0)),
            pl.BlockSpec((1, p * cp), lambda i: (0, 0)),
            pl.BlockSpec((1, p * cp), lambda i: (0, 0)),
            pl.BlockSpec((tn, p * cp), lambda i: (i, 0)),
            pl.BlockSpec((lanes, lanes), lambda i: (0, 0)),
            pl.BlockSpec(pxor.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, p * cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=common.interpret_mode(),
    )(x2, wbd, bl, vl, lblp, sblk, pxor)[0, 0]
    return total, (features, w2, b, labels, valid_classes)


def _head_ce_packed_bwd(ignore_index, p, res, gcot):
    features, w2, b, labels, valid_classes = res
    lanes = features.shape[-1]
    cin = lanes // p
    cp = lanes // p
    C = valid_classes.shape[0]
    wbd, wbdt, bl, vl = _bd_mats(w2, b, valid_classes, p, cp, cin,
                                 features.dtype)
    sblk, pxor = _head_routing_mats(lanes, cp)
    x2, lblp = _pk_prep(features, labels, p)
    n, _ = x2.shape
    tn = _pick_rows(n)
    scale = jnp.full((1, 1), gcot, jnp.float32)
    dx, dwp, dbl = pl.pallas_call(
        functools.partial(_pk_bwd_kernel, int(ignore_index), p, cp),
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((lanes, p * cp), lambda i: (0, 0)),
            pl.BlockSpec((p * cp, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, p * cp), lambda i: (0, 0)),
            pl.BlockSpec((1, p * cp), lambda i: (0, 0)),
            pl.BlockSpec((tn, p * cp), lambda i: (i, 0)),
            pl.BlockSpec((lanes, lanes), lambda i: (0, 0)),
            pl.BlockSpec(pxor.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
                   pl.BlockSpec((p * cp, lanes), lambda i: (0, 0)),
                   pl.BlockSpec((1, p * cp), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n, lanes), features.dtype),
                   jax.ShapeDtypeStruct((p * cp, lanes), jnp.float32),
                   jax.ShapeDtypeStruct((1, p * cp), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((p * cp, lanes), jnp.float32),
                        pltpu.VMEM((1, p * cp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=common.interpret_mode(),
    )(x2, wbd, wbdt, bl, vl, lblp, sblk, pxor, scale)
    dfeat = dx.reshape(features.shape)
    # the p diagonal (class-block, cin-block) tiles of the full [L, L]
    # contraction are this head's dW (summed over pixel slots)
    dwb = sum(dwp[u * cp:(u + 1) * cp, u * cin:(u + 1) * cin]
              for u in range(p))
    dw = dwb[:C, :].T                                  # [cin, C]
    db = dbl[0].reshape(p, cp).sum(0)[:C]
    return (dfeat, dw, db,
            np.zeros(labels.shape, jax.dtypes.float0),
            np.zeros(valid_classes.shape, jax.dtypes.float0))


_head_ce_packed_total.defvjp(_head_ce_packed_fwd, _head_ce_packed_bwd)


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
