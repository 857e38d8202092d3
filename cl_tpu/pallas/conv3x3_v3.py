"""Lane-packed 3×3 SAME conv, generation 3: ZERO XLA-side preparation.

Gen 2 (`conv3x3.py`) beat XLA's emitter on kernel device time (0.84 ms vs
1.79 ms for the 512²×32→32 forward) but lost in-step because its halo
came from an XLA `pad` of the flat rows — measured ~2.2 ms/call at 512²
(a 134 MB lane-shift relayout; `benchmarks/probe_reduce_dw.py` and
DESIGN.md §8).  This generation removes ALL host-graph preparation:

* The input is consumed as ``x.reshape(b, h, wg, lanes)`` — a FREE
  reshape (row-major order and the minor 128-lane dim are unchanged).
* The row halo comes from the DMA itself: each grid tile copies image
  rows ``[jh·th−1, jh·th+th+1)``; the first/last tiles use statically
  predicated shorter copies and zero the missing halo row in VMEM.
* The column halo comes from ±1 BLOCK-ROW SHIFTS of the flat VMEM view:
  group g's union window is [last c_in lanes of group g−1 | group g |
  first c_in lanes of group g+1], i.e. flat rows r−1 / r / r+1 with
  lane sub-ranges.  The left/right image borders (g = 0 / wg−1) read a
  neighbouring row's data there, so those rows are zero-masked with an
  iota mask before the dot — the SAME-padding zeros, made in-register.

The contraction is split per (kernel row u, piece A/B/C) against the
matching row block of the packed weights W' (`conv3x3.pack_weights`,
window offset −c_in, identical layout), so each dot is a plain
[th·wg, K] @ [K, p·c_out] MXU matmul with K ∈ {c_in, lanes, c_in}.

All three passes use the same tile loader:
  * forward:  y += A@W'_A + B@W'_B + C@W'_C
  * dx:       forward kernel on dy with the flipped/transposed kernel
  * dW:       pieceᵀ @ dy accumulated into a [3k, p·c_out] f32 VMEM
              accumulator across the sequential grid, written once.

Capability parity: `nn.Conv(features, (3,3), padding="SAME",
use_bias=False)` — the reference UNet's conv (SURVEY.md §2.1 "UNet",
§3.2).  Interpret mode runs on CPU for the unit/parity suites.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common
from cl_tpu.pallas.conv3x3 import pick_pack, pack_weights, _fold_dw

import os as _os

# Self-imposed scoped-VMEM budget for conv tile sizing (_pick_th).
# r3 sweep on the 512² headline: 12 MB (r2 default) 188.1 img/s,
# 16 MB 190.7 (+1.3%, two samples; methods step 127.6 → 130.1),
# 24 MB fails compile (upconv scoped-vmem stack overflows its 16 MB
# Mosaic limit once conv tiles grow past it).  r5 re-sweep on the
# current compile generation: 14 MB 190.1, 16 MB 191.3, 20 MB 192.2
# (two tight samples each) — 20 MB adopted; the tight 8+1 baseline_5
# compile re-verified at this budget.
# r5d: the >20 MB compile failure was the budget acting as a PACKING-
# EXTENT knob — `supported()` gates on _pick_th(_VMEM_BUDGET), so a
# larger budget newly admits the deepest level into the packed domain,
# whose upconv weight block ([2, 2048, 2048] bf16 ≈ 16.8 MB) then
# overflowed upconv's DEFAULT Mosaic stack.  With upconv's ceiling
# raised (common.vmem_cparams) 22 MB compiles — and measures 168.6
# img/s: the deepest level loses to XLA's emitter at big tiles, as
# the `profitable()` routing always said.  20 MB remains the knee for
# the RIGHT reason now (geometry, not a crash).
_VMEM_BUDGET = int(_os.environ.get(
    "CL_TPU_CONV_BUDGET", 20 * 1024 * 1024))  # Mosaic scoped-VMEM stack
# Raised scoped-VMEM ceiling passed to Mosaic (CompilerParams.
# vmem_limit_bytes; v5e has 128 MB VMEM/core); None = the 16 MB default.
# The single-pass fused backward kernel needs it — its budget below.
_VMEM_LIMIT: int | None = 100 * 1024 * 1024
_VMEM_BUDGET_FUSED = int(_os.environ.get(
    "CL_TPU_BWDF_BUDGET", 64 * 1024 * 1024))
# Route conv_bn_fused's backward through the one-pass dx+dW kernel.
# MEASURED NET-NEGATIVE at 512²/b8 bf16 (43.4 → 44.2 ms/step; tile
# budget swept 14/24/64 MB → 44.7/43.9/44.2) — the ~268 MB/conv of
# saved (dy, y) re-reads don't pay for the longer per-tile critical
# path (dx dots → epilogue → prologue → dW dots) and tripled VMEM
# footprint.  Kept as a tested opt-in (DESIGN.md §8).
_FUSE_BWD = _os.environ.get("CL_TPU_FUSE_BWD", "0") == "1"
_ROW_TARGET = int(_os.environ.get("CL_TPU_ROW_TARGET", 8192))
# Cross-tile software pipeline in the dx backward kernels (r5): the
# grid gains one drain step; at step i the kernel issues tile i-1's
# window DOTS (MXU) first and only then forms tile i's dy_eff (VPU), so
# the vector work of each tile would overlap the matrix work of the
# previous one instead of serializing wait→VPU→dots per tile (the r4
# hypothesis — DESIGN.md §8 round 4b).  MEASURED NEGATIVE (r5):
# per-call at the enc0 shape 0.708 → 1.018 ms (same th=16; a raised
# VMEM budget doesn't recover it) and −1.6% headline — because the
# baseline kernel ALREADY streams at ~758 GB/s effective (ABOVE the
# 635 GB/s copy-micro ceiling; its four HBM streams overlap), so there
# was no serialization gap to hide, and the restructure's predicated
# phases cost more than they overlap.  Kept as a tested opt-in
# (bit-identical: benchmarks/dx_pipe_micro.py, DESIGN.md §8 round 5).
_DX_PIPE = _os.environ.get("CL_TPU_DX_PIPE", "0") == "1"
# Dot schedule (MFU push, r3): 1 (default) = the three center window
# pieces lane-concatenated in-register and contracted in ONE
# [rows, 3·lanes]@[3·lanes, out] dot — Mosaic issues back-to-back
# same-shape dots without pipelining them (DESIGN.md §8 gen-2 head
# lesson), so fewer/wider dots win: measured 186.2 → 188.2 img/s
# (+1.1%, 3 bench samples each, tight) on the 512² headline. 0 = one
# dot per piece (5 dots, the r2 schedule). 2 = all five pieces in a
# single [rows, 3k] dot — Mosaic-rejected ("result/input offset
# mismatch on non-concat dimension"): mixed-width concat unsupported.
_CAT_DOTS = int(_os.environ.get("CL_TPU_CAT_DOTS", "1"))
if _CAT_DOTS not in (0, 1):
    raise ValueError(
        f"CL_TPU_CAT_DOTS={_CAT_DOTS} unsupported: 2 (all five pieces in "
        "one mixed-width dot) is rejected by Mosaic ('result/input offset "
        "mismatch on non-concat dimension' — mixed-width lane concat is "
        "unsupported); use 0 (five dots) or 1 (merged center dots, default)")


def _cparams():
    if _VMEM_LIMIT is None:
        return {}
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)}


# ---------------------------------------------------------------------------
# int8 saved-activation storage (r4) — quantization primitives
# ---------------------------------------------------------------------------

_QMAX = 127.0


def q_supported(wg: int) -> bool:
    """int8 VMEM tiling on v5e is (32, 128): the packed view's sublane
    dim ``wg`` must be a multiple of 32 for the kernels' flat
    (th+4, wg, L) → ((th+4)·wg, L) collapse to stay layout-free on the
    int8 scratch.  At 512² every packed level qualifies (wg 128/64/32);
    at 256² the last level (wg 16) falls back to compute-dtype
    residuals.  Interpret mode (CPU tests) has no tiling constraint."""
    return wg % 32 == 0 or common.interpret_mode()


def _quant_rows(yf3):
    """Symmetric per-(image-row, lane) int8 quantization of a
    (th, wg, L) f32 tile: returns (q int8 (th, wg, L), dequant scale
    f32 (th, 1, L)).  Row granularity (not per-tile) so backward
    kernels with a DIFFERENT tile height can slice/DMA scales with the
    same row ranges as the data."""
    m = jnp.max(jnp.abs(yf3), axis=1, keepdims=True)
    inv = jnp.where(m > 0, _QMAX / m, 0.0)
    q = jnp.clip(jnp.rint(yf3 * inv), -_QMAX, _QMAX).astype(jnp.int8)
    return q, m * (1.0 / _QMAX)


def _vmem_estimate(th, wg, lanes, k, p, c_out, itemsize) -> int:
    """Generous scoped-VMEM accounting for one grid step: double-buffered
    input scratch + double-buffered packed-weight block + output block +
    the three masked piece copies + the f32 accumulator."""
    rows = th * wg
    return (2 * (th + 4) * wg * lanes * itemsize      # input scratch
            + 2 * 3 * k * p * c_out * itemsize        # W' block
            + 2 * th * wg * p * c_out * itemsize      # out block
            + 3 * rows * lanes * itemsize             # pieces
            + rows * p * c_out * 4)                   # f32 acc


def _pick_th(h: int, wg: int, lanes: int, itemsize: int,
             k: int = 0, p: int = 1, c_out: int = 0) -> int:
    """Rows per grid tile: a divisor of h (multiple of 8, or h itself for
    small images), targeting ~8192 dot rows (fewer grid steps — measured
    −0.6 ms/step at 512²/b8 vs the original 2048), shrunk until the scoped-VMEM
    estimate fits.  Returns 0 if nothing fits."""
    if h <= 16:
        th = h
        if _vmem_estimate(th, wg, lanes, k, p, c_out, itemsize) \
                <= _VMEM_BUDGET:
            return th
        return 0
    th = min(h, max(8, (_ROW_TARGET // max(1, wg)) // 8 * 8))
    while th >= 8:
        if h % th == 0 and _vmem_estimate(
                th, wg, lanes, k, p, c_out, itemsize) <= _VMEM_BUDGET:
            return th
        th -= 8
    return 0


def supported(h: int, w: int, c_in: int, c_out: int,
              itemsize: int = 2, p: int | None = None) -> bool:
    p = p or pick_pack(c_in, c_out)
    lanes = p * c_in
    k = (p + 2) * c_in
    if lanes % 128 or w % p:
        return False
    wg = w // p
    # wg must be a power of two (boundary masks use `& (wg-1)`) and a
    # multiple of 8 (free flat-view reshape), and c_in sublane-aligned.
    if wg < 8 or wg & (wg - 1) or c_in % 8 or c_in < 8 or h < 2:
        return False
    if h > 16 and h % 8:
        return False
    return _pick_th(h, wg, lanes, itemsize, k, p, c_out) > 0


def profitable(h: int, w: int, c_in: int, c_out: int) -> bool:
    """Measured-win shapes for ``model.conv_impl="auto"`` routing: the
    lane-starved large-spatial levels (chain A/B, DESIGN.md §8 — 1.9x at
    512²×32ch, 1.35x at 256²×64ch; deeper levels run at big tiles on
    XLA's emitter and tie or lose)."""
    return supported(h, w, c_in, c_out) and h * w >= 256 * 256


def _geometry(h, wid, c_in, c_out, itemsize, p=None):
    p = p or pick_pack(c_in, c_out)
    wg = wid // p
    lanes = p * c_in
    k = (p + 2) * c_in
    th = _pick_th(h, wg, lanes, itemsize, k, p, c_out)
    assert th > 0, "caller must gate on supported()"
    nh = h // th
    return p, wg, th, nh, lanes, k


def _start_dma(xp_ref, scratch, sems, slot, idx, *, nh, th):
    """Start the row-halo DMA for grid step ``idx`` into ``slot``.

    v[1+i] = image row jh·th−1+i.  Interior tiles copy th+2 rows; the
    first/last tiles copy one fewer (the missing halo row is zeroed at
    compute time)."""
    ib = idx // nh
    jh = idx % nh
    if nh == 1:
        pltpu.make_async_copy(
            xp_ref.at[ib, pl.ds(0, th)],
            scratch.at[slot, pl.ds(2, th)], sems.at[slot]).start()
        return

    @pl.when(jh == 0)
    def _():
        pltpu.make_async_copy(
            xp_ref.at[ib, pl.ds(0, th + 1)],
            scratch.at[slot, pl.ds(2, th + 1)], sems.at[slot]).start()

    @pl.when(jnp.logical_and(jh > 0, jh < nh - 1))
    def _():
        pltpu.make_async_copy(
            xp_ref.at[ib, pl.ds(jh * th - 1, th + 2)],
            scratch.at[slot, pl.ds(1, th + 2)], sems.at[slot]).start()

    @pl.when(jh == nh - 1)
    def _():
        pltpu.make_async_copy(
            xp_ref.at[ib, pl.ds(jh * th - 1, th + 1)],
            scratch.at[slot, pl.ds(1, th + 1)], sems.at[slot]).start()


def _wait_dma(xp_ref, scratch, sems, *, nh, th):
    """Double-buffer bookkeeping; returns the ready slot after zeroing
    any missing halo rows of this tile."""
    idx = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(idx == 0)
    def _():
        _start_dma(xp_ref, scratch, sems, 0, 0, nh=nh, th=th)

    @pl.when(idx + 1 < n)
    def _():
        _start_dma(xp_ref, scratch, sems, (idx + 1) % 2, idx + 1,
                   nh=nh, th=th)

    slot = idx % 2
    jh = idx % nh
    # The wait must mirror the copy shape the start used, so it is
    # predicated identically (the semaphore is shared per slot).
    _wait_variant(xp_ref, scratch, sems, slot, idx, nh=nh, th=th)

    @pl.when(jh == 0)
    def _():
        scratch[slot, 1] = jnp.zeros_like(scratch[slot, 1])

    @pl.when(jh == nh - 1)
    def _():
        scratch[slot, th + 2] = jnp.zeros_like(scratch[slot, th + 2])
    return slot


def _wait_variant(xp_ref, scratch, sems, slot, idx, *, nh, th):
    """Wait for the slot's DMA.  The wait must match the copy shape the
    start used, so it is predicated the same way."""
    ib = idx // nh
    jh = idx % nh
    if nh == 1:
        pltpu.make_async_copy(
            xp_ref.at[ib, pl.ds(0, th)],
            scratch.at[slot, pl.ds(2, th)], sems.at[slot]).wait()
        return

    @pl.when(jh == 0)
    def _():
        pltpu.make_async_copy(
            xp_ref.at[ib, pl.ds(0, th + 1)],
            scratch.at[slot, pl.ds(2, th + 1)], sems.at[slot]).wait()

    @pl.when(jnp.logical_and(jh > 0, jh < nh - 1))
    def _():
        pltpu.make_async_copy(
            xp_ref.at[ib, pl.ds(jh * th - 1, th + 2)],
            scratch.at[slot, pl.ds(1, th + 2)], sems.at[slot]).wait()

    @pl.when(jh == nh - 1)
    def _():
        pltpu.make_async_copy(
            xp_ref.at[ib, pl.ds(jh * th - 1, th + 1)],
            scratch.at[slot, pl.ds(1, th + 1)], sems.at[slot]).wait()


def _use_comb(c_in: int) -> bool:
    """Combine the A/C halo pieces ACROSS the three kernel rows into one
    [rows, 3·c_in] operand each: the per-(u, piece) halo dots contract
    over K = c_in (≤64 on the packed levels) and waste ≥half the MXU's
    128-deep systolic array; combined they run K = 3·c_in in 1–2 passes
    instead of 3 — 9 MXU passes per tile become 5 at c_in = 32.  At
    c_in ≥ 128 the per-u dots are already full-depth, so combining only
    adds concat traffic."""
    return c_in < 128


def _comb_perm(c_in: int, lanes: int):
    """Row permutation taking `pack_weights` layout [(u, piece-major)]
    to the combined layout [A0|A1|A2 | B0|B1|B2 | C0|C1|C2]."""
    k = 2 * c_in + lanes
    idx = []
    for u in range(3):
        idx += list(range(u * k, u * k + c_in))
    for u in range(3):
        idx += list(range(u * k + c_in, u * k + c_in + lanes))
    for u in range(3):
        idx += list(range(u * k + c_in + lanes, (u + 1) * k))
    return np.asarray(idx, np.int32)


def _pack_weights_v3(w: jax.Array, p: int) -> jax.Array:
    """`pack_weights` + the combined-layout row permutation (identity
    layout when the combine path is off for this c_in)."""
    c_in = w.shape[2]
    wp = pack_weights(w, p)
    if not _use_comb(c_in):
        return wp
    return jnp.take(wp, _comb_perm(c_in, p * c_in), axis=0)


def _unperm_dw(dwp: jax.Array, c_in: int, lanes: int) -> jax.Array:
    """Combined-layout dW accumulator → `pack_weights` row order (the
    layout `_fold_dw` expects)."""
    if not _use_comb(c_in):
        return dwp
    perm = _comb_perm(c_in, lanes)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return jnp.take(dwp, inv, axis=0)


def _cat_pieces(vflat, *, th, wg, lanes, c_in, dtype):
    """Combined window pieces: A_cat/C_cat [rows, 3·c_in] (kernel rows
    u = 0,1,2 lane-concatenated, image borders zero-masked once — the
    mask depends only on the output row, identical per u) and the three
    center views B_u [rows, lanes]."""
    rows = th * wg
    vas, vbs, vcs = [], [], []
    for u in range(3):
        base = (u + 1) * wg
        vas.append(vflat[base - 1:base - 1 + rows, lanes - c_in:])
        vbs.append(vflat[base:base + rows])
        vcs.append(vflat[base + 1:base + 1 + rows, :c_in])
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    zero = jnp.zeros((), dtype)
    pa = jnp.where((rid & (wg - 1)) != 0,
                   jnp.concatenate(vas, axis=-1), zero)
    pc = jnp.where((rid & (wg - 1)) != (wg - 1),
                   jnp.concatenate(vcs, axis=-1), zero)
    return pa, vbs, pc


def _conv_dots(vflat, w_ref, *, th, wg, lanes, k, c_in, dtype):
    """f32 accumulator [rows, out_lanes] of the window contraction
    against the packed weights (combined layout when `_use_comb`)."""

    def dot(patch, lo, hi):
        return jax.lax.dot_general(
            patch, w_ref[lo:hi, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if not _use_comb(c_in):
        acc = None
        for u in range(3):
            pa, pb, pc = _pieces(vflat, u, th=th, wg=wg, lanes=lanes,
                                 c_in=c_in, dtype=dtype)
            r0 = u * k
            for patch, lo, hi in ((pa, r0, r0 + c_in),
                                  (pb, r0 + c_in, r0 + c_in + lanes),
                                  (pc, r0 + c_in + lanes, r0 + k)):
                d = dot(patch, lo, hi)
                acc = d if acc is None else acc + d
        return acc
    pa, vbs, pc = _cat_pieces(vflat, th=th, wg=wg, lanes=lanes,
                              c_in=c_in, dtype=dtype)
    c3 = 3 * c_in
    if _CAT_DOTS == 2:
        xall = jnp.concatenate([pa] + vbs + [pc], axis=-1)
        return dot(xall, 0, 3 * k)
    if _CAT_DOTS == 1:
        xb = jnp.concatenate(vbs, axis=-1)
        return (dot(pa, 0, c3) + dot(xb, c3, c3 + 3 * lanes)
                + dot(pc, 3 * k - c3, 3 * k))
    acc = dot(pa, 0, c3)
    for u in range(3):
        acc = acc + dot(vbs[u], c3 + u * lanes, c3 + (u + 1) * lanes)
    return acc + dot(pc, 3 * k - c3, 3 * k)


def _dw_accum(vflat, dy2, acc, *, th, wg, lanes, k, c_in, dtype):
    """acc[3k, out_lanes] += pieceᵀ @ dy2 for every window piece (acc in
    the combined layout when `_use_comb`; `_unperm_dw` restores the
    `_fold_dw` order outside the kernel)."""

    def dotT(patch):
        return jax.lax.dot_general(
            patch, dy2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    if not _use_comb(c_in):
        for u in range(3):
            pa, pb, pc = _pieces(vflat, u, th=th, wg=wg, lanes=lanes,
                                 c_in=c_in, dtype=dtype)
            r0 = u * k
            for patch, lo, hi in ((pa, r0, r0 + c_in),
                                  (pb, r0 + c_in, r0 + c_in + lanes),
                                  (pc, r0 + c_in + lanes, r0 + k)):
                acc[lo:hi] += dotT(patch)
        return
    pa, vbs, pc = _cat_pieces(vflat, th=th, wg=wg, lanes=lanes,
                              c_in=c_in, dtype=dtype)
    c3 = 3 * c_in
    if _CAT_DOTS == 2:
        xall = jnp.concatenate([pa] + vbs + [pc], axis=-1)
        acc[0:3 * k] += dotT(xall)
        return
    if _CAT_DOTS == 1:
        xb = jnp.concatenate(vbs, axis=-1)
        acc[0:c3] += dotT(pa)
        acc[c3:c3 + 3 * lanes] += dotT(xb)
        acc[3 * k - c3:3 * k] += dotT(pc)
        return
    acc[0:c3] += dotT(pa)
    for u in range(3):
        acc[c3 + u * lanes:c3 + (u + 1) * lanes] += dotT(vbs[u])
    acc[3 * k - c3:3 * k] += dotT(pc)


def _pieces(vflat, u, *, th, wg, lanes, c_in, dtype):
    """The three block-aligned window pieces for kernel row ``u``:
    A (left halo, c_in lanes), B (center, `lanes`), C (right halo).
    Image-border rows of A/C are zero-masked in-register."""
    base = (u + 1) * wg
    rows = th * wg
    pb = vflat[base:base + rows]
    va = vflat[base - 1:base - 1 + rows, lanes - c_in:]
    vc = vflat[base + 1:base + 1 + rows, :c_in]
    # Border masks vary only along rows — keep them [rows, 1] and let
    # `where` broadcast across lanes (a full-width int32 iota is 4 MB of
    # scoped VMEM at deep-decoder shapes).
    rid = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    ga = (rid & (wg - 1)) != 0
    gc = (rid & (wg - 1)) != (wg - 1)
    zero = jnp.zeros((), dtype)
    pa = jnp.where(ga, va, zero)
    pc = jnp.where(gc, vc, zero)
    return pa, pb, pc


def _fwd_kernel(xp_ref, w_ref, y_ref, scratch, sems, *, nh, th, wg,
                lanes, k, c_in):
    slot = _wait_dma(xp_ref, scratch, sems, nh=nh, th=th)
    vflat = scratch[slot].reshape((th + 4) * wg, lanes)
    acc = _conv_dots(vflat, w_ref, th=th, wg=wg, lanes=lanes, k=k,
                     c_in=c_in, dtype=xp_ref.dtype)
    y_ref[0] = acc.reshape(th, wg, y_ref.shape[-1]).astype(y_ref.dtype)


def _dw_kernel(xp_ref, dy_ref, dw_ref, scratch, sems, acc, *, nh, th, wg,
               lanes, k, c_in):
    slot = _wait_dma(xp_ref, scratch, sems, nh=nh, th=th)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    vflat = scratch[slot].reshape((th + 4) * wg, lanes)
    dy2 = dy_ref[0].reshape(th * wg, dy_ref.shape[-1])
    _dw_accum(vflat, dy2, acc, th=th, wg=wg, lanes=lanes, k=k,
              c_in=c_in, dtype=xp_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = acc[:]


def _fwd_packed(xp: jax.Array, w: jax.Array,
                p_force: int | None = None) -> jax.Array:
    """Packed-view forward: xp [b, h, wg, lanes] → y [b, h, wg, p·c_out]
    (both the kernel's native lane-packed views; see conv3x3_packed)."""
    b, h, wg_in, lanes_in = xp.shape
    c_in = w.shape[2]
    c_out = w.shape[-1]
    wid = wg_in * lanes_in // c_in
    p, wg, th, nh, lanes, k = _geometry(h, wid, c_in, c_out,
                                        xp.dtype.itemsize, p_force)
    assert (wg_in, lanes_in) == (wg, lanes), \
        f"packed view mismatch: got {(wg_in, lanes_in)} want {(wg, lanes)}"
    wp = _pack_weights_v3(w, p)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, nh=nh, th=th, wg=wg, lanes=lanes,
                          k=k, c_in=c_in),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * k, p * c_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wg, p * c_out),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, th, wg, p * c_out),
                                       xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wg, lanes), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=common.interpret_mode(),
        **_cparams(),
    )(xp, wp)
    return y.reshape(b, h, wg, p * c_out)


def _conv_fwd_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    b, h, wid, c_in = x.shape
    c_out = w.shape[-1]
    p, wg, _, _, lanes, _ = _geometry(h, wid, c_in, c_out,
                                      x.dtype.itemsize)
    y = _fwd_packed(x.reshape(b, h, wg, lanes), w)
    return y.reshape(b, h, wid, c_out)


def _dw_packed(xp: jax.Array, dyp4: jax.Array, c_in: int,
               p_force: int | None = None) -> jax.Array:
    """Packed-view dW: xp [b,h,wg,lanes], dyp4 [b,h,wg,p·c_out] →
    dW [3,3,c_in,c_out] (f32)."""
    b, h, wg_in, lanes_in = xp.shape
    wid = wg_in * lanes_in // c_in
    c_out = dyp4.shape[-1] // (lanes_in // c_in)   # lanes/c_in == p
    p, wg, th, nh, lanes, k = _geometry(h, wid, c_in, c_out,
                                        xp.dtype.itemsize, p_force)
    assert (wg_in, lanes_in) == (wg, lanes)
    dyp = dyp4.reshape(b * nh, th, wg, p * c_out)
    dwp = pl.pallas_call(
        functools.partial(_dw_kernel, nh=nh, th=th, wg=wg, lanes=lanes,
                          k=k, c_in=c_in),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, wg, p * c_out), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3 * k, p * c_out), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * k, p * c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wg, lanes), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((3 * k, p * c_out), jnp.float32),
        ],
        interpret=common.interpret_mode(),
        **_cparams(),
    )(xp, dyp)
    return _fold_dw(_unperm_dw(dwp, c_in, lanes), p, c_in, c_out)


def _conv_dw_impl(x: jax.Array, dy: jax.Array) -> jax.Array:
    b, h, wid, c_in = x.shape
    c_out = dy.shape[-1]
    p, wg, _, _, lanes, _ = _geometry(h, wid, c_in, c_out,
                                      x.dtype.itemsize)
    return _dw_packed(x.reshape(b, h, wg, lanes),
                      dy.reshape(b, h, wg, p * c_out), c_in)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_packed(xp: jax.Array, w: jax.Array,
                   p: int | None = None) -> jax.Array:
    """Packed-domain conv: xp [b,h,wg,p·c_in] → [b,h,wg,p·c_out], both
    the kernel-native lane-packed views (free reshapes of NHWC).  Lets a
    whole UNet level run packed — conv, BN stats (packed column reduce +
    p-fold), ReLU — with NO layout round-trips between ops.  ``p``
    overrides the natural pack factor so a whole level can run at one
    uniform view (e.g. enc1's 32→64 conv packs at 4, forcing its 64→64
    sibling from 2 to 4)."""
    return _fwd_packed(xp, w, p)


def _cp_fwd(xp, w, p=None):
    return _fwd_packed(xp, w, p), (xp, w)


def _cp_bwd(p, res, dyp):
    xp, w = res
    dyp = dyp.astype(xp.dtype)
    c_in = w.shape[2]
    # dx: forward kernel on the packed dy with the flipped/transposed
    # kernel.  dy's packed view [*, p·c_out] must equal the dx conv's
    # native input view [*, p'·c_out]; p' == p for every UNet shape
    # (asserted inside _fwd_packed; forced p propagates).
    w_dx = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    dxp = _fwd_packed(dyp, w_dx, p)
    dw = _dw_packed(xp, dyp, c_in, p).astype(w.dtype)
    return dxp, dw


conv3x3_packed.defvjp(_cp_fwd, _cp_bwd)


@jax.custom_vjp
def conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """3×3 SAME stride-1 conv, NHWC, no bias (gen-3 no-prep kernel)."""
    return _conv_fwd_impl(x, w)


def _conv_fwd(x, w):
    return _conv_fwd_impl(x, w), (x, w)


def _conv_bwd(res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    w_dx = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    dx = _conv_fwd_impl(dy, w_dx)
    dw = _conv_dw_impl(x, dy).astype(w.dtype)
    return dx, dw


conv3x3.defvjp(_conv_fwd, _conv_bwd)


# ---------------------------------------------------------------------------
# Fused BN·ReLU prologue + stats epilogue (the packed-domain level engine)
# ---------------------------------------------------------------------------
#
# In the packed UNet, BatchNorm as separate XLA passes costs ~1.5 ms fwd
# and ~1.9 ms bwd per BN at 512² AND pins layouts between custom calls
# (DESIGN.md §8). This variant folds the normalize into the conv that
# CONSUMES it — t = relu(x·a + b) applied to the DMA'd tile in VMEM
# (VPU work hidden under the MXU) — and emits the conv OUTPUT's batch
# stats (Σy, Σy²) from an f32 accumulator epilogue, so the next BN's
# stats also never run as a standalone pass.
#
#   conv_bn_fused(xp, w, a_l, b_l, p, prologue) -> (y, s1_l, s2_l)
#
# a_l/b_l are the consumer-side scale/shift pre-tiled to the INPUT lane
# view (f32).  The backward recomputes t in the dW kernel's prologue,
# applies the stats cotangents (dy_eff = dy + ds1 + 2·y·ds2) and the
# prologue chain (mask·a, da, db) as jnp elementwise/reduces.


def _ew_dtype(dtype):
    """Elementwise-chain dtype for the full-tile VPU passes (prologue
    recompute, dy_eff formation).  f32 math on bf16-tiled data costs
    ~2× VPU (upcast + double register pressure); under CL_TPU_E_BF16
    the bf16 kernels run those chains natively in bf16 — the stored
    result was cast to bf16 anyway, so only intermediate rounding
    changes (bf16-gated tests + the dtype-trajectory harness cover
    it).  f32 kernels always keep f32 (parity suite exactness)."""
    if _E_BF16 and jnp.dtype(dtype) == jnp.bfloat16:
        return jnp.bfloat16
    return jnp.float32


_E_BF16 = _os.environ.get("CL_TPU_E_BF16", "0") == "1"


def _apply_prologue(scratch, slot, a_ref, b_ref, dtype):
    ew = _ew_dtype(dtype)
    t = (scratch[slot].astype(ew) * a_ref[:][0].astype(ew)
         + b_ref[:][0].astype(ew))
    scratch[slot] = jnp.maximum(t, jnp.zeros((), ew)).astype(dtype)


def _zero_halo_rows(scratch, slot, *, nh, th):
    idx = pl.program_id(0)
    jh = idx % nh
    if nh == 1:
        scratch[slot, 1] = jnp.zeros_like(scratch[slot, 1])
        scratch[slot, th + 2] = jnp.zeros_like(scratch[slot, th + 2])
        return

    @pl.when(jh == 0)
    def _():
        scratch[slot, 1] = jnp.zeros_like(scratch[slot, 1])

    @pl.when(jh == nh - 1)
    def _():
        scratch[slot, th + 2] = jnp.zeros_like(scratch[slot, th + 2])


def _fwd_bn_body(xp_ref, w_ref, a_ref, b_ref, y_ref, s_ref, scratch,
                 sems, sacc, qrefs, *, nh, th, wg, lanes, k, c_in,
                 prologue):
    slot = _wait_dma_nozero(xp_ref, scratch, sems, nh=nh, th=th)
    if prologue:
        _apply_prologue(scratch, slot, a_ref, b_ref, xp_ref.dtype)
    _zero_halo_rows(scratch, slot, nh=nh, th=th)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        sacc[:] = jnp.zeros_like(sacc)

    vflat = scratch[slot].reshape((th + 4) * wg, lanes)
    acc = _conv_dots(vflat, w_ref, th=th, wg=wg, lanes=lanes, k=k,
                     c_in=c_in, dtype=xp_ref.dtype)
    yd = acc.astype(y_ref.dtype)
    # stats of the STORED dtype (bf16 under config 5) so the folded
    # mean/var match a separate pass over the materialized y exactly.
    yf = yd.astype(jnp.float32)
    sacc[0:1] += jnp.sum(yf, axis=0, keepdims=True)
    sacc[1:2] += jnp.sum(yf * yf, axis=0, keepdims=True)
    y_ref[0] = yd.reshape(th, wg, y_ref.shape[-1])
    if qrefs is not None:
        # int8 saved-activation epilogue (r4): quantize the tile rows
        # while they are still in registers — the extra HBM traffic is
        # the 1-byte q write (+ tiny scales); the backward's y re-reads
        # shrink 2× (VERDICT r3 next #1; DESIGN.md §8 int8 micro: the
        # in-register int8→f32 upcast is free, −31% on the HBM-bound
        # streaming shape).
        yq_ref, sc_ref = qrefs
        q, sc = _quant_rows(yf.reshape(th, wg, y_ref.shape[-1]))
        yq_ref[0] = q
        sc_ref[0] = sc

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        s_ref[:] = sacc[:]


def _fwd_bn_kernel(xp_ref, w_ref, a_ref, b_ref, y_ref, s_ref, scratch,
                   sems, sacc, *, nh, th, wg, lanes, k, c_in, prologue):
    _fwd_bn_body(xp_ref, w_ref, a_ref, b_ref, y_ref, s_ref, scratch,
                 sems, sacc, None, nh=nh, th=th, wg=wg, lanes=lanes,
                 k=k, c_in=c_in, prologue=prologue)


def _fwd_bn_q_kernel(xp_ref, w_ref, a_ref, b_ref, y_ref, s_ref, yq_ref,
                     sc_ref, scratch, sems, sacc, *, nh, th, wg, lanes,
                     k, c_in, prologue):
    _fwd_bn_body(xp_ref, w_ref, a_ref, b_ref, y_ref, s_ref, scratch,
                 sems, sacc, (yq_ref, sc_ref), nh=nh, th=th, wg=wg,
                 lanes=lanes, k=k, c_in=c_in, prologue=prologue)


def _wait_dma_nozero(xp_ref, scratch, sems, *, nh, th):
    """_wait_dma without the halo-row zeroing (the fused kernel zeroes
    AFTER its prologue so padding stays zero in t-space)."""
    idx = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(idx == 0)
    def _():
        _start_dma(xp_ref, scratch, sems, 0, 0, nh=nh, th=th)

    @pl.when(idx + 1 < n)
    def _():
        _start_dma(xp_ref, scratch, sems, (idx + 1) % 2, idx + 1,
                   nh=nh, th=th)

    slot = idx % 2
    _wait_variant(xp_ref, scratch, sems, slot, idx, nh=nh, th=th)
    return slot


def _dw_bn_kernel(xp_ref, dy_ref, a_ref, b_ref, dw_ref, scratch, sems,
                  acc, *, nh, th, wg, lanes, k, c_in, prologue):
    slot = _wait_dma_nozero(xp_ref, scratch, sems, nh=nh, th=th)
    if prologue:
        _apply_prologue(scratch, slot, a_ref, b_ref, xp_ref.dtype)
    _zero_halo_rows(scratch, slot, nh=nh, th=th)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    vflat = scratch[slot].reshape((th + 4) * wg, lanes)
    dy2 = dy_ref[0].reshape(th * wg, dy_ref.shape[-1])
    _dw_accum(vflat, dy2, acc, th=th, wg=wg, lanes=lanes, k=k,
              c_in=c_in, dtype=xp_ref.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = acc[:]


def _fwd_bn_impl(xp, w, a_l, b_l, p_force, prologue, emit_q=False):
    b, h, wg_in, lanes_in = xp.shape
    c_in = w.shape[2]
    c_out = w.shape[-1]
    wid = wg_in * lanes_in // c_in
    p, wg, th, nh, lanes, k = _geometry(h, wid, c_in, c_out,
                                        xp.dtype.itemsize, p_force)
    assert (wg_in, lanes_in) == (wg, lanes)
    wp = _pack_weights_v3(w, p)
    out_lanes = p * c_out
    kern = _fwd_bn_q_kernel if emit_q else _fwd_bn_kernel
    out_specs = [pl.BlockSpec((1, th, wg, out_lanes),
                              lambda i: (i, 0, 0, 0)),
                 pl.BlockSpec((2, out_lanes), lambda i: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((b * nh, th, wg, out_lanes),
                                      xp.dtype),
                 jax.ShapeDtypeStruct((2, out_lanes), jnp.float32)]
    if emit_q:
        out_specs += [pl.BlockSpec((1, th, wg, out_lanes),
                                   lambda i: (i, 0, 0, 0)),
                      pl.BlockSpec((1, th, 1, out_lanes),
                                   lambda i: (i, 0, 0, 0))]
        out_shape += [jax.ShapeDtypeStruct((b * nh, th, wg, out_lanes),
                                           jnp.int8),
                      jax.ShapeDtypeStruct((b * nh, th, 1, out_lanes),
                                           jnp.float32)]
    out = pl.pallas_call(
        functools.partial(kern, nh=nh, th=th, wg=wg,
                          lanes=lanes, k=k, c_in=c_in, prologue=prologue),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3 * k, out_lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wg, lanes), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, out_lanes), jnp.float32),
        ],
        interpret=common.interpret_mode(),
        **_cparams(),
    )(xp, wp, a_l.reshape(1, -1), b_l.reshape(1, -1))
    y, s = out[0], out[1]
    y = y.reshape(b, h, wg, out_lanes)
    if not emit_q:
        return y, s[0], s[1]
    yq = out[2].reshape(b, h, wg, out_lanes)
    ysc = out[3].reshape(b, h, 1, out_lanes)
    return y, s[0], s[1], yq, ysc


def _dw_bn_impl(xp, dyp4, c_in, a_l, b_l, p_force, prologue):
    b, h, wg_in, lanes_in = xp.shape
    wid = wg_in * lanes_in // c_in
    c_out = dyp4.shape[-1] // (lanes_in // c_in)
    p, wg, th, nh, lanes, k = _geometry(h, wid, c_in, c_out,
                                        xp.dtype.itemsize, p_force)
    assert (wg_in, lanes_in) == (wg, lanes)
    dyp = dyp4.reshape(b * nh, th, wg, p * c_out)
    dwp = pl.pallas_call(
        functools.partial(_dw_bn_kernel, nh=nh, th=th, wg=wg,
                          lanes=lanes, k=k, c_in=c_in, prologue=prologue),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, wg, p * c_out), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3 * k, p * c_out), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * k, p * c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wg, lanes), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((3 * k, p * c_out), jnp.float32),
        ],
        interpret=common.interpret_mode(),
        **_cparams(),
    )(xp, dyp, a_l.reshape(1, -1), b_l.reshape(1, -1))
    return _fold_dw(_unperm_dw(dwp, c_in, lanes), p, c_in, c_out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv_bn_fused(xp, w, a_l, b_l, p, prologue):
    """Packed conv with in-kernel BN·ReLU prologue and output-stats
    epilogue: t = relu(xp·a_l + b_l) (skipped when ``prologue`` False),
    y = conv3x3(t, w), returns (y, Σy per lane, Σy² per lane)."""
    return _fwd_bn_impl(xp, w, a_l, b_l, p, prologue)


def _cbf_fwd(xp, w, a_l, b_l, p, prologue):
    y, s1, s2 = _fwd_bn_impl(xp, w, a_l, b_l, p, prologue)
    return (y, s1, s2), (xp, w, a_l, b_l, y)


def _cbf_bwd(p, prologue, res, cots):
    """Backward of conv_bn_fused, entirely in-kernel (no XLA elementwise
    on packed views — those trigger ~2 ms relayout copies per pass at
    512², DESIGN.md §8):

      e  = dy + ds1 + 2·y·ds2   (stats cotangents, fused into BOTH the
                                 dx and dW kernels' input paths)
      dt = conv(e, w_flip)       dw = tᵀ★e  (t recomputed in prologue)
      dxp = [u>0]·dt·a           da_l = Σ [u>0]·dt·x   db_l = Σ [u>0]·dt

    with the prologue chain (mask/da/db) as the dx kernel's epilogue."""
    xp, w, a_l, b_l, y = res
    dy, ds1, ds2 = cots
    c_in = w.shape[2]
    w_dx = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    # The fused dx kernel carries two halo scratches + the full packed
    # weight block; at deep wide levels (f32, k·out_lanes large) no tile
    # fits the scoped-VMEM budget — fall back to the two-pass backward
    # (XLA dy_eff + plain dx/dW kernels) there.
    b_, h, wg, lanes = dy.shape
    c_out_fwd = lanes // p
    kk = (p + 2) * c_out_fwd
    out_lanes = p * c_in
    itemsize = dy.dtype.itemsize
    th = _pick_th_dx(h, wg, lanes, kk, out_lanes, itemsize, prologue)
    # the fused dW variant streams dy AND y blocks on top of the plain
    # dW kernel's footprint — it picks its OWN (smaller) tile height for
    # that, so it fits whenever any multiple-of-8 divisor of h does
    # (reusing the plain-dW tile here used to reject 4 of 6 levels at
    # 512² bf16 once the tile target grew to 8192 rows, silently taking
    # the two-pass backward and its relayout copies — a 150→113 img/s
    # step regression).
    lanes_x = p * c_in
    kx = (p + 2) * c_in
    if _FUSE_BWD:
        th_f = _pick_th_bwdf(h, wg, lanes, lanes_x, kk, kx, itemsize,
                             prologue)
        if th_f > 0:
            dxp, da_l, db_l, dw = _bwd_fused_impl(
                dy, y, xp, w_dx, ds1, ds2, a_l, b_l, p, prologue, th_f)
            dw = dw.astype(w.dtype)
            if not prologue:
                da_l = jnp.zeros_like(a_l)
                db_l = jnp.zeros_like(b_l)
            return dxp, dw, da_l, db_l
    th_dw2 = _pick_th_dw2(h, wg, lanes_x, kx, p, c_out_fwd, itemsize)
    if th > 0 and th_dw2 > 0:
        dxp, da_l, db_l = _dx_bn_impl(dy, y, xp, w_dx, ds1, ds2, a_l,
                                      b_l, p, prologue)
        dw = _dw_bn2_impl(xp, dy, y, ds1, ds2, c_in, a_l, b_l, p,
                          prologue)
        dw = dw.astype(w.dtype)
        if not prologue:
            da_l = jnp.zeros_like(a_l)
            db_l = jnp.zeros_like(b_l)
        return dxp, dw, da_l, db_l
    ds1b, ds2b = jax.lax.optimization_barrier((ds1, ds2))
    dy_eff = (dy.astype(jnp.float32) + ds1b
              + 2.0 * y.astype(jnp.float32) * ds2b).astype(xp.dtype)
    dt = _fwd_packed(dy_eff, w_dx, p)
    dw = _dw_bn_impl(xp, dy_eff, c_in, a_l, b_l, p, prologue)
    dw = dw.astype(w.dtype)
    if prologue:
        a_b, b_b = jax.lax.optimization_barrier((a_l, b_l))
        xf = xp.astype(jnp.float32)
        u = xf * a_b + b_b
        du = jnp.where(u > 0, dt.astype(jnp.float32), 0.0)
        dxp = (du * a_b).astype(xp.dtype)
        da_l = jnp.sum(du * xf, axis=(0, 1, 2))
        db_l = jnp.sum(du, axis=(0, 1, 2))
    else:
        dxp = dt.astype(xp.dtype)
        da_l = jnp.zeros_like(a_l)
        db_l = jnp.zeros_like(b_l)
    return dxp, dw, da_l, db_l


conv_bn_fused.defvjp(_cbf_fwd, _cbf_bwd)


# ---------------------------------------------------------------------------
# Fully fused backward kernels (dy_eff prologue + mask/da/db epilogue)
# ---------------------------------------------------------------------------


def _vmem_estimate_dx(th, wg, lanes, k, out_lanes, itemsize,
                      epilogue) -> int:
    """Scoped-VMEM accounting for one dx grid step: the halo scratches
    (dy: two slots, or three under _DX_PIPE; y: two), the f32 dy_eff
    temp, weight/out blocks, pieces, the f32 conv accumulator, and the
    epilogue's xp block and f32 temps."""
    rows = th * wg
    dy_slots = 3 if _DX_PIPE else 2
    est = ((dy_slots + 2) * (th + 4) * wg * lanes * itemsize  # dy + y
           + (th + 4) * wg * lanes * 4               # f32 e temp
           + 2 * 3 * k * out_lanes * itemsize        # W' block
           + 2 * th * wg * out_lanes * itemsize      # dx out block
           + 3 * rows * lanes * itemsize             # pieces
           + rows * out_lanes * 4)                   # f32 conv acc
    if epilogue:
        est += (2 * th * wg * out_lanes * itemsize   # xp block
                + 3 * rows * out_lanes * 4)          # xb/u/du f32 temps
    return est


def _pick_th_dw2(h, wg, lanes, k, p, c_out, itemsize) -> int:
    """Tile height for the fused dW kernel (`_dw_bn2_kernel`): the plain
    dW footprint plus the double-buffered dy and y input blocks it
    streams (2 buffers × 2 operands × th·wg·p·c_out) and the f32 dy_eff
    temp it forms per tile."""

    def fits(th):
        extra = (4 * th * wg * p * c_out * itemsize
                 + th * wg * p * c_out * 4)
        return (_vmem_estimate(th, wg, lanes, k, p, c_out, itemsize)
                + extra) <= _VMEM_BUDGET

    if h <= 16:
        return h if fits(h) else 0
    th = min(h, max(8, (_ROW_TARGET // max(1, wg)) // 8 * 8))
    while th >= 8:
        if h % th == 0 and fits(th):
            return th
        th -= 8
    return 0


def _pick_th_dx(h, wg, lanes, k, out_lanes, itemsize, epilogue) -> int:
    if h <= 16:
        th = h
        if _vmem_estimate_dx(th, wg, lanes, k, out_lanes, itemsize,
                             epilogue) <= _VMEM_BUDGET:
            return th
        return 0
    th = min(h, max(8, (_ROW_TARGET // max(1, wg)) // 8 * 8))
    while th >= 8:
        if h % th == 0 and _vmem_estimate_dx(
                th, wg, lanes, k, out_lanes, itemsize,
                epilogue) <= _VMEM_BUDGET:
            return th
        th -= 8
    return 0


def _dy_eff_tile(sdy, syv, slot, s1_ref, s2_ref, dtype, sloty=None):
    """e = dy + ds1 + 2·y·ds2 on the whole scratch tile (halo rows
    included — e is positionwise, so real neighbour rows transform
    correctly and out-of-image rows are zeroed afterwards).  ``sloty``
    indexes the y scratch when its slot count differs from sdy's (the
    pipelined kernel: 3 dy slots, 2 y slots)."""
    ew = _ew_dtype(dtype)
    ys = syv[slot if sloty is None else sloty]
    e = (sdy[slot].astype(ew) + s1_ref[:][0].astype(ew)
         + jnp.asarray(2.0, ew) * ys.astype(ew)
         * s2_ref[:][0].astype(ew))
    sdy[slot] = e.astype(dtype)


def _dx_bn_kernel(dy_hbm, y_hbm, x_ref, w_ref, s1_ref, s2_ref, a_ref,
                  b_ref, dx_ref, ds_ref, sdy, syv, semd, semy, acc2, *,
                  nh, th, wg, lanes, k, c_in, epilogue):
    slot = _wait_dma_nozero(dy_hbm, sdy, semd, nh=nh, th=th)
    _wait_dma_nozero(y_hbm, syv, semy, nh=nh, th=th)
    _dy_eff_tile(sdy, syv, slot, s1_ref, s2_ref, dy_hbm.dtype)
    _zero_halo_rows(sdy, slot, nh=nh, th=th)
    i = pl.program_id(0)
    if epilogue:
        @pl.when(i == 0)
        def _():
            acc2[:] = jnp.zeros_like(acc2)

    vflat = sdy[slot].reshape((th + 4) * wg, lanes)
    acc = _conv_dots(vflat, w_ref, th=th, wg=wg, lanes=lanes, k=k,
                     c_in=c_in, dtype=dy_hbm.dtype)
    out_lanes = dx_ref.shape[-1]
    if epilogue:
        xb = x_ref[0].reshape(th * wg, out_lanes).astype(jnp.float32)
        uu = xb * a_ref[:][0] + b_ref[:][0]
        du = jnp.where(uu > 0, acc, 0.0)
        dx_ref[0] = (du * a_ref[:][0]).reshape(
            th, wg, out_lanes).astype(dx_ref.dtype)
        acc2[0:1] += jnp.sum(du * xb, axis=0, keepdims=True)
        acc2[1:2] += jnp.sum(du, axis=0, keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            ds_ref[:] = acc2[:]
    else:
        dx_ref[0] = acc.reshape(th, wg, out_lanes).astype(dx_ref.dtype)


def _dx_slim_kernel(dy_hbm, y_hbm, w_ref, s1_ref, s2_ref, dx_ref, sdy,
                    syv, semd, semy, *, nh, th, wg, lanes, k, c_in):
    """dx conv of e = dy+ds1+2y·ds2 without the prologue epilogue (the
    level-entry convs: stem / split, whose input isn't BN·ReLU'd)."""
    slot = _wait_dma_nozero(dy_hbm, sdy, semd, nh=nh, th=th)
    _wait_dma_nozero(y_hbm, syv, semy, nh=nh, th=th)
    _dy_eff_tile(sdy, syv, slot, s1_ref, s2_ref, dy_hbm.dtype)
    _zero_halo_rows(sdy, slot, nh=nh, th=th)
    vflat = sdy[slot].reshape((th + 4) * wg, lanes)
    acc = _conv_dots(vflat, w_ref, th=th, wg=wg, lanes=lanes, k=k,
                     c_in=c_in, dtype=dy_hbm.dtype)
    out_lanes = dx_ref.shape[-1]
    dx_ref[0] = acc.reshape(th, wg, out_lanes).astype(dx_ref.dtype)


def _dx_pipe_body(dy_hbm, y_hbm, w_ref, s1_ref, s2_ref, dx_ref, sdy, syv,
                  semd, semy, epi, *, nh, th, wg, lanes, k, c_in):
    """Cross-tile software-pipelined dx body (r5, _DX_PIPE).

    Grid = n_tiles + 1.  Step i issues tile i-1's window dots FIRST
    (the MXU starts from the e formed last step), then forms tile i's
    dy_eff (VPU) while the MXU drains, then runs tile i-1's epilogue
    (which consumes the dot accumulator).  sdy has THREE slots — DMA
    target (i+1), forming (i), being-dotted (i-1); y keeps two (only
    read during formation).  Step 0 dots a garbage slot and discards
    the result (no epilogue/write); step n_tiles only drains.
    ``epi`` = None (slim: level-entry convs) or
    (x_ref, a_ref, b_ref, ds_ref, acc2) for the BN·ReLU prologue
    backward epilogue."""
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0) - 1

    @pl.when(i == 0)
    def _():
        _start_dma(dy_hbm, sdy, semd, 0, 0, nh=nh, th=th)
        _start_dma(y_hbm, syv, semy, 0, 0, nh=nh, th=th)
        if epi is not None:
            epi[4][:] = jnp.zeros_like(epi[4])

    @pl.when(i + 1 < n_tiles)
    def _():
        _start_dma(dy_hbm, sdy, semd, (i + 1) % 3, i + 1, nh=nh, th=th)
        _start_dma(y_hbm, syv, semy, (i + 1) % 2, i + 1, nh=nh, th=th)

    # Tile i-1's dots, issued unconditionally (garbage operand at i==0,
    # result discarded) so the matrix units are busy before any of this
    # step's vector work begins.
    jslot = (i + 2) % 3  # == (i - 1) % 3 without going negative
    vflat = sdy[jslot].reshape((th + 4) * wg, lanes)
    acc = _conv_dots(vflat, w_ref, th=th, wg=wg, lanes=lanes, k=k,
                     c_in=c_in, dtype=dy_hbm.dtype)

    @pl.when(i < n_tiles)
    def _():
        slot = i % 3
        _wait_variant(dy_hbm, sdy, semd, slot, i, nh=nh, th=th)
        _wait_variant(y_hbm, syv, semy, i % 2, i, nh=nh, th=th)
        _dy_eff_tile(sdy, syv, slot, s1_ref, s2_ref, dy_hbm.dtype,
                     sloty=i % 2)
        _zero_halo_rows(sdy, slot, nh=nh, th=th)

    out_lanes = dx_ref.shape[-1]

    @pl.when(i > 0)
    def _():
        if epi is None:
            dx_ref[0] = acc.reshape(th, wg, out_lanes).astype(dx_ref.dtype)
        else:
            x_ref, a_ref, b_ref, ds_ref, acc2 = epi
            xb = x_ref[0].reshape(th * wg, out_lanes).astype(jnp.float32)
            uu = xb * a_ref[:][0] + b_ref[:][0]
            du = jnp.where(uu > 0, acc, 0.0)
            dx_ref[0] = (du * a_ref[:][0]).reshape(
                th, wg, out_lanes).astype(dx_ref.dtype)
            acc2[0:1] += jnp.sum(du * xb, axis=0, keepdims=True)
            acc2[1:2] += jnp.sum(du, axis=0, keepdims=True)

            @pl.when(i == n_tiles)
            def _():
                ds_ref[:] = acc2[:]


def _dx_pipe_bn_kernel(dy_hbm, y_hbm, x_ref, w_ref, s1_ref, s2_ref,
                       a_ref, b_ref, dx_ref, ds_ref, sdy, syv, semd,
                       semy, acc2, *, nh, th, wg, lanes, k, c_in):
    _dx_pipe_body(dy_hbm, y_hbm, w_ref, s1_ref, s2_ref, dx_ref, sdy,
                  syv, semd, semy, (x_ref, a_ref, b_ref, ds_ref, acc2),
                  nh=nh, th=th, wg=wg, lanes=lanes, k=k, c_in=c_in)


def _dx_pipe_slim_kernel(dy_hbm, y_hbm, w_ref, s1_ref, s2_ref, dx_ref,
                         sdy, syv, semd, semy, *, nh, th, wg, lanes, k,
                         c_in):
    _dx_pipe_body(dy_hbm, y_hbm, w_ref, s1_ref, s2_ref, dx_ref, sdy,
                  syv, semd, semy, None, nh=nh, th=th, wg=wg,
                  lanes=lanes, k=k, c_in=c_in)


def _dx_bn_impl(dy, y, xp, w_dx, ds1, ds2, a_l, b_l, p, prologue):
    """dxp (and da_l/db_l when ``prologue``) from the packed cotangent:
    the dx conv of e = dy+ds1+2y·ds2 with the flipped kernel, with the
    BN·ReLU prologue's backward as an in-kernel epilogue."""
    b, h, wg, lanes = dy.shape
    c_in = w_dx.shape[2]          # = forward c_out (contraction channel)
    c_out = w_dx.shape[-1]        # = forward c_in
    out_lanes = p * c_out
    itemsize = dy.dtype.itemsize
    k = (p + 2) * c_in
    th = _pick_th_dx(h, wg, lanes, k, out_lanes, itemsize, prologue)
    assert th > 0, "dx geometry must fit whenever the forward did"
    nh = h // th
    wp = _pack_weights_v3(w_dx, p)
    # The pipelined variant (r5 default, _DX_PIPE) runs one extra drain
    # step and lags the tile-block index maps by one; interpret mode
    # always takes the reference two-phase kernel (the pipeline's value
    # is hardware scheduling; its garbage-operand warmup step would
    # trip interpret-mode NaN checks).
    pipe = _DX_PIPE and not common.interpret_mode()
    n_tiles = b * nh
    grid = (n_tiles + 1,) if pipe else (n_tiles,)

    def lag(i):
        return jnp.maximum(i - 1, 0) if pipe else i

    scratch_shapes = [
        pltpu.VMEM((3 if pipe else 2, th + 4, wg, lanes), dy.dtype),
        pltpu.VMEM((2, th + 4, wg, lanes), dy.dtype),
        pltpu.SemaphoreType.DMA((3 if pipe else 2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if not prologue:
        kern = (functools.partial(_dx_pipe_slim_kernel, nh=nh, th=th,
                                  wg=wg, lanes=lanes, k=k, c_in=c_in)
                if pipe else
                functools.partial(_dx_slim_kernel, nh=nh, th=th, wg=wg,
                                  lanes=lanes, k=k, c_in=c_in))
        dxp = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((3 * k, out_lanes), lambda i: (0, 0)),
                pl.BlockSpec((1, lanes), lambda i: (0, 0)),
                pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, th, wg, out_lanes),
                                   lambda i: (lag(i), 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((n_tiles, th, wg, out_lanes),
                                           xp.dtype),
            scratch_shapes=scratch_shapes,
            interpret=common.interpret_mode(),
            **_cparams(),
        )(dy, y, wp, ds1.reshape(1, -1), ds2.reshape(1, -1))
        zeros = jnp.zeros((out_lanes,), jnp.float32)
        return dxp.reshape(b, h, wg, out_lanes), zeros, zeros
    xb = xp.reshape(b * nh, th, wg, out_lanes)
    kern = (functools.partial(_dx_pipe_bn_kernel, nh=nh, th=th, wg=wg,
                              lanes=lanes, k=k, c_in=c_in)
            if pipe else
            functools.partial(_dx_bn_kernel, nh=nh, th=th, wg=wg,
                              lanes=lanes, k=k, c_in=c_in, epilogue=True))
    dxp, ds = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # dy
            pl.BlockSpec(memory_space=pl.ANY),              # y
            pl.BlockSpec((1, th, wg, out_lanes),
                         lambda i: (lag(i), 0, 0, 0)),
            pl.BlockSpec((3 * k, out_lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),     # ds1
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),     # ds2
            pl.BlockSpec((1, out_lanes), lambda i: (0, 0)),  # a_l
            pl.BlockSpec((1, out_lanes), lambda i: (0, 0)),  # b_l
        ],
        out_specs=(pl.BlockSpec((1, th, wg, out_lanes),
                                lambda i: (lag(i), 0, 0, 0)),
                   pl.BlockSpec((2, out_lanes), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_tiles, th, wg, out_lanes),
                                        xp.dtype),
                   jax.ShapeDtypeStruct((2, out_lanes), jnp.float32)),
        scratch_shapes=scratch_shapes + [
            pltpu.VMEM((2, out_lanes), jnp.float32),
        ],
        interpret=common.interpret_mode(),
        **_cparams(),
    )(dy, y, xb, wp, ds1.reshape(1, -1), ds2.reshape(1, -1),
      a_l.reshape(1, -1), b_l.reshape(1, -1))
    return dxp.reshape(b, h, wg, out_lanes), ds[0], ds[1]


def _dw_bn2_kernel(xp_hbm, dy_ref, yv_ref, a_ref, b_ref, s1_ref, s2_ref,
                   dw_ref, scratch, sems, acc, *, nh, th, wg, lanes, k,
                   c_in, prologue):
    slot = _wait_dma_nozero(xp_hbm, scratch, sems, nh=nh, th=th)
    if prologue:
        _apply_prologue(scratch, slot, a_ref, b_ref, xp_hbm.dtype)
    _zero_halo_rows(scratch, slot, nh=nh, th=th)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    vflat = scratch[slot].reshape((th + 4) * wg, lanes)
    ew = _ew_dtype(xp_hbm.dtype)
    e = (dy_ref[0].astype(ew) + s1_ref[:][0].astype(ew)
         + jnp.asarray(2.0, ew) * yv_ref[0].astype(ew)
         * s2_ref[:][0].astype(ew)).astype(xp_hbm.dtype)
    dy2 = e.reshape(th * wg, dy_ref.shape[-1])
    _dw_accum(vflat, dy2, acc, th=th, wg=wg, lanes=lanes, k=k,
              c_in=c_in, dtype=xp_hbm.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = acc[:]


def _dw_bn2_impl(xp, dy, y, ds1, ds2, c_in, a_l, b_l, p_force, prologue):
    """dW with BOTH fusions in-kernel: the BN·ReLU prologue recompute of
    t (from xp) and the stats-cotangent dy_eff (from dy, y, ds1, ds2)."""
    b, h, wg_in, lanes_in = xp.shape
    wid = wg_in * lanes_in // c_in
    c_out = dy.shape[-1] // (lanes_in // c_in)
    p = p_force or pick_pack(c_in, c_out)
    wg = wid // p
    lanes = p * c_in
    k = (p + 2) * c_in
    th = _pick_th_dw2(h, wg, lanes, k, p, c_out, xp.dtype.itemsize)
    assert th > 0, "caller must gate on _pick_th_dw2"
    nh = h // th
    assert (wg_in, lanes_in) == (wg, lanes)
    dyb = dy.reshape(b * nh, th, wg, p * c_out)
    yb = y.reshape(b * nh, th, wg, p * c_out)
    dwp = pl.pallas_call(
        functools.partial(_dw_bn2_kernel, nh=nh, th=th, wg=wg,
                          lanes=lanes, k=k, c_in=c_in, prologue=prologue),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, wg, p * c_out), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, th, wg, p * c_out), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, p * c_out), lambda i: (0, 0)),
            pl.BlockSpec((1, p * c_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3 * k, p * c_out), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * k, p * c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wg, lanes), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((3 * k, p * c_out), jnp.float32),
        ],
        interpret=common.interpret_mode(),
        **_cparams(),
    )(xp, dyb, yb, a_l.reshape(1, -1), b_l.reshape(1, -1),
      ds1.reshape(1, -1), ds2.reshape(1, -1))
    return _fold_dw(_unperm_dw(dwp, c_in, lanes), p, c_in, c_out)


# ---------------------------------------------------------------------------
# Single-pass fused backward: dx + dW (+ BN/ReLU prologue backward) in
# ONE kernel
# ---------------------------------------------------------------------------
#
# The two-kernel backward above streams the (dy, y) pair from HBM twice
# (once for the dx conv, once for the dW contraction) and forms the
# stats-cotangent dy_eff twice.  At 512²/b8 that second (dy + y) stream
# is ~268 MB of pure re-read per conv.  This kernel does the whole
# backward per tile:
#
#   DMA dy, y (halo'd)          → dy_eff = dy + ds1 + 2·y·ds2  (once)
#   DMA x (halo'd)
#   dx   = conv(dy_eff, w_flip) pieces from the dy_eff scratch
#   epilogue (prologue=True):   u = x·a+b from the RAW x rows, du =
#        [u>0]·dx_acc, dxp = du·a, da/db accumulate; then the x scratch
#        is prologue'd IN PLACE (t = relu(x·a+b)) for the dW pieces
#   dW  += t_piecesᵀ @ dy_eff   into the f32 VMEM accumulator
#
# VMEM: three double-buffered halo scratches + both piece sets ≈ 3× a
# single-pass kernel's footprint — it needs the raised Mosaic ceiling
# (_VMEM_LIMIT via CompilerParams.vmem_limit_bytes); _pick_th_bwdf gates
# on _VMEM_BUDGET_FUSED and the caller falls back to the two-kernel
# backward when no tile fits.


def _vmem_estimate_bwdf(th, wg, lanes, out_lanes, kdx, kdw, itemsize,
                        prologue) -> int:
    rows = th * wg
    est = (2 * 2 * (th + 4) * wg * lanes * itemsize   # dy + y scratches
           + 2 * (th + 4) * wg * out_lanes * itemsize  # x scratch
           + (th + 4) * wg * lanes * 4                # f32 dy_eff temp
           + 2 * 3 * kdx * out_lanes * itemsize       # W'(dx) block
           + 2 * th * wg * out_lanes * itemsize       # dx out block
           + 3 * rows * lanes * itemsize              # dx pieces
           + 3 * rows * out_lanes * itemsize          # dW pieces
           + rows * out_lanes * 4                     # f32 dx acc
           + 2 * 3 * kdw * lanes * 4)                 # dW acc
    if prologue:
        est += 3 * rows * out_lanes * 4               # xb/u/du f32 temps
    return est


def _pick_th_bwdf(h, wg, lanes, out_lanes, kdx, kdw, itemsize,
                  prologue) -> int:
    if h <= 16:
        th = h
        if _vmem_estimate_bwdf(th, wg, lanes, out_lanes, kdx, kdw,
                               itemsize, prologue) <= _VMEM_BUDGET_FUSED:
            return th
        return 0
    th = min(h, max(8, (_ROW_TARGET // max(1, wg)) // 8 * 8))
    while th >= 8:
        if h % th == 0 and _vmem_estimate_bwdf(
                th, wg, lanes, out_lanes, kdx, kdw, itemsize,
                prologue) <= _VMEM_BUDGET_FUSED:
            return th
        th -= 8
    return 0


def _bwd_fused_kernel(dy_hbm, y_hbm, x_hbm, wdx_ref, s1_ref, s2_ref,
                      a_ref, b_ref, dx_ref, ds_ref, dw_ref, sdy, syv,
                      sx, semd, semy, semx, acc2, accw, *, nh, th, wg,
                      lanes, out_lanes, kdx, kdw, c_in_dx, c_in,
                      prologue):
    slot = _wait_dma_nozero(dy_hbm, sdy, semd, nh=nh, th=th)
    _wait_dma_nozero(y_hbm, syv, semy, nh=nh, th=th)
    _wait_dma_nozero(x_hbm, sx, semx, nh=nh, th=th)
    _dy_eff_tile(sdy, syv, slot, s1_ref, s2_ref, dy_hbm.dtype)
    _zero_halo_rows(sdy, slot, nh=nh, th=th)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        accw[:] = jnp.zeros_like(accw)
        acc2[:] = jnp.zeros_like(acc2)

    # dx conv of dy_eff with the flipped kernel
    vdy = sdy[slot].reshape((th + 4) * wg, lanes)
    acc = _conv_dots(vdy, wdx_ref, th=th, wg=wg, lanes=lanes, k=kdx,
                     c_in=c_in_dx, dtype=dy_hbm.dtype)
    if prologue:
        # the prologue chain's backward needs the RAW x rows — read them
        # before the in-place prologue below rewrites the scratch to t
        xb = sx[slot, 2:th + 2].reshape(
            th * wg, out_lanes).astype(jnp.float32)
        uu = xb * a_ref[:][0] + b_ref[:][0]
        du = jnp.where(uu > 0, acc, 0.0)
        dx_ref[0] = (du * a_ref[:][0]).reshape(
            th, wg, out_lanes).astype(dx_ref.dtype)
        acc2[0:1] += jnp.sum(du * xb, axis=0, keepdims=True)
        acc2[1:2] += jnp.sum(du, axis=0, keepdims=True)
        _apply_prologue(sx, slot, a_ref, b_ref, x_hbm.dtype)
    else:
        dx_ref[0] = acc.reshape(th, wg, out_lanes).astype(dx_ref.dtype)
    _zero_halo_rows(sx, slot, nh=nh, th=th)

    # dW contraction: t pieces vs the tile body of dy_eff
    vx = sx[slot].reshape((th + 4) * wg, out_lanes)
    dy2 = sdy[slot, 2:th + 2].reshape(th * wg, lanes)
    _dw_accum(vx, dy2, accw, th=th, wg=wg, lanes=out_lanes, k=kdw,
              c_in=c_in, dtype=x_hbm.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = accw[:]
        ds_ref[:] = acc2[:]


def _bwd_fused_impl(dy, y, xp, w_dx, ds1, ds2, a_l, b_l, p, prologue,
                    th):
    """One-kernel backward: (dxp, da_l, db_l, dW[3,3,c_in,c_out] f32)."""
    b, h, wg, lanes = dy.shape
    c_in_dx = w_dx.shape[2]        # = forward c_out
    c_in = w_dx.shape[-1]          # = forward c_in
    out_lanes = p * c_in
    kdx = (p + 2) * c_in_dx
    kdw = (p + 2) * c_in
    nh = h // th
    wp = _pack_weights_v3(w_dx, p)
    dxp, ds, dwp = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, nh=nh, th=th, wg=wg,
                          lanes=lanes, out_lanes=out_lanes, kdx=kdx,
                          kdw=kdw, c_in_dx=c_in_dx, c_in=c_in,
                          prologue=prologue),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),              # dy
            pl.BlockSpec(memory_space=pl.ANY),              # y
            pl.BlockSpec(memory_space=pl.ANY),              # x
            pl.BlockSpec((3 * kdx, out_lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),     # ds1
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),     # ds2
            pl.BlockSpec((1, out_lanes), lambda i: (0, 0)),  # a_l
            pl.BlockSpec((1, out_lanes), lambda i: (0, 0)),  # b_l
        ],
        out_specs=(pl.BlockSpec((1, th, wg, out_lanes),
                                lambda i: (i, 0, 0, 0)),
                   pl.BlockSpec((2, out_lanes), lambda i: (0, 0)),
                   pl.BlockSpec((3 * kdw, lanes), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((b * nh, th, wg, out_lanes),
                                        xp.dtype),
                   jax.ShapeDtypeStruct((2, out_lanes), jnp.float32),
                   jax.ShapeDtypeStruct((3 * kdw, lanes), jnp.float32)),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wg, lanes), dy.dtype),
            pltpu.VMEM((2, th + 4, wg, lanes), dy.dtype),
            pltpu.VMEM((2, th + 4, wg, out_lanes), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, out_lanes), jnp.float32),
            pltpu.VMEM((3 * kdw, lanes), jnp.float32),
        ],
        interpret=common.interpret_mode(),
        **_cparams(),
    )(dy, y, xp, wp, ds1.reshape(1, -1), ds2.reshape(1, -1),
      a_l.reshape(1, -1), b_l.reshape(1, -1))
    c_out = lanes // p
    dw = _fold_dw(_unperm_dw(dwp, c_in, out_lanes), p, c_in, c_out)
    return (dxp.reshape(b, h, wg, out_lanes), ds[0], ds[1], dw)


# ---------------------------------------------------------------------------
# int8 saved-activation backward (r4): the two-kernel backward with the
# SAVED tensors (y always; xp when the producer conv threaded its own q
# output through the model) stored int8 + per-row scales, dequantized
# in-register.  The cotangent dy and the dx output stay in the compute
# dtype — only residual re-reads shrink.  VERDICT r3 next #1.
# ---------------------------------------------------------------------------


def _dy_eff_tile_q(sdy, syq, ssc, slot, s1_ref, s2_ref, dtype):
    """e = dy + ds1 + 2·deq(y)·ds2 over the whole halo tile, with y
    dequantized from the int8 scratch (per-row scales DMA'd with the
    same halo ranges, so interior-boundary halo rows dequantize with
    their OWN row's scale)."""
    yv = syq[slot].astype(jnp.float32) * ssc[slot]
    e = (sdy[slot].astype(jnp.float32) + s1_ref[:][0]
         + 2.0 * yv * s2_ref[:][0])
    sdy[slot] = e.astype(dtype)


def _dx_q_kernel(*refs, nh, th, wg, lanes, k, c_in, epilogue, xq_mode):
    it = iter(refs)
    dy_hbm, yq_hbm, ysc_hbm = next(it), next(it), next(it)
    if epilogue:
        if xq_mode:
            xqb_ref, xsc_ref = next(it), next(it)
        else:
            xb_ref = next(it)
    w_ref, s1_ref, s2_ref = next(it), next(it), next(it)
    if epilogue:
        a_ref, b_ref = next(it), next(it)
    dx_ref = next(it)
    if epilogue:
        ds_ref = next(it)
    sdy, syq, ssc = next(it), next(it), next(it)
    semd, semy, semsc = next(it), next(it), next(it)
    acc2 = next(it, None)

    slot = _wait_dma_nozero(dy_hbm, sdy, semd, nh=nh, th=th)
    _wait_dma_nozero(yq_hbm, syq, semy, nh=nh, th=th)
    _wait_dma_nozero(ysc_hbm, ssc, semsc, nh=nh, th=th)
    _dy_eff_tile_q(sdy, syq, ssc, slot, s1_ref, s2_ref, dy_hbm.dtype)
    _zero_halo_rows(sdy, slot, nh=nh, th=th)
    i = pl.program_id(0)
    if epilogue:
        @pl.when(i == 0)
        def _():
            acc2[:] = jnp.zeros_like(acc2)

    vflat = sdy[slot].reshape((th + 4) * wg, lanes)
    acc = _conv_dots(vflat, w_ref, th=th, wg=wg, lanes=lanes, k=k,
                     c_in=c_in, dtype=dy_hbm.dtype)
    out_lanes = dx_ref.shape[-1]
    if epilogue:
        if xq_mode:
            xb = (xqb_ref[0].astype(jnp.float32) * xsc_ref[0]).reshape(
                th * wg, out_lanes)
        else:
            xb = xb_ref[0].reshape(th * wg, out_lanes).astype(jnp.float32)
        uu = xb * a_ref[:][0] + b_ref[:][0]
        du = jnp.where(uu > 0, acc, 0.0)
        dx_ref[0] = (du * a_ref[:][0]).reshape(
            th, wg, out_lanes).astype(dx_ref.dtype)
        acc2[0:1] += jnp.sum(du * xb, axis=0, keepdims=True)
        acc2[1:2] += jnp.sum(du, axis=0, keepdims=True)

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            ds_ref[:] = acc2[:]
    else:
        dx_ref[0] = acc.reshape(th, wg, out_lanes).astype(dx_ref.dtype)


def _dx_q_impl(dy, yq, ysc, x_res, w_dx, ds1, ds2, a_l, b_l, p,
               prologue, xq_mode):
    """dx of the q backward; ``x_res`` is (xp_q, xp_sc) when ``xq_mode``
    else the bf16/f32 xp.  Returns None when no tile fits (caller falls
    back to the XLA-dequant path)."""
    b, h, wg, lanes = dy.shape
    c_in = w_dx.shape[2]
    c_out = w_dx.shape[-1]
    out_lanes = p * c_out
    itemsize = dy.dtype.itemsize
    k = (p + 2) * c_in
    th = _pick_th_dx(h, wg, lanes, k, out_lanes, itemsize, prologue)
    if th <= 0:
        return None
    nh = h // th
    wp = _pack_weights_v3(w_dx, p)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 3
    args = [dy, yq, ysc]
    if prologue:
        if xq_mode:
            xqb = x_res[0].reshape(b * nh, th, wg, out_lanes)
            xscb = x_res[1].reshape(b * nh, th, 1, out_lanes)
            in_specs += [
                pl.BlockSpec((1, th, wg, out_lanes),
                             lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, th, 1, out_lanes),
                             lambda i: (i, 0, 0, 0)),
            ]
            args += [xqb, xscb]
        else:
            xb = x_res.reshape(b * nh, th, wg, out_lanes)
            in_specs += [pl.BlockSpec((1, th, wg, out_lanes),
                                      lambda i: (i, 0, 0, 0))]
            args += [xb]
    in_specs += [
        pl.BlockSpec((3 * k, out_lanes), lambda i: (0, 0)),
        pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        pl.BlockSpec((1, lanes), lambda i: (0, 0)),
    ]
    args += [wp, ds1.reshape(1, -1), ds2.reshape(1, -1)]
    if prologue:
        in_specs += [pl.BlockSpec((1, out_lanes), lambda i: (0, 0)),
                     pl.BlockSpec((1, out_lanes), lambda i: (0, 0))]
        args += [a_l.reshape(1, -1), b_l.reshape(1, -1)]
    out_specs = [pl.BlockSpec((1, th, wg, out_lanes),
                              lambda i: (i, 0, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((b * nh, th, wg, out_lanes),
                                      dy.dtype)]
    if prologue:
        out_specs += [pl.BlockSpec((2, out_lanes), lambda i: (0, 0))]
        out_shape += [jax.ShapeDtypeStruct((2, out_lanes), jnp.float32)]
    scratch_shapes = [
        pltpu.VMEM((2, th + 4, wg, lanes), dy.dtype),
        pltpu.VMEM((2, th + 4, wg, lanes), jnp.int8),
        pltpu.VMEM((2, th + 4, 1, lanes), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    if prologue:
        scratch_shapes += [pltpu.VMEM((2, out_lanes), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_dx_q_kernel, nh=nh, th=th, wg=wg, lanes=lanes,
                          k=k, c_in=c_in, epilogue=prologue,
                          xq_mode=xq_mode),
        grid=(b * nh,),
        in_specs=in_specs,
        out_specs=tuple(out_specs) if prologue else out_specs[0],
        out_shape=tuple(out_shape) if prologue else out_shape[0],
        scratch_shapes=scratch_shapes,
        interpret=common.interpret_mode(),
        **_cparams(),
    )(*args)
    if prologue:
        dxp, ds = out
        return dxp.reshape(b, h, wg, out_lanes), ds[0], ds[1]
    zeros = jnp.zeros((out_lanes,), jnp.float32)
    return out.reshape(b, h, wg, out_lanes), zeros, zeros


def _dw2_q_kernel(*refs, nh, th, wg, lanes, k, c_in, prologue, xq_mode):
    it = iter(refs)
    x_hbm = next(it)
    xsc_hbm = next(it) if xq_mode else None
    dyb_ref, yqb_ref, yscb_ref = next(it), next(it), next(it)
    a_ref, b_ref, s1_ref, s2_ref = next(it), next(it), next(it), next(it)
    dw_ref = next(it)
    sx = next(it)
    if xq_mode:
        sxsc, tmp = next(it), next(it)
    sems = next(it)
    semsc = next(it) if xq_mode else None
    acc = next(it)

    slot = _wait_dma_nozero(x_hbm, sx, sems, nh=nh, th=th)
    if xq_mode:
        _wait_dma_nozero(xsc_hbm, sxsc, semsc, nh=nh, th=th)
        deq = sx[slot].astype(jnp.float32) * sxsc[slot]
        if prologue:
            deq = jnp.maximum(deq * a_ref[:][0] + b_ref[:][0], 0.0)
        tmp[0] = deq.astype(tmp.dtype)
        tv = tmp
        tslot = 0
    else:
        if prologue:
            _apply_prologue(sx, slot, a_ref, b_ref, x_hbm.dtype)
        tv = sx
        tslot = slot
    _zero_halo_rows(tv, tslot, nh=nh, th=th)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    vflat = tv[tslot].reshape((th + 4) * wg, lanes)
    yv = yqb_ref[0].astype(jnp.float32) * yscb_ref[0]
    e = (dyb_ref[0].astype(jnp.float32) + s1_ref[:][0]
         + 2.0 * yv * s2_ref[:][0]).astype(tv.dtype)
    dy2 = e.reshape(th * wg, dyb_ref.shape[-1])
    _dw_accum(vflat, dy2, acc, th=th, wg=wg, lanes=lanes, k=k,
              c_in=c_in, dtype=tv.dtype)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        dw_ref[:] = acc[:]


def _dw2_q_impl(x_res, dy, yq, ysc, c_in, a_l, b_l, ds1, ds2, p_force,
                prologue, xq_mode, compute_dtype):
    """dW of the q backward: dy_eff recomputed from (dy, int8 y), and t
    recomputed from xp — itself int8-dequantized when ``xq_mode``."""
    if xq_mode:
        xq, xsc = x_res
        b, h, wg_in, lanes_in = xq.shape
    else:
        b, h, wg_in, lanes_in = x_res.shape
    wid = wg_in * lanes_in // c_in
    c_out = dy.shape[-1] // (lanes_in // c_in)
    p = p_force or pick_pack(c_in, c_out)
    wg = wid // p
    lanes = p * c_in
    k = (p + 2) * c_in
    th = _pick_th_dw2(h, wg, lanes, k, p, c_out,
                      jnp.dtype(compute_dtype).itemsize)
    if th <= 0:
        return None
    nh = h // th
    assert (wg_in, lanes_in) == (wg, lanes)
    dyb = dy.reshape(b * nh, th, wg, p * c_out)
    yqb = yq.reshape(b * nh, th, wg, p * c_out)
    yscb = ysc.reshape(b * nh, th, 1, p * c_out)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    args = [xq if xq_mode else x_res]
    scratch_shapes = []
    if xq_mode:
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)]
        args += [xsc]
    in_specs += [
        pl.BlockSpec((1, th, wg, p * c_out), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, th, wg, p * c_out), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, th, 1, p * c_out), lambda i: (i, 0, 0, 0)),
        pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        pl.BlockSpec((1, p * c_out), lambda i: (0, 0)),
        pl.BlockSpec((1, p * c_out), lambda i: (0, 0)),
    ]
    args += [dyb, yqb, yscb, a_l.reshape(1, -1), b_l.reshape(1, -1),
             ds1.reshape(1, -1), ds2.reshape(1, -1)]
    if xq_mode:
        scratch_shapes += [
            pltpu.VMEM((2, th + 4, wg, lanes), jnp.int8),
            pltpu.VMEM((2, th + 4, 1, lanes), jnp.float32),
            pltpu.VMEM((1, th + 4, wg, lanes), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        scratch_shapes += [
            pltpu.VMEM((2, th + 4, wg, lanes), compute_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    scratch_shapes += [pltpu.VMEM((3 * k, p * c_out), jnp.float32)]
    dwp = pl.pallas_call(
        functools.partial(_dw2_q_kernel, nh=nh, th=th, wg=wg,
                          lanes=lanes, k=k, c_in=c_in, prologue=prologue,
                          xq_mode=xq_mode),
        grid=(b * nh,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3 * k, p * c_out), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * k, p * c_out), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=common.interpret_mode(),
        **_cparams(),
    )(*args)
    return _fold_dw(_unperm_dw(dwp, c_in, lanes), p, c_in, c_out)


def _deq(q, sc, dtype):
    """XLA-side dequantize (fallback / oracle path)."""
    return (q.astype(jnp.float32) * sc).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def conv_bn_fused_q(xp, xq, w, a_l, b_l, p, prologue):
    """:func:`conv_bn_fused` with int8 saved-activation storage: returns
    ``(y, s1, s2, (y_q, y_sc))``.  The backward saves (y_q, y_sc) —
    NOT y — and, when ``xq`` (the producer conv's own ``(q, sc)`` pair
    for xp) is given, drops the bf16 xp residual too.  The forward
    compute is IDENTICAL to conv_bn_fused (y is exact); only gradients
    pick up the ≤0.4%-of-row-absmax dequantization noise — gated by the
    dtype-trajectory harness (benchmarks/dtype_traj.py, PARITY.md)."""
    out = _fwd_bn_impl(xp, w, a_l, b_l, p, prologue, emit_q=True)
    y, s1, s2, yq, ysc = out
    return y, s1, s2, (yq, ysc)


def _cbfq_fwd(xp, xq, w, a_l, b_l, p, prologue):
    y, s1, s2, yq, ysc = _fwd_bn_impl(xp, w, a_l, b_l, p, prologue,
                                      emit_q=True)
    res = (xq, None if xq is not None else xp, w, a_l, b_l, yq, ysc)
    return (y, s1, s2, (yq, ysc)), res


def _cbfq_bwd(p, prologue, res, cots):
    xq, xp_plain, w, a_l, b_l, yq, ysc = res
    dy, ds1, ds2, _ = cots          # (y_q, y_sc) cotangents are zeros
    xq_mode = xq is not None
    c_in = w.shape[2]
    w_dx = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    compute_dtype = dy.dtype
    x_res = xq if xq_mode else xp_plain
    r = _dx_q_impl(dy, yq, ysc, x_res, w_dx, ds1, ds2, a_l, b_l, p,
                   prologue, xq_mode)
    rw = None
    if r is not None:
        rw = _dw2_q_impl(x_res, dy, yq, ysc, c_in, a_l, b_l, ds1, ds2,
                         p, prologue, xq_mode, compute_dtype)
    if r is None or rw is None:
        # No tile fits (deep/wide f32 shapes): XLA-dequantize the saved
        # tensors once and take the plain fallback path.
        y = _deq(yq, ysc, compute_dtype)
        xp_full = (_deq(xq[0], xq[1], compute_dtype) if xq_mode
                   else xp_plain)
        ds1b, ds2b = jax.lax.optimization_barrier((ds1, ds2))
        dy_eff = (dy.astype(jnp.float32) + ds1b
                  + 2.0 * y.astype(jnp.float32) * ds2b
                  ).astype(compute_dtype)
        dt = _fwd_packed(dy_eff, w_dx, p)
        dw = _dw_bn_impl(xp_full, dy_eff, c_in, a_l, b_l, p, prologue)
        dw = dw.astype(w.dtype)
        if prologue:
            a_b, b_b = jax.lax.optimization_barrier((a_l, b_l))
            xf = xp_full.astype(jnp.float32)
            u = xf * a_b + b_b
            du = jnp.where(u > 0, dt.astype(jnp.float32), 0.0)
            dxp = (du * a_b).astype(compute_dtype)
            da_l = jnp.sum(du * xf, axis=(0, 1, 2))
            db_l = jnp.sum(du, axis=(0, 1, 2))
        else:
            dxp = dt.astype(compute_dtype)
            da_l = jnp.zeros_like(a_l)
            db_l = jnp.zeros_like(b_l)
    else:
        dxp, da_l, db_l = r
        dw = rw.astype(w.dtype)
        if not prologue:
            da_l = jnp.zeros_like(a_l)
            db_l = jnp.zeros_like(b_l)
    dxq = ((np.zeros(xq[0].shape, jax.dtypes.float0),
            jnp.zeros_like(xq[1])) if xq_mode else None)
    return dxp, dxq, dw, da_l, db_l


conv_bn_fused_q.defvjp(_cbfq_fwd, _cbfq_bwd)
