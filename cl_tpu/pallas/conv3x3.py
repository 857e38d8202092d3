"""Lane-packed 3×3 SAME conv for small channel counts — Pallas TPU kernel.

Why this exists (measured, `benchmarks/profile_b8_512.json` + DESIGN.md §8):
XLA's conv emitters reach only ~6–8% MFU on the UNet's 512² level-0
convolutions because C_out=32 fills 32 of the MXU's 128 lanes. This kernel
restores lane occupancy by computing P adjacent output columns per lane
group — output lane l = j·C_out + c_out for j ∈ [0, P) — so a C_out=32
conv runs with P=4 → all 128 lanes live.

The contraction is an im2col over the union window of the P packed taps:
k = (u, v6, c_in) with u ∈ [0,3) kernel rows and v6 = j + v ∈ [0, P+2)
the fine-column offset (+1). Because adjacent output columns share input,
the union window is P+2 wide instead of 3P — the packed weight matrix
W'[(u,v6,ci),(j,co)] = W[u, v6−j, ci, co] is 3/(P+2) dense, so the
useful-FLOP ceiling is 128 lanes × 3/(P+2): 50% of peak for P=4 (vs 25%
for the unpacked lane-limited conv) and 75% for P=2.

Data path (the round-2 redesign, DESIGN.md §8): the input stays in HBM as
one XLA `pad` of the flat rows (left halo c_in, right halo covering the
window tail — ~1× input bytes, vs ~6 ms/call for the first-generation
XLA-side overlapped-window materialization). Inside the kernel, each
row-tile's union windows arrive as ⌈K/lanes⌉ *lane-offset piece DMAs*
straight from HBM — piece q is the contiguous flat run starting q·lanes
elements in, viewed as [th+2, Wg·lanes] — double-buffered across grid
steps so the copy hides under the previous tile's matmuls. The dot is
split per (kernel row u, piece q) against the matching row-slice of W',
so there is ZERO in-kernel window assembly (Mosaic's lane-boundary
concatenate either refused to compile or ran 4× slower than the matmuls
it fed).

The same piece layout serves all three passes:
  * forward:  y' = Σ_{u,q} piece[u,q] @ W'[u,q]   (one MXU dot each)
  * dx:       forward kernel on dy with W flipped/transposed
  * dW:       Σ_{u,q} piece[u,q]ᵀ @ dy' accumulated across the grid into
              [3K, P·C_out] f32, folded to [3,3,C_in,C_out] outside.

Capability parity: `nn.Conv(features, (3,3), padding="SAME",
use_bias=False)` — the reference UNet's conv (SURVEY.md §2.1 "UNet",
§3.2); wired into the model behind `model.conv_impl` with identical
parameter trees. Interpret mode runs on CPU for the unit/parity suites
(manual DMAs included).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common


def pick_pack(c_in: int, c_out: int) -> int:
    """Lane-pack factor: fill 128 lanes with P·C_out, then bump P until
    the input lane group P·C_in is a whole number of 128-lane tiles —
    the piece DMAs slice HBM at offsets q·(P·C_in), and Mosaic requires
    lane offsets aligned to the (8,128) memref tiling."""
    if c_out <= 32:
        p = 4
    elif c_out <= 64:
        p = 2
    else:
        p = 1
    while (p * c_in) % 128 and p <= 64:
        p *= 2
    return p


def supported(h: int, w: int, c_in: int, c_out: int,
              itemsize: int = 2) -> bool:
    """Shapes this kernel handles; callers fall back to XLA otherwise."""
    p = pick_pack(c_in, c_out)
    if (p * c_in) % 128 or w % p or (w // p) < 2:
        return False
    # Row tiles DMA at offsets jh·th with th a multiple of 8 (Mosaic
    # sublane alignment) — need h tileable that way, or small enough
    # for a single tile.
    if h > 16 and h % 8:
        return False
    # Sub-8 c_in (the RGB stem) wastes >half the contraction lanes —
    # XLA's emitter is no worse there, and the stem is ~2% of FLOPs.
    if c_in < 8 or h < 2:
        return False
    # Hard VMEM guard: even the smallest tile must leave the scoped
    # 16 MB budget room for the weight/output blocks (deep-decoder
    # shapes like 64²×512→256 blow it — XLA handles those).
    wg = w // p
    lanes = p * c_in
    n_pieces = -(-((p + 2) * c_in) // lanes)
    th = _pick_th(h, wg, lanes, n_pieces, itemsize)
    rh = common.round_up(th + 2, 8)
    scratch = 2 * n_pieces * rh * wg * lanes * itemsize
    return scratch <= _SCRATCH_HARD_LIMIT


def profitable(h: int, w: int, c_in: int, c_out: int) -> bool:
    """Measured-win shapes for ``model.conv_impl="auto"`` routing.

    On-chip A/B (`benchmarks/conv_micro.py`, r2): the kernel beats XLA's
    emitter fwd AND bwd only on the channel-doubling encoder convs where
    lane packing is active (P≥2) and the emitter is lane-starved on the
    *input* side — 256²×(32→64) and 128²×(64→128). Equal-width and
    decoder shapes tie or lose (the XLA-side halo pad adds HBM traffic
    the win doesn't cover)."""
    return (supported(h, w, c_in, c_out)
            and pick_pack(c_in, c_out) >= 2 and c_out == 2 * c_in)


_SCRATCH_BUDGET = 4 * 1024 * 1024  # soft target for double-buffered pieces
_SCRATCH_HARD_LIMIT = 8 * 1024 * 1024  # supported() rejects shapes above


def _pick_th(h: int, wg: int, lanes: int, n_pieces: int,
             itemsize: int) -> int:
    """Rows per grid tile. th is a multiple of 8 dividing h (so the HBM
    row-DMA offset jh·th is sublane-aligned), sized for ~2048 dot rows
    and a bounded double-buffered scratch; small images go whole."""
    if h <= 16:
        return h  # single tile, offset 0 — trivially aligned
    th = min(h, max(8, (2048 // max(1, wg)) // 8 * 8))
    while th >= 8:
        if h % th == 0:
            scratch = 2 * n_pieces * (th + 8) * wg * lanes * itemsize
            if scratch <= _SCRATCH_BUDGET:
                return th
        th -= 8
    return 8  # over soft budget even at minimum; supported() hard-gates


def pack_weights(w: jax.Array, p: int) -> jax.Array:
    """[3,3,Cin,Cout] → W'[(u,v6,ci), (j,co)] = W[u, v6−j, ci, co]."""
    kh, kw, c_in, c_out = w.shape
    assert kh == 3 and kw == 3
    wp = jnp.zeros((3, p + 2, c_in, p, c_out), w.dtype)
    for j in range(p):
        for v in range(3):
            wp = wp.at[:, j + v, :, j, :].set(w[:, v])
    return wp.reshape(3 * (p + 2) * c_in, p * c_out)


def _fold_dw(dwp: jax.Array, p: int, c_in: int, c_out: int) -> jax.Array:
    """Inverse of pack_weights for the weight cotangent: sum over j."""
    dwp = dwp.reshape(3, p + 2, c_in, p, c_out)
    cols = []
    for v in range(3):
        acc = dwp[:, v + 0, :, 0, :]
        for j in range(1, p):
            acc = acc + dwp[:, v + j, :, j, :]
        cols.append(acc)
    return jnp.stack(cols, axis=1)  # [3,3,Cin,Cout]


def _geometry(b, h, wid, c_in, c_out, itemsize):
    """Shared tiling parameters for all three passes."""
    p = pick_pack(c_in, c_out)
    wg = wid // p
    lanes = p * c_in
    k = (p + 2) * c_in
    n_pieces = -(-k // lanes)  # ceil — always ≥ 2 (K = lanes + 2·c_in)
    segs = tuple(min(lanes, k - q * lanes) for q in range(n_pieces))
    th = _pick_th(h, wg, lanes, n_pieces, itemsize)
    nh = h // th
    rh = common.round_up(th + 2, 8)  # DMA'd rows: sublane-aligned size
    return p, wg, th, nh, rh, lanes, k, n_pieces, segs


def _pad_input(x: jax.Array, lanes: int, n_pieces: int,
               th: int, nh: int, rh: int) -> jax.Array:
    """[B,H,W,Cin] → padded flat rows, ready for aligned piece DMAs.

    One XLA pad supplies BOTH halos: 1 zero row on top plus rh−th−1 on
    the bottom (each tile DMAs rh ≥ th+2 rows from offset jh·th so both
    offset and extent are sublane-aligned; the surplus rows past th+2
    are never read by the dots), and c_in zeros left (the left column
    halo) with (n_pieces−1)·lanes − c_in ≥ c_in zeros right — enough
    that every piece's contiguous [Wg·lanes] run stays in bounds AND
    the right column halo reads zeros."""
    b, h, wid, c_in = x.shape
    rpad = (n_pieces - 1) * lanes - c_in
    bot = (nh - 1) * th + rh - (h + 1)
    return jnp.pad(x.reshape(b, h, wid * c_in),
                   ((0, 0), (1, bot), (c_in, rpad)))


def _x_dmas(xp_ref, scratch, sems, slot, idx, *, nh, th, rh, wg, lanes,
            n_pieces):
    """The piece DMAs for grid step ``idx`` into buffer ``slot``.

    Piece q of row-tile (ib, jh) is the contiguous padded-flat run
    [q·lanes, q·lanes + Wg·lanes) of rows [jh·th, jh·th + rh): window
    lanes [q·lanes, (q+1)·lanes) of EVERY group at once, because group
    g's window starts at padded-flat g·lanes."""
    ib = idx // nh
    jh = idx % nh
    return [pltpu.make_async_copy(
        xp_ref.at[ib, pl.ds(jh * th, rh),
                  pl.ds(q * lanes, wg * lanes)],
        scratch.at[slot, q], sems.at[slot, q]) for q in range(n_pieces)]


def _double_buffer(xp_ref, scratch, sems, dma_kw):
    """Start next tile's piece DMAs, wait for this tile's; return slot."""
    idx = pl.program_id(0)
    n = pl.num_programs(0)

    @pl.when(idx == 0)
    def _():
        for d in _x_dmas(xp_ref, scratch, sems, 0, 0, **dma_kw):
            d.start()

    @pl.when(idx + 1 < n)
    def _():
        for d in _x_dmas(xp_ref, scratch, sems, (idx + 1) % 2, idx + 1,
                         **dma_kw):
            d.start()

    slot = idx % 2
    for d in _x_dmas(xp_ref, scratch, sems, slot, idx, **dma_kw):
        d.wait()
    return slot


def _fwd_kernel(xp_ref, w_ref, y_ref, scratch, sems, *, nh, th, rh, wg,
                lanes, k, n_pieces, segs):
    slot = _double_buffer(xp_ref, scratch, sems,
                          dict(nh=nh, th=th, rh=rh, wg=wg, lanes=lanes,
                               n_pieces=n_pieces))
    acc = None
    for u in range(3):  # dot split per (kernel row, lane piece)
        for q in range(n_pieces):
            v = scratch[slot, q]                    # [th+2, wg·lanes]
            patch = v[u:u + th].reshape(th * wg, lanes)[:, :segs[q]]
            row0 = u * k + q * lanes
            d = jax.lax.dot_general(
                patch, w_ref[row0:row0 + segs[q], :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d
    y_ref[0] = acc.reshape(th, wg, y_ref.shape[-1]).astype(y_ref.dtype)


def _dw_kernel(xp_ref, dy_ref, dw_ref, scratch, sems, *, nh, th, rh, wg,
               lanes, k, n_pieces, segs):
    slot = _double_buffer(xp_ref, scratch, sems,
                          dict(nh=nh, th=th, rh=rh, wg=wg, lanes=lanes,
                               n_pieces=n_pieces))
    dy2 = dy_ref[0].reshape(th * wg, dy_ref.shape[-1])
    first = pl.program_id(0) == 0
    for u in range(3):
        for q in range(n_pieces):
            v = scratch[slot, q]
            patch = v[u:u + th].reshape(th * wg, lanes)[:, :segs[q]]
            acc = jax.lax.dot_general(  # patchᵀ @ dy over th·wg rows
                patch, dy2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            row0 = u * k + q * lanes

            @pl.when(first)
            def _init(row0=row0, q=q, acc=acc):
                dw_ref[row0:row0 + segs[q], :] = acc

            @pl.when(jnp.logical_not(first))
            def _accum(row0=row0, q=q, acc=acc):
                dw_ref[row0:row0 + segs[q], :] += acc


def _conv_fwd_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    b, h, wid, c_in = x.shape
    c_out = w.shape[-1]
    p, wg, th, nh, rh, lanes, k, n_pieces, segs = _geometry(
        b, h, wid, c_in, c_out, x.dtype.itemsize)

    xp = _pad_input(x, lanes, n_pieces, th, nh, rh)
    wp = pack_weights(w, p)

    y = pl.pallas_call(
        functools.partial(_fwd_kernel, nh=nh, th=th, rh=rh, wg=wg,
                          lanes=lanes, k=k, n_pieces=n_pieces, segs=segs),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((wp.shape[0], p * c_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, wg, p * c_out),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, th, wg, p * c_out),
                                       x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, n_pieces, rh, wg * lanes), x.dtype),
            pltpu.SemaphoreType.DMA((2, n_pieces)),
        ],
        interpret=common.interpret_mode(),
    )(xp, wp)
    return y.reshape(b, h, wid, c_out)


def _conv_dw_impl(x: jax.Array, dy: jax.Array) -> jax.Array:
    b, h, wid, c_in = x.shape
    c_out = dy.shape[-1]
    p, wg, th, nh, rh, lanes, k, n_pieces, segs = _geometry(
        b, h, wid, c_in, c_out, x.dtype.itemsize)

    xp = _pad_input(x, lanes, n_pieces, th, nh, rh)
    dyp = dy.reshape(b * nh, th, wg, p * c_out)

    dwp = pl.pallas_call(
        functools.partial(_dw_kernel, nh=nh, th=th, rh=rh, wg=wg,
                          lanes=lanes, k=k, n_pieces=n_pieces, segs=segs),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, th, wg, p * c_out), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((3 * k, p * c_out), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((3 * k, p * c_out), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, n_pieces, rh, wg * lanes), x.dtype),
            pltpu.SemaphoreType.DMA((2, n_pieces)),
        ],
        interpret=common.interpret_mode(),
    )(xp, dyp)
    return _fold_dw(dwp, p, c_in, c_out)


@jax.custom_vjp
def conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """3×3 SAME stride-1 conv, NHWC, no bias. y = conv(x, w[3,3,Cin,Cout])."""
    return _conv_fwd_impl(x, w)


def _conv_fwd(x, w):
    return _conv_fwd_impl(x, w), (x, w)


def _conv_bwd(res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    # dx: correlate dy with the spatially flipped, channel-transposed
    # kernel — the forward kernel reused with Cin/Cout swapped.
    w_dx = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    dx = _conv_fwd_impl(dy, w_dx)
    dw = _conv_dw_impl(x, dy).astype(w.dtype)
    return dx, dw


conv3x3.defvjp(_conv_fwd, _conv_bwd)


def conv3x3_reference(x: jax.Array, w: jax.Array) -> jax.Array:
    """jnp oracle (tests): lax conv in NHWC/HWIO."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Hybrid conv: XLA forward + dx, Pallas dW (model.conv_impl="hybrid")
# ---------------------------------------------------------------------------
#
# The full-Pallas replacement loses in-step because the custom call breaks
# XLA's conv↔BN/ReLU producer/consumer fusion on the fwd/dx chains
# (measured, DESIGN.md §8). dW has no such chain — it is a SINK consumed
# only by the optimizer — so this hybrid keeps the fwd and dx convs as
# plain lax convs and routes ONLY dW through the piece-DMA kernel.
#
# MEASURED NEGATIVE (conv_micro.py --dw, b8 bf16, DESIGN.md §8): XLA's
# standalone dW reaches 7.7–17 TF/s at the UNet shapes and the Pallas dW
# loses or ties everywhere (enc0b 5.53 vs 5.00 ms, dec0a 8.34 vs 5.07).
# Kept as an opt-in reference implementation; "xla" stays the default.


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dw_profitable(h: int, w: int, c_in: int, c_out: int) -> bool:
    """Shapes routed to the Pallas dW under conv_impl="hybrid" — i.e.
    every kernel-supported shape, so the opt-in exercises the kernel.
    Measured on-chip (``conv_micro.py --dw``): XLA wins or ties them all,
    which is why "hybrid" is NOT the default (DESIGN.md §8)."""
    return supported(h, w, c_in, c_out)


@jax.custom_vjp
def conv3x3_hybrid(x: jax.Array, w: jax.Array) -> jax.Array:
    """3×3 SAME stride-1 conv, NHWC, no bias — XLA fwd/dx, Pallas dW."""
    return _xla_conv(x, w)


def _hybrid_fwd(x, w):
    return _xla_conv(x, w), (x, w)


def _hybrid_bwd(res, dy):
    x, w = res
    dy = dy.astype(x.dtype)
    # dx: the same conv AD's transpose rule emits for SAME/stride-1 —
    # correlate dy with the spatially flipped, channel-swapped kernel.
    dx = _xla_conv(dy, jnp.flip(w, (0, 1)).swapaxes(2, 3))
    b, h, wid, c_in = x.shape
    if dw_profitable(h, wid, c_in, w.shape[-1]):
        dw = _conv_dw_impl(x, dy).astype(w.dtype)
    else:
        dw = jax.vjp(lambda kk: _xla_conv(x, kk), w)[1](dy)[0]
    return dx, dw


conv3x3_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)
