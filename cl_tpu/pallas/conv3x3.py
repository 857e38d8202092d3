"""Lane-packed 3×3 SAME conv for small channel counts — Pallas TPU kernel.

Why this exists (measured, `benchmarks/profile_b8_512.json` + DESIGN.md §8):
XLA's conv emitters reach only ~6–8% MFU on the UNet's 512² level-0
convolutions because C_out=32 fills 32 of the MXU's 128 lanes. This kernel
restores lane occupancy by computing P adjacent output columns per lane
group — output lane l = j·C_out + c_out for j ∈ [0, P) — so a C_out=32
conv runs with P=4 → all 128 lanes live.

The contraction is an in-VMEM im2col over the union window of the P
packed taps: k = (u, v6, c_in) with u ∈ [0,3) kernel rows and
v6 = j + v ∈ [0, P+2) the fine-column offset (+1). Because adjacent
output columns share input, the union window is P+2 wide instead of 3P —
the packed weight matrix W'[(u,v6,ci),(j,co)] = W[u, v6−j, ci, co] is
3/(P+2) dense, so the useful-FLOP ceiling is 128 lanes × 3/(P+2):
50% of peak for P=4 (vs 25% for the unpacked lane-limited conv) and 75%
for P=2. Packing the input as x[B, H, W/P, P·C_in] is a pure reshape, and
the per-u patch slice is three group-shifted lane concats — no gathers,
no strided loads.

The same patch build serves all three passes:
  * forward:  y' = patch @ W'                     (one MXU dot per tile)
  * dx:       forward kernel on dy with W flipped/transposed
  * dW:       patchᵀ @ dy' accumulated across the grid into [K, P·C_out]
              f32, folded to [3,3,C_in,C_out] outside (sum over j).

Capability parity: `nn.Conv(features, (3,3), padding="SAME",
use_bias=False)` — the reference UNet's conv (SURVEY.md §2.1 "UNet",
§3.2); wired into the model behind `model.conv_impl` with identical
parameter trees. Interpret mode runs on CPU for the unit/parity suites.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common


def pick_pack(c_out: int) -> int:
    """Lane-pack factor: fill 128 lanes with P·C_out (P ∈ {1,2,4})."""
    if c_out <= 32:
        return 4
    if c_out <= 64:
        return 2
    return 1


def supported(h: int, w: int, c_in: int, c_out: int) -> bool:
    """Shapes this kernel handles; callers fall back to XLA otherwise."""
    p = pick_pack(c_out)
    if w % p or (w // p) < 2:
        return False
    # Sub-8 c_in (the RGB stem) wastes >half the contraction lanes —
    # XLA's emitter is no worse there, and the stem is ~2% of FLOPs.
    return c_in >= 8 and h >= 2


def _pick_th(h: int, wg: int) -> int:
    """Rows per tile: R = th·wg ≈ 1024 keeps the patch ~1–3 MB in VMEM."""
    th = max(1, 1024 // wg)
    while h % th:
        th -= 1
    return th


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


def _window_pack(x: jax.Array, p: int) -> jax.Array:
    """[B, H, W, Cin] → overlapped union windows [B, H, W/p, (P+2)·Cin].

    xw[..., g, :] is the flat row slice [g·P·Cin − Cin, (g+1)·P·Cin + Cin):
    the last fine column of group g−1, group g itself, and the first fine
    column of group g+1 (zeros at the row edges). Materializing the
    overlap OUTSIDE the kernel costs (p+2)/p × the input bytes in HBM —
    ~0.3 ms of the ~3 ms the 512² conv costs XLA — and buys a kernel with
    ZERO in-kernel assembly: Mosaic's lane-boundary concatenate (the
    first-generation design) either refused to compile ("result/input
    offset mismatch on non-concat dimension") or, offset-aligned, ran 4×
    slower than the matmuls it fed."""
    b, h, wid, c_in = x.shape
    wg = wid // p
    lanes = p * c_in
    k = (p + 2) * c_in
    flat = x.reshape(b, h, wid * c_in)
    xp = jnp.pad(flat, ((0, 0), (0, 0), (c_in, c_in)))
    # Window g is xp[g·lanes : g·lanes + K]. Build it from ⌈K/lanes⌉
    # lane-strided views (2 for P≥2, 3 for P=1): piece at offset `off`
    # contributes lanes [off, off+seg) of every window via one reshape.
    pieces = []
    for off in range(0, k, lanes):
        seg = min(lanes, k - off)
        t = xp[..., off:]
        short = wg * lanes - t.shape[-1]
        if short > 0:
            t = jnp.pad(t, ((0, 0), (0, 0), (0, short)))
        t = t[..., :wg * lanes].reshape(b, h, wg, lanes)
        pieces.append(t[..., :seg])
    return jnp.concatenate(pieces, axis=-1)  # [b, h, wg, K]


def _row_slab(xw: jax.Array, th: int) -> jax.Array:
    """[B, H, Wg, K] → row-halo slabs [B, H/th, th+2, Wg, K] (zero pads).

    One extra pass over xw; trades the HBM copy for trivially correct
    non-overlapping Pallas blocks (overlapping BlockSpecs don't exist)."""
    b, h, wg, k = xw.shape
    xp = jnp.pad(xw, ((0, 0), (1, 1), (0, 0), (0, 0)))
    nh = h // th
    body = xp[:, 1:h + 1].reshape(b, nh, th, wg, k)
    top = xp[:, 0:h:th][:, :, None]           # padded row i·th
    bot = xp[:, th + 1::th][:, :, None]       # padded row i·th + th + 1
    return jnp.concatenate([top, body, bot], axis=2)


def _fwd_kernel(xs_ref, w_ref, y_ref, *, th, c_in, p):
    kseg = (p + 2) * c_in
    acc = None
    for u in range(3):  # dot split per kernel row: no in-kernel concat
        patch = xs_ref[0, 0, u:u + th]        # [th, wg, K] — leading-dim
        d = jax.lax.dot_general(              # slice only, offset (0, 0)
            patch, w_ref[u * kseg:(u + 1) * kseg, :],
            (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    y_ref[0, 0] = acc.astype(y_ref.dtype)     # [th, wg, P·Cout]


def _dw_kernel(xs_ref, dy_ref, dw_ref, *, th, c_in, p):
    kseg = (p + 2) * c_in
    dy = dy_ref[0, 0]                         # [th, wg, P·Cout]
    m = dy.shape[0] * dy.shape[1]
    dy2 = dy.reshape(m, dy.shape[2])
    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
    for u in range(3):
        patch = xs_ref[0, 0, u:u + th]        # [th, wg, K]
        # patchᵀ @ dy over the fused (th·wg) rows — Mosaic's matmul only
        # takes a single contracting dim, so collapse the leading pair.
        p2 = patch.reshape(m, patch.shape[2])
        acc = jax.lax.dot_general(
            p2, dy2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(first)
        def _init():
            dw_ref[u * kseg:(u + 1) * kseg, :] = acc

        @pl.when(jnp.logical_not(first))
        def _accum():
            dw_ref[u * kseg:(u + 1) * kseg, :] += acc


def _conv_fwd_impl(x: jax.Array, w: jax.Array) -> jax.Array:
    b, h, wid, c_in = x.shape
    c_out = w.shape[-1]
    p = pick_pack(c_out)
    wg = wid // p
    th = _pick_th(h, wg)
    nh = h // th
    k = (p + 2) * c_in

    xs = _row_slab(_window_pack(x, p), th)
    wp = pack_weights(w, p)
    kdim = wp.shape[0]

    y = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, c_in=c_in, p=p),
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, wg, k),
                         lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((kdim, p * c_out), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, th, wg, p * c_out),
                               lambda i, j: (i, j, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nh, th, wg, p * c_out), x.dtype),
        interpret=common.interpret_mode(),
    )(xs, wp)
    return y.reshape(b, h, wid, c_out)


def _conv_dw_impl(x: jax.Array, dy: jax.Array, p: int) -> jax.Array:
    b, h, wid, c_in = x.shape
    c_out = dy.shape[-1]
    wg = wid // p
    th = _pick_th(h, wg)
    nh = h // th
    k = (p + 2) * c_in
    kdim = 3 * k

    xs = _row_slab(_window_pack(x, p), th)
    dyp = dy.reshape(b, nh, th, wg, p * c_out)

    dwp = pl.pallas_call(
        functools.partial(_dw_kernel, th=th, c_in=c_in, p=p),
        grid=(b, nh),
        in_specs=[
            pl.BlockSpec((1, 1, th + 2, wg, k),
                         lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, 1, th, wg, p * c_out),
                         lambda i, j: (i, j, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((kdim, p * c_out), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((kdim, p * c_out), jnp.float32),
        interpret=common.interpret_mode(),
    )(xs, dyp)
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
    dw = _conv_dw_impl(x, dy, pick_pack(w.shape[-1])).astype(w.dtype)
    return dx, dw


conv3x3.defvjp(_conv_fwd, _conv_bwd)


def conv3x3_reference(x: jax.Array, w: jax.Array) -> jax.Array:
    """jnp oracle (tests): lax conv in NHWC/HWIO."""
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
