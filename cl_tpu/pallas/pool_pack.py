"""2×2/stride-2 max pool on lane-packed views — Pallas TPU kernel.

Part of the packed-domain UNet execution (DESIGN.md §8): between two
packed levels the pool must consume the producer's packed view
[B,H,G,L] (L = p·C, p ≥ 2 spatial columns per lane group) and emit the
consumer's packed view [B,H/2,G/2,L] DIRECTLY — an XLA-level reshape
between two different packed views is a physical retiling (~2 ms at
512², the boundary tax that made per-conv kernel routing a net loss).

Row pairs are outer-dim slices (free); column pairs are adjacent C-lane
blocks of the same group, handled with static lane slices in-register.
The backward routes dy to the FIRST maximal element in row-major window
scan order — columns compared within each row first, then rows — the
tie rule of XLA's ``select_and_scatter`` and torch's first-argmax
(capability parity: ``nn.max_pool`` in the reference UNet, SURVEY.md
§2.1/§3.2; tie order matches `models/unet.py::maxpool2x2`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common


def supported(h, g, lanes, c, itemsize=2):
    p = lanes // c
    if p == 1:
        # unpacked columns: pool pairs adjacent GROUPS (g % 4 keeps the
        # output group count even for the next pool)
        return (h % 2 == 0 and h >= 2 and lanes == c and g % 2 == 0
                and _pick_th(h, g, lanes, itemsize) > 0)
    return (h % 2 == 0 and h >= 2 and p % 2 == 0
            and lanes % c == 0 and g % 2 == 0
            and _pick_th(h, g, lanes, itemsize) > 0)


def _pick_th(h, g, lanes, itemsize):
    """Output rows per grid tile (the input tile is 2× as tall)."""
    ho = h // 2
    th = min(ho, max(1, 2048 // max(1, g)))
    while th >= 1:
        if ho % th == 0:
            # bwd holds ~10 tile-sized temporaries (pair slices,
            # selects, routed blocks) — budget generously
            need = 10 * (2 * th * g * lanes + th * g * lanes) * itemsize
            if need <= 10 * 1024 * 1024:
                return th
        th -= 1
    return 0


def _col_pairs(row, p, c):
    """Per-row column-pair operands: lists of the even/odd C-lane blocks."""
    ev = [row[..., (2 * u) * c:(2 * u + 1) * c] for u in range(p // 2)]
    od = [row[..., (2 * u + 1) * c:(2 * u + 2) * c] for u in range(p // 2)]
    return ev, od


def _ge(a, b):
    """bf16 vector compares are unsupported on this target — compare in
    f32 (exact for bf16 inputs)."""
    return a.astype(jnp.float32) >= b.astype(jnp.float32)


def _fwd_kernel(x_ref, y_ref, *, th, g, lanes, c):
    p = lanes // c
    v = x_ref[0].reshape(th, 2, g, lanes)
    r0, r1 = v[:, 0], v[:, 1]
    if p == 1:
        # columns = groups: pool group pairs on the sublane dim
        v0 = r0.reshape(th, g // 2, 2, lanes)
        v1 = r1.reshape(th, g // 2, 2, lanes)
        q0 = jnp.maximum(v0[:, :, 0], v0[:, :, 1])
        q1 = jnp.maximum(v1[:, :, 0], v1[:, :, 1])
        y_ref[0] = jnp.maximum(q0, q1)
        return
    # NOTE all reshapes below keep the lane dim intact (Mosaic rejects
    # lane-regrouping vector reshapes); the output's group-pair merge is
    # done with two HALF-LANE stores instead.
    rmax = jnp.maximum(r0, r1).reshape(th, g // 2, 2, lanes)
    for gp in range(2):                            # input group parity
        z = rmax[:, :, gp]                         # [th, G/2, L]
        cols = [jnp.maximum(z[..., (2 * u) * c:(2 * u + 1) * c],
                            z[..., (2 * u + 1) * c:(2 * u + 2) * c])
                for u in range(p // 2)]
        q = jnp.concatenate(cols, axis=-1)         # [th, G/2, L/2]
        y_ref[0, :, :, gp * (lanes // 2):(gp + 1) * (lanes // 2)] = q


def _bwd_kernel(x_ref, dy_ref, dx_ref, *, th, g, lanes, c):
    """dx block is DECLARED with the interleave structure
    [1, th, 2(row phase), g/2, 2(group parity), lanes] so the routed
    quadrants are written as four plane STORES — the earlier
    stack+reshape interleaves were cross-sublane vreg shuffles costing
    ~3.5 ms at the 512² level (measured; the reshape outside is free)."""
    p = lanes // c
    v = x_ref[0].reshape(th, 2, g, lanes)
    r0, r1 = v[:, 0], v[:, 1]
    zero = jnp.zeros((), dy_ref.dtype)
    if p == 1:
        dy = dy_ref[0]                             # [th, G/2, L]
        v0 = r0.reshape(th, g // 2, 2, lanes)
        v1 = r1.reshape(th, g // 2, 2, lanes)
        m0 = jnp.maximum(v0[:, :, 0], v0[:, :, 1])
        m1 = jnp.maximum(v1[:, :, 0], v1[:, :, 1])
        sel_row = _ge(m0, m1)
        dtop = jnp.where(sel_row, dy, zero)
        dbot = jnp.where(sel_row, zero, dy)
        s0 = _ge(v0[:, :, 0], v0[:, :, 1])
        s1 = _ge(v1[:, :, 0], v1[:, :, 1])
        dx_ref[0, :, 0, :, 0] = jnp.where(s0, dtop, zero)
        dx_ref[0, :, 0, :, 1] = jnp.where(s0, zero, dtop)
        dx_ref[0, :, 1, :, 0] = jnp.where(s1, dbot, zero)
        dx_ref[0, :, 1, :, 1] = jnp.where(s1, zero, dbot)
        return
    v0 = r0.reshape(th, g // 2, 2, lanes)
    v1 = r1.reshape(th, g // 2, 2, lanes)
    dy = dy_ref[0]                                 # [th, G/2, L]
    for gp in range(2):                            # input group parity
        d0_blocks, d1_blocks = [], []
        for u in range(p // 2):
            e0 = v0[:, :, gp, (2 * u) * c:(2 * u + 1) * c]
            o0 = v0[:, :, gp, (2 * u + 1) * c:(2 * u + 2) * c]
            e1 = v1[:, :, gp, (2 * u) * c:(2 * u + 1) * c]
            o1 = v1[:, :, gp, (2 * u + 1) * c:(2 * u + 2) * c]
            m0 = jnp.maximum(e0, o0)
            m1 = jnp.maximum(e1, o1)
            d = dy[..., gp * (lanes // 2) + u * c:
                   gp * (lanes // 2) + (u + 1) * c]
            sel_row = _ge(m0, m1)                     # tie -> first row
            dtop = jnp.where(sel_row, d, zero)
            dbot = jnp.where(sel_row, zero, d)
            s0 = _ge(e0, o0)                          # tie -> first column
            s1 = _ge(e1, o1)
            d0_blocks += [jnp.where(s0, dtop, zero),
                          jnp.where(s0, zero, dtop)]
            d1_blocks += [jnp.where(s1, dbot, zero),
                          jnp.where(s1, zero, dbot)]
        # lane concat (static lane offsets) — no sublane movement
        dx_ref[0, :, 0, :, gp] = jnp.concatenate(d0_blocks, axis=-1)
        dx_ref[0, :, 1, :, gp] = jnp.concatenate(d1_blocks, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool2x2_packed(xp, c):
    """Packed 2×2/s2 max pool: [B,H,G,p·c] → [B,H/2,G/2,p·c]."""
    return _fwd(xp, c)[0]


def _fwd(xp, c):
    b, h, g, lanes = xp.shape
    th = _pick_th(h, g, lanes, xp.dtype.itemsize)
    ho = h // 2
    nh = ho // th
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, g=g, lanes=lanes, c=c),
        grid=(b * nh,),
        in_specs=[pl.BlockSpec((1, 2 * th, g, lanes),
                               lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, th, g // 2, lanes),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, th, g // 2, lanes),
                                       xp.dtype),
        interpret=common.interpret_mode(),
    )(xp.reshape(b * nh, 2 * th, g, lanes))
    return y.reshape(b, ho, g // 2, lanes), xp


def _bwd(c, xp, dy):
    b, h, g, lanes = xp.shape
    th = _pick_th(h, g, lanes, xp.dtype.itemsize)
    ho = h // 2
    nh = ho // th
    dy = dy.astype(xp.dtype)
    # out block carries the interleave structure (row phase, group
    # parity) as its own dims — the flat view is the same linear order,
    # so the final reshape is free (see _bwd_kernel docstring).
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, g=g, lanes=lanes, c=c),
        grid=(b * nh,),
        in_specs=[pl.BlockSpec((1, 2 * th, g, lanes),
                               lambda i: (i, 0, 0, 0)),
                  pl.BlockSpec((1, th, g // 2, lanes),
                               lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, th, 2, g // 2, 2, lanes),
                               lambda i: (i, 0, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, th, 2, g // 2, 2, lanes),
                                       xp.dtype),
        interpret=common.interpret_mode(),
    )(xp.reshape(b * nh, 2 * th, g, lanes),
      dy.reshape(b * nh, th, g // 2, lanes))
    return (dx.reshape(b, h, g, lanes),)


maxpool2x2_packed.defvjp(_fwd, _bwd)
