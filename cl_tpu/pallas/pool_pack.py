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


def _pick_th(h, g, lanes, itemsize, units=10):
    """Output rows per grid tile (the input tile is 2× as tall)."""
    ho = h // 2
    th = min(ho, max(1, 2048 // max(1, g)))
    while th >= 1:
        if ho % th == 0:
            # bwd holds ~10 tile-sized temporaries (pair slices,
            # selects, routed blocks) — budget generously; the tee
            # variant carries the skip-cotangent input block on top
            # (units=13)
            need = units * (2 * th * g * lanes + th * g * lanes) * itemsize
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


def _add_skip(val, ds_slice, out_dtype):
    """Routed pool cotangent + skip cotangent, bit-identical to the
    unfused path: round the routed value to the output dtype FIRST (the
    plain kernel's store), then add in f32 and round once (XLA's add of
    two bf16 operands is the exactly-rounded f32 sum)."""
    v = val.astype(out_dtype).astype(jnp.float32)
    return (v + ds_slice.astype(jnp.float32)).astype(out_dtype)


def _bwd_kernel(x_ref, dy_ref, *refs, th, g, lanes, c, tee):
    """dx block is DECLARED with the interleave structure
    [1, th, 2(row phase), g/2, 2(group parity), lanes] so the routed
    quadrants are written as four plane STORES — the earlier
    stack+reshape interleaves were cross-sublane vreg shuffles costing
    ~3.5 ms at the 512² level (measured; the reshape outside is free).

    p ≥ 2 routing runs at FULL lane width: every cross-lane movement is
    a dot with a constant 0/1 lane-routing matrix (MXU does arbitrary
    lane permutation/broadcast at full speed; VPU lane shuffles and
    sub-width selects do not — quarter-width selects measured 3.9 ms at
    the 512² level, and slice+concat lane rotates 10.2 ms, vs the
    ~0.4 ms HBM bound). ``swap`` exchanges adjacent c-lane blocks so
    each lane sees its column partner; ``b0/b1`` spread one group
    parity's dy half onto both partner blocks. Exactness: each output
    lane of these dots has exactly one nonzero term, so bf16 in/f32
    accumulate reproduces the operand bits."""
    p = lanes // c
    dx_ref = refs[-1]
    nm = 0
    if tee:
        # skip-cotangent input block, same shape/layout as x's; sliced
        # per (row phase, group parity) to match each dx plane store
        dsv = refs[0][0].reshape(th, 2, g, lanes)
        ds = [dsv[:, r].reshape(th, g // 2, 2, lanes) for r in (0, 1)]
        nm = 1
    v = x_ref[0].reshape(th, 2, g, lanes)
    r0, r1 = v[:, 0], v[:, 1]
    zero = jnp.zeros((), dy_ref.dtype)

    def emit(rphase, par, val):
        if tee:
            val = _add_skip(val, ds[rphase][:, :, par], dy_ref.dtype)
        else:
            val = val.astype(dy_ref.dtype)
        dx_ref[0, :, rphase, :, par] = val

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
        emit(0, 0, jnp.where(s0, dtop, zero))
        emit(0, 1, jnp.where(s0, zero, dtop))
        emit(1, 0, jnp.where(s1, dbot, zero))
        emit(1, 1, jnp.where(s1, zero, dbot))
        return
    swap_ref, b0_ref, b1_ref = refs[nm], refs[nm + 1], refs[nm + 2]

    def lane_dot(a, m_ref):
        # exact routing for f32 operands too (common.dot_precision —
        # default TPU precision bf16-truncates f32 before the MXU)
        flat = a.reshape(th * a.shape[1], lanes)
        out = jax.lax.dot_general(
            flat, m_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=common.dot_precision(a.dtype))
        return out.reshape(th, a.shape[1], lanes)

    # Partner values at every lane (even block sees odd, odd sees even).
    r0f, r1f = r0.astype(jnp.float32), r1.astype(jnp.float32)
    p0 = lane_dot(r0, swap_ref)                    # [th, g, L] f32
    p1 = lane_dot(r1, swap_ref)
    one, zf = jnp.float32(1.0), jnp.float32(0.0)
    # Window-row maxes are pair-symmetric: identical at both partner
    # lanes, so the row select is computable once at full width. Masks
    # stay f32 0/1 and route by MULTIPLY: Mosaic cannot lane-slice i1
    # vectors (trunci i8→i1 rejected), and ×{0,1} is exact in bf16.
    rsel = jnp.where(_ge(jnp.maximum(r0f, p0), jnp.maximum(r1f, p1)),
                     one, zf)
    # Column winner with first-column ties: even lanes keep >=, odd
    # lanes (holding the second column) must lose exact ties. Selects
    # between BOOLEAN vectors also hit the i1 truncation, so the >=/>
    # masks go through f32 before the even/odd mix.
    even = (jax.lax.broadcasted_iota(jnp.int32, (th, g, lanes), 2)
            // c % 2) == 0

    def colwin(rf, pf):
        return jnp.where(even, jnp.where(rf >= pf, one, zf),
                         jnp.where(rf > pf, one, zf))

    col0 = colwin(r0f, p0)
    col1 = colwin(r1f, p1)
    dy = dy_ref[0]                                 # [th, G/2, L]
    vr = rsel.reshape(th, g // 2, 2, lanes)
    vc0 = col0.reshape(th, g // 2, 2, lanes)
    vc1 = col1.reshape(th, g // 2, 2, lanes)
    for gp, b_ref in ((0, b0_ref), (1, b1_ref)):   # input group parity
        e = lane_dot(dy, b_ref)                    # dy at both partners
        rs, c0, c1 = vr[:, :, gp], vc0[:, :, gp], vc1[:, :, gp]
        emit(0, gp, e * rs * c0)
        emit(1, gp, e * (one - rs) * c1)


def _routing_mats(lanes, c, dtype):
    """(swap, b0, b1) constant lane-routing matrices for ``x @ m``.

    swap[s, d] = 1 where s is d's column partner (adjacent c-block);
    b{gp}[s, d] = 1 where source dy lane s = gp·L/2 + u·c + ch feeds
    both destination blocks 2u and 2u+1 at channel ch."""
    import numpy as np
    d = np.arange(lanes)
    blk, ch = d // c, d % c
    swap = np.zeros((lanes, lanes), np.float32)
    swap[np.where(blk % 2 == 0, d + c, d - c), d] = 1.0
    b0 = np.zeros((lanes, lanes), np.float32)
    b1 = np.zeros((lanes, lanes), np.float32)
    src = (blk // 2) * c + ch
    b0[src, d] = 1.0
    b1[lanes // 2 + src, d] = 1.0
    return (jnp.asarray(swap, dtype), jnp.asarray(b0, dtype),
            jnp.asarray(b1, dtype))


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


def _bwd_impl(c, xp, dy, ds=None):
    b, h, g, lanes = xp.shape
    tee = ds is not None
    th = _pick_th(h, g, lanes, xp.dtype.itemsize,
                  units=13 if tee else 10)
    ho = h // 2
    nh = ho // th
    dy = dy.astype(xp.dtype)
    in_specs = [pl.BlockSpec((1, 2 * th, g, lanes),
                             lambda i: (i, 0, 0, 0)),
                pl.BlockSpec((1, th, g // 2, lanes),
                             lambda i: (i, 0, 0, 0))]
    operands = [xp.reshape(b * nh, 2 * th, g, lanes),
                dy.reshape(b * nh, th, g // 2, lanes)]
    if tee:
        in_specs.append(pl.BlockSpec((1, 2 * th, g, lanes),
                                     lambda i: (i, 0, 0, 0)))
        operands.append(ds.astype(xp.dtype)
                        .reshape(b * nh, 2 * th, g, lanes))
    if lanes // c >= 2:
        # lane-routing constants for the MXU dots (see _bwd_kernel);
        # every grid step reads the same [L, L] block.
        operands += list(_routing_mats(lanes, c, xp.dtype))
        in_specs += [pl.BlockSpec((lanes, lanes), lambda i: (0, 0))] * 3
    # out block carries the interleave structure (row phase, group
    # parity) as its own dims — the flat view is the same linear order,
    # so the final reshape is free (see _bwd_kernel docstring).
    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, th=th, g=g, lanes=lanes, c=c,
                          tee=tee),
        grid=(b * nh,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, th, 2, g // 2, 2, lanes),
                               lambda i: (i, 0, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, th, 2, g // 2, 2, lanes),
                                       xp.dtype),
        interpret=common.interpret_mode(),
    )(*operands)
    return dx.reshape(b, h, g, lanes)


def _bwd(c, xp, dy):
    return (_bwd_impl(c, xp, dy),)


maxpool2x2_packed.defvjp(_fwd, _bwd)


def tee_supported(h, g, lanes, c, itemsize=2):
    """Shape gate for the fused-skip variant (bigger VMEM footprint)."""
    return (supported(h, g, lanes, c, itemsize)
            and _pick_th(h, g, lanes, itemsize, units=13) > 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def maxpool2x2_packed_tee(xp, c):
    """Pool + skip tee: ``(skip, pooled) = (xp, maxpool(xp))``.

    In the UNet encoder the pool input IS the skip tensor, so its
    cotangent is ``d_skip + route(d_pool)``; the plain kernel leaves
    that add to XLA (an extra HBM round-trip over the full-resolution
    tensor — 0.6 ms at the 512² level). This variant routes d_pool and
    adds d_skip inside the backward kernel, bit-identical to the
    unfused path (see ``_add_skip``)."""
    return xp, _fwd(xp, c)[0]


def _tee_fwd(xp, c):
    y, res = _fwd(xp, c)
    return (xp, y), res


def _tee_bwd(c, xp, cots):
    ds, dy = cots
    return (_bwd_impl(c, xp, dy, ds),)


maxpool2x2_packed_tee.defvjp(_tee_fwd, _tee_bwd)
