"""Packed-view elementwise kernels: BN·ReLU apply and its analytic VJP.

`models/unet.py::bn_relu_apply` materializes z = relu(y·scale+shift) on a
lane-packed [B,H,G,L] view as plain jnp elementwise.  XLA's layout
assignment treats those fused elementwise ops as free to re-tile: it
re-associates the p-periodic vector broadcast onto the unpacked [N,C]
view and inserts ~2 ms f32 retiling copies per pass at 512² around the
neighbouring custom calls (measured; DESIGN.md §8 "packed-domain UNet").
An `optimization_barrier` protects the vectors but NOT the layout choice.

These kernels do the same math inside `pallas_call`s, whose operands and
results carry the default layout — chained custom calls then pass arrays
through with no relayout.  The backward is analytic (one fused pass):

    t  = y·s + b          (f32)
    du = [t > 0]·dz       (ReLU mask)
    dy = du·s             dsc_l = Σ du·y      dsh_l = Σ du

with the [L]→[C] p-fold of the vector cotangents done outside (tiny).
Both kernels view the packed tensor as flat [N, L] rows (free reshape —
the minor lane dim is unchanged).

Capability parity: the BatchNorm-apply+ReLU between UNet conv levels
(SURVEY.md §2.1 "UNet": conv3×3+BN+ReLU blocks); interpret mode runs the
same kernels on CPU for the unit suites.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common

_TARGET_ELEMS = 2048 * 128  # ~1 MB/block f32 — the bwd kernel keeps
#                             several f32 temps live; deep levels have
#                             wide lanes (512 at level 2), so the row
#                             count must scale down with lane width.


def _pick_tn(n: int, lanes: int) -> int:
    """Rows per grid tile: the largest divisor of n that keeps the block
    near the element target and a multiple of 8 (or n itself when n is
    small)."""
    target = max(8, _TARGET_ELEMS // lanes)
    if n <= target:
        return n
    tn = target // 8 * 8
    while tn >= 8:
        if n % tn == 0:
            return tn
        tn -= 8
    return n  # no aligned divisor — single tile


def _fwd_kernel(y_ref, s_ref, b_ref, z_ref):
    t = y_ref[...].astype(jnp.float32) * s_ref[0] + b_ref[0]
    z_ref[...] = jnp.maximum(t, 0.0).astype(z_ref.dtype)


def _bwd_kernel(y_ref, dz_ref, s_ref, b_ref, dy_ref, ds_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    yf = y_ref[...].astype(jnp.float32)
    t = yf * s_ref[0] + b_ref[0]
    du = jnp.where(t > 0, dz_ref[...].astype(jnp.float32), 0.0)
    dy_ref[...] = (du * s_ref[0]).astype(dy_ref.dtype)
    acc[0:1] += common.colsum(du * yf)
    acc[1:2] += common.colsum(du)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        ds_ref[:] = acc[:]


def _flat(yp):
    shp = yp.shape
    return yp.reshape(-1, shp[-1]), shp


def _fwd_impl(yp, s_l, b_l):
    y2, shp = _flat(yp)
    n, lanes = y2.shape
    tn = _pick_tn(n, lanes)
    z = pl.pallas_call(
        _fwd_kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, lanes), yp.dtype),
        interpret=common.interpret_mode(),
    )(y2, s_l.reshape(1, -1), b_l.reshape(1, -1))
    return z.reshape(shp)


def _bwd_impl(yp, dz, s_l, b_l):
    y2, shp = _flat(yp)
    dz2, _ = _flat(dz)
    n, lanes = y2.shape
    tn = _pick_tn(n, lanes)
    dy, ds = pl.pallas_call(
        _bwd_kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        ],
        out_specs=(pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
                   pl.BlockSpec((2, lanes), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n, lanes), yp.dtype),
                   jax.ShapeDtypeStruct((2, lanes), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, lanes), jnp.float32)],
        interpret=common.interpret_mode(),
    )(y2, dz2, s_l.reshape(1, -1), b_l.reshape(1, -1))
    return dy.reshape(shp), ds[0], ds[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_relu_packed(yp, scale, shift, p):
    """z = relu(yp·tile(scale,p) + tile(shift,p)) on a packed [...,L]
    view, L = p·C, with scale/shift [C] f32.  Drop-in for the jnp
    `bn_relu_apply` but immune to XLA's packed-elementwise relayouts."""
    s_l = jnp.tile(scale, p)
    b_l = jnp.tile(shift, p)
    return _fwd_impl(yp, s_l, b_l)


def _brp_fwd(yp, scale, shift, p):
    s_l = jnp.tile(scale, p)
    b_l = jnp.tile(shift, p)
    return _fwd_impl(yp, s_l, b_l), (yp, s_l, b_l)


def _brp_bwd(p, res, dz):
    yp, s_l, b_l = res
    dy, dsc_l, dsh_l = _bwd_impl(yp, dz, s_l, b_l)
    c = s_l.shape[0] // p
    dscale = dsc_l.reshape(p, c).sum(0)
    dshift = dsh_l.reshape(p, c).sum(0)
    return dy, dscale, dshift


bn_relu_packed.defvjp(_brp_fwd, _brp_bwd)


# ---------------------------------------------------------------------------
# add + batch-stats (the packed decoder's split-entry combine)
# ---------------------------------------------------------------------------
#
# The split-mode PackedLevel sums its two distributed conv outputs and
# needs the SUM's batch stats (stats of the sum ≠ sum of the per-operand
# stats).  As jnp this is an f32 elementwise+reduce pass over a packed
# 512² view — the same relayout trap as bn_relu_apply.  The backward is
# the stats-cotangent pattern shared with conv_bn_fused:
#     d(ys) = d(yu) = dyp + ds1 + 2·yp·ds2.


def _add_stats_kernel(a_ref, b_ref, z_ref, s_ref, acc):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    z = (a_ref[...].astype(jnp.float32)
         + b_ref[...].astype(jnp.float32)).astype(z_ref.dtype)
    z_ref[...] = z
    zf = z.astype(jnp.float32)
    acc[0:1] += common.colsum(zf)
    acc[1:2] += common.colsum(zf * zf)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        s_ref[:] = acc[:]


def _dy_eff_kernel(dz_ref, y_ref, s1_ref, s2_ref, e_ref):
    e = (dz_ref[...].astype(jnp.float32) + s1_ref[0]
         + 2.0 * y_ref[...].astype(jnp.float32) * s2_ref[0])
    e_ref[...] = e.astype(e_ref.dtype)


def _add_stats_impl(ys, yu):
    a2, shp = _flat(ys)
    b2, _ = _flat(yu)
    n, lanes = a2.shape
    tn = _pick_tn(n, lanes)
    z, s = pl.pallas_call(
        _add_stats_kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
        ],
        out_specs=(pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
                   pl.BlockSpec((2, lanes), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n, lanes), ys.dtype),
                   jax.ShapeDtypeStruct((2, lanes), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((2, lanes), jnp.float32)],
        interpret=common.interpret_mode(),
    )(a2, b2)
    return z.reshape(shp), s[0], s[1]


def dy_eff_packed(dz, y, ds1, ds2):
    """e = dz + ds1 + 2·y·ds2 (per-lane vectors) as one packed-view
    kernel pass — the stats-cotangent combine, standalone."""
    d2, shp = _flat(dz)
    y2, _ = _flat(y)
    n, lanes = d2.shape
    tn = _pick_tn(n, lanes)
    e = pl.pallas_call(
        _dy_eff_kernel,
        grid=(n // tn,),
        in_specs=[
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
            pl.BlockSpec((1, lanes), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tn, lanes), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, lanes), dz.dtype),
        interpret=common.interpret_mode(),
    )(d2, y2, ds1.reshape(1, -1), ds2.reshape(1, -1))
    return e.reshape(shp)


@jax.custom_vjp
def add_stats_packed(ys, yu):
    """(z, Σz per lane, Σz² per lane) with z = ys + yu, all in-kernel."""
    return _add_stats_impl(ys, yu)


def _asp_fwd(ys, yu):
    z, s1, s2 = _add_stats_impl(ys, yu)
    return (z, s1, s2), z


def _asp_bwd(z, cots):
    dz, ds1, ds2 = cots
    e = dy_eff_packed(dz, z, ds1, ds2)
    return e, e


add_stats_packed.defvjp(_asp_fwd, _asp_bwd)
