"""k=2/s=2 transposed conv on lane-packed views — Pallas TPU kernel.

The no-overlap 2× upsample is one matmul per output-row parity: output
pixel (2h+a, 2w+b) = x[h, w] @ K[a, b] + bias (the spatially flipped
placement ``nn.ConvTranspose`` uses is handled in the weight packing by
the caller module, matching `models/unet.py::UpConv2x2`).  On packed
views [B,H,G_in,L_in] (L_in = p_in·C_in) each INPUT lane group covers
p_in columns → 2·p_in output columns, so with the consumer's packing
p_out the kernel writes output groups in-register when 2·p_in = m·p_out
for m ∈ {1, 2} — which holds at every UNet level — and the whole op is
TWO MXU dots per row tile against a block-structured packed weight
W'_a[(d, ci), (j₂, c)] = K[a, j₂ % 2, ci, c]·[d == j₂ // 2] (density
1/p_in), with no pixel-shuffle layout ops at all (the ~3.5 ms/step
transpose cost that sank the XLA-level matmul upconv, DESIGN.md §8).

Capability parity: ``nn.ConvTranspose(features, (2,2), strides=(2,2))``
(SURVEY.md §2.1 "UNet" Up path, §3.2); parameter tree handled by the
caller (kernel [2,2,Cin,Cout], bias [Cout]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common


def geometry(h, g_in, lanes_in, c_in, c_out, p_out):
    """Returns (p_in, g_out, lanes_out) or None if unsupported."""
    if lanes_in % c_in:
        return None
    p_in = lanes_in // c_in
    if 2 * p_in % p_out or (2 * p_in) // p_out not in (1, 2):
        return None
    lanes_out = p_out * c_out
    g_out = g_in * 2 * p_in // p_out
    if lanes_out % 128:
        return None
    return p_in, g_out, lanes_out


def pack_up_weights(k: jax.Array, p_in: int) -> jax.Array:
    """K[2,2,Cin,Cout] → W'[a][(d,ci),(j2,c)] stacked on a:
    [2, p_in·Cin, 2·p_in·Cout]."""
    kh, kw, c_in, c_out = k.shape
    assert kh == 2 and kw == 2
    w = jnp.zeros((2, p_in, c_in, 2 * p_in, c_out), k.dtype)
    for d in range(p_in):
        for b in range(2):
            w = w.at[:, d, :, 2 * d + b, :].set(k[:, b])
    return w.reshape(2, p_in * c_in, 2 * p_in * c_out)


def _fold_up_dw(dwp: jax.Array, p_in: int, c_in: int,
                c_out: int) -> jax.Array:
    """Inverse of pack_up_weights for the weight cotangent."""
    dwp = dwp.reshape(2, p_in, c_in, 2 * p_in, c_out)
    out = []
    for b in range(2):
        acc = dwp[:, 0, :, b, :]
        for d in range(1, p_in):
            acc = acc + dwp[:, d, :, 2 * d + b, :]
        out.append(acc)
    return jnp.stack(out, axis=1)  # [2,2,Cin,Cout]


def _pick_th(h, g_in, lanes_in, itemsize):
    th = min(h, max(1, 2048 // max(1, g_in)))
    while th >= 1:
        if h % th == 0:
            need = 6 * th * g_in * lanes_in * itemsize * 4
            if need <= 10 * 1024 * 1024:
                return th
        th -= 1
    return 0


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, *, th, g_in, lanes_in,
                g_out, lanes_out):
    v = x_ref[0].reshape(th * g_in, lanes_in)
    rows = []
    for a in range(2):
        d = jax.lax.dot_general(
            v, w_ref[a], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        d = d + b_ref[:]                      # [1, L2] broadcast
        rows.append(d.reshape(th, g_out, lanes_out))
    y_ref[0] = jnp.stack(rows, axis=1).reshape(
        2 * th, g_out, lanes_out).astype(y_ref.dtype)


def _dx_kernel(dy_ref, w_ref, dx_ref, *, th, g_in, lanes_in, g_out,
               lanes_out):
    l2 = g_out * lanes_out // g_in
    dy = dy_ref[0].reshape(th, 2, g_out, lanes_out)
    acc = None
    for a in range(2):
        da = dy[:, a].reshape(th * g_in, l2)
        d = jax.lax.dot_general(
            da, w_ref[a], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    dx_ref[0] = acc.reshape(th, g_in, lanes_in).astype(dx_ref.dtype)


def _dw_kernel(x_ref, dy_ref, dw_ref, db_ref, *, th, g_in,
               lanes_in, g_out, lanes_out):
    """Accumulates DIRECTLY into the constant-index out blocks (Mosaic
    keeps them VMEM-resident across the sequential grid) — a separate
    f32 scratch copy doubled scoped VMEM and overflowed the 16 MB stack
    at the deepest packed level's [2, L_in, L2] accumulator (b16)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    v = x_ref[0].reshape(th * g_in, lanes_in)
    dy = dy_ref[0].reshape(th, 2, g_out, lanes_out)
    l2 = g_out * lanes_out // g_in
    for a in range(2):
        da = dy[:, a].reshape(th * g_in, l2)
        dw_ref[a] += jax.lax.dot_general(
            v, da, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        db_ref[a:a + 1] += jnp.sum(da, axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def upconv2x2_packed(xp, wp, bias_l, dims):
    """Packed k2/s2 transposed conv.

    xp [B,H,G_in,L_in]; wp = pack_up_weights(K, p_in) [2, L_in, L2] with
    L2 = 2·p_in·C_out; bias_l = bias tiled to [L2]; dims = static
    (g_out, lanes_out) consumer view.  → [B, 2H, G_out, L_out]."""
    return _fwd_impl(xp, wp, bias_l, dims)


def _fwd_impl(xp, wp, bias_l, dims):
    g_out, lanes_out = dims
    b, h, g_in, lanes_in = xp.shape
    th = _pick_th(h, g_in, lanes_in, xp.dtype.itemsize)
    nh = h // th
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, g_in=g_in,
                          lanes_in=lanes_in, g_out=g_out,
                          lanes_out=lanes_out),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec((1, th, g_in, lanes_in), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(wp.shape, lambda i: (0, 0, 0)),
            pl.BlockSpec((1, wp.shape[-1]), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * th, g_out, lanes_out),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, 2 * th, g_out, lanes_out),
                                       xp.dtype),
        interpret=common.interpret_mode(),
        **common.vmem_cparams(),
    )(xp.reshape(b * nh, th, g_in, lanes_in), wp,
      bias_l.reshape(1, -1).astype(jnp.float32))
    return y.reshape(b, 2 * h, g_out, lanes_out)


def _vjp_fwd(xp, wp, bias_l, dims):
    return _fwd_impl(xp, wp, bias_l, dims), (xp, wp)


def _vjp_bwd(dims, res, dy):
    xp, wp = res
    g_out, lanes_out = dims
    b, h, g_in, lanes_in = xp.shape
    th = _pick_th(h, g_in, lanes_in, xp.dtype.itemsize)
    nh = h // th
    dy = dy.astype(xp.dtype)
    dy4 = dy.reshape(b * nh, 2 * th, g_out, lanes_out)
    dx = pl.pallas_call(
        functools.partial(_dx_kernel, th=th, g_in=g_in,
                          lanes_in=lanes_in, g_out=g_out,
                          lanes_out=lanes_out),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec((1, 2 * th, g_out, lanes_out),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec(wp.shape, lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, g_in, lanes_in),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b * nh, th, g_in, lanes_in),
                                       xp.dtype),
        interpret=common.interpret_mode(),
        **common.vmem_cparams(),
    )(dy4, wp)
    l2 = wp.shape[-1]
    dwp, dbl = pl.pallas_call(
        functools.partial(_dw_kernel, th=th, g_in=g_in,
                          lanes_in=lanes_in, g_out=g_out,
                          lanes_out=lanes_out),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec((1, th, g_in, lanes_in), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, 2 * th, g_out, lanes_out),
                         lambda i: (i, 0, 0, 0)),
        ],
        out_specs=(pl.BlockSpec((2, lanes_in, l2), lambda i: (0, 0, 0)),
                   pl.BlockSpec((2, l2), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((2, lanes_in, l2), jnp.float32),
                   jax.ShapeDtypeStruct((2, l2), jnp.float32)),
        interpret=common.interpret_mode(),
        **common.vmem_cparams(),
    )(xp.reshape(b * nh, th, g_in, lanes_in), dy4)
    dbias_l = (dbl[0] + dbl[1]).astype(jnp.float32)
    return (dx.reshape(b, h, g_in, lanes_in), dwp.astype(wp.dtype),
            dbias_l)


upconv2x2_packed.defvjp(_vjp_fwd, _vjp_bwd)
