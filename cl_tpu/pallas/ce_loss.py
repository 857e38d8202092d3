"""Fused masked softmax cross-entropy kernel.

The per-step CE at 512² touches an [B,512,512,C] f32 logit tensor several
times in the jnp path (mask, logsumexp, gather, reduce). This kernel does
mask → logsumexp → label-pick → ignore-mask → reduce in ONE pass per pixel
tile, with the closed-form backward (softmax − one-hot)·mask/n as a second
fused kernel (custom VJP). Same contract and arithmetic as
``cl_tpu.losses.cross_entropy`` (oracle-equality tested).
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
ROWS = 512
LANES = 128


def _ce_kernel(x_ref, valid_ref, label_ref, pixmask_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    v = valid_ref[:]                                   # [1, C] 1/0
    x = jnp.where(v > 0, x_ref[:], NEG_INF)            # [R, C]
    m = jnp.max(x, axis=-1, keepdims=True)
    logz = m + jnp.log(jnp.sum(jnp.exp(x - m), axis=-1, keepdims=True))
    C = x.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    picked = jnp.sum(jnp.where(col == label_ref[:], x, 0.0), axis=-1,
                     keepdims=True)
    out_ref[0, 0] += jnp.sum((logz - picked) * pixmask_ref[:])


def _ce_grad_kernel(x_ref, valid_ref, label_ref, pixmask_ref, scale_ref,
                    out_ref):
    v = valid_ref[:]
    x = jnp.where(v > 0, x_ref[:], NEG_INF)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    onehot = (col == label_ref[:]).astype(jnp.float32)
    g = scale_ref[0, 0] * pixmask_ref[:] * (p - onehot)
    out_ref[:] = jnp.where(v > 0, g, 0.0)


def _prep(logits, labels, valid_classes, ignore_index):
    # NO class-dim padding: a block may span the full (non-lane-multiple)
    # class dim; padding C to 128 in HBM would blow activations up by
    # 128/C (1.6 GB temps at 512², 19 classes). Rows pad only when P isn't
    # a ROWS multiple (it is for all power-of-two image sizes).
    C = logits.shape[-1]
    x = logits.astype(jnp.float32).reshape(-1, C)
    P = x.shape[0]
    Pp = common.round_up(P, ROWS)
    if Pp != P:
        x = jnp.pad(x, ((0, Pp - P), (0, 0)))
    valid = valid_classes.astype(jnp.float32)[None, :]
    lbl = labels.reshape(-1).astype(jnp.int32)
    pix = (lbl != ignore_index).astype(jnp.float32)
    lbl = jnp.where(lbl == ignore_index, 0, lbl)
    if Pp != P:
        lbl = jnp.pad(lbl, (0, Pp - P))
        pix = jnp.pad(pix, (0, Pp - P))
    return x, valid, lbl[:, None], pix[:, None], P, Pp, C


def _specs(Pp, Cp):
    row = pl.BlockSpec((ROWS, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((1, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    col1 = pl.BlockSpec((ROWS, 1), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return row, vs, col1, (Pp // ROWS,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ce(logits, labels, valid_classes, ignore_index):
    return _ce_impl(logits, labels, valid_classes, ignore_index)


def _ce_impl(logits, labels, valid_classes, ignore_index):
    x, valid, lbl, pix, P, Pp, Cp = _prep(logits, labels, valid_classes,
                                          ignore_index)
    row, vs, col1, grid = _specs(Pp, Cp)
    total = pl.pallas_call(
        _ce_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[row, vs, col1, col1],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=common.interpret_mode(),
    )(x, valid, lbl, pix)[0, 0]
    n = jnp.maximum(jnp.sum(pix), 1.0)
    return total / n


def _ce_fwd(logits, labels, valid_classes, ignore_index):
    return (_ce_impl(logits, labels, valid_classes, ignore_index),
            (logits, labels, valid_classes))


def _ce_bwd(ignore_index, res, g):
    logits, labels, valid_classes = res
    x, valid, lbl, pix, P, Pp, Cp = _prep(logits, labels, valid_classes,
                                          ignore_index)
    row, vs, col1, grid = _specs(Pp, Cp)
    n = jnp.maximum(jnp.sum(pix), 1.0)
    scale = jnp.full((1, 1), g, jnp.float32) / n
    dx = pl.pallas_call(
        _ce_grad_kernel,
        out_shape=jax.ShapeDtypeStruct((Pp, Cp), jnp.float32),
        grid=grid,
        in_specs=[row, vs, col1, col1,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=row,
        interpret=common.interpret_mode(),
    )(x, valid, lbl, pix, scale)
    C = logits.shape[-1]
    dx = dx[:P, :C].reshape(logits.shape).astype(logits.dtype)
    return (dx, np.zeros(labels.shape, jax.dtypes.float0),
            np.zeros(valid_classes.shape, jax.dtypes.float0))


_ce.defvjp(_ce_fwd, _ce_bwd)


def cross_entropy(logits, labels, valid_classes, *, ignore_index=255):
    """Fused variant of ``cl_tpu.losses.cross_entropy`` (same return:
    (mean NLL over non-ignored pixels, n_valid_pixels))."""
    loss = _ce(logits, labels, valid_classes, int(ignore_index))
    n = jnp.maximum((labels != ignore_index).sum().astype(jnp.float32), 1.0)
    return loss, n
