"""Fused LwF knowledge-distillation loss kernel.

SURVEY.md §2.2: softmax-T + KL + ignore-mask fused per pixel tile —
one HBM pass over the two logit tensors instead of XLA materializing
log-softmax intermediates. Custom VJP: the backward is the closed form
T²/(n·T)·mask·(softmax(new)−softmax(old)) computed by a second fused
kernel (old logits are a frozen snapshot → no gradient).

Layout: [B,H,W,C] → [P, C] pixels×classes, the full (non-lane-multiple)
class dim per block with invalid classes masked to −1e9 (they drop out of
both softmaxes), P tiled in row blocks; sequential-grid scalar
accumulation; 1/T applied inside the kernel (no host-side logit copy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common

NEG_INF = -1e9
ROWS = 512  # pixel rows per grid step
LANES = 128


def _log_softmax(x):
    m = jnp.max(x, axis=-1, keepdims=True)
    s = x - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=-1, keepdims=True))


def _kd_kernel(new_ref, old_ref, valid_ref, pixmask_ref, invt_ref,
               out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    v = valid_ref[:]  # [1, C] f32 1/0
    inv_t = invt_ref[0, 0]
    new_m = jnp.where(v > 0, new_ref[:] * inv_t, NEG_INF)
    old_m = jnp.where(v > 0, old_ref[:] * inv_t, NEG_INF)
    ls_new = _log_softmax(new_m)
    ls_old = _log_softmax(old_m)
    p_old = jnp.exp(ls_old)
    kl = jnp.sum(p_old * (ls_old - ls_new), axis=-1, keepdims=True)  # [R,1]
    out_ref[0, 0] += jnp.sum(kl * pixmask_ref[:])


def _kd_grad_kernel(new_ref, old_ref, valid_ref, pixmask_ref, scale_ref,
                    invt_ref, out_ref):
    v = valid_ref[:]
    inv_t = invt_ref[0, 0]
    new_m = jnp.where(v > 0, new_ref[:] * inv_t, NEG_INF)
    old_m = jnp.where(v > 0, old_ref[:] * inv_t, NEG_INF)
    p_new = jnp.exp(_log_softmax(new_m))
    p_old = jnp.exp(_log_softmax(old_m))
    g = scale_ref[0, 0] * pixmask_ref[:] * (p_new - p_old)
    out_ref[:] = jnp.where(v > 0, g, 0.0)


def _prep(new_logits, old_logits, old_valid, labels, temperature,
          ignore_index):
    # NO class padding (HBM blowup — see ce_loss._prep) and NO host-side
    # /T (it would copy the full logit tensor): the kernel scales by the
    # inverse temperature from SMEM.
    C = new_logits.shape[-1]
    new2 = new_logits.astype(jnp.float32).reshape(-1, C)
    old2 = old_logits.astype(jnp.float32).reshape(-1, C)
    P = new2.shape[0]
    Pp = common.round_up(P, ROWS)
    if Pp != P:
        new2 = jnp.pad(new2, ((0, Pp - P), (0, 0)))
        old2 = jnp.pad(old2, ((0, Pp - P), (0, 0)))
    valid = old_valid.astype(jnp.float32)[None, :]
    pix = (labels.reshape(-1) != ignore_index).astype(jnp.float32)
    if Pp != P:
        pix = jnp.pad(pix, (0, Pp - P))
    inv_t = jnp.full((1, 1), 1.0 / temperature, jnp.float32)
    return new2, old2, valid, pix[:, None], inv_t, P, Pp, C


def _specs(Pp: int, Cp: int):
    row_spec = pl.BlockSpec((ROWS, Cp), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    valid_spec = pl.BlockSpec((1, Cp), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    pix_spec = pl.BlockSpec((ROWS, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    return row_spec, valid_spec, pix_spec, (Pp // ROWS,)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _kd(new_logits, old_logits, old_valid, labels, temperature,
        ignore_index):
    return _kd_impl(new_logits, old_logits, old_valid, labels, temperature,
                    ignore_index)[0]


def kd_loss(new_logits, old_logits, old_valid, labels, *, temperature,
            ignore_index=255):
    """T²·KL(softmax(old/T) ‖ softmax(new/T)) mean over non-ignored pixels.
    Same contract as ``cl_tpu.losses.kd_loss_jnp`` (tests assert equality)."""
    return _kd(new_logits, old_logits, old_valid, labels,
               float(temperature), int(ignore_index))


def _kd_impl(new_logits, old_logits, old_valid, labels, temperature,
             ignore_index):
    new2, old2, valid, pix, inv_t, P, Pp, Cp = _prep(
        new_logits, old_logits, old_valid, labels, temperature, ignore_index)
    row_spec, valid_spec, pix_spec, grid = _specs(Pp, Cp)
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    total = pl.pallas_call(
        _kd_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[row_spec, row_spec, valid_spec, pix_spec, smem1],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=common.interpret_mode(),
    )(new2, old2, valid, pix, inv_t)[0, 0]
    n = jnp.maximum(jnp.sum(pix), 1.0)
    t2 = temperature * temperature
    return t2 * total / n, n


def _kd_fwd(new_logits, old_logits, old_valid, labels, temperature,
            ignore_index):
    loss = _kd_impl(new_logits, old_logits, old_valid, labels,
                    temperature, ignore_index)[0]
    return loss, (new_logits, old_logits, old_valid, labels)


def _kd_bwd(temperature, ignore_index, res, g):
    new_logits, old_logits, old_valid, labels = res
    new2, old2, valid, pix, inv_t, P, Pp, Cp = _prep(
        new_logits, old_logits, old_valid, labels, temperature, ignore_index)
    row_spec, valid_spec, pix_spec, grid = _specs(Pp, Cp)
    n = jnp.maximum(jnp.sum(pix), 1.0)
    # d loss/d new_logits = (T²/n)·(1/T)·mask·(p_new − p_old) = (T/n)·…
    scale = jnp.full((1, 1), g, jnp.float32) * temperature / n
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dnew = pl.pallas_call(
        _kd_grad_kernel,
        out_shape=jax.ShapeDtypeStruct((Pp, Cp), jnp.float32),
        grid=grid,
        in_specs=[row_spec, row_spec, valid_spec, pix_spec, smem1, smem1],
        out_specs=row_spec,
        interpret=common.interpret_mode(),
    )(new2, old2, valid, pix, scale, inv_t)
    import numpy as np

    C = new_logits.shape[-1]
    dnew = dnew[:P, :C].reshape(new_logits.shape).astype(new_logits.dtype)
    # old logits are stop-gradient state (zero cotangent, DCE'd); bool/int
    # primals take float0 cotangents.
    return (dnew, jnp.zeros_like(old_logits),
            np.zeros(old_valid.shape, jax.dtypes.float0),
            np.zeros(labels.shape, jax.dtypes.float0))


_kd.defvjp(_kd_fwd, _kd_bwd)
