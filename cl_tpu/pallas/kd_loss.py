"""Fused LwF knowledge-distillation loss kernel (class-major layout).

SURVEY.md §2.2: softmax-T + KL + ignore-mask fused per pixel tile —
one HBM pass over the two logit tensors instead of XLA materializing
log-softmax intermediates. Custom VJP: the backward is the closed form
T²/(n·T)·mask·(softmax(new)−softmax(old)) computed by a second fused
kernel (old logits are a frozen snapshot → no gradient).

Layout mirrors ``cl_tpu.pallas.ce_loss``: Pallas operands get a forced
row-major (8,128)-tiled layout, so pixels×classes [P, C] would lane-pad
C→128 (6.7× HBM traffic at 19 classes) and per-pixel [P, 1] side inputs
would pad 128×. Both logit tensors therefore enter CLASS-MAJOR [C, P]
(classes on sublanes, pixels dense on lanes), labels enter as one
s32[1, P] row, and the ignore mask is computed in-kernel; 1/T is applied
inside the kernel from SMEM (no host-side logit copy)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.pallas import common

NEG_INF = -1e9
LANES = 128
BP = 8192  # pixels (lanes) per grid step


def _log_softmax0(x):
    m = jnp.max(x, axis=0, keepdims=True)
    s = x - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=0, keepdims=True))


def _kd_kernel(ignore_index, new_ref, old_ref, lbl_ref, valid_ref,
               invt_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    v = valid_ref[:]  # [C, 1] f32 1/0
    inv_t = invt_ref[0, 0]
    new_m = jnp.where(v > 0, new_ref[:].astype(jnp.float32) * inv_t,
                      NEG_INF)  # [C, BP]
    old_m = jnp.where(v > 0, old_ref[:].astype(jnp.float32) * inv_t,
                      NEG_INF)
    ls_new = _log_softmax0(new_m)
    ls_old = _log_softmax0(old_m)
    p_old = jnp.exp(ls_old)
    kl = jnp.sum(p_old * (ls_old - ls_new), axis=0, keepdims=True)  # [1,BP]
    pix = (lbl_ref[:] != ignore_index).astype(jnp.float32)
    out_ref[0, 0] += jnp.sum(kl * pix)


def _kd_grad_kernel(ignore_index, new_ref, old_ref, lbl_ref, valid_ref,
                    scale_ref, invt_ref, out_ref):
    v = valid_ref[:]
    inv_t = invt_ref[0, 0]
    new_m = jnp.where(v > 0, new_ref[:].astype(jnp.float32) * inv_t,
                      NEG_INF)
    old_m = jnp.where(v > 0, old_ref[:].astype(jnp.float32) * inv_t,
                      NEG_INF)
    p_new = jnp.exp(_log_softmax0(new_m))
    p_old = jnp.exp(_log_softmax0(old_m))
    pix = (lbl_ref[:] != ignore_index).astype(jnp.float32)
    g = scale_ref[0, 0] * pix * (p_new - p_old)
    out_ref[:] = jnp.where(v > 0, g, 0.0).astype(out_ref.dtype)


def _prep(new_logits, old_logits, old_valid, labels, temperature,
          ignore_index):
    """[B,H,W,C] → class-major [C, Pp] ×2 + label row [1, Pp]; lane
    padding carries ignore_index labels so padded pixels contribute 0.
    Logit dtypes are PRESERVED (bf16 stays bf16 — half the operand
    traffic); kernels upcast to f32 in-register."""
    C = new_logits.shape[-1]
    new2 = new_logits.reshape(-1, C).T                      # [C, P]
    old2 = old_logits.reshape(-1, C).T
    P = new2.shape[1]
    bp = min(BP, common.round_up(P, LANES))
    Pp = common.round_up(P, bp)
    if Pp != P:
        new2 = jnp.pad(new2, ((0, 0), (0, Pp - P)))
        old2 = jnp.pad(old2, ((0, 0), (0, Pp - P)))
    lbl = labels.reshape(1, -1).astype(jnp.int32)
    if Pp != P:
        lbl = jnp.pad(lbl, ((0, 0), (0, Pp - P)),
                      constant_values=ignore_index)
    valid = old_valid.astype(jnp.float32)[:, None]  # [C, 1]
    inv_t = jnp.full((1, 1), 1.0 / temperature, jnp.float32)
    return new2, old2, lbl, valid, inv_t, P, Pp, bp, C


def _specs(Pp: int, C: int, bp: int):
    zs = pl.BlockSpec((C, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    ls = pl.BlockSpec((1, bp), lambda i: (0, i), memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return zs, ls, vs, (Pp // bp,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _kd_total(new_logits, old_logits, old_valid, labels, temperature,
              ignore_index):
    """UNNORMALIZED Σ per-pixel KL (at temperature T, before the T²/n
    factor) — normalization happens outside so the sharded variant can
    psum totals and counts independently."""
    return _kd_total_impl(new_logits, old_logits, old_valid, labels,
                          temperature, ignore_index)


def _n_pix(labels, ignore_index):
    return jnp.maximum(
        (labels != ignore_index).sum().astype(jnp.float32), 1.0)


def kd_loss(new_logits, old_logits, old_valid, labels, *, temperature,
            ignore_index=255):
    """T²·KL(softmax(old/T) ‖ softmax(new/T)) mean over non-ignored pixels.
    Same contract as ``cl_tpu.losses.kd_loss_jnp`` (tests assert equality).
    The T²/n factor is applied outside the custom VJP; AD feeds the grad
    kernel g·T²/n, matching the closed form (T/n)·mask·(p_new − p_old)."""
    t = float(temperature)
    total = _kd_total(new_logits, old_logits, old_valid, labels, t,
                      int(ignore_index))
    return t * t * total / _n_pix(labels, ignore_index)


def kd_loss_sharded(new_logits, old_logits, old_valid, labels, *, axis,
                    temperature, ignore_index=255):
    """Batch-sharded KD for use INSIDE ``jax.shard_map`` over ``axis``
    (see ``ce_loss.cross_entropy_sharded``). Returns the replicated
    global-mean loss."""
    t = float(temperature)
    total = _kd_total(new_logits, old_logits, old_valid, labels, t,
                      int(ignore_index))
    n_local = (labels != ignore_index).sum().astype(jnp.float32)
    total = jax.lax.psum(total, axis)
    n = jnp.maximum(jax.lax.psum(n_local, axis), 1.0)
    return t * t * total / n


def _kd_total_impl(new_logits, old_logits, old_valid, labels, temperature,
                   ignore_index):
    new2, old2, lbl, valid, inv_t, P, Pp, bp, C = _prep(
        new_logits, old_logits, old_valid, labels, temperature, ignore_index)
    zs, ls, vs, grid = _specs(Pp, C, bp)
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_kd_kernel, ignore_index),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[zs, zs, ls, vs, smem1],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=common.interpret_mode(),
    )(new2, old2, lbl, valid, inv_t)[0, 0]


def _kd_fwd(new_logits, old_logits, old_valid, labels, temperature,
            ignore_index):
    loss = _kd_total_impl(new_logits, old_logits, old_valid, labels,
                          temperature, ignore_index)
    return loss, (new_logits, old_logits, old_valid, labels)


def _kd_bwd(temperature, ignore_index, res, g):
    import numpy as np

    new_logits, old_logits, old_valid, labels = res
    new2, old2, lbl, valid, inv_t, P, Pp, bp, C = _prep(
        new_logits, old_logits, old_valid, labels, temperature, ignore_index)
    zs, ls, vs, grid = _specs(Pp, C, bp)
    # d total/d new_logits = (1/T)·mask·(p_new − p_old); the outer T²/n
    # arrives through g.
    scale = jnp.full((1, 1), g, jnp.float32) / temperature
    smem1 = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    dnew = pl.pallas_call(
        functools.partial(_kd_grad_kernel, ignore_index),
        # grad buffer in the logit dtype (see ce_loss._ce_bwd).
        out_shape=jax.ShapeDtypeStruct((C, Pp), new_logits.dtype),
        grid=grid,
        in_specs=[zs, zs, ls, vs, smem1, smem1],
        out_specs=zs,
        interpret=common.interpret_mode(),
    )(new2, old2, lbl, valid, scale, inv_t)
    dnew = dnew[:, :P].T.reshape(new_logits.shape).astype(new_logits.dtype)
    # old logits are stop-gradient state (zero cotangent, DCE'd); bool/int
    # primals take float0 cotangents.
    return (dnew, jnp.zeros_like(old_logits),
            np.zeros(old_valid.shape, jax.dtypes.float0),
            np.zeros(labels.shape, jax.dtypes.float0))


_kd_total.defvjp(_kd_fwd, _kd_bwd)
