"""Fused EWC kernels over the flattened parameter vector.

The reference computes the EWC penalty as a Python loop over
``model.parameters()`` (BASELINE.json:5, SURVEY.md §3.3); the fused-kernel
obligation (SURVEY.md §2.2) replaces it with:

  * ``penalty_flat`` — one Pallas pass computing Σ F_i (θ_i − θ*_i)² over
    the whole flattened vector, VMEM-chunked, sequential-grid accumulation
    into a single scalar. Custom VJP so the backward (F·(θ−θ*), the hot
    per-step gradient contribution) is a single elementwise kernel instead
    of XLA re-deriving it leaf by leaf.
  * ``sq_accumulate`` — the Fisher pass's fused acc += g² (f32 always —
    g² underflows in bf16, SURVEY.md §7).

Chunk size 64·1024 f32 = 256 KB/operand → 3 operands ≈ 0.75 MB VMEM per
grid step, far under the ~16 MB budget; the grid walks the vector
sequentially so accumulation into the (1,1) output block is safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.methods import ewc as ewc_lib
from cl_tpu.pallas import common

CHUNK = 64 * 1024  # f32 elements per grid step
LANES = 128


def _penalty_kernel(theta_ref, anchor_ref, fisher_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    d = theta_ref[:] - anchor_ref[:]
    out_ref[0, 0] += jnp.sum(fisher_ref[:] * d * d)


def _grad_kernel(theta_ref, anchor_ref, fisher_ref, g_ref, out_ref):
    out_ref[:] = g_ref[0, 0] * fisher_ref[:] * (theta_ref[:] - anchor_ref[:])


def _rows(n_padded: int) -> int:
    return n_padded // LANES


def _chunk_spec(rows_total: int):
    rows = min(rows_total, CHUNK // LANES)
    return rows, pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)


@jax.custom_vjp
def penalty_flat(theta: jax.Array, anchor: jax.Array,
                 fisher: jax.Array) -> jax.Array:
    """Σ F (θ−θ*)² over flat f32 vectors (padding must carry F=0)."""
    return _penalty_impl(theta, anchor, fisher)


def _penalty_impl(theta, anchor, fisher):
    n = theta.shape[0]
    rows_total = _rows(n)
    rows, spec = _chunk_spec(rows_total)
    grid = (pl.cdiv(rows_total, rows),)
    shaped = [v.reshape(rows_total, LANES) for v in (theta, anchor, fisher)]
    out = pl.pallas_call(
        _penalty_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        interpret=common.interpret_mode(),
    )(*shaped)
    return out[0, 0]


def _penalty_fwd(theta, anchor, fisher):
    return _penalty_impl(theta, anchor, fisher), (theta, anchor, fisher)


def _penalty_bwd(res, g):
    theta, anchor, fisher = res
    n = theta.shape[0]
    rows_total = _rows(n)
    rows, spec = _chunk_spec(rows_total)
    grid = (pl.cdiv(rows_total, rows),)
    shaped = [v.reshape(rows_total, LANES) for v in (theta, anchor, fisher)]
    dtheta = pl.pallas_call(
        _grad_kernel,
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=spec,
        interpret=common.interpret_mode(),
    )(*shaped, jnp.full((1, 1), 2.0 * g, jnp.float32))
    # d/dθ [F(θ−a)²] = 2F(θ−a). anchor/fisher are frozen state; their zero
    # cotangents are DCE'd by XLA (grad is only taken w.r.t. params).
    return (dtheta.reshape(n), jnp.zeros_like(anchor),
            jnp.zeros_like(fisher))


penalty_flat.defvjp(_penalty_fwd, _penalty_bwd)


# ---------------------------------------------------------------------------
# Public API mirroring cl_tpu.methods.ewc.penalty
# ---------------------------------------------------------------------------


def penalty(params, state: ewc_lib.EWCState, *, mode: str) -> jax.Array:
    """(1/2)·weight·Σ F (θ−θ*)², fused. Same contract as the tree-map
    version (tests/unit/test_pallas.py asserts equality)."""
    theta = common.flatten_f32(params)
    n_pad = common.round_up(theta.shape[0], CHUNK)
    theta_p = common.pad_to(theta, n_pad)
    if mode == "online":
        anchor = common.pad_to(common.flatten_f32(state.anchor), n_pad)
        fisher = common.pad_to(common.flatten_f32(state.fisher), n_pad)
        total = penalty_flat(theta_p, anchor, fisher)
    else:  # separate: leading [T] axis on every leaf; sum per-task penalties
        anchors = _flatten_stacked(state.anchor, n_pad)
        fishers = _flatten_stacked(state.fisher, n_pad)
        total = jnp.float32(0.0)
        for t in range(anchors.shape[0]):  # T<=5, statically unrolled
            total = total + penalty_flat(theta_p, anchors[t], fishers[t])
    return 0.5 * state.weight * total


def _flatten_stacked(tree, n_pad: int) -> jax.Array:
    """[T, n_pad] from a pytree whose leaves have a leading task axis."""
    leaves = jax.tree.leaves(tree)
    T = leaves[0].shape[0]
    flat = jnp.concatenate(
        [l.astype(jnp.float32).reshape(T, -1) for l in leaves], axis=1)
    return jnp.pad(flat, ((0, 0), (0, n_pad - flat.shape[1])))


# ---------------------------------------------------------------------------
# Fisher pass: fused acc += g²
# ---------------------------------------------------------------------------


def _sq_acc_kernel(acc_ref, g_ref, out_ref):
    g = g_ref[:].astype(jnp.float32)
    out_ref[:] = acc_ref[:] + g * g


def sq_accumulate_flat(acc: jax.Array, g: jax.Array) -> jax.Array:
    """acc + g² over flat f32 vectors, one fused pass (aliased in-place)."""
    n = acc.shape[0]
    rows_total = _rows(n)
    rows, spec = _chunk_spec(rows_total)
    grid = (pl.cdiv(rows_total, rows),)
    out = pl.pallas_call(
        _sq_acc_kernel,
        out_shape=jax.ShapeDtypeStruct((rows_total, LANES), jnp.float32),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        input_output_aliases={0: 0},
        interpret=common.interpret_mode(),
    )(acc.reshape(rows_total, LANES), g.reshape(rows_total, LANES))
    return out.reshape(n)


def sq_accumulate(acc_tree, grads_tree):
    """Tree-level wrapper: flatten grads once, accumulate fused, unflatten.

    ``acc_tree`` leaves must be f32 and structure-match ``grads_tree``.
    """
    flat_acc = common.flatten_f32(acc_tree)
    flat_g = common.flatten_f32(grads_tree)
    n_pad = common.round_up(flat_acc.shape[0], CHUNK)
    out = sq_accumulate_flat(common.pad_to(flat_acc, n_pad),
                             common.pad_to(flat_g, n_pad))[:flat_acc.shape[0]]
    return _unflatten_like(out, acc_tree)


def _unflatten_like(flat: jax.Array, tree):
    leaves, treedef = jax.tree.flatten(tree)
    out, off = [], 0
    for l in leaves:
        out.append(flat[off:off + l.size].reshape(l.shape))
        off += l.size
    return jax.tree.unflatten(treedef, out)
