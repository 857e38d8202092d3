"""Shared Pallas helpers: platform gating, flattening, padding."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def interpret_mode() -> bool:
    """Pallas kernels compile only for TPU; on CPU (tests, virtual meshes)
    run them through the interpreter so the ``use_pallas`` path stays
    exercisable everywhere (SURVEY.md §4.1 kernel test strategy)."""
    return jax.default_backend() != "tpu"


def round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def vmem_cparams(limit: int = 100 * 1024 * 1024) -> dict:
    """`compiler_params` raising Mosaic's scoped-VMEM stack ceiling
    above its 16 MB default (v5e has 128 MB VMEM/core).  The conv
    kernels have always passed this (conv3x3_v3._cparams); the other
    packed kernels ran at the default — which is what made conv
    budgets >20 MB fail compile: a larger `CL_TPU_CONV_BUDGET` shifts
    the deepest level's packing, and the upconv fwd kernel's
    VMEM-resident weight block ([2, L_in, L2] bf16 ≈ 16.8 MB at the
    512² deepest level) then overflows the DEFAULT stack even though
    the chip has headroom.  Interpret mode (CPU tests) ignores it."""
    from jax.experimental.pallas import tpu as pltpu
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=limit)}


def dot_precision(dtype):
    """Precision for dots whose contract is EXACT routing/summation of
    the operand bits. TPU default matmul precision truncates f32
    operands to bf16 before the MXU multiply — fine for bf16 operands
    (already exact with f32 accumulation) but silently lossy for f32
    (caught compiled-on-chip: pool routing off by ~4e-3 relative vs the
    select_and_scatter oracle). HIGHEST decomposes f32 into bf16 passes
    whose f32-accumulated sum reproduces the operand exactly when the
    other factor is an exact 0/1 or ones matrix."""
    return (jax.lax.Precision.HIGHEST
            if jnp.dtype(dtype).itemsize >= 4
            else jax.lax.Precision.DEFAULT)


def flatten_f32(tree) -> jax.Array:
    """Concatenate all leaves into one f32 vector (differentiable)."""
    leaves = jax.tree.leaves(tree)
    return jnp.concatenate([l.astype(jnp.float32).ravel() for l in leaves])


def pad_to(v: jax.Array, n: int, value: float = 0.0) -> jax.Array:
    return jnp.pad(v, (0, n - v.shape[0]), constant_values=value)


def colsum(m: jax.Array) -> jax.Array:
    """[R, L] → [1, L] column sum VIA THE MXU (ones-vector matmul).

    In-kernel ``jnp.sum(x, axis=0)`` lowers to a cross-sublane VPU tree
    reduce — measured ~3 ms for a 512² stats epilogue pass vs ~0.5 ms
    HBM floor.  A [1,R]@[R,L] dot does the same reduction on the MXU at
    negligible cost (R·L MACs)."""
    ones = jnp.ones((1, m.shape[0]), jnp.float32)
    return jax.lax.dot_general(
        ones, m.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_precision(m.dtype))
