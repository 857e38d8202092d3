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


def flatten_f32(tree) -> jax.Array:
    """Concatenate all leaves into one f32 vector (differentiable)."""
    leaves = jax.tree.leaves(tree)
    return jnp.concatenate([l.astype(jnp.float32).ravel() for l in leaves])


def pad_to(v: jax.Array, n: int, value: float = 0.0) -> jax.Array:
    return jnp.pad(v, (0, n - v.shape[0]), constant_values=value)
