"""Compiled-on-chip gate for the r5 dx software-pipeline variant
(CL_TPU_DX_PIPE): bit-identical gradients vs the two-phase kernel.

Run with:  CL_TPU_TESTS=1 python -m pytest tests/tpu/test_dx_pipe.py -q
"""

from __future__ import annotations

import os

import numpy as np
import pytest

if os.environ.get("CL_TPU_TESTS") != "1":
    pytest.skip("real-TPU suite; set CL_TPU_TESTS=1",
                allow_module_level=True)

import jax
import jax.numpy as jnp

from cl_tpu.pallas import conv3x3_v3 as pc3


@pytest.mark.parametrize("prologue", [True, False])
def test_dx_pipe_bitexact(monkeypatch, prologue):
    rng = np.random.RandomState(0)
    b, h, wg, cin, cout, p = 2, 64, 32, 32, 32, 4
    lanes = p * cin
    xp = jnp.asarray(rng.randn(b, h, wg, lanes), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, cin, cout), jnp.float32)
    a = jnp.asarray(rng.rand(lanes) + 0.5, jnp.float32)
    bb = jnp.asarray(rng.randn(lanes), jnp.float32)

    def f(xp, w):
        y, s1, s2 = pc3.conv_bn_fused(xp, w, a, bb, p, prologue)
        return ((y.astype(jnp.float32) ** 2).sum() + (s1 * s1).sum()
                + s2.astype(jnp.float32).sum())

    def grads(pipe: bool):
        monkeypatch.setattr(pc3, "_DX_PIPE", pipe)
        g = jax.jit(jax.grad(f, argnums=(0, 1)))(xp, w)
        return [np.asarray(x, np.float32) for x in jax.device_get(g)]

    ref = grads(False)
    got = grads(True)
    for r, g in zip(ref, got):
        np.testing.assert_array_equal(r, g)
