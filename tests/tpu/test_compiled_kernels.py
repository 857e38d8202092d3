"""Compiled-kernel tests on the real TPU chip (SURVEY.md §4.4).

Run with:  CL_TPU_TESTS=1 python -m pytest tests/tpu/ -q
The default CPU suite skips these (kernels are covered there in interpret
mode by tests/unit/test_pallas.py).
"""

import os

import pytest

if os.environ.get("CL_TPU_TESTS") != "1":
    pytest.skip("real-TPU suite; set CL_TPU_TESTS=1", allow_module_level=True)

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() != "tpu":
    pytest.skip("no TPU backend", allow_module_level=True)

from cl_tpu import losses
from cl_tpu.methods import ewc as ewc_lib
from cl_tpu.pallas import ewc_fused, kd_loss as kd_pallas


def test_ewc_penalty_compiled():
    rng = np.random.RandomState(0)
    params = {"a": jnp.asarray(rng.randn(300, 300).astype(np.float32)),
              "b": jnp.asarray(rng.randn(77).astype(np.float32))}
    anchor = jax.tree.map(lambda p: p + 0.1, params)
    fisher = jax.tree.map(jnp.abs, params)
    state = ewc_lib.EWCState(anchor=anchor, fisher=fisher,
                             weight=jnp.float32(1.0), n_tasks=jnp.int32(1))
    ref = ewc_lib.penalty(params, state, mode="online")
    got = jax.jit(lambda p: ewc_fused.penalty(p, state, mode="online"))(
        params)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    g_ref = jax.grad(lambda p: ewc_lib.penalty(p, state, mode="online"))(
        params)
    g_got = jax.jit(jax.grad(
        lambda p: ewc_fused.penalty(p, state, mode="online")))(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_kd_loss_compiled():
    rng = np.random.RandomState(1)
    new = jnp.asarray(rng.randn(2, 64, 64, 21).astype(np.float32))
    old = jnp.asarray(rng.randn(2, 64, 64, 21).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 21, size=(2, 64, 64)).astype(np.int32))
    valid = jnp.asarray(np.arange(21) < 11)
    ref = losses.kd_loss_jnp(new, old, valid, labels, temperature=2.0)
    got = jax.jit(lambda a, b: kd_pallas.kd_loss(
        a, b, valid, labels, temperature=2.0))(new, old)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)

    g_ref = jax.grad(lambda x: losses.kd_loss_jnp(
        x, old, valid, labels, temperature=2.0))(new)
    g_got = jax.jit(jax.grad(lambda x: kd_pallas.kd_loss(
        x, old, valid, labels, temperature=2.0)))(new)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-5)


def test_sq_accumulate_compiled():
    rng = np.random.RandomState(2)
    acc = {"w": jnp.zeros((500, 70), jnp.float32)}
    g = {"w": jnp.asarray(rng.randn(500, 70).astype(np.float32))}
    got = jax.jit(ewc_fused.sq_accumulate)(acc, g)
    np.testing.assert_allclose(np.asarray(got["w"]),
                               np.asarray(g["w"]) ** 2, rtol=1e-6)


def test_augment_compiled():
    from cl_tpu import augment as augment_jnp_lib
    from cl_tpu.pallas import augment as augment_pallas

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randint(0, 256, size=(4, 160, 160, 3),
                                  dtype=np.uint8))
    mask = jnp.asarray(rng.randint(0, 21, size=(4, 160, 160)).astype(np.int32))
    flip = jnp.asarray(np.array([True, False, True, False]))
    kw = dict(out_size=128, mean=(0.485, 0.456, 0.406),
              std=(0.229, 0.224, 0.225), compute_dtype=jnp.float32)
    x_ref, y_ref = jax.jit(
        lambda *a: augment_jnp_lib.augment_jnp(*a, **kw))(img, mask, flip)
    x_got, y_got = jax.jit(
        lambda *a: augment_pallas.augment(*a, **kw))(img, mask, flip)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(x_ref),
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(y_got), np.asarray(y_ref))


def test_replay_gather_compiled():
    from cl_tpu.pallas import replay_gather

    rng = np.random.RandomState(9)
    buf = jnp.asarray(rng.randint(0, 256, size=(32, 64, 64, 3),
                                  dtype=np.uint8))
    idx = jnp.asarray(rng.randint(0, 32, size=6).astype(np.int32))
    got = jax.jit(replay_gather.gather)(buf, idx)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(buf)[np.asarray(idx)])


def test_ce_loss_compiled():
    from cl_tpu.pallas import ce_loss as ce_pallas

    rng = np.random.RandomState(13)
    logits = jnp.asarray(rng.randn(2, 64, 64, 19).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 19, size=(2, 64, 64)).astype(np.int32))
    valid = jnp.asarray(np.arange(19) < 10)
    ref, _ = losses.cross_entropy(logits, labels, valid)
    got, _ = jax.jit(lambda x: ce_pallas.cross_entropy(x, labels, valid))(
        logits)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-4)
    g_ref = jax.grad(lambda x: losses.cross_entropy(x, labels, valid)[0])(
        logits)
    g_got = jax.jit(jax.grad(
        lambda x: ce_pallas.cross_entropy(x, labels, valid)[0]))(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-5)
