"""Packed-domain DoubleConv vs the standard XLA path (interpret on CPU).

The packed level (models/unet.py: DoubleConv._packed) runs conv → BN →
ReLU → conv → BN → ReLU entirely on lane-packed views with an analytic
custom-VJP BatchNorm.  These tests pin: identical variable trees, forward
parity train AND eval, running-stats updates, and the analytic BN
gradient against AD through the reference formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu.models.unet import DoubleConv, packed_level_geometry


def _rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
    ).astype(dtype)


def _build(conv_impl, features, x):
    m = DoubleConv(features, norm="batch", conv_impl=conv_impl)
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    return m, vs


@pytest.mark.parametrize("c_in,features,w", [(32, 32, 64), (64, 64, 64),
                                             (64, 32, 64)])
def test_packed_level_matches_xla(c_in, features, w):
    x = _rand((1, 16, w, c_in), seed=1)
    assert packed_level_geometry(16, w, c_in, features, "v3") is not None
    m_x, vs = _build("xla", features, x)
    m_p, vs_p = _build("v3", features, x)
    # identical variable trees (checkpoint compatibility)
    assert jax.tree_util.tree_structure(vs) \
        == jax.tree_util.tree_structure(vs_p)
    for a, b in zip(jax.tree.leaves(vs), jax.tree.leaves(vs_p)):
        assert a.shape == b.shape

    # eval-mode forward parity (running stats path)
    ex = m_x.apply(vs, x, train=False)
    ep = m_p.apply(vs, x, train=False)
    np.testing.assert_allclose(ep, ex, atol=1e-4, rtol=1e-4)

    # train-mode forward + batch_stats update parity
    ox, sx = m_x.apply(vs, x, train=True, mutable=["batch_stats"])
    op, sp = m_p.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(op, ox, atol=1e-4, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(sx), jax.tree.leaves(sp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-5, rtol=1e-5)


def test_packed_level_grads_match_ad():
    """The analytic BN VJP (incl. the μ/σ² paths) against plain AD."""
    x = _rand((2, 16, 64, 32), seed=2)
    m_x, vs = _build("xla", 32, x)
    m_p, _ = _build("v3", 32, x)
    cot = _rand((2, 16, 64, 32), seed=3)

    def loss(m):
        def f(params, x):
            out, _ = m.apply({**vs, "params": params}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out * cot)
        return f

    gx = jax.grad(loss(m_x), argnums=(0, 1))(vs["params"], x)
    gp = jax.grad(loss(m_p), argnums=(0, 1))(vs["params"], x)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), atol=2e-3, rtol=1e-3), gx, gp)


def test_packed_gate_rejects_nonuniform_or_unsupported():
    # RGB stem: conv0 unsupported -> whole level falls back
    assert packed_level_geometry(64, 64, 3, 32, "v3") is None
    # group-norm levels never take the packed path (routed in DoubleConv)
    x = _rand((1, 16, 64, 32), seed=4)
    m = DoubleConv(32, norm="group", conv_impl="v3")
    vs = m.init(jax.random.PRNGKey(0), x, train=False)
    m_ref = DoubleConv(32, norm="group", conv_impl="xla")
    # group-norm path with v3 still routes per-conv kernels; outputs match
    out_v = m.apply(vs, x, train=True)
    out_x = m_ref.apply(vs, x, train=True)
    np.testing.assert_allclose(out_v, out_x, atol=1e-4, rtol=1e-4)


def test_packed_level_bf16():
    x = _rand((1, 16, 64, 32), jnp.bfloat16, seed=5)
    m_x = DoubleConv(32, norm="batch", conv_impl="xla", dtype=jnp.bfloat16)
    m_p = DoubleConv(32, norm="batch", conv_impl="v3", dtype=jnp.bfloat16)
    vs = m_x.init(jax.random.PRNGKey(0), x, train=False)
    ox, _ = m_x.apply(vs, x, train=True, mutable=["batch_stats"])
    op, _ = m_p.apply(vs, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(op.astype(jnp.float32),
                               ox.astype(jnp.float32), atol=5e-2, rtol=5e-2)
