"""Per-level rematerialization (train.remat → nn.remat on every UNet
level) is a scheduling transform, not an arithmetic one: forward logits
and parameter gradients must be IDENTICAL with and without it, on both
the standard and the packed body (DESIGN.md §8 round 4c — the knob that
fits batch-9 512² training in one 16 GB chip under the 2026-08-21
relay compile generation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu.models.unet import UNet, init_variables, packed_prefix


@pytest.mark.parametrize("packed", [False, True])
def test_remat_is_identity(packed):
    kw = dict(num_classes=5, base_channels=32, depth=2, packed=packed)
    if packed:
        assert packed_prefix(32, 32, 2, 4) > 0
    m0 = UNet(**kw)
    m1 = UNet(**kw, remat=True)
    vs = init_variables(m0, jax.random.PRNGKey(0), 32, 1)
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(1, 32, 32, 3).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(m0.apply(vs, x, train=False)),
        np.asarray(m1.apply(vs, x, train=False)))

    def loss(m):
        def f(p):
            out, ms = m.apply({**vs, "params": p}, x, train=True,
                              mutable=["batch_stats"])
            return jnp.sum(out ** 2), ms
        return f

    g0, ms0 = jax.grad(loss(m0), has_aux=True)(vs["params"])
    g1, ms1 = jax.grad(loss(m1), has_aux=True)(vs["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # batch_stats updates identical too (remat re-runs BN stat math
    # bit-identically)
    for a, b in zip(jax.tree.leaves(ms0), jax.tree.leaves(ms1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_remat_with_int8_act():
    """remat composes with int8 saved-activation storage (the combined
    memory mode): grads match the unrematted int8 model exactly."""
    kw = dict(num_classes=5, base_channels=32, depth=2, packed=True,
              act_q=True)
    m0 = UNet(**kw)
    m1 = UNet(**kw, remat=True)
    vs = init_variables(m0, jax.random.PRNGKey(0), 32, 1)
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(1, 32, 32, 3).astype(np.float32))

    def loss(m):
        def f(p):
            out, _ = m.apply({**vs, "params": p}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return f

    g0 = jax.grad(loss(m0))(vs["params"])
    g1 = jax.grad(loss(m1))(vs["params"])
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
