"""bn_relu_packed (pallas) vs the jnp reference formulation: forward and
gradients (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu.pallas.packed_eltwise import bn_relu_packed


def _ref(yp, scale, shift, p):
    s_l = jnp.tile(scale, p)
    b_l = jnp.tile(shift, p)
    return jnp.maximum(yp.astype(jnp.float32) * s_l + b_l,
                       0.0).astype(yp.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("shape,p", [((2, 8, 8, 64), 4), ((1, 16, 4, 128), 4),
                                     ((3, 8, 2, 256), 8)])
def test_forward_matches_reference(shape, p, dtype):
    rng = np.random.RandomState(0)
    c = shape[-1] // p
    yp = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)
    scale = jnp.asarray(rng.randn(c).astype(np.float32))
    shift = jnp.asarray(rng.randn(c).astype(np.float32))
    out = bn_relu_packed(yp, scale, shift, p)
    ref = _ref(yp, scale, shift, p)
    assert out.dtype == yp.dtype
    # interpret mode may contract the mul+add into an FMA — 1-ulp f32
    # differences (which can flip a bf16 rounding), hence allclose.
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=1e-2 if dtype == jnp.bfloat16 else 1e-6, rtol=1e-5)


def test_gradients_match_ad():
    rng = np.random.RandomState(1)
    p, c = 4, 32
    yp = jnp.asarray(rng.randn(2, 8, 4, p * c).astype(np.float32))
    scale = jnp.asarray(rng.randn(c).astype(np.float32))
    shift = jnp.asarray(rng.randn(c).astype(np.float32))
    cot = jnp.asarray(rng.randn(2, 8, 4, p * c).astype(np.float32))

    def loss_k(y, s, b):
        return jnp.vdot(bn_relu_packed(y, s, b, p), cot)

    def loss_r(y, s, b):
        return jnp.vdot(_ref(y, s, b, p), cot)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(yp, scale, shift)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(yp, scale, shift)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_add_stats_matches_reference():
    from cl_tpu.pallas.packed_eltwise import add_stats_packed
    rng = np.random.RandomState(3)
    ys = jnp.asarray(rng.randn(2, 8, 4, 128).astype(np.float32))
    yu = jnp.asarray(rng.randn(2, 8, 4, 128).astype(np.float32))
    z, s1, s2 = add_stats_packed(ys, yu)
    zf = (ys + yu).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(z), np.asarray(ys + yu),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s1),
                               np.asarray(jnp.sum(zf, axis=(0, 1, 2))),
                               atol=1e-4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s2),
                               np.asarray(jnp.sum(zf * zf, axis=(0, 1, 2))),
                               atol=1e-4, rtol=1e-5)


def test_add_stats_grads_match_ad():
    from cl_tpu.pallas.packed_eltwise import add_stats_packed
    rng = np.random.RandomState(4)
    ys = jnp.asarray(rng.randn(1, 8, 4, 128).astype(np.float32))
    yu = jnp.asarray(rng.randn(1, 8, 4, 128).astype(np.float32))
    c1 = jnp.asarray(rng.randn(1, 8, 4, 128).astype(np.float32))
    c2 = jnp.asarray(rng.randn(128).astype(np.float32))
    c3 = jnp.asarray(rng.randn(128).astype(np.float32))

    def loss_k(a, b):
        z, s1, s2 = add_stats_packed(a, b)
        return jnp.vdot(z, c1) + jnp.vdot(s1, c2) + jnp.vdot(s2, c3)

    def loss_r(a, b):
        z = a + b
        zf = z.astype(jnp.float32)
        return (jnp.vdot(z, c1) + jnp.vdot(jnp.sum(zf, (0, 1, 2)), c2)
                + jnp.vdot(jnp.sum(zf * zf, (0, 1, 2)), c3))

    gk = jax.grad(loss_k, argnums=(0, 1))(ys, yu)
    gr = jax.grad(loss_r, argnums=(0, 1))(ys, yu)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-5)


def test_grad_bf16_storage():
    """bf16 activations: dy is bf16, vector cotangents stay f32."""
    rng = np.random.RandomState(2)
    p, c = 4, 32
    yp = jnp.asarray(rng.randn(1, 8, 4, p * c).astype(np.float32)
                     ).astype(jnp.bfloat16)
    scale = jnp.asarray(rng.randn(c).astype(np.float32))
    shift = jnp.asarray(rng.randn(c).astype(np.float32))

    def f(y, s, b):
        return jnp.sum(bn_relu_packed(y, s, b, p).astype(jnp.float32))

    dy, dsc, dsh = jax.grad(f, argnums=(0, 1, 2))(yp, scale, shift)
    assert dy.dtype == jnp.bfloat16
    assert dsc.dtype == jnp.float32 and dsh.dtype == jnp.float32
    assert np.isfinite(np.asarray(dsc)).all()
