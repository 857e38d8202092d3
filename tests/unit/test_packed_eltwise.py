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
