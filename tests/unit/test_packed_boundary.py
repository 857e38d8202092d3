"""Packed-domain boundary kernels vs lax oracles (interpret on CPU):
2×2 max pool (pool_pack) and k2/s2 transposed conv (upconv_pack).

These run between packed levels in the packed UNet; parity targets are
``nn.max_pool`` (with select_and_scatter's first-max gradient routing)
and ``nn.ConvTranspose`` semantics (flipped-kernel placement, bias).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu.pallas import pool_pack, upconv_pack


def _rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
    ).astype(dtype)


def _pool_oracle(x):
    import flax.linen as nn
    return nn.max_pool(x, (2, 2), strides=(2, 2))


@pytest.mark.parametrize("p,c,g,h", [(4, 32, 16, 8), (2, 64, 16, 8),
                                     (1, 128, 16, 8)])
def test_pool_forward_matches(p, c, g, h):
    b, lanes = 2, p * c
    w = g * p
    x = _rand((b, h, w, c), seed=1)
    xp = x.reshape(b, h, g, lanes)
    assert pool_pack.supported(h, g, lanes, c, 4)
    yp = pool_pack.maxpool2x2_packed(xp, c)
    assert yp.shape == (b, h // 2, g // 2, lanes)
    want = _pool_oracle(x)
    np.testing.assert_array_equal(
        np.asarray(yp.reshape(want.shape)), np.asarray(want))


@pytest.mark.parametrize("p,c", [(4, 32), (2, 64), (1, 128)])
def test_pool_grad_routing_matches_select_and_scatter(p, c):
    b, g, h = 1, 16, 8
    lanes = p * c
    w = g * p
    # duplicate values to force ties — the routing rule is the test
    base = np.random.RandomState(2).randint(0, 3, (b, h, w, c))
    x = jnp.asarray(base.astype(np.float32))
    xp = x.reshape(b, h, g, lanes)
    cot = _rand((b, h // 2, w // 2, c), seed=3)

    def loss_p(xp):
        yp = pool_pack.maxpool2x2_packed(xp, c)
        return jnp.sum(yp.reshape(cot.shape) * cot)

    def loss_o(x):
        return jnp.sum(_pool_oracle(x) * cot)

    gp = jax.grad(loss_p)(xp).reshape(x.shape)
    go = jax.grad(loss_o)(x)
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(go))


@pytest.mark.parametrize("p,c", [(4, 32), (2, 64), (1, 128)])
def test_pool_tee_grad_matches_oracle(p, c):
    """(skip, pooled) tee: grad through BOTH outputs equals the plain
    composition (skip used directly + nn.max_pool), exactly (f32)."""
    b, g, h = 1, 16, 8
    lanes = p * c
    w = g * p
    base = np.random.RandomState(5).randint(0, 3, (b, h, w, c))
    x = jnp.asarray(base.astype(np.float32))
    xp = x.reshape(b, h, g, lanes)
    cot = _rand((b, h // 2, w // 2, c), seed=6)
    cot2 = _rand((b, h, w, c), seed=7)
    assert pool_pack.tee_supported(h, g, lanes, c, 4)

    def loss_p(xp):
        s, yp = pool_pack.maxpool2x2_packed_tee(xp, c)
        return (jnp.sum(yp.reshape(cot.shape) * cot)
                + jnp.sum(s.reshape(x.shape) * cot2))

    def loss_o(x):
        return (jnp.sum(_pool_oracle(x) * cot) + jnp.sum(x * cot2))

    gp = jax.grad(loss_p)(xp).reshape(x.shape)
    go = jax.grad(loss_o)(x)
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(go))


@pytest.mark.parametrize("p,c", [(4, 32), (1, 128)])
def test_pool_tee_bf16_bit_identical_to_unfused(p, c):
    """bf16: the in-kernel skip add rounds exactly like the unfused
    path (plain pool kernel store + XLA bf16 add)."""
    b, g, h = 1, 16, 8
    lanes = p * c
    w = g * p
    x = _rand((b, h, w, c), jnp.bfloat16, seed=8)
    xp = x.reshape(b, h, g, lanes)
    cot = _rand((b, h // 2, g // 2, lanes), jnp.bfloat16, seed=9)
    cot2 = _rand((b, h, g, lanes), jnp.bfloat16, seed=10)

    def loss_tee(xp):
        s, yp = pool_pack.maxpool2x2_packed_tee(xp, c)
        return jnp.sum((yp * cot).astype(jnp.float32)) + \
            jnp.sum((s * cot2).astype(jnp.float32))

    def loss_plain(xp):
        yp = pool_pack.maxpool2x2_packed(xp, c)
        return jnp.sum((yp * cot).astype(jnp.float32)) + \
            jnp.sum((xp * cot2).astype(jnp.float32))

    gt = jax.grad(loss_tee)(xp)
    gu = jax.grad(loss_plain)(xp)
    np.testing.assert_array_equal(
        np.asarray(gt, np.float32), np.asarray(gu, np.float32))


def _upconv_oracle(x, k, bias):
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(k.shape[-1], (2, 2), strides=(2, 2),
                                    padding="VALID", use_bias=True)(x)

    m = M()
    vs = {"params": {"ConvTranspose_0": {"kernel": k, "bias": bias}}}
    return m.apply(vs, x)


@pytest.mark.parametrize("p_in,c_in,c_out,p_out", [
    (2, 64, 32, 4),    # dec0-style: 2·p_in == p_out
    (1, 128, 64, 2),   # dec1-style
    (1, 256, 128, 1),  # dec2-style: 2·p_in == 2·p_out
])
def test_upconv_matches_conv_transpose(p_in, c_in, c_out, p_out):
    b, h, g_in = 1, 4, 8
    lanes_in = p_in * c_in
    w_in = g_in * p_in
    geo = upconv_pack.geometry(h, g_in, lanes_in, c_in, c_out, p_out)
    assert geo is not None
    _, g_out, lanes_out = geo
    x = _rand((b, h, w_in, c_in), seed=4)
    k = _rand((2, 2, c_in, c_out), seed=5) * 0.1
    bias = _rand((c_out,), seed=6) * 0.1

    def run_packed(x, k, bias):
        xp = x.reshape(b, h, g_in, lanes_in)
        wp = upconv_pack.pack_up_weights(jnp.flip(k, (0, 1)), p_in)
        bias_l = jnp.tile(bias, 2 * p_in)
        yp = upconv_pack.upconv2x2_packed(xp, wp, bias_l,
                                          (g_out, lanes_out))
        return yp.reshape(b, 2 * h, 2 * w_in, c_out)

    got = run_packed(x, k, bias)
    want = _upconv_oracle(x, k, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    cot = _rand((b, 2 * h, 2 * w_in, c_out), seed=7)
    gp = jax.grad(lambda *a: jnp.sum(run_packed(*a) * cot),
                  argnums=(0, 1, 2))(x, k, bias)
    go = jax.grad(lambda *a: jnp.sum(_upconv_oracle(*a) * cot),
                  argnums=(0, 1, 2))(x, k, bias)
    for a, b_ in zip(gp, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
