"""int8 saved-activation storage (conv_bn_fused_q) vs explicit oracles,
interpret mode on CPU (SURVEY.md §4.1; VERDICT r3 next #1).

The contract under test: the FORWARD of conv_bn_fused_q is bit-identical
to conv_bn_fused (quantization is an epilogue, not a rewrite), and the
BACKWARD equals the plain backward math evaluated with the saved tensors
replaced by their int8-dequantized values — i.e. the only error int8
storage introduces is the quantization of the residuals, never a change
of formula.  The per-row reference quantizer here replicates the
kernel's `_quant_rows` exactly (scales are per image row, so they are
tile-size independent).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu.pallas import conv3x3_v3 as v3
from cl_tpu.pallas.conv3x3 import conv3x3_reference


def _rand(shape, scale=1.0, seed=0, dtype=jnp.float32):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
        * scale).astype(dtype)


def quantize_rows_ref(x4):
    """jnp reference of the kernel's per-(image-row, lane) quantizer:
    x4 [b, h, wg, L] → (q int8, sc f32 [b, h, 1, L])."""
    m = jnp.max(jnp.abs(x4.astype(jnp.float32)), axis=2, keepdims=True)
    inv = jnp.where(m > 0, 127.0 / m, 0.0)
    q = jnp.clip(jnp.rint(x4.astype(jnp.float32) * inv),
                 -127.0, 127.0).astype(jnp.int8)
    return q, m / 127.0


def deq(q, sc):
    return q.astype(jnp.float32) * sc


GEOM = (2, 16, 32, 8, 8)  # b, h, wid, ci, co


def _setup(prologue=True, seed=0):
    b, h, wid, ci, co = GEOM
    p = v3.pick_pack(ci, co)
    wg = wid // p
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, wg, p * ci).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2)
    if prologue:
        a = jnp.asarray(rng.rand(p * ci).astype(np.float32) + 0.5)
        bb = jnp.asarray(rng.randn(p * ci).astype(np.float32) * 0.1)
    else:
        a = jnp.ones((p * ci,), jnp.float32)
        bb = jnp.zeros((p * ci,), jnp.float32)
    return p, wg, x, w, a, bb


def _unpack(xp, p, c):
    b, h, wg, lanes = xp.shape
    return xp.reshape(b, h, wg * p, c)


def _pack(x4, p, c):
    b, h, wid, _ = x4.shape
    return x4.reshape(b, h, wid // p, p * c)


def _oracle_bwd(xp_used, w, a, bb, y_used, dy, ds1, ds2, p, prologue,
                ci, co):
    """Explicit plain-backward math (the `_cbf_bwd` contract) evaluated
    at the GIVEN saved tensors (already dequantized by the caller)."""
    e = (dy.astype(jnp.float32) + ds1
         + 2.0 * y_used.astype(jnp.float32) * ds2)
    w_dx = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    # dt = conv(e, w_flip) on the unpacked view
    e4 = _unpack(e, p, co)
    dt = conv3x3_reference(e4, w_dx)
    dt_p = _pack(dt, p, ci)
    xf = xp_used.astype(jnp.float32)
    if prologue:
        u = xf * a + bb
        du = jnp.where(u > 0, dt_p, 0.0)
        dxp = du * a
        da = jnp.sum(du * xf, axis=(0, 1, 2))
        db = jnp.sum(du, axis=(0, 1, 2))
        t = jnp.maximum(u, 0.0)
    else:
        dxp = dt_p
        da = jnp.zeros_like(a)
        db = jnp.zeros_like(bb)
        t = xf
    # dW via autodiff of the reference conv at linearization point t
    t4 = _unpack(t, p, ci)
    dw = jax.grad(
        lambda w_: jnp.sum(conv3x3_reference(t4, w_) * e4))(w)
    return dxp, dw, da, db


@pytest.mark.parametrize("prologue", [True, False])
def test_q_forward_exact(prologue):
    p, wg, x, w, a, bb = _setup(prologue)
    y0, s10, s20 = v3.conv_bn_fused(x, w, a, bb, p, prologue)
    y, s1, s2, (yq, ysc) = v3.conv_bn_fused_q(x, None, w, a, bb, p,
                                              prologue)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y0))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s10))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s20))
    # dequantized copy within half a quantization step per element
    err = np.abs(np.asarray(deq(yq, ysc)) - np.asarray(y))
    bound = np.broadcast_to(np.asarray(ysc) * 0.5 + 1e-7, err.shape)
    assert (err <= bound).all()
    # and the emitted q/sc match the per-row reference quantizer
    qr, scr = quantize_rows_ref(y)
    np.testing.assert_array_equal(np.asarray(yq), np.asarray(qr))
    np.testing.assert_allclose(np.asarray(ysc), np.asarray(scr),
                               rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("prologue", [True, False])
@pytest.mark.parametrize("xq_mode", [False, True])
def test_q_backward_matches_oracle(prologue, xq_mode):
    b, h, wid, ci, co = GEOM
    p, wg, x, w, a, bb = _setup(prologue)
    xq = quantize_rows_ref(x) if xq_mode else None
    rng = np.random.RandomState(5)
    dy = jnp.asarray(rng.randn(b, h, wg, p * co).astype(np.float32))
    c1 = jnp.asarray(rng.randn(p * co).astype(np.float32) * 0.3)
    c2 = jnp.asarray(rng.randn(p * co).astype(np.float32) * 0.1)

    def f(x, w, a, bb):
        y, s1, s2, _ = v3.conv_bn_fused_q(x, xq, w, a, bb, p, prologue)
        return jnp.sum(y * dy) + jnp.sum(s1 * c1) + jnp.sum(s2 * c2)

    gx, gw, ga, gb = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, a, bb)

    # oracle at the dequantized saved tensors
    y, _, _, (yq, ysc) = v3.conv_bn_fused_q(x, xq, w, a, bb, p, prologue)
    y_used = deq(yq, ysc)
    xp_used = deq(*xq) if xq_mode else x
    ox, ow, oa, ob = _oracle_bwd(xp_used, w, a, bb, y_used, dy, c1, c2,
                                 p, prologue, ci, co)
    np.testing.assert_allclose(gx, ox, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gw, ow, rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(ga, oa, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gb, ob, rtol=1e-4, atol=1e-4)


def test_q_backward_fallback_matches_oracle(monkeypatch):
    """When no dx tile fits, the XLA-dequant fallback must produce the
    same cotangents as the kernels (same formulas, same saved tensors)."""
    b, h, wid, ci, co = GEOM
    p, wg, x, w, a, bb = _setup(True)
    xq = quantize_rows_ref(x)
    rng = np.random.RandomState(6)
    dy = jnp.asarray(rng.randn(b, h, wg, p * co).astype(np.float32))

    def f(x, w, a, bb):
        y, s1, s2, _ = v3.conv_bn_fused_q(x, xq, w, a, bb, p, True)
        return jnp.sum(y * dy) + jnp.sum(s1) * 0.2

    g_kern = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, a, bb)
    monkeypatch.setattr(v3, "_pick_th_dx", lambda *a_, **k_: 0)
    g_fall = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, a, bb)
    for u, v in zip(g_kern, g_fall):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-4)


def test_q_chain_close_to_plain():
    """Two-conv chain (the PackedLevel wiring: conv0's q pair threads
    into conv1's residuals): gradients track the exact plain chain
    within quantization-noise tolerance."""
    b, h, wid, ci, co = GEOM
    p, wg, x, w0, a, bb = _setup(True, seed=2)
    w1 = _rand((3, 3, co, co), 0.2, seed=3)
    rng = np.random.RandomState(7)
    dy = jnp.asarray(rng.randn(b, h, wg, p * co).astype(np.float32))

    def f_q(x, w0, w1):
        y1, s1, s2, q1 = v3.conv_bn_fused_q(x, None, w0,
                                            jnp.ones_like(a) * 0,
                                            jnp.zeros_like(bb), p, False)
        del s1, s2
        y2, s1b, _, _ = v3.conv_bn_fused_q(y1, q1, w1, a, bb, p, True)
        return jnp.sum(y2 * dy) + jnp.sum(s1b) * 0.1

    def f_plain(x, w0, w1):
        y1, s1, s2 = v3.conv_bn_fused(x, w0, jnp.ones_like(a) * 0,
                                      jnp.zeros_like(bb), p, False)
        del s1, s2
        y2, s1b, _ = v3.conv_bn_fused(y1, w1, a, bb, p, True)
        return jnp.sum(y2 * dy) + jnp.sum(s1b) * 0.1

    gq = jax.grad(f_q, argnums=(0, 1, 2))(x, w0, w1)
    gp = jax.grad(f_plain, argnums=(0, 1, 2))(x, w0, w1)
    # Quantization noise, not bias: elementwise spikes exist where the
    # dequantized pre-activation flips a ReLU mask (measured maxrel
    # 0.16/0.06/0.001 for gx/gw0/gw1 at this seed), but the energy of
    # the error stays ~2.5% RMS — that is the quantity training feels,
    # and the end-to-end gate is the dtype-trajectory harness.
    for name, u, v in zip(("gx", "gw0", "gw1"), gq, gp):
        u, v = np.asarray(u), np.asarray(v)
        rms = (np.sqrt(((u - v) ** 2).mean())
               / (np.sqrt((v ** 2).mean()) + 1e-9))
        assert rms < 6e-2, f"{name} rms rel gap {rms}"
        maxrel = np.abs(u - v).max() / (np.abs(v).max() + 1e-6)
        assert maxrel < 0.25, f"{name} max rel gap {maxrel}"


def test_packed_level_act_q_forward_exact():
    """PackedLevel(act_q=True) forward == act_q=False bitwise (the q
    epilogue never changes the primal path)."""
    from cl_tpu.models.unet import PackedLevel

    b, h, wid, f = 1, 16, 32, 8
    p = v3.pick_pack(f, f)
    x = _rand((b, h, wid // p, p * f), seed=9)
    lvl = PackedLevel(f, f, p, mode="plain")
    lvl_q = PackedLevel(f, f, p, mode="plain", act_q=True)
    vs = lvl.init(jax.random.PRNGKey(0), x, train=True)
    out0 = lvl.apply(vs, x, train=True, mutable=["batch_stats"])[0]
    out1 = lvl_q.apply(vs, x, train=True, mutable=["batch_stats"])[0]
    for u, v in zip(jax.tree.leaves(out0), jax.tree.leaves(out1)):
        np.testing.assert_array_equal(np.asarray(u), np.asarray(v))


def test_unet_act_q_grads_close():
    """Full packed UNet with act_q: forward logits identical, grads
    within quantization-noise tolerance of the exact model."""
    from cl_tpu.models.unet import UNet, init_variables, packed_prefix

    kw = dict(num_classes=5, base_channels=32, depth=2, packed=True)
    assert packed_prefix(32, 32, 2, 4) > 0, \
        "test geometry must engage the packed body"
    m0 = UNet(**kw)
    m1 = UNet(**kw, act_q=True)
    rng = jax.random.PRNGKey(0)
    vs = init_variables(m0, rng, image_size=32, batch_size=1)
    x = _rand((1, 32, 32, 3), seed=11)
    l0 = m0.apply(vs, x, train=False)
    l1 = m1.apply(vs, x, train=False)
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    def loss(m):
        def f(params):
            out, _ = m.apply({**vs, "params": params}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return f

    g0 = jax.grad(loss(m0))(vs["params"])
    g1 = jax.grad(loss(m1))(vs["params"])
    flat0 = jnp.concatenate([u.ravel() for u in jax.tree.leaves(g0)])
    flat1 = jnp.concatenate([u.ravel() for u in jax.tree.leaves(g1)])
    rel = float(jnp.abs(flat1 - flat0).max()
                / (jnp.abs(flat0).max() + 1e-6))
    assert rel < 5e-2, rel
