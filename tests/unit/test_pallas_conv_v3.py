"""Gen-3 zero-prep Pallas 3×3 conv vs the lax oracle (interpret on CPU).

The gen-3 kernel (`pallas/conv3x3_v3.py`) consumes the input through a
free reshape (no halo pad op): row halos come from per-tile DMA offsets
with statically predicated boundary variants, column halos from ±1
block-row shifts of the flat VMEM view with iota-masked border rows.
These tests pin exactly those mechanisms: multi-tile rows (top/bottom
DMA variants), both pack factors, the left/right border masks (columns 0
and W−1 are where the shift trick can silently wrap), the packed-domain
API used by the packed-level integration, and the full-model route.
SURVEY.md §4.1: kernels run under interpret=True vs a pure-jnp oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu.pallas import conv3x3_v3 as v3
from cl_tpu.pallas.conv3x3 import conv3x3_reference


def _rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
    ).astype(dtype)


@pytest.mark.parametrize("shape", [
    (2, 8, 32, 32, 32),     # nh=1, P=4
    (1, 24, 32, 32, 32),    # nh=3: first/interior/last DMA variants
    (1, 16, 64, 64, 64),    # P=2
    (1, 16, 64, 32, 32),    # rectangular
    (1, 16, 64, 64, 32),    # channel-halving (decoder entry)
])
def test_forward_matches_lax(shape):
    b, h, w, ci, co = shape
    assert v3.supported(h, w, ci, co, itemsize=4)
    x = _rand((b, h, w, ci))
    k = _rand((3, 3, ci, co), seed=1)
    got = v3.conv3x3(x, k)
    want = conv3x3_reference(x, k)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_border_columns_exact():
    """Columns 0 and W−1 take the masked halo path — compare them alone
    at tight tolerance so a wrap bug cannot hide in an aggregate norm."""
    x = _rand((1, 24, 32, 32))
    k = _rand((3, 3, 32, 32), seed=2)
    got = np.asarray(v3.conv3x3(x, k))
    want = np.asarray(conv3x3_reference(x, k))
    np.testing.assert_allclose(got[:, :, 0], want[:, :, 0],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got[:, :, -1], want[:, :, -1],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got[:, 0], want[:, 0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(got[:, -1], want[:, -1],
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("ci,co", [(32, 32), (32, 64), (64, 32)])
def test_grads_match_lax(ci, co):
    x = _rand((2, 8, 32, ci), seed=3)
    k = _rand((3, 3, ci, co), seed=4)
    cot = _rand((2, 8, 32, co), seed=5)

    def loss(fn):
        return lambda x, k: jnp.sum(fn(x, k) * cot)

    gx, gw = jax.grad(loss(v3.conv3x3), argnums=(0, 1))(x, k)
    rx, rw = jax.grad(loss(conv3x3_reference), argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gx, rx, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gw, rw, atol=1e-4, rtol=1e-4)


def test_bf16_forward_close():
    x = _rand((1, 8, 32, 32), jnp.bfloat16, seed=6)
    k = _rand((3, 3, 32, 32), jnp.bfloat16, seed=7)
    got = v3.conv3x3(x, k).astype(jnp.float32)
    want = conv3x3_reference(x, k).astype(jnp.float32)
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_packed_api_matches_nhwc():
    """conv3x3_packed on the packed view == conv3x3 on NHWC, both
    directions of the free reshape; grads agree too."""
    b, h, w, ci, co = 1, 16, 64, 32, 32
    p = v3.pick_pack(ci, co)
    wg, lanes = w // p, p * ci
    x = _rand((b, h, w, ci), seed=8)
    k = _rand((3, 3, ci, co), seed=9)
    yp = v3.conv3x3_packed(x.reshape(b, h, wg, lanes), k)
    assert yp.shape == (b, h, wg, p * co)
    np.testing.assert_allclose(yp.reshape(b, h, w, co),
                               v3.conv3x3(x, k), atol=1e-5, rtol=1e-5)

    cot = _rand((b, h, w, co), seed=10)

    def loss_p(x, k):
        yp = v3.conv3x3_packed(x.reshape(b, h, wg, lanes), k)
        return jnp.sum(yp.reshape(b, h, w, co) * cot)

    def loss_r(x, k):
        return jnp.sum(conv3x3_reference(x, k) * cot)

    gp = jax.grad(loss_p, argnums=(0, 1))(x, k)
    gr = jax.grad(loss_r, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gp[0], gr[0], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gp[1], gr[1], atol=1e-4, rtol=1e-4)


def test_supported_gate():
    assert v3.supported(512, 512, 32, 32)
    assert v3.supported(512, 512, 64, 32)
    assert v3.supported(256, 256, 32, 64)
    assert not v3.supported(512, 512, 3, 32)    # RGB stem
    assert not v3.supported(8, 48, 32, 32)      # wg=12 not a power of 2
    assert not v3.supported(20, 32, 32, 32)     # h>16, h%8
    # deep-decoder shape fits only at a small tile, still supported
    assert v3.supported(64, 64, 512, 256)
    # profitable() restricts to the measured-win large-spatial levels
    assert v3.profitable(512, 512, 32, 32)
    assert v3.profitable(256, 256, 64, 64)
    assert not v3.profitable(128, 128, 128, 128)
    assert not v3.profitable(64, 64, 512, 256)


def test_unet_v3_impl_matches_xla():
    """Whole-model gate for conv_impl="v3" (supported shapes routed)."""
    from cl_tpu.models.unet import UNet, init_variables

    mx = UNet(num_classes=5, base_channels=32, depth=2, conv_impl="xla")
    mv = UNet(num_classes=5, base_channels=32, depth=2, conv_impl="v3")
    assert v3.supported(64, 64, 32, 32)
    rng = jax.random.PRNGKey(0)
    vs = init_variables(mx, rng, image_size=64, batch_size=1)
    x = _rand((1, 64, 64, 3), seed=11)
    lx = mx.apply(vs, x, train=False)
    lv = mv.apply(vs, x, train=False)
    np.testing.assert_allclose(lv, lx, atol=1e-4, rtol=1e-4)

    def loss(m):
        def f(params):
            out, _ = m.apply({**vs, "params": params}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return f

    gx = jax.grad(loss(mx))(vs["params"])
    gv = jax.grad(loss(mv))(vs["params"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, atol=5e-3, rtol=1e-3), gx, gv)


def test_flagship_levels_take_fused_backward():
    """Every packed level of the flagship shape (512², 32 ch, bf16) must
    take the FULLY-fused conv_bn_fused backward — the two-pass fallback
    costs ~2 ms of relayout copies per level (a silent 150→113 img/s
    step regression when the dW gate reused the plain-dW tile height
    instead of picking its own)."""
    p = 4  # pick_pack(32, 32)
    for level in range(3):
        h = 512 >> level
        feats = 32 * (2 ** level)
        for c_in, c_out in (((3 if level == 0 else feats // 2), feats),
                            (feats, feats)):
            wg = h // p
            th_dx = v3._pick_th_dx(h, wg, p * c_out, (p + 2) * c_out,
                                   p * c_in, 2, True)
            th_dw2 = v3._pick_th_dw2(h, wg, p * c_in, (p + 2) * c_in,
                                     p, c_out, 2)
            assert th_dx > 0 and th_dw2 > 0, \
                f"level{level} {c_in}->{c_out} fell off the fused backward"


def test_one_pass_bwd_matches_two_pass():
    """The opt-in single-pass dx+dW backward (CL_TPU_FUSE_BWD=1;
    measured-negative at 512², kept for future tuning) must produce the
    two-pass backward's gradients: same kernels' dot/cast discipline,
    only the streaming fused."""
    rng = np.random.RandomState(7)
    b, h, wid, ci, co = 2, 16, 32, 8, 8
    p = v3.pick_pack(ci, co)
    wg = wid // p
    x = jnp.asarray(rng.randn(b, h, wg, p * ci).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2)
    a = jnp.asarray(rng.rand(p * ci).astype(np.float32) + 0.5)
    bb = jnp.asarray(rng.randn(p * ci).astype(np.float32) * 0.1)

    def f(x, w, a, bb):
        y, s1, s2 = v3.conv_bn_fused(x, w, a, bb, p, True)
        return jnp.sum(y * y) + jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.1)

    prev = v3._FUSE_BWD
    try:
        v3._FUSE_BWD = True
        assert v3._pick_th_bwdf(h, wg, p * co, p * ci, (p + 2) * co,
                                (p + 2) * ci, 4, True) > 0
        g_fused = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, a, bb)
        v3._FUSE_BWD = False
        g_two = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, a, bb)
    finally:
        v3._FUSE_BWD = prev
    for u, v in zip(g_fused, g_two):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-4)


def test_one_pass_bwd_no_prologue():
    """prologue=False variant (level-entry convs): dx has no mask/da/db
    epilogue and dW contracts raw x."""
    rng = np.random.RandomState(8)
    b, h, wid, ci, co = 1, 16, 32, 8, 8
    p = v3.pick_pack(ci, co)
    wg = wid // p
    x = jnp.asarray(rng.randn(b, h, wg, p * ci).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2)
    a = jnp.ones((p * ci,), jnp.float32)
    bb = jnp.zeros((p * ci,), jnp.float32)

    def f(x, w):
        y, s1, s2 = v3.conv_bn_fused(x, w, a, bb, p, False)
        return jnp.sum(y * y) + jnp.sum(s1) * 0.1

    prev = v3._FUSE_BWD
    try:
        v3._FUSE_BWD = True
        g_fused = jax.grad(f, argnums=(0, 1))(x, w)
        v3._FUSE_BWD = False
        g_two = jax.grad(f, argnums=(0, 1))(x, w)
    finally:
        v3._FUSE_BWD = prev
    for u, v in zip(g_fused, g_two):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   rtol=1e-5, atol=1e-4)
