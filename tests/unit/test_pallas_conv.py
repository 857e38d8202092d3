"""Lane-packed Pallas 3×3 conv vs the lax oracle (interpret mode on CPU).

Covers every pack factor (P=4/2/1 via C_out=32/64/128), forward and both
backward passes (dx through the flipped-kernel forward, dW through the
grid-accumulated reduce kernel), bf16, and the weight pack/fold round
trip. SURVEY.md §4.1: kernels run under interpret=True vs a pure-jnp
oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu.pallas import conv3x3 as pc


def _rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
    ).astype(dtype)


@pytest.mark.parametrize("c_out,p", [(32, 4), (64, 2), (128, 1)])
def test_forward_matches_lax(c_out, p):
    # c_in=128 keeps P·C_in lane-aligned at the natural pack factor
    assert pc.pick_pack(128, c_out) == p
    x = _rand((2, 8, 8, 128))
    w = _rand((3, 3, 128, c_out), seed=1)
    got = pc.conv3x3(x, w)
    want = pc.conv3x3_reference(x, w)
    # K=768 contraction, different accumulation order than lax
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_forward_rectangular_and_odd_rows():
    x = _rand((1, 6, 16, 16))  # odd rows -> single whole-image tile
    w = _rand((3, 3, 16, 32), seed=2)
    np.testing.assert_allclose(pc.conv3x3(x, w),
                               pc.conv3x3_reference(x, w),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("c_in,c_out", [(16, 32), (32, 64)])
def test_grads_match_lax(c_in, c_out):
    x = _rand((2, 8, 16, c_in), seed=3)
    w = _rand((3, 3, c_in, c_out), seed=4)
    cot = _rand((2, 8, 16, c_out), seed=5)  # fixed cotangent

    def loss(fn):
        def f(x, w):
            return jnp.sum(fn(x, w) * cot)
        return f

    gx, gw = jax.grad(loss(pc.conv3x3), argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss(pc.conv3x3_reference), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gx, rx, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gw, rw, atol=1e-4, rtol=1e-4)


def test_bf16_forward_close():
    x = _rand((1, 8, 8, 16), jnp.bfloat16, seed=6)
    w = _rand((3, 3, 16, 32), jnp.bfloat16, seed=7)
    got = pc.conv3x3(x, w).astype(jnp.float32)
    want = pc.conv3x3_reference(x, w).astype(jnp.float32)
    # bf16 inputs, f32 accumulation both sides; only I/O rounding differs.
    np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)


def test_pack_fold_roundtrip():
    w = _rand((3, 3, 8, 32), seed=8)
    p = 4
    wp = pc.pack_weights(w, p)
    # fold(pack) multiplies each tap by its pack multiplicity⁻¹?  No —
    # fold sums over j, and pack writes each tap once per j, so
    # fold(pack(w)) = p * w only where all P copies exist. Check the
    # actual contract instead: packed conv == reference conv (covered
    # above); here just check shapes and zero-structure.
    assert wp.shape == (3 * (p + 2) * 8, p * 32)
    wp5 = np.asarray(wp).reshape(3, p + 2, 8, p, 32)
    for v6 in range(p + 2):
        for j in range(p):
            blk = wp5[:, v6, :, j, :]
            if 0 <= v6 - j <= 2:
                assert np.abs(blk).max() > 0
            else:
                assert np.abs(blk).max() == 0


def test_supported_gate():
    assert pc.supported(512, 512, 32, 32)      # P=4, lanes 128
    assert pc.supported(256, 256, 64, 64)      # P=2, lanes 128
    assert pc.supported(256, 256, 32, 64)      # P bumped 2->4 for lanes
    assert not pc.supported(512, 512, 3, 32)   # RGB stem -> XLA
    assert not pc.supported(8, 6, 32, 32)      # W not divisible by P=4
    assert not pc.supported(20, 16, 32, 32)    # h>16 and h%8 != 0
    # a shape whose minimum (th=8) tile still needs >8 MB scoped VMEM
    # (would OOM Mosaic's 16 MB stack) -> XLA
    assert not pc.supported(64, 64, 1024, 512)
    # ...while the dec3 512->256 shape fits at th=8 (its whole-image
    # tile needed 27 MB -- the r2 OOM this guard fixes) and is supported
    assert pc.supported(64, 64, 512, 256)


def test_profitable_is_measured_subset():
    # measured-win shapes (DESIGN.md §8): channel-doubling packed convs
    assert pc.profitable(256, 256, 32, 64)
    assert pc.profitable(128, 128, 64, 128)
    # equal-width / decoder / unpacked shapes are routed to XLA
    assert not pc.profitable(512, 512, 32, 32)   # equal width
    assert not pc.profitable(512, 512, 64, 32)   # decoder halving
    assert not pc.profitable(64, 64, 128, 256)   # P=1, no packing
    # profitable() implies supported()
    for args in [(256, 256, 32, 64), (128, 128, 64, 128)]:
        assert pc.supported(*args)


def test_unet_pallas_impl_matches_xla():
    """Whole-model gate: same variables, same logits (interpret on CPU)."""
    from cl_tpu.models.unet import UNet, init_variables

    mx = UNet(num_classes=5, base_channels=16, depth=2, conv_impl="xla")
    mp = UNet(num_classes=5, base_channels=16, depth=2, conv_impl="pallas")
    # the 16-ch convs pack at P=8 (lane alignment) with wg>=2 at 32px,
    # so the pallas path is genuinely exercised, not gated out
    from cl_tpu.pallas import conv3x3 as _pc
    assert _pc.supported(32, 32, 16, 16)
    rng = jax.random.PRNGKey(0)
    vs = init_variables(mx, rng, image_size=32, batch_size=2)
    x = _rand((2, 32, 32, 3), seed=9)
    lx = mx.apply(vs, x, train=False)
    lp = mp.apply(vs, x, train=False)
    np.testing.assert_allclose(lp, lx, atol=1e-4, rtol=1e-4)

    # and the training grads agree through BN + the custom VJP
    def loss(m):
        def f(params):
            out, _ = m.apply({**vs, "params": params}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return f

    gx = jax.grad(loss(mx))(vs["params"])
    gp = jax.grad(loss(mp))(vs["params"])
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, atol=5e-3, rtol=1e-3), gx, gp)


def test_hybrid_conv_matches_ad_oracle():
    """conv_impl="hybrid": XLA fwd/dx + Pallas dW must match plain lax
    conv AD — forward bitwise (same lax call), grads at f32 tolerance
    (dx uses the flipped-kernel formulation; dW the piece-DMA kernel)."""
    x = _rand((2, 16, 16, 128))
    w = _rand((3, 3, 128, 32), seed=3)
    assert pc.dw_profitable(16, 16, 128, 32)
    np.testing.assert_array_equal(
        np.asarray(pc.conv3x3_hybrid(x, w)),
        np.asarray(pc._xla_conv(x, w)))

    def loss_h(x, w):
        return jnp.sum(pc.conv3x3_hybrid(x, w).astype(jnp.float32) ** 2)

    def loss_o(x, w):
        return jnp.sum(pc._xla_conv(x, w).astype(jnp.float32) ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1))(x, w)
    go = jax.grad(loss_o, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gh[0], go[0], atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(gh[1], go[1], atol=1e-2, rtol=1e-4)


def test_hybrid_conv_unsupported_shape_falls_back():
    """dW falls back to XLA's vjp on shapes the kernel rejects — grads
    must still match the oracle."""
    x = _rand((1, 6, 10, 3))   # W=10 not divisible by pack
    w = _rand((3, 3, 3, 32), seed=4)
    assert not pc.dw_profitable(6, 10, 3, 32)

    def loss_h(x, w):
        return jnp.sum(pc.conv3x3_hybrid(x, w).astype(jnp.float32) ** 2)

    def loss_o(x, w):
        return jnp.sum(pc._xla_conv(x, w).astype(jnp.float32) ** 2)

    gh = jax.grad(loss_h, argnums=(0, 1))(x, w)
    go = jax.grad(loss_o, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(gh[0], go[0], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gh[1], go[1], atol=1e-3, rtol=1e-4)


def test_unet_hybrid_impl_matches_xla():
    """Full UNet forward+grad with conv_impl="hybrid" vs "xla"."""
    from cl_tpu.models.unet import UNet

    x = _rand((1, 32, 32, 3))
    y = jnp.asarray(np.random.RandomState(9).randint(0, 3, (1, 32, 32)))

    def build(impl):
        m = UNet(num_classes=3, base_channels=8, norm="group",
                 conv_impl=impl)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        return m, v

    m_x, v_x = build("xla")
    m_h, v_h = build("hybrid")

    def loss(m, v):
        def f(params):
            logits = m.apply({"params": params}, x, train=False)
            oh = jax.nn.one_hot(y, 3)
            return -jnp.mean(jax.nn.log_softmax(logits) * oh)
        return jax.value_and_grad(f)(v["params"])

    lx, gx = loss(m_x, v_x)
    lh, gh = loss(m_h, v_h)
    np.testing.assert_allclose(float(lh), float(lx), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)
