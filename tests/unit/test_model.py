import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu.models.unet import UNet, init_variables, param_count


@pytest.mark.parametrize("base,depth,size,classes",
                         [(8, 4, 32, 2), (8, 3, 64, 21), (16, 4, 64, 19)])
def test_output_shape(base, depth, size, classes):
    model = UNet(num_classes=classes, base_channels=base, depth=depth)
    v = init_variables(model, jax.random.PRNGKey(0), size)
    x = jnp.zeros((2, size, size, 3))
    y = model.apply(v, x, train=False)
    assert y.shape == (2, size, size, classes)
    assert y.dtype == jnp.float32


def test_bf16_compute_f32_params_and_logits():
    model = UNet(num_classes=2, base_channels=8, dtype=jnp.bfloat16)
    v = init_variables(model, jax.random.PRNGKey(0), 32)
    for p in jax.tree.leaves(v["params"]):
        assert p.dtype == jnp.float32
    y = model.apply(v, jnp.zeros((1, 32, 32, 3)), train=False)
    assert y.dtype == jnp.float32


def test_param_count_matches_torch():
    import torch
    from reference_impl.unet import UNet as TorchUNet

    for base, depth, classes in [(8, 4, 2), (32, 4, 21)]:
        jm = UNet(num_classes=classes, base_channels=base, depth=depth)
        v = init_variables(jm, jax.random.PRNGKey(0), 64)
        tm = TorchUNet(classes, base, depth)
        t_count = sum(p.numel() for p in tm.parameters())
        # flax param_count excludes batch_stats (running stats aren't params
        # in torch either)
        assert param_count(v["params"]) == t_count


def test_train_mode_updates_batch_stats():
    model = UNet(num_classes=2, base_channels=8)
    v = init_variables(model, jax.random.PRNGKey(0), 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    _, new_state = model.apply(v, x, train=True, mutable=["batch_stats"])
    before = v["batch_stats"]["enc0"]["bn0"]["mean"]
    after = new_state["batch_stats"]["enc0"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_upconv_matmul_matches_conv_transpose():
    """UpConv2x2 (einsum + pixel shuffle) == nn.ConvTranspose(k2/s2) with
    the SAME param tree — forward near-exact, grads close (the default
    model.upconv_impl=matmul must be a drop-in for checkpoints and the
    torch importer; DESIGN.md §8)."""
    import flax.linen as nn

    from cl_tpu.models.unet import UpConv2x2

    for c_in, c_out, hw, dt in [(16, 8, 8, jnp.float32),
                                (8, 4, 6, jnp.float32),
                                (16, 8, 8, jnp.bfloat16)]:
        up = UpConv2x2(c_out, dtype=dt)
        ct = nn.ConvTranspose(c_out, (2, 2), strides=(2, 2),
                              padding="VALID", use_bias=True, dtype=dt,
                              param_dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, hw, hw, c_in), dt)
        v = up.init(jax.random.PRNGKey(1), x)
        assert jax.tree.map(jnp.shape, v) == jax.tree.map(
            jnp.shape, ct.init(jax.random.PRNGKey(1), x))
        ya = up.apply(v, x).astype(jnp.float32)
        yb = ct.apply(v, x).astype(jnp.float32)
        tol = 1e-5 if dt == jnp.float32 else 2e-2
        np.testing.assert_allclose(ya, yb, atol=tol, rtol=tol)

        def loss(fn):
            return lambda p, x: jnp.sum(
                fn.apply(p, x).astype(jnp.float32) ** 2)

        ga = jax.grad(loss(up))(v, x)
        gb = jax.grad(loss(ct))(v, x)
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            a, b, atol=20 * tol, rtol=20 * tol), ga, gb)


def test_maxpool2x2_matches_reduce_window():
    """maxpool2x2 forward == nn.max_pool exactly; custom-VJP gradient ==
    XLA's select_and_scatter backward, INCLUDING tie routing (both send
    dy to the first maximal element in window scan order)."""
    import flax.linen as nn

    from cl_tpu.models.unet import maxpool2x2

    rng = np.random.RandomState(0)
    for shape, dt in [((2, 8, 8, 3), jnp.float32),
                      ((1, 16, 16, 4), jnp.bfloat16)]:
        x = rng.randn(*shape).astype(np.float32)
        # force plenty of exact ties (post-ReLU zeros and equal pairs)
        x[x < 0] = 0.0
        x = jnp.asarray(x, dt)

        ref_pool = lambda v: nn.max_pool(v, (2, 2), strides=(2, 2))
        np.testing.assert_array_equal(
            np.asarray(maxpool2x2(x)), np.asarray(ref_pool(x)))

        def loss(fn, v):
            y = fn(v).astype(jnp.float32)
            w = jnp.arange(y.size, dtype=jnp.float32).reshape(y.shape)
            return jnp.sum(y * w)  # distinct cotangent per output

        ga = jax.grad(lambda v: loss(maxpool2x2, v))(x)
        gb = jax.grad(lambda v: loss(ref_pool, v))(x)
        np.testing.assert_array_equal(np.asarray(ga, np.float32),
                                      np.asarray(gb, np.float32))
