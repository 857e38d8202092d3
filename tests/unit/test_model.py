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
