"""Grow-the-head variant (model.padded_head=False): weight-copy exactness
(SURVEY.md §4.1 "head-expansion weight-copy test") and end-to-end runs."""

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu.config import parse_overrides
from cl_tpu.models import unet as unet_lib
from cl_tpu.train import train


def test_expand_copies_old_class_logits_exactly():
    model_small = unet_lib.UNet(num_classes=5, base_channels=8, depth=2,
                                head_width=3)
    v = unet_lib.init_variables(model_small, jax.random.PRNGKey(0), 16)
    params_big = unet_lib.expand_head_params(
        v["params"], 5, jax.random.PRNGKey(1))
    model_big = unet_lib.UNet(num_classes=5, base_channels=8, depth=2,
                              head_width=5)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
    small = model_small.apply({"params": v["params"],
                               "batch_stats": v["batch_stats"]}, x,
                              train=False)
    big = model_big.apply({"params": params_big,
                           "batch_stats": v["batch_stats"]}, x, train=False)
    np.testing.assert_array_equal(np.asarray(big[..., :3]),
                                  np.asarray(small))


def test_expand_zeros_aux_tree():
    tree = {"head": {"kernel": jnp.ones((1, 1, 4, 3)),
                     "bias": jnp.ones((3,))},
            "enc0": {"conv0": {"kernel": jnp.ones((3, 3, 3, 4))}}}
    out = unet_lib.expand_head_zeros(tree, 5)
    assert out["head"]["kernel"].shape == (1, 1, 4, 5)
    np.testing.assert_array_equal(np.asarray(out["head"]["bias"][3:]),
                                  np.zeros(2))
    np.testing.assert_array_equal(np.asarray(out["head"]["kernel"][..., :3]),
                                  np.ones((1, 1, 4, 3)))


def _grow_args(extra=()):
    return ["preset=smoke", "data.num_classes=5", "train.num_tasks=2",
            "model.padded_head=false", "train.data_parallel=false",
            "data.train_images_per_task=8", "train.epochs_per_task=1",
            *extra]


def test_grow_mode_full_run_all_methods():
    report = train(parse_overrides(
        _grow_args(["method.methods=ewc,lwf,replay"])))
    assert np.isfinite(report["final_per_task_miou"]).all()


def test_grow_mode_resume(tmp_path):
    import pytest

    args = _grow_args([f"train.checkpoint_dir={tmp_path}/g"])
    full = train(parse_overrides(args))
    with pytest.raises(RuntimeError):
        train(parse_overrides(args + ["train.fail_after_task=0"]))
    resumed = train(parse_overrides(args + ["train.resume=true"]))
    np.testing.assert_allclose(resumed["final_per_task_miou"],
                               full["final_per_task_miou"], atol=1e-12)
