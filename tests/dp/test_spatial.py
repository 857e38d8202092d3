"""Spatial (halo-exchange) UNet forward vs the unsharded model —
SURVEY.md §5.7's documented extension, validated on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu.models.unet import UNet, init_variables
from cl_tpu.parallel import spatial


def test_spatial_forward_matches_unsharded(eight_devices):
    model = UNet(num_classes=4, base_channels=8, depth=4, norm="group")
    v = init_variables(model, jax.random.PRNGKey(0), 128)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 128, 3))
    ref = model.apply(v, x, train=False)

    mesh = spatial.make_space_mesh(8, devices=eight_devices)
    got = spatial.spatial_apply(v["params"], x, mesh, depth=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_spatial_grads_match_unsharded(eight_devices):
    """The spatial path trains, not just infers: jax.grad through the
    shard_map (halo-exchange ppermute transposes + psum'd GroupNorm stats)
    must produce the same parameter gradients as the unsharded model."""
    from cl_tpu import losses

    model = UNet(num_classes=4, base_channels=8, depth=2, norm="group")
    v = init_variables(model, jax.random.PRNGKey(0), 64)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y = jax.random.randint(jax.random.PRNGKey(2), (2, 64, 64), 0, 4)
    valid = jnp.ones(4, bool)

    def loss_ref(p):
        logits = model.apply({"params": p}, x, train=False)
        return losses.cross_entropy(logits, y, valid)[0]

    mesh = spatial.make_space_mesh(8, devices=eight_devices)

    def loss_sp(p):
        logits = spatial.spatial_apply(p, x, mesh, depth=2)
        return losses.cross_entropy(logits, y, valid)[0]

    g_ref = jax.grad(loss_ref)(v["params"])
    g_sp = jax.grad(loss_sp)(v["params"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_spatial_rejects_indivisible_height(eight_devices):
    import pytest

    model = UNet(num_classes=2, base_channels=8, depth=4, norm="group")
    v = init_variables(model, jax.random.PRNGKey(0), 128)
    mesh = spatial.make_space_mesh(8, devices=eight_devices)
    with pytest.raises(ValueError, match="divide"):
        spatial.spatial_apply(v["params"],
                              jnp.zeros((1, 96, 96, 3)), mesh, depth=4)


def test_halo_rows_zero_at_edges(eight_devices):
    """Top shard's top halo and bottom shard's bottom halo are zeros —
    the SAME-padding guarantee."""
    from jax.sharding import PartitionSpec as P

    mesh = spatial.make_space_mesh(4, devices=eight_devices[:4])
    x = jnp.arange(1, 9, dtype=jnp.float32).reshape(1, 8, 1, 1) \
        .repeat(2, axis=2)
    fn = jax.shard_map(
        lambda xs: spatial._halo_rows(xs, spatial.SPACE_AXIS),
        mesh=mesh, in_specs=P(None, spatial.SPACE_AXIS),
        out_specs=P(None, spatial.SPACE_AXIS))
    out = np.asarray(fn(x))  # [1, 4*(2+2), 2, 1]
    shards = out.reshape(4, 4, 2)[:, :, 0]
    # shard i rows: [halo_top, row, row, halo_bottom]
    np.testing.assert_allclose(shards[0], [0, 1, 2, 3])
    np.testing.assert_allclose(shards[1], [2, 3, 4, 5])
    np.testing.assert_allclose(shards[3], [6, 7, 8, 0])


def test_spatial_parallel_training_runs_and_matches(eight_devices):
    """train.spatial_parallel end-to-end: the full continual driver trains
    with the height-sharded forward and reports the same mIoU as the
    single-device run (f32; psum'd GroupNorm stats reorder reductions, so
    tolerance rather than bit-equality)."""
    from cl_tpu.config import parse_overrides
    from cl_tpu.train import train

    ov = ["preset=smoke", "model.norm=group", "model.depth=2",
          "data.num_classes=5", "train.num_tasks=2",
          "method.methods=ewc", "data.train_images_per_task=8",
          "data.image_size=32", "data.source_size=40"]
    spatial = train(parse_overrides(ov + ["train.spatial_parallel=true"]))
    single = train(parse_overrides(ov + ["train.data_parallel=false"]))
    np.testing.assert_allclose(spatial["final_per_task_miou"],
                               single["final_per_task_miou"], atol=5e-3)


def test_spatial_parallel_rejects_batchnorm(eight_devices):
    import pytest

    from cl_tpu.config import parse_overrides
    from cl_tpu.train import train

    with pytest.raises(ValueError, match="norm"):
        train(parse_overrides(["preset=smoke",
                               "train.spatial_parallel=true"]))


def test_spatial_parallel_bf16_runs(eight_devices):
    # bf16 compute through the height-sharded path (params cast per-op,
    # GroupNorm stats f32) — regression for the lax-conv dtype mismatch.
    from cl_tpu.config import parse_overrides
    from cl_tpu.train import train

    res = train(parse_overrides([
        "preset=smoke", "model.norm=group", "model.depth=2",
        "data.image_size=32", "data.source_size=40",
        "train.compute_dtype=bfloat16", "train.spatial_parallel=true"]))
    assert np.isfinite(res["mean_final_miou"])
