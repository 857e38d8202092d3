"""Data-parallel correctness on the 8-virtual-CPU-device mesh (SURVEY.md
§4.3): a sharded train step must produce the same update as single-device."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu import sharding, train as train_lib
from cl_tpu.config import get_preset
from cl_tpu.data import pipeline, tasks as task_lib


def _cfg():
    cfg = get_preset("smoke")
    # SGD: the update is lr·grad, so the comparison below directly measures
    # the sharded all-reduce against the single-device grad (Adam would
    # amplify ~1e-7 reduction-order noise through 1/sqrt(v)).
    return cfg.replace(train=dataclasses.replace(
        cfg.train, data_parallel=True, optimizer="sgd", lr=0.1))


def _first_batch(cfg):
    b = next(iter(pipeline.train_batches(cfg, 0, epoch=0)))
    return pipeline.HostBatch(jnp.asarray(b.image), jnp.asarray(b.mask),
                              jnp.asarray(b.flip))


def test_sharded_step_matches_single_device(eight_devices):
    cfg = _cfg()
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state0 = train_lib.init_state(cfg, model, tx)
    valid = jnp.asarray(task_lib.valid_class_mask(
        cfg.data.num_classes, task_lib.seen_classes(cfg.classes_per_task, 0)))
    batch = _first_batch(cfg)

    mesh = sharding.make_mesh(eight_devices[:4])
    step_m = train_lib.make_train_step(cfg, model, tx, mesh=mesh)
    step_1 = train_lib.make_train_step(cfg, model, tx, mesh=None)

    sm, am = step_m(state0, batch, valid)
    state0b = train_lib.init_state(cfg, model, tx)  # state0 was donated
    s1, a1 = step_1(state0b, batch, valid)

    np.testing.assert_allclose(float(am["loss"]), float(a1["loss"]),
                               rtol=1e-5)
    # Reduction order differs between the sharded all-reduce and the
    # single-device sum — bit-exactness is not expected, closeness is.
    for pm, p1 in zip(jax.tree.leaves(sm.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(pm), np.asarray(p1), atol=1e-3)


def test_batch_sharding_places_shards(eight_devices):
    mesh = sharding.make_mesh(eight_devices)
    spec = sharding.batch_sharding(mesh)
    x = jax.device_put(jnp.zeros((16, 4, 4, 3)), spec)
    assert len(x.addressable_shards) == 8
    assert x.addressable_shards[0].data.shape[0] == 2


def test_check_divisible():
    import pytest

    mesh = sharding.make_mesh(jax.devices()[:4])
    sharding.check_divisible(8, mesh)
    with pytest.raises(ValueError):
        sharding.check_divisible(6, mesh)


def test_sharded_eval_matches_single_device(eight_devices):
    """The eval step's on-device confusion matrix must be identical under
    a DP mesh (per-shard one-hot matmuls + partitioner-inserted psum) and
    on one device."""
    cfg = _cfg()
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    valid = jnp.asarray(task_lib.valid_class_mask(
        cfg.data.num_classes, task_lib.seen_classes(cfg.classes_per_task, 0)))
    batch = _first_batch(cfg)
    C = cfg.data.num_classes
    conf0 = jnp.zeros((C, C), jnp.float32)

    mesh = sharding.make_mesh(eight_devices[:4])
    ev_m = train_lib.make_eval_step(cfg, model, mesh=mesh)
    ev_1 = train_lib.make_eval_step(cfg, model, mesh=None)
    cm = ev_m(conf0, state.params, state.model_state, batch, valid)
    c1 = ev_1(conf0, state.params, state.model_state, batch, valid)
    # Counts are integers accumulated in f32 — exact equality expected.
    np.testing.assert_array_equal(np.asarray(cm), np.asarray(c1))


def test_put_global_batch_local_api_matches_device_put(eight_devices):
    """Multi-controller readiness (SURVEY.md §2.4): the
    make_array_from_process_local_data path must place the same values with
    the same sharding as the single-controller device_put fast path (with
    process_count=1 the local rows are the whole batch)."""
    mesh = sharding.make_mesh(eight_devices)
    spec = sharding.batch_sharding(mesh)
    batch = pipeline.HostBatch(
        image=np.arange(16 * 4 * 4 * 3, dtype=np.uint8).reshape(16, 4, 4, 3),
        mask=np.arange(16 * 4 * 4, dtype=np.uint8).reshape(16, 4, 4) % 7,
        flip=(np.arange(16) % 2).astype(bool))
    fast = sharding.put_global_batch(batch, spec)
    local = sharding.put_global_batch(batch, spec, force_local_api=True)
    for f, l in zip(jax.tree.leaves(fast), jax.tree.leaves(local)):
        assert l.sharding.is_equivalent_to(f.sharding, f.ndim)
        np.testing.assert_array_equal(np.asarray(f), np.asarray(l))
    assert sharding.process_local_rows(16) == slice(0, 16)


def test_2d_mesh_channel_sharded_forward(eight_devices):
    """TP readiness (SURVEY.md §2.3): conv channels sharded over the model
    axis of a 2x4 mesh produce the same logits as replicated params."""
    import jax.numpy as jnp

    from cl_tpu.models.unet import UNet, init_variables

    model = UNet(num_classes=3, base_channels=16, depth=2, norm="group")
    v = init_variables(model, jax.random.PRNGKey(0), 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = model.apply(v, x, train=False)

    mesh = sharding.make_mesh_2d(4, devices=eight_devices)
    specs = sharding.param_specs(v["params"], mesh, min_channels=16)
    n_sharded = sum(
        1 for s in jax.tree.leaves(specs)
        if s.spec != jax.sharding.PartitionSpec())
    assert n_sharded > 0  # some kernels actually shard
    params_sh = jax.device_put(v["params"], specs)
    xspec = jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
    x_sh = jax.device_put(x, xspec)
    got = jax.jit(lambda p, x: model.apply({"params": p}, x, train=False))(
        params_sh, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_sharded_pallas_losses_match_single_device(eight_devices):
    # The mesh path routes CE/KD through shard_map'd class-major kernels
    # (psum(total)/psum(count)); the full EWC+LwF step must still match
    # the single-device step.
    cfg = _cfg()
    cfg = cfg.replace(method=dataclasses.replace(
        cfg.method, methods=("ewc", "lwf")))
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    valid = jnp.asarray(task_lib.valid_class_mask(
        cfg.data.num_classes, task_lib.seen_classes(cfg.classes_per_task, 0)))
    batch = _first_batch(cfg)

    mesh = sharding.make_mesh(eight_devices[:4])
    step_m = train_lib.make_train_step(cfg, model, tx, mesh=mesh)
    step_1 = train_lib.make_train_step(cfg, model, tx, mesh=None)

    state0 = train_lib.init_state(cfg, model, tx)
    # Arm LwF so the KD branch carries signal (weight=1, snapshot=init).
    from cl_tpu.methods import lwf as lwf_lib
    state0 = state0.replace(lwf=lwf_lib.lwf_after_task(
        state0.lwf, {"params": state0.params, **state0.model_state}, valid))
    sm, am = step_m(state0, batch, valid)

    state1 = train_lib.init_state(cfg, model, tx)
    state1 = state1.replace(lwf=lwf_lib.lwf_after_task(
        state1.lwf, {"params": state1.params, **state1.model_state}, valid))
    s1, a1 = step_1(state1, batch, valid)

    np.testing.assert_allclose(float(am["loss"]), float(a1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(am["kd"]), float(a1["kd"]),
                               rtol=1e-4, atol=1e-7)
    for pm, p1 in zip(jax.tree.leaves(sm.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(pm), np.asarray(p1), atol=1e-3)


def test_public_evaluate_api_honors_mesh(eight_devices):
    # VERDICT r1 weak item 6: evaluate() used to always build a single-
    # device eval step. It must follow train.data_parallel like train()
    # and produce the same mIoU either way (counts are exact).
    cfg = _cfg()  # data_parallel=True; 8 virtual devices visible
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, batch_size=8, val_images_per_task=8))
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)

    dp = train_lib.evaluate(cfg, state, task_id=0)
    single = train_lib.evaluate(
        cfg.replace(train=dataclasses.replace(cfg.train,
                                              data_parallel=False)),
        state, task_id=0)
    assert dp["miou"] == single["miou"]
    np.testing.assert_array_equal(np.asarray(dp["per_class_iou"]),
                                  np.asarray(single["per_class_iou"]))


def test_grow_head_mode_under_dp_mesh(eight_devices):
    # Grow-the-head (model.padded_head=false) through the FULL driver on a
    # DP mesh: per-task head surgery + recompile must compose with batch
    # sharding. Trajectory must match the single-device grow run.
    from cl_tpu.train import train

    cfg = _cfg()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, padded_head=False),
        data=dataclasses.replace(cfg.data, num_classes=5, batch_size=8,
                                 train_images_per_task=16,
                                 val_images_per_task=8),
        train=dataclasses.replace(cfg.train, num_tasks=2,
                                  epochs_per_task=1))
    dp = train(cfg)
    single = train(cfg.replace(train=dataclasses.replace(
        cfg.train, data_parallel=False)))
    np.testing.assert_allclose(
        np.asarray(dp["final_per_task_miou"]),
        np.asarray(single["final_per_task_miou"]), atol=5e-3)
