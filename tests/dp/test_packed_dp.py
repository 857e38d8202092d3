"""Packed-domain UNet under data parallelism: the shard_map'd packed
step (train.packed_dp_apply_fn — per-shard pallas kernels + psum'd
BatchNorm statistics) must match the single-device packed step on the
same global batch."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu import sharding, train as train_lib
from cl_tpu.config import get_preset
from cl_tpu.data import pipeline, tasks as task_lib
from cl_tpu.models.unet import packed_prefix


def _cfg():
    cfg = get_preset("smoke")
    return cfg.replace(
        data=dataclasses.replace(cfg.data, image_size=32, source_size=40,
                                 batch_size=8, train_images_per_task=8),
        model=dataclasses.replace(cfg.model, packed_unet=True,
                                  packed_min_size=0, base_channels=32),
        train=dataclasses.replace(cfg.train, data_parallel=True,
                                  optimizer="sgd", lr=0.1))


def _first_batch(cfg):
    b = next(iter(pipeline.train_batches(cfg, 0, epoch=0)))
    return pipeline.HostBatch(jnp.asarray(b.image), jnp.asarray(b.mask),
                              jnp.asarray(b.flip))


def test_packed_sharded_step_matches_single_device(eight_devices):
    cfg = _cfg()
    assert packed_prefix(cfg.data.image_size, cfg.model.base_channels,
                         cfg.model.depth, 4) > 0, \
        "test geometry must engage the packed body"
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
    # psum'd-partial-sums vs one big sum: closeness, not bit-equality.
    for pm, p1 in zip(jax.tree.leaves(sm.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(pm), np.asarray(p1), atol=1e-3)
    # batch-stat updates are replicated and match the single-device ones
    for bm, b1 in zip(jax.tree.leaves(sm.model_state),
                      jax.tree.leaves(s1.model_state)):
        np.testing.assert_allclose(np.asarray(bm), np.asarray(b1),
                                   atol=1e-4, rtol=1e-4)


def test_packed_dp_train_e2e_with_device_cache(eight_devices, tmp_path,
                                               monkeypatch):
    """Full train() on the virtual mesh with packed_unet AND the
    HBM-cache epoch-scan path (the flagship config-5 shape: shard_map'd
    packed body inside lax.scan inside the sharded jit)."""
    import dataclasses as dc

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    cfg = _cfg()
    cfg = cfg.replace(
        data=dc.replace(cfg.data, device_cache=True, epoch_scan=True),
        train=dc.replace(cfg.train, epochs_per_task=1, num_tasks=1))
    r = train_lib.train(cfg)
    assert np.isfinite(r["mean_final_miou"])


def test_packed_dp_eval_matches_single_device(eight_devices):
    cfg = _cfg()
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    valid = jnp.asarray(task_lib.valid_class_mask(
        cfg.data.num_classes, task_lib.seen_classes(cfg.classes_per_task, 0)))
    batch = _first_batch(cfg)
    C = cfg.data.num_classes

    mesh = sharding.make_mesh(eight_devices[:4])
    ev_m = train_lib.make_eval_step(cfg, model, mesh=mesh)
    ev_1 = train_lib.make_eval_step(cfg, model, mesh=None)
    conf_m = ev_m(jnp.zeros((C, C), jnp.float32), state.params,
                  state.model_state, batch, valid)
    conf_1 = ev_1(jnp.zeros((C, C), jnp.float32), state.params,
                  state.model_state, batch, valid)
    np.testing.assert_allclose(np.asarray(conf_m), np.asarray(conf_1),
                               atol=1e-3)
