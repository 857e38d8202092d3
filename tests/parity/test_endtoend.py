"""End-to-end parity gate (SURVEY.md §4.2 / BASELINE.md quality target):
the JAX framework and the torch-CPU oracle train on the SAME data stream
from the SAME initial weights; per-task mIoU must agree within 0.5 pts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from cl_tpu.config import parse_overrides
from cl_tpu.interop import torch_state_dict_to_variables


def _cfg(extra=()):
    return parse_overrides([
        "preset=smoke", "data.num_classes=3", "data.image_size=32",
        "data.source_size=40", "data.batch_size=4",
        "data.train_images_per_task=16", "data.val_images_per_task=8",
        "train.epochs_per_task=2", "train.num_tasks=2",
        "train.data_parallel=false", "train.optimizer=sgd", "train.lr=0.05",
        "model.base_channels=8", *extra])


def _miou_torch(cfg):
    from reference_impl.train import train as torch_train

    return torch_train(cfg)


def _miou_jax_from_torch_weights(cfg):
    """Run cl_tpu.train but with the torch oracle's initial weights so both
    frameworks traverse the same loss surface."""
    from cl_tpu import train as train_lib
    from cl_tpu.data import pipeline, tasks as task_lib
    from reference_impl.unet import UNet as TorchUNet

    torch.manual_seed(cfg.train.seed)
    tm = TorchUNet(cfg.data.num_classes, cfg.model.base_channels,
                   cfg.model.depth)
    variables = jax.tree.map(jnp.asarray,
                             torch_state_dict_to_variables(tm.state_dict()))

    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    state = state.replace(params=variables["params"],
                          model_state={"batch_stats":
                                       variables["batch_stats"]},
                          opt_state=tx.init(variables["params"]))

    step = train_lib.make_train_step(cfg, model, tx, mesh=None)
    eval_step = train_lib.make_eval_step(cfg, model, mesh=None)
    splits = cfg.classes_per_task
    T = cfg.train.num_tasks
    miou = np.full((T, T), np.nan)
    for task_id in range(T):
        seen = task_lib.seen_classes(splits, task_id)
        valid = jnp.asarray(task_lib.valid_class_mask(
            cfg.data.num_classes, seen))
        for epoch in range(cfg.train.epochs_per_task):
            for b in pipeline.train_batches(cfg, task_id, epoch):
                batch = pipeline.HostBatch(jnp.asarray(b.image),
                                           jnp.asarray(b.mask),
                                           jnp.asarray(b.flip))
                state, _ = step(state, batch, valid)
        for k in range(task_id + 1):
            res = train_lib.evaluate_task(
                cfg, eval_step, state, k,
                np.asarray(valid), mesh=None)
            miou[task_id, k] = res["miou"]
    return miou


@pytest.mark.slow
def test_finetune_miou_parity():
    cfg = _cfg()
    torch_report = _miou_torch(cfg)
    jax_miou = _miou_jax_from_torch_weights(cfg)
    torch_final = np.asarray(torch_report["final_per_task_miou"])
    jax_final = jax_miou[-1]
    # Same data, same init, same arithmetic — within 0.5 mIoU points
    # (BASELINE.md quality gate; float accumulation orders differ).
    np.testing.assert_allclose(jax_final, torch_final, atol=0.005)


@pytest.mark.slow
def test_first_step_loss_parity():
    """Tighter probe: the very first training-step loss must match to 1e-4
    (same weights, same batch, same CE arithmetic)."""
    from cl_tpu import train as train_lib
    from cl_tpu.data import pipeline, tasks as task_lib
    from reference_impl.methods import cross_entropy
    from reference_impl.train import _to_torch
    from reference_impl.unet import UNet as TorchUNet

    cfg = _cfg()
    torch.manual_seed(cfg.train.seed)
    tm = TorchUNet(cfg.data.num_classes, cfg.model.base_channels,
                   cfg.model.depth)
    variables = jax.tree.map(jnp.asarray,
                             torch_state_dict_to_variables(tm.state_dict()))
    model = train_lib.build_model(cfg)
    b = next(iter(pipeline.train_batches(cfg, 0, 0)))
    valid_np = task_lib.valid_class_mask(
        cfg.data.num_classes, task_lib.seen_classes(cfg.classes_per_task, 0))

    # torch side (train mode, batch stats from batch)
    tm.train()
    x_t, y_t = _to_torch(b, cfg)
    loss_t = cross_entropy(tm(x_t), y_t, torch.from_numpy(valid_np))

    # jax side
    from cl_tpu import augment as augment_lib, losses
    x_j, y_j = augment_lib.augment_jnp(
        jnp.asarray(b.image), jnp.asarray(b.mask), jnp.asarray(b.flip),
        out_size=cfg.data.image_size, mean=cfg.data.mean, std=cfg.data.std)
    logits, _ = model.apply(variables, x_j, train=True,
                            mutable=["batch_stats"])
    loss_j, _ = losses.cross_entropy(logits, y_j, jnp.asarray(valid_np))
    np.testing.assert_allclose(float(loss_j), float(loss_t), atol=1e-4)
