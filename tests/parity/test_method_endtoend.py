"""Shared-weights end-to-end METHOD parity gates (VERDICT round-1 item 1;
BASELINE.md quality + forgetting targets): for each CL method — EWC, LwF,
replay, and all three together — the torch-CPU oracle and cl_tpu train the
FULL multi-task driver from identical initial weights on the identical
seeded data stream. Per-task mIoU must agree within 0.5 pts AND the
forgetting-per-task gap must be ≈ 0 ("no measurable forgetting gap vs the
PyTorch reference", BASELINE.json:5).

Unlike tests/parity/test_endtoend.py's hand-rolled loop, these run the real
``cl_tpu.train.train`` driver (after-task hooks, Fisher pass, snapshots,
buffer fills) with ``init_variables`` injected from the torch init — so the
whole L3/L4 surface is inside the gate, not just the step math.
"""

import numpy as np
import pytest
import torch

from cl_tpu.config import parse_overrides
from cl_tpu.interop import torch_state_dict_to_variables

ATOL_MIOU = 0.005  # 0.5 mIoU points (BASELINE.md quality gate)

METHOD_OVERRIDES = {
    "ewc": ["method.methods=ewc"],
    "lwf": ["method.methods=lwf"],
    "replay": ["method.methods=replay"],
    "all": ["method.methods=ewc,lwf,replay"],
}


def _cfg(extra=()):
    return parse_overrides([
        "preset=smoke", "data.num_classes=3", "data.image_size=32",
        "data.source_size=40", "data.batch_size=4",
        "data.train_images_per_task=16", "data.val_images_per_task=8",
        "train.epochs_per_task=2", "train.num_tasks=2",
        "train.data_parallel=false", "train.optimizer=sgd", "train.lr=0.05",
        "model.base_channels=8", *extra])


def run_pair(extra):
    """(torch_report, jax_report) from IDENTICAL initial weights."""
    from cl_tpu import train as train_lib
    from reference_impl.train import train as torch_train
    from reference_impl.unet import UNet as TorchUNet

    cfg = _cfg(extra)
    # torch_train re-seeds and constructs the same UNet, so this snapshot
    # IS the oracle's initial state.
    torch.manual_seed(cfg.train.seed)
    tm = TorchUNet(cfg.data.num_classes, cfg.model.base_channels,
                   cfg.model.depth)
    variables = torch_state_dict_to_variables(tm.state_dict())
    torch_report = torch_train(cfg)
    jax_report = train_lib.train(cfg, init_variables=variables)
    return torch_report, jax_report


def assert_parity(torch_report, jax_report):
    np.testing.assert_allclose(
        np.asarray(jax_report["final_per_task_miou"]),
        np.asarray(torch_report["final_per_task_miou"]),
        atol=ATOL_MIOU,
        err_msg="per-task mIoU gate (0.5 pts) violated")
    np.testing.assert_allclose(
        np.asarray(jax_report["forgetting_per_task"]),
        np.asarray(torch_report["forgetting_per_task"]),
        atol=ATOL_MIOU,
        err_msg="forgetting-gap gate violated")


@pytest.mark.slow
@pytest.mark.parametrize("method", ["ewc", "lwf", "replay", "all"])
def test_method_miou_and_forgetting_parity(method):
    torch_report, jax_report = run_pair(METHOD_OVERRIDES[method])
    assert_parity(torch_report, jax_report)


@pytest.mark.slow
def test_ewc_separate_mode_parity():
    """The per-task (θ*_t, F_t) formulation, 3 tasks."""
    torch_report, jax_report = run_pair(
        ["method.methods=ewc", "method.ewc_mode=separate",
         "data.num_classes=4", "train.num_tasks=3"])
    assert_parity(torch_report, jax_report)


if __name__ == "__main__":
    # Manual run: print the measured deltas for PARITY.md.
    import json

    rows = dict(METHOD_OVERRIDES)
    rows["finetune"] = []
    for name, extra in rows.items():
        tr, jr = run_pair(extra)
        print(json.dumps({
            "method": name,
            "jax_final_miou": jr["final_per_task_miou"],
            "torch_final_miou": tr["final_per_task_miou"],
            "max_miou_delta": float(np.max(np.abs(
                np.asarray(jr["final_per_task_miou"])
                - np.asarray(tr["final_per_task_miou"])))),
            "jax_forgetting": jr["forgetting_per_task"],
            "torch_forgetting": tr["forgetting_per_task"],
            "max_forgetting_gap": float(np.max(np.abs(
                np.asarray(jr["forgetting_per_task"])
                - np.asarray(tr["forgetting_per_task"])))) if
                jr["forgetting_per_task"] else 0.0,
        }))
