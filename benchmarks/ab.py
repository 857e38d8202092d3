"""Method A/B harness (VERDICT r1 item 5; BASELINE.md forgetting target).

Runs the SAME shape with the method set swapped — finetune / ewc / lwf /
replay / all — and reports per-task mIoU + forgetting for each, so the
mitigation effect of every CL method is measured, not assumed. With
``--torch`` each rung ALSO runs the torch-CPU oracle from IDENTICAL
initial weights (train(init_variables=...) + the shared seeded stream),
so the jax column tracks the oracle, not init luck.

    python benchmarks/ab.py --preset baseline_3 --out ab512.json
    python benchmarks/ab.py --preset baseline_3 --lambda-sweep 1e2,1e4,1e6
    python benchmarks/ab.py --size 128 --torch          # oracle columns

``--size/--images/--epochs`` shrink the preset shape (torch at 512² is
~0.07 img/s on this host — use a reduced shape for oracle columns and
label it; the jax-only 512² rows are the acceptance shape).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AB_METHODS = {
    "finetune": "",
    "ewc": "ewc",
    "lwf": "lwf",
    "replay": "replay",
    "all": "ewc,lwf,replay",
}


def build_cfg(args, methods: str, ewc_lambda: float | None = None):
    from cl_tpu.config import get_preset, parse_overrides

    cfg = get_preset(args.preset)
    over = [f"method.methods={methods}"]
    if args.size:
        over += [f"data.image_size={args.size}",
                 f"data.source_size={args.size + args.size // 8}"]
    if args.images:
        over += [f"data.train_images_per_task={args.images}",
                 f"data.val_images_per_task={max(8, args.images // 4)}"]
    if args.epochs:
        over += [f"train.epochs_per_task={args.epochs}"]
    if ewc_lambda is not None:
        over += [f"method.ewc_lambda={ewc_lambda}"]
    # Single-process A/B: no DP requirement on the widened batch here.
    over += ["train.data_parallel=false"]
    return parse_overrides(over, base=cfg)


def run_rung(cfg, with_torch: bool) -> dict:
    from cl_tpu.train import train

    init_variables = None
    torch_cols = {}
    if with_torch:
        import torch

        from cl_tpu.interop import torch_state_dict_to_variables
        from reference_impl.train import train as torch_train
        from reference_impl.unet import UNet as TorchUNet

        torch.manual_seed(cfg.train.seed)
        tm = TorchUNet(cfg.data.num_classes, cfg.model.base_channels,
                       cfg.model.depth)
        init_variables = torch_state_dict_to_variables(tm.state_dict())
        t0 = time.perf_counter()
        tr = torch_train(cfg)
        torch_cols = {
            "torch_wall_seconds": round(time.perf_counter() - t0, 2),
            "torch_final_per_task_miou": tr["final_per_task_miou"],
            "torch_mean_forgetting": tr["mean_forgetting"],
            "torch_forgetting_per_task": tr["forgetting_per_task"],
        }

    t0 = time.perf_counter()
    report = train(cfg, init_variables=init_variables)
    out = {
        "wall_seconds": round(time.perf_counter() - t0, 2),
        "final_per_task_miou": report["final_per_task_miou"],
        "mean_final_miou": report["mean_final_miou"],
        "forgetting_per_task": report["forgetting_per_task"],
        "mean_forgetting": report["mean_forgetting"],
        "miou_matrix": report["miou_matrix"],
        **torch_cols,
    }
    if with_torch:
        out["max_miou_delta"] = float(np.max(np.abs(
            np.asarray(out["final_per_task_miou"])
            - np.asarray(out["torch_final_per_task_miou"]))))
        if out["forgetting_per_task"]:
            out["max_forgetting_gap"] = float(np.max(np.abs(
                np.asarray(out["forgetting_per_task"])
                - np.asarray(out["torch_forgetting_per_task"]))))
        out["note"] = "shared initial weights (train(init_variables=...))"
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="baseline_3")
    p.add_argument("--size", type=int, default=0, help="override image_size")
    p.add_argument("--images", type=int, default=0,
                   help="override train_images_per_task")
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--torch", action="store_true",
                   help="oracle columns from shared initial weights")
    p.add_argument("--methods", default="finetune,ewc,lwf,replay,all")
    p.add_argument("--lambda-sweep", default="",
                   help="comma-separated ewc_lambda values (EWC-only rows)")
    p.add_argument("--out", default="")
    args = p.parse_args()

    results = []
    if args.lambda_sweep:
        for lam in args.lambda_sweep.split(","):
            cfg = build_cfg(args, "ewc", ewc_lambda=float(lam))
            print(f"== ewc lambda={lam} ==", file=sys.stderr)
            row = {"method": "ewc", "ewc_lambda": float(lam),
                   **run_rung(cfg, args.torch)}
            results.append(row)
            print(json.dumps(row, default=float), file=sys.stderr)
    else:
        for name in args.methods.split(","):
            cfg = build_cfg(args, AB_METHODS[name.strip()])
            print(f"== {name} ==", file=sys.stderr)
            row = {"method": name, **run_rung(cfg, args.torch)}
            results.append(row)
            print(json.dumps(row, default=float), file=sys.stderr)

    meta = {"preset": args.preset,
            "overrides": {k: getattr(args, k) for k in
                          ("size", "images", "epochs") if getattr(args, k)}}
    blob = json.dumps({"meta": meta, "rows": results}, default=float,
                      indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob)
    print(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
