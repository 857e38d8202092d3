"""Acceptance-ladder benchmark runner (SURVEY.md §4.5, BASELINE.md).

Runs BASELINE configs 1..5 (scaled-down variants selectable) on the current
device and, optionally, the torch-CPU oracle on the same stream, emitting a
JSON report with images/sec/chip and the per-task mIoU matrix for each rung.

    python benchmarks/run.py                 # configs 1-4 on this device
    python benchmarks/run.py --configs 1,2   # subset
    python benchmarks/run.py --torch         # also run the torch oracle
    python benchmarks/run.py --quick         # tiny shapes (CI smoke)

Config 5 needs a real v5e-8 slice; on fewer devices it runs with whatever
mesh exists and the report records n_devices (never extrapolated —
BASELINE.md measurement protocol).
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


_TORCH_MODS = None


def _torch_mods():
    """Import the torch oracle stack once per process (not per config /
    per transient retry) and fail with a pointed message if the torch
    extra is absent."""
    global _TORCH_MODS
    if _TORCH_MODS is None:
        try:
            import torch

            from cl_tpu.interop import torch_state_dict_to_variables
            from reference_impl.train import train as torch_train
            from reference_impl.unet import UNet as TorchUNet
        except ImportError as e:
            raise SystemExit(
                f"--torch needs the torch-CPU oracle stack ({e}); install "
                "torch (CPU build is enough) or drop --torch") from e
        _TORCH_MODS = (torch, torch_state_dict_to_variables, torch_train,
                       TorchUNet)
    return _TORCH_MODS


def run_config(name: str, *, quick: bool, with_torch: bool,
               overrides: list[str] = ()) -> dict:
    import jax

    from cl_tpu.config import get_preset, parse_overrides
    from cl_tpu.train import train

    cfg = get_preset(name)
    if quick:
        # 128²/48 imgs (r2 bump from 64²/16): at the old shape the mIoU
        # column was near-random (0.04 at 2 epochs) and carried no signal
        # while looking like a parity check (VERDICT r1 weakness 5); at
        # 128² the models train to meaningful mIoU in the same 2 epochs.
        cfg = cfg.replace(
            data=dataclasses.replace(
                cfg.data, image_size=128, source_size=144,
                train_images_per_task=48, val_images_per_task=16,
                batch_size=min(cfg.data.batch_size, 8)),
            # >=2 epochs: the first epoch carries compilation and is
            # excluded from the throughput numbers.
            train=dataclasses.replace(cfg.train, epochs_per_task=2),
        )
    # Overrides apply LAST so they win over the --quick shrink too.
    if overrides:
        cfg = parse_overrides(list(overrides), base=cfg)

    init_variables = None
    if with_torch:
        # Shared initial weights (VERDICT r2 next #8): seed/construct the
        # torch model exactly as reference_impl.train.train will, import
        # its state dict, and hand it to the jax driver — miou_delta then
        # tracks the oracle trajectory instead of init luck (the same
        # machinery ab.py and tests/parity use).
        from cl_tpu.data import tasks as task_lib

        torch, torch_state_dict_to_variables, _, TorchUNet = _torch_mods()
        torch.manual_seed(cfg.train.seed)
        width0 = (cfg.data.num_classes if cfg.model.padded_head else
                  max(task_lib.seen_classes(cfg.classes_per_task, 0)) + 1)
        tm = TorchUNet(width0, cfg.model.base_channels, cfg.model.depth)
        init_variables = torch_state_dict_to_variables(tm.state_dict())

    t0 = time.perf_counter()
    report = train(cfg, init_variables=init_variables)
    wall = time.perf_counter() - t0
    out = {
        "config": name,
        "config_hash": report["config_hash"],
        "n_devices": len(jax.devices()),
        "backend": jax.default_backend(),
        "wall_seconds": round(wall, 2),
        "mean_final_miou": report["mean_final_miou"],
        "final_per_task_miou": report["final_per_task_miou"],
        "mean_forgetting": report["mean_forgetting"],
        "images_per_sec_per_chip": report.get("images_per_sec_per_chip"),
        "eval_images_per_sec_per_chip": report.get(
            "eval_images_per_sec_per_chip"),
        "eval_overhead_seconds": report.get("eval_overhead_seconds"),
    }
    # MFU: analytic model FLOPs (benchmarks/flops.py) against the v5e
    # bf16 peak; the dtype column lets readers discount f32 rungs.
    from benchmarks.flops import mfu, unet_train_flops_per_image
    rate = out["images_per_sec_per_chip"]
    if rate:
        fpi = unet_train_flops_per_image(
            cfg.model.base_channels, cfg.data.image_size,
            cfg.data.num_classes, depth=cfg.model.depth)
        out["train_flops_per_image"] = fpi
        out["mfu"] = round(mfu(rate, fpi), 4)
        out["compute_dtype"] = cfg.train.compute_dtype
    if with_torch:
        torch_train = _torch_mods()[2]
        t0 = time.perf_counter()
        tr = torch_train(cfg)
        out["torch_wall_seconds"] = round(time.perf_counter() - t0, 2)
        out["torch_mean_final_miou"] = tr["mean_final_miou"]
        out["torch_images_per_sec"] = tr.get("images_per_sec_per_chip")
        out["miou_delta"] = out["mean_final_miou"] - tr["mean_final_miou"]
        out["note"] = "shared initial weights (train(init_variables=...))"
        if quick and cfg.train.num_tasks >= 5:
            # 5 tasks of f32-TPU vs f32-CPU rounding compound chaotically
            # at the 2-epoch/48-image quick budget: ±0.07 spread that
            # flips sign with the seed (BASELINE.md "Quick ladder").
            # The acceptance gate is the deterministic matched-arithmetic
            # trajectory suite (tests/parity) + the 512² shared-weights
            # rungs (PARITY.md), not this cell.
            out["miou_delta_below_noise_floor"] = True
        if tr.get("images_per_sec_per_chip"):
            out["speedup_vs_torch_cpu"] = (
                out["images_per_sec_per_chip"] / tr["images_per_sec_per_chip"])
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="1,2,3,4")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--torch", action="store_true")
    p.add_argument("--disk", action="store_true",
                   help="append a disk-fed rung: baseline_3 semantics "
                        "over a real PNG tree (voc_dir layout, generated "
                        "if absent) through decode->HBM-cache->train — "
                        "the deployment input path (VERDICT r4 #8)")
    p.add_argument("--disk-dir", default="/tmp/cl_tpu_png_tree")
    p.add_argument("--out", default="")
    p.add_argument("overrides", nargs="*",
                   help="extra section.key=value overrides applied on top "
                        "of each preset (e.g. data.device_cache=true)")
    args = p.parse_args()

    try:
        rev = os.popen("git -C %s rev-parse --short HEAD"
                       % os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__)))).read().strip()
    except OSError:
        rev = ""

    # One-shot retry on transient device-relay error signatures (the
    # same set bench.py retries): a relay blip mid-ladder should cost a
    # rung re-run, not the whole ladder. Deterministic failures (OOM,
    # shape errors) surface immediately.
    _TRANSIENT = ("FAILED_PRECONDITION", "UNAVAILABLE",
                  "DEADLINE_EXCEEDED", "INTERNAL")

    # One canary compile identifies the relay's compile-service
    # generation for every row of this ladder run (VERDICT r4 next #9).
    from benchmarks.genid import compile_generation
    gen = compile_generation()
    print(f"== compile generation {gen} ==", file=sys.stderr)

    # (display name, preset, extra overrides) per rung; --disk appends
    # the deployment input path as an official ladder rung.
    rungs = [(f"baseline_{c.strip()}", f"baseline_{c.strip()}", [])
             for c in args.configs.split(",") if c.strip()]
    if args.disk:
        img_dir = os.path.join(args.disk_dir, "images")
        if not os.path.isdir(img_dir):
            print(f"== generating PNG tree at {args.disk_dir} ==",
                  file=sys.stderr)
            import subprocess
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "gen_png_tree.py"),
                 "--out", args.disk_dir, "--train", "1024", "--val",
                 "128", "--size", "576", "--classes", "19"], check=True)
        rungs.append(("baseline_3_disk", "baseline_3", [
            "data.dataset=voc_dir", f"data.data_dir={args.disk_dir}",
            "data.train_images_per_task=512",
            "data.val_images_per_task=64", "data.device_cache=true"]))

    results = []
    blob = "[]"
    for name, preset, extra in rungs:
        print(f"== {name} ==", file=sys.stderr)
        over = extra + list(args.overrides)
        try:
            row = run_config(preset, quick=args.quick,
                             with_torch=args.torch,
                             overrides=over)
        except Exception as e:
            if not any(s in str(e) for s in _TRANSIENT) \
                    or "Ran out of memory" in str(e):
                raise
            print(f"== {name} transient failure ({type(e).__name__}); "
                  "retrying once ==", file=sys.stderr)
            time.sleep(10)
            row = run_config(preset, quick=args.quick,
                             with_torch=args.torch,
                             overrides=over)
        row["config"] = name
        results.append(row)
        results[-1]["compile_generation"] = gen["id"]
        if rev:
            results[-1]["git_rev"] = rev
        if over:
            results[-1]["overrides"] = over
        print(json.dumps(results[-1], default=float), file=sys.stderr)
        # Flush after every rung: a crash on a later config (e.g. an HBM
        # OOM at a bigger shape) must not lose the finished rows.
        blob = json.dumps(results, default=float, indent=1)
        if args.out:
            with open(args.out, "w") as f:
                f.write(blob)
    print(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
