"""Dtype-trajectory numerics harness (VERDICT r3 next #2).

Runs the FULL continual driver twice (or more) at a fixed shape with
IDENTICAL config, seed, data stream, and initial weights — differing only
in a dtype-affecting override set — and reports per-task mIoU + forgetting
deltas vs the f32 base run.  This is the end-to-end gate that turns
"bf16 runs, loss is finite" into a measured trajectory-level bound, and it
is reused verbatim for any lossy-storage variant (int8 saved activations:
``model.conv_act_store=int8``) — the int8 gate is exactly the bf16 gate
with a different variant row.

    python benchmarks/dtype_traj.py --preset baseline_3 --size 128 \
        --images 48 --epochs 2 --out dtype_traj_128.json
    python benchmarks/dtype_traj.py --preset baseline_3 \
        --out dtype_traj_512.json          # on-chip acceptance-shape point

Variants are named override sets; add rows with --variants (comma list of
names from VARIANTS).  Reference behavior pinned by SURVEY.md §6
(determinism target) and BASELINE.json:11 (bf16 is config 5's property).
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

# Each variant: overrides applied on top of the base config. The base run
# is always plain f32 ("f32" row, empty overrides).
VARIANTS: dict[str, list[str]] = {
    "bf16": ["train.compute_dtype=bfloat16"],
    # int8 saved-activation storage in the packed conv backward (r4): the
    # forward epilogue quantizes the saved activations symmetric int8
    # with per-row scales (per image row x lane — conv3x3_v3._quant_rows);
    # dx/dW dequantize in-register. bf16 compute + int8 storage is the
    # production combination the headline benchmark would ship.
    "bf16_int8act": ["train.compute_dtype=bfloat16",
                     "model.conv_act_store=int8"],
    "f32_int8act": ["model.conv_act_store=int8"],
}


def build_base_cfg(args):
    from cl_tpu.config import get_preset, parse_overrides

    cfg = get_preset(args.preset)
    over = ["train.data_parallel=false", "train.compute_dtype=float32"]
    if args.size:
        over += [f"data.image_size={args.size}",
                 f"data.source_size={args.size + args.size // 8}"]
    if args.images:
        over += [f"data.train_images_per_task={args.images}",
                 f"data.val_images_per_task={max(8, args.images // 4)}"]
    if args.epochs:
        over += [f"train.epochs_per_task={args.epochs}"]
    # Extra base overrides (applied to EVERY variant row, so deltas stay
    # apples-to-apples) — e.g. model.packed_min_size=0 so the packed
    # body (the int8 storage's domain) engages at sub-256² shapes.
    over += list(args.over or [])
    return parse_overrides(over, base=cfg)


def shared_init_variables(cfg):
    """One f32 init shared by every run (belt-and-braces: init is seeded
    f32 and dtype-independent anyway, but sharing removes all doubt).
    Held as HOST numpy — train() donates its state, so each run must
    get its own device copy."""
    import jax

    from cl_tpu import train as train_lib

    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    return jax.tree.map(np.asarray,
                        {"params": state.params, **state.model_state})


def run_variants(cfg_base, variant_names, *, progress=lambda s: None) -> dict:
    """Full-driver trajectory for f32 + each named variant; deltas vs f32.

    Returns {"rows": [...]} where each row carries final_per_task_miou,
    forgetting_per_task, and (for non-base rows) max_miou_delta /
    max_forgetting_gap vs the f32 base.
    """
    from cl_tpu.config import parse_overrides
    from cl_tpu.train import train

    init_variables = shared_init_variables(cfg_base)
    rows = []
    base_row = None
    for name in ["f32", *variant_names]:
        over = VARIANTS.get(name, []) if name != "f32" else []
        cfg = parse_overrides(list(over), base=cfg_base)
        progress(f"== dtype_traj: {name} ==")
        t0 = time.perf_counter()
        rep = train(cfg, init_variables=init_variables)
        row = {
            "variant": name,
            "overrides": list(over),
            "wall_seconds": round(time.perf_counter() - t0, 2),
            "final_per_task_miou": rep["final_per_task_miou"],
            "mean_final_miou": rep["mean_final_miou"],
            "forgetting_per_task": rep["forgetting_per_task"],
            "mean_forgetting": rep["mean_forgetting"],
            "images_per_sec_per_chip": rep.get("images_per_sec_per_chip"),
        }
        if base_row is None:
            base_row = row
        else:
            row["max_miou_delta"] = float(np.max(np.abs(
                np.asarray(row["final_per_task_miou"])
                - np.asarray(base_row["final_per_task_miou"]))))
            if row["forgetting_per_task"]:
                row["max_forgetting_gap"] = float(np.max(np.abs(
                    np.asarray(row["forgetting_per_task"])
                    - np.asarray(base_row["forgetting_per_task"]))))
        rows.append(row)
        progress(json.dumps(row, default=float))
    return {"rows": rows}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="baseline_3")
    p.add_argument("--size", type=int, default=0)
    p.add_argument("--images", type=int, default=0)
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--variants", default="bf16")
    p.add_argument("--over", nargs="*", default=[],
                   help="extra section.key=value base overrides")
    p.add_argument("--out", default="")
    args = p.parse_args()

    cfg = build_base_cfg(args)
    res = run_variants(cfg, [v.strip() for v in args.variants.split(",")],
                       progress=lambda s: print(s, file=sys.stderr))
    import jax
    res["meta"] = {
        "preset": args.preset, "backend": jax.default_backend(),
        "image_size": cfg.data.image_size,
        "train_images_per_task": cfg.data.train_images_per_task,
        "epochs_per_task": cfg.train.epochs_per_task,
        "num_tasks": cfg.train.num_tasks,
        "rev": os.popen(
            "git -C %s rev-parse --short HEAD" % os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))).read().strip(),
    }
    blob = json.dumps(res, default=float, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob)
    print(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
