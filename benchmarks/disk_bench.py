"""Disk-fed input-pipeline benchmark at the acceptance shape (VERDICT r3
next #3; SURVEY.md §1 L1, §7 hard part "decode").

Every other perf row feeds the chip from the in-memory rasterizer or the
HBM cache; this measures the REAL deployment path — PNG files on disk →
threaded PIL decode → host resize → uint8 H2D → fused device-side
augmentation → train step — on a tree written by `gen_png_tree.py`:

    python benchmarks/gen_png_tree.py --out /tmp/png_tree --train 1024 \
        --val 128 --size 576 --classes 19
    python benchmarks/disk_bench.py --data /tmp/png_tree --out \
        benchmarks/disk_bench.json

Reports three tiers:
  decode_only     host decode+resize rate, no device (the producer ceiling)
  disk_per_step   full driver, per-step host→HBM feeding (device_cache off)
  disk_hbm_cache  full driver, decode once → HBM-resident cache + epoch scan
plus the synthetic in-memory rate at the same shape for the decode-cost
delta.  On this box the relay serializes H2D (DESIGN.md §5) — the
disk_per_step tier is relay-bound before it is decode-bound; the
decode_only tier is the honest producer-side number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def decode_only_rate(cfg, n_batches: int = 24) -> dict:
    """Host-side producer rate: threaded PNG decode + resize to uint8
    batches, no device involved."""
    from cl_tpu.data import pipeline

    ds, _ = pipeline.make_datasets(cfg, 0)
    bs = cfg.data.batch_size
    # Modular batch indexing: a slice crossing the dataset end wraps to
    # FRESH rows instead of replaying idx[:bs] (which the warmup below
    # already decoded — the replay inflated the ceiling with page-cache /
    # PIL-warm re-reads, ADVICE r4 #2). The warmup batch uses rows the
    # counted window never revisits while n_batches*bs < len(ds).
    start = (n_batches * bs) % len(ds)
    ds.get_batch((start + np.arange(bs)) % len(ds))  # warm cache/pool
    t0 = time.perf_counter()
    n = 0
    for i in range(n_batches):
        ds.get_batch(np.arange(i * bs, (i + 1) * bs) % len(ds))
        n += bs
    dt = time.perf_counter() - t0
    return {"images_per_sec": round(n / dt, 2), "batches": n_batches,
            "n_items": len(ds)}


def run_driver(cfg) -> dict:
    from cl_tpu.train import train

    t0 = time.perf_counter()
    rep = train(cfg)
    return {"images_per_sec_per_chip": rep.get("images_per_sec_per_chip"),
            "wall_seconds": round(time.perf_counter() - t0, 2),
            "mean_final_miou": rep["mean_final_miou"]}


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data", required=True)
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--profile-dir", default="")
    p.add_argument("--out", default="")
    args = p.parse_args()

    from cl_tpu.config import parse_overrides

    base = [
        "data.dataset=voc_dir", f"data.data_dir={args.data}",
        "data.num_classes=19", "data.image_size=512",
        "data.source_size=576", f"data.batch_size={args.batch}",
        f"data.train_images_per_task={args.images}",
        "data.val_images_per_task=64",
        "model.base_channels=32", "method.methods=",
        f"train.epochs_per_task={args.epochs}",
        "train.compute_dtype=bfloat16", "train.data_parallel=false",
    ]
    res = {"meta": {"data_dir": args.data, "images": args.images,
                    "epochs": args.epochs, "batch": args.batch,
                    "rev": os.popen("git rev-parse --short HEAD")
                    .read().strip()}}

    cfg = parse_overrides(list(base))
    print("== tier: decode_only ==", file=sys.stderr)
    res["decode_only"] = decode_only_rate(cfg)
    print(json.dumps(res["decode_only"]), file=sys.stderr)

    tiers = [
        ("disk_per_step", ["data.device_cache=false"]),
        ("disk_hbm_cache", ["data.device_cache=true"]),
        ("synthetic_hbm_cache", ["data.dataset=synthetic_native",
                                 "data.device_cache=true"]),
    ]
    for name, extra in tiers:
        over = list(base) + extra
        if args.profile_dir and name == "disk_per_step":
            over.append(f"train.profile_dir={args.profile_dir}")
        cfg = parse_overrides(over)
        print(f"== tier: {name} ==", file=sys.stderr)
        res[name] = run_driver(cfg)
        print(json.dumps(res[name]), file=sys.stderr)

    blob = json.dumps(res, indent=1, default=float)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob)
    print(blob)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
