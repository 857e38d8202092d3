"""Generate a PNG directory tree for the disk-fed pipeline benchmark
(VERDICT r3 next #3; SURVEY.md §1 L1 "decode" hard part).

Every published perf row feeds the chip from the synthetic rasterizer or
the HBM cache; this writes the SAME synthetic content as real PNG files
in the `voc_dir` layout so `disk_bench.py` can measure the full
disk → PNG-decode → resize → H2D → train path at the acceptance shape:

    python benchmarks/gen_png_tree.py --out /tmp/png_tree --train 1024 \
        --val 128 --size 576 --classes 19

Layout written (cl_tpu/data/directory.py contract):
    {out}/images/{train,val}/NNNNN.png   RGB uint8
    {out}/masks/{train,val}/NNNNN.png    uint8 class ids (255 = ignore)
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--train", type=int, default=1024)
    p.add_argument("--val", type=int, default=128)
    p.add_argument("--size", type=int, default=576)
    p.add_argument("--classes", type=int, default=19)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from PIL import Image

    from cl_tpu.data.synthetic_native import NativeSyntheticSegDataset

    classes = list(range(args.classes))
    t0 = time.perf_counter()
    for split, n in (("train", args.train), ("val", args.val)):
        img_dir = os.path.join(args.out, "images", split)
        mask_dir = os.path.join(args.out, "masks", split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(mask_dir, exist_ok=True)
        # remap=False: masks carry GLOBAL class ids on disk; the
        # directory loader remaps per task at load time, like real data.
        ds = NativeSyntheticSegDataset(
            num_images=n, size=args.size, task_classes=classes,
            seed=args.seed, split=split, remap=False)

        def write(i):
            img, mask = ds[i]
            Image.fromarray(img).save(
                os.path.join(img_dir, f"{i:05d}.png"))
            Image.fromarray(mask).save(
                os.path.join(mask_dir, f"{i:05d}.png"))

        with cf.ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(write, range(n)))
        print(f"{split}: {n} images at {args.size}² → {img_dir}",
              file=sys.stderr)
    wall = time.perf_counter() - t0
    du = sum(os.path.getsize(os.path.join(r, f))
             for r, _, fs in os.walk(args.out) for f in fs)
    print(f"wrote {args.train + args.val} pairs in {wall:.1f}s, "
          f"{du / 1e6:.0f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
