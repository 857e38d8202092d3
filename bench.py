"""Headline benchmark: train images/sec/chip, UNet-32 @ 512², bf16, vs the
torch-CPU reference implementation (BASELINE.md — the reference repo
publishes no numbers; the acceptance target is >=3x torch-CPU).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The torch-CPU baseline is measured once on this host and cached in
``.bench_baseline.json`` (keyed by a benchmark-shape hash); delete the file
to re-measure. ``--small`` runs a 128² variant for quick checks.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_baseline.json")

# Benchmark shape: config-5 geometry on one chip (BASELINE.json:11), no CL
# methods in the step (the headline metric is the UNet train step itself).
IMG = 512
SRC = 576
BATCH = 8
BASE_CH = 32
CLASSES = 19
WARMUP = 10
STEPS = 100
TORCH_STEPS = 5


def _shape_key(img: int) -> str:
    return f"unet{BASE_CH}_c{CLASSES}_b{BATCH}_i{img}"


def _host_batches(img: int, src: int, n: int):
    """Deterministic uint8 batches shared by both frameworks."""
    from cl_tpu.config import parse_overrides
    from cl_tpu.data import pipeline

    cfg = parse_overrides([
        f"data.num_classes={CLASSES}", f"data.image_size={img}",
        f"data.source_size={src}", f"data.batch_size={BATCH}",
        f"data.train_images_per_task={BATCH * 4}",
        f"model.base_channels={BASE_CH}",
    ])
    out = []
    it = pipeline.train_batches(cfg, 0, epoch=0)
    while len(out) < n:
        for b in it:
            out.append(b)
            if len(out) >= n:
                break
        it = pipeline.train_batches(cfg, 0, epoch=len(out))
    return cfg, out


def bench_jax(img: int, src: int) -> float:
    import jax.numpy as jnp

    from cl_tpu import train as train_lib
    from cl_tpu.data import pipeline, tasks as task_lib

    cfg, host = _host_batches(img, src, 4)
    cfg = cfg.replace(train=cfg.train.__class__(
        **{**cfg.train.__dict__, "compute_dtype": "bfloat16",
           "data_parallel": False}))
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    step = train_lib.make_train_step(cfg, model, tx, mesh=None)
    valid = jnp.asarray(task_lib.valid_class_mask(
        CLASSES, task_lib.seen_classes(cfg.classes_per_task, 0)))
    dev = [pipeline.HostBatch(jnp.asarray(b.image), jnp.asarray(b.mask),
                              jnp.asarray(b.flip)) for b in host]

    for i in range(WARMUP):
        state, aux = step(state, dev[i % len(dev)], valid)
    float(aux["loss"])  # host fetch = the only reliable sync through the
    #                     axon relay (block_until_ready returns early there)

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, aux = step(state, dev[i % len(dev)], valid)
    float(aux["loss"])  # aux depends on the full state chain
    dt = (time.perf_counter() - t0) / STEPS
    return BATCH / dt  # images/sec on this one chip


def bench_torch(img: int, src: int) -> float:
    import torch

    from cl_tpu.data import tasks as task_lib
    from reference_impl.train import _to_torch
    from reference_impl.methods import cross_entropy
    from reference_impl.unet import UNet

    cfg, host = _host_batches(img, src, 3)
    torch.manual_seed(0)
    model = UNet(CLASSES, BASE_CH, 4)
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    valid = torch.from_numpy(task_lib.valid_class_mask(
        CLASSES, task_lib.seen_classes(cfg.classes_per_task, 0)))
    model.train()

    def one(b):
        x, y = _to_torch(b, cfg)
        loss = cross_entropy(model(x), y, valid)
        opt.zero_grad()
        loss.backward()
        opt.step()

    one(host[0])  # warmup
    t0 = time.perf_counter()
    for i in range(TORCH_STEPS):
        one(host[i % len(host)])
    dt = (time.perf_counter() - t0) / TORCH_STEPS
    return BATCH / dt


def main() -> int:
    img, src = (128, 160) if "--small" in sys.argv else (IMG, SRC)
    key = _shape_key(img)

    cache = {}
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            cache = json.load(f)
    if key not in cache or "--remeasure" in sys.argv:
        cache[key] = bench_torch(img, src)
        with open(CACHE, "w") as f:
            json.dump(cache, f)
    baseline = cache[key]

    # The device relay on this box occasionally drops a program with a
    # transient runtime error; retry once on THOSE signatures only —
    # deterministic failures (OOM, shape errors) surface immediately.
    _TRANSIENT = ("FAILED_PRECONDITION", "UNAVAILABLE", "DEADLINE_EXCEEDED",
                  "INTERNAL")
    try:
        value = bench_jax(img, src)
    except Exception as e:
        if not any(s in str(e) for s in _TRANSIENT):
            raise
        print(f"# bench_jax failed ({type(e).__name__}: {e}); retrying once",
              file=sys.stderr)
        time.sleep(10)
        value = bench_jax(img, src)
    print(json.dumps({
        "metric": f"train_images_per_sec_per_chip_unet{BASE_CH}_{img}px_bf16",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
