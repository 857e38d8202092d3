"""Attribute the 512² bf16 train step's device time to MODEL SUBSYSTEMS.

The raw trace's op names (``fusion.453``, ``convert_reduce_fusion.5``)
say nothing; this tool compiles the step, maps every HLO instruction to
its ``metadata.op_name`` (the jax-level path: ``jvp(...)/enc0/bn1/...``),
records a fresh 5-step trace, and aggregates device time by
(layer, primitive kind). This is the table that decides which Pallas
kernel to build next (DESIGN.md §8 discipline).

    python benchmarks/attribute_step.py [--out=...]

Run ALONE on the box — host contention skews chip numbers.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hlo_metadata_map(hlo_text: str) -> dict[str, str]:
    """fusion/op NAME -> jax metadata op_name, from compiled HLO text.

    For fusions, the root instruction's metadata is what the fusion
    computes; HLO text puts each instruction's metadata on its own line,
    so map every named instruction, then let callers look up exact trace
    names."""
    out: dict[str, str] = {}
    pat = re.compile(r"%?([\w.\-]+)\s*=.*?metadata={[^}]*op_name=\"([^\"]+)\"")
    for line in hlo_text.splitlines():
        m = pat.search(line)
        if m:
            out[m.group(1)] = m.group(2)
    return out


def classify(meta: str, hlo_name: str) -> tuple[str, str]:
    """(subsystem, layer) from a jax metadata path like
    ``transpose(jvp(UNet))/enc0/conv0/conv_general_dilated``."""
    low = meta.lower()
    is_bwd = "transpose" in low
    layer = "?"
    m = re.search(r"/((?:enc|dec|bot|head|up|eltwise|pool)[\w]*)/", low)
    if m:
        layer = m.group(1)
    if "/bn" in low or "batch_norm" in low or "batchnorm" in low:
        kind = "batchnorm"
    elif "conv_transpose" in low or "/up" in low and "conv" in low:
        kind = "upconv"
    elif "conv" in low:
        kind = "conv"
    elif "max_pool" in low or "reduce_window" in low or \
            "select_and_scatter" in hlo_name:
        kind = "maxpool"
    elif "loss" in low or "softmax" in low or "log_softmax" in low or \
            "cross_entropy" in low or "take_along" in low:
        kind = "loss"
    elif "adam" in low or "sgd" in low or "optax" in low or \
            "update" in low:
        kind = "optimizer"
    elif "augment" in low or "resize" in low or "normalize" in low or \
            "flip" in low:
        kind = "augment"
    else:
        kind = "other"
    return (f"{kind}_{'bwd' if is_bwd else 'fwd'}", layer)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from cl_tpu import train as train_lib
    from cl_tpu.config import parse_overrides
    from cl_tpu.data import pipeline, tasks as task_lib

    out_path = ""
    for a in sys.argv:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    over = [
        "data.num_classes=19", "data.image_size=512",
        "data.source_size=576", "data.batch_size=8",
        "data.train_images_per_task=32",
        "model.base_channels=32", "train.compute_dtype=bfloat16",
        "train.data_parallel=false",
    ]
    for a in sys.argv:
        if a.startswith("--set="):  # any config override, e.g.
            over.append(a.split("=", 1)[1])  # --set=model.packed_unet=true
    cfg = parse_overrides(over)
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    step = train_lib.make_train_step(cfg, model, tx, mesh=None)
    valid = jnp.asarray(task_lib.valid_class_mask(
        cfg.data.num_classes,
        task_lib.seen_classes(cfg.classes_per_task, 0)))
    host = list(pipeline.train_batches(cfg, 0, epoch=0))
    dev = [pipeline.HostBatch(jnp.asarray(b.image), jnp.asarray(b.mask),
                              jnp.asarray(b.flip)) for b in host]

    meta_map = hlo_metadata_map(
        step.lower(state, dev[0], valid).compile().as_text())

    for i in range(6):
        state, aux = step(state, dev[i % len(dev)], valid)
    float(aux["loss"])

    trace_dir = "/tmp/tpu_trace_attr"
    with jax.profiler.trace(trace_dir):
        for i in range(5):
            state, aux = step(state, dev[i % len(dev)], valid)
        float(aux["loss"])

    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")),
        key=os.path.getmtime)
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    pnames = {e["pid"]: e["args"].get("name", "")
              for e in events if e.get("ph") == "M"
              and e.get("name") == "process_name"}
    tpu_pids = {pid for pid, n in pnames.items()
                if "TPU" in n or "/device" in n.lower()}
    parent = re.compile(r"^(jit_|\d+$)")
    per_op: dict[str, float] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        if parent.match(name):
            continue
        per_op[name] = per_op.get(name, 0.0) + e.get("dur", 0.0)

    by_kind: dict[str, float] = {}
    by_layer_kind: dict[str, float] = {}
    unattributed = 0.0
    rows = []
    for name, us in per_op.items():
        meta = meta_map.get(name, "")
        if not meta:
            unattributed += us
            kind, layer = ("unknown", "?")
        else:
            kind, layer = classify(meta, name)
        by_kind[kind] = by_kind.get(kind, 0.0) + us
        by_layer_kind[f"{layer}/{kind}"] = \
            by_layer_kind.get(f"{layer}/{kind}", 0.0) + us
        rows.append((us, name, meta))

    ms = lambda us: round(us / 5000.0, 2)  # noqa: E731  (5 traced steps)
    report = {
        "total_ms_per_step": ms(sum(per_op.values())),
        "unattributed_ms": ms(unattributed),
        "by_kind_ms": {k: ms(v) for k, v in sorted(
            by_kind.items(), key=lambda kv: -kv[1])},
        "by_layer_kind_ms": {k: ms(v) for k, v in sorted(
            by_layer_kind.items(), key=lambda kv: -kv[1])[:30]},
        "top_ops": [{"ms": ms(us), "op": n, "meta": m}
                    for us, n, m in sorted(rows, key=lambda r: -r[0])[:30]],
    }
    print(json.dumps(report, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
