"""Per-op profile of the 512² bf16 train step on the real chip.

Measures the steady-state step, runs XLA cost analysis (FLOPs / bytes →
MFU and HBM-roofline fractions), and with ``--trace`` records a
jax.profiler trace and aggregates the device track into a per-op table
(the DESIGN.md §8 numbers and the VERDICT-r1 trace artifact).

    python benchmarks/profile_step.py                 # step time + roofline
    python benchmarks/profile_step.py --batch=16
    python benchmarks/profile_step.py --methods       # config-5 step
    python benchmarks/profile_step.py --trace --out=benchmarks/step_profile.json

Run ALONE on this box — host contention skews chip numbers (memory:
axon-relay-measurement). Sync is a loss fetch, not block_until_ready.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e peak: 197 TFLOP/s bf16, 819 GB/s HBM.
PEAK_TFLOPS, PEAK_GBS = 197.0, 819.0

CATEGORIES = [
    ("convolution", re.compile(r"convolution|conv_general|%conv")),
    ("reduce (BN stats/grads)", re.compile(r"reduce|all-reduce")),
    ("fusion (conv+elementwise)", re.compile(r"^(loop_)?fusion")),
    ("copy/transpose/layout", re.compile(r"copy|transpose|bitcast|reshape")),
    ("pallas custom-call", re.compile(r"custom-call|tpu_custom_call")),
    ("scatter/gather", re.compile(r"scatter|gather|dynamic-slice|"
                                  r"dynamic_update")),
]


def categorize(name: str) -> str:
    for cat, pat in CATEGORIES:
        if pat.search(name):
            return cat
    return "other"


def parse_trace(trace_dir: str) -> dict:
    """Aggregate the newest trace's TPU-track complete events by op name."""
    files = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")), key=os.path.getmtime)
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]
    # pid -> process name from metadata events
    pnames = {e["pid"]: e["args"].get("name", "")
              for e in events if e.get("ph") == "M"
              and e.get("name") == "process_name"}
    tpu_pids = {pid for pid, n in pnames.items()
                if "TPU" in n or "/device" in n.lower()}
    per_op: dict[str, float] = {}
    # Parent/container events (the jit_step region and the bare-digit
    # module lanes) span the whole step and would double-count every op.
    parent = re.compile(r"^(jit_|\d+$)")
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        if parent.match(name):
            continue
        per_op[name] = per_op.get(name, 0.0) + e.get("dur", 0.0)
    per_cat: dict[str, float] = {}
    for name, us in per_op.items():
        c = categorize(name)
        per_cat[c] = per_cat.get(c, 0.0) + us
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    return {"trace_file": files[-1],
            "tpu_processes": [pnames[p] for p in tpu_pids],
            "per_category_us": dict(
                sorted(per_cat.items(), key=lambda kv: -kv[1])),
            "top_ops_us": [{"op": k, "us": round(v, 1)} for k, v in top]}


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cl_tpu import train as train_lib
    from cl_tpu.config import parse_overrides
    from cl_tpu.data import pipeline, tasks as task_lib

    batch = 8
    for a in sys.argv:
        if a.startswith("--batch="):
            batch = int(a.split("=", 1)[1])
    methods = "--methods" in sys.argv
    out_path = ""
    for a in sys.argv:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]

    over = [
        "data.num_classes=19", "data.image_size=512",
        "data.source_size=576", f"data.batch_size={batch}",
        f"data.train_images_per_task={batch * 4}",
        "model.base_channels=32", "train.compute_dtype=bfloat16",
        "train.data_parallel=false",
    ]
    for a in sys.argv:
        if a.startswith("--conv="):
            over.append(f"model.conv_impl={a.split('=', 1)[1]}")
        if a.startswith("--upconv="):
            over.append(f"model.upconv_impl={a.split('=', 1)[1]}")
        if a.startswith("--set="):  # any config override, e.g.
            over.append(a.split("=", 1)[1])  # --set=train.fused_head_ce=false
    if methods:
        over += ["method.methods=ewc,lwf,replay",
                 f"method.replay_batch={max(1, batch // 8)}"]
    cfg = parse_overrides(over)
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    if methods:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench
        state = bench._arm_method_state(cfg, state, model)
    step = train_lib.make_train_step(cfg, model, tx, mesh=None)
    valid = jnp.asarray(task_lib.valid_class_mask(
        cfg.data.num_classes,
        task_lib.seen_classes(cfg.classes_per_task, 0)))
    host = list(pipeline.train_batches(cfg, 0, epoch=0))
    if methods:
        rng = np.random.RandomState(7)
        host = [bench._widen(b, cfg.method.replay_batch, rng) for b in host]
    dev = [pipeline.HostBatch(jnp.asarray(b.image), jnp.asarray(b.mask),
                              jnp.asarray(b.flip)) for b in host]

    for i in range(10):  # warmup/compile
        state, aux = step(state, dev[i % len(dev)], valid)
    float(aux["loss"])

    STEPS = 50
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, aux = step(state, dev[i % len(dev)], valid)
    float(aux["loss"])
    dt = (time.perf_counter() - t0) / STEPS
    n_img = dev[0].image.shape[0]

    c = step.lower(state, dev[0], valid).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    fl, by = ca.get("flops", 0), ca.get("bytes accessed", 0)
    report = {
        "batch": n_img, "methods": methods,
        "step_ms": round(dt * 1e3, 2),
        "images_per_sec_per_chip": round(n_img / dt, 2),
        "gflop_per_step": round(fl / 1e9, 1),
        "gb_per_step": round(by / 1e9, 2),
        "achieved_tflops": round(fl / dt / 1e12, 1),
        "achieved_gbs": round(by / dt / 1e9, 0),
        "mfu_pct": round(100 * fl / dt / 1e12 / PEAK_TFLOPS, 1),
        "hbm_roofline_pct": round(100 * by / dt / 1e9 / PEAK_GBS, 1),
    }
    print(json.dumps(report, indent=1))

    if "--trace" in sys.argv:
        tdir = "/tmp/tpu_trace_profile"
        jax.profiler.start_trace(tdir)
        for i in range(5):
            state, aux = step(state, dev[i % len(dev)], valid)
        float(aux["loss"])
        jax.profiler.stop_trace()
        trace = parse_trace(tdir)
        # per-category ms per step (5 traced steps)
        trace["per_category_ms_per_step"] = {
            k: round(v / 1e3 / 5, 2)
            for k, v in trace["per_category_us"].items()}
        report["trace"] = trace
        print(json.dumps({"per_category_ms_per_step":
                          trace["per_category_ms_per_step"],
                          "top_ops_us": trace["top_ops_us"][:10]}, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
