"""Isolated device-time profile of the head+CE path (packed or
class-major) at the 512² step shape — for kernel-internal iteration
without a full attribute_step run.

    python benchmarks/head_micro.py [--packed=0|1]

Prints per-op device time (ms/step) for a jitted fwd+bwd of the head
loss alone; the same 5-step trace discipline as attribute_step.py
(per-call wall timings are meaningless through the relay).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    packed = True
    rows = 0
    for a in sys.argv:
        if a.startswith("--packed="):
            packed = a.split("=", 1)[1] in ("1", "true")
        if a.startswith("--rows="):
            rows = int(a.split("=", 1)[1])

    from cl_tpu.pallas import head_ce

    if rows:
        import functools
        orig = head_ce._pick_rows
        head_ce._pick_rows = functools.partial(orig, target=rows)

    b, h, w, cin, p, C = 8, 512, 512, 32, 4, 20
    g = w // p
    key = jax.random.PRNGKey(0)
    if packed:
        feats = jnp.asarray(
            jax.random.normal(key, (b, h, g, p * cin)), jnp.bfloat16)
    else:
        feats = jnp.asarray(
            jax.random.normal(key, (b, h, w, cin)), jnp.bfloat16)
    kern = jnp.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (1, 1, cin, C)) * 0.1,
        jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    lbl = jax.random.randint(jax.random.PRNGKey(2), (b, h, w), 0, C)
    lbl = jnp.where(lbl == 3, 255, lbl)
    valid = jnp.ones((C,), jnp.float32)

    def loss(feats, kern, bias):
        if packed:
            l, _ = head_ce.head_cross_entropy_packed(
                feats, kern, bias, lbl, valid, p=p)
        else:
            l, _ = head_ce.head_cross_entropy(feats, kern, bias, lbl, valid)
        return l

    step = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    out = step(feats, kern, bias)
    float(out[2][0])                     # sync via D2H

    trace_dir = "/tmp/tpu_trace_head"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            out = step(feats, kern, bias)
        float(out[2][0])

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
    total = sum(per_op.values()) / 5000.0
    print(f"total {total:.3f} ms/step  (packed={packed})")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {us / 5000.0:7.3f}  {name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
