"""v5e-8 scaling projection for baseline_5 (VERDICT r4 next #6).

Real 8-chip hardware is absent from this box, but the relay's compile
service can AOT-compile for an ABSTRACT v5e-8 topology
(`jax.experimental.topologies.get_topology_desc("v5e:2x4")`).  This
harness compiles the FULL baseline_5 train step (EWC+LwF+replay, packed
bf16 body, global batch 64 + replay 8) against that topology, inspects
the optimized HLO for its collectives, and combines them with an ICI
cost model into a projected 8-chip images/sec/chip.

This AOT compile is also a stronger gate than the 8-virtual-CPU-device
dryrun: interpret mode turns Pallas kernels into partitionable jnp, so
only the real-TPU lowering catches Mosaic-partitioning errors (it found
the unwrapped EWC penalty/Fisher kernels, fixed in r5).

    python benchmarks/v5e8_projection.py [--headline=191.3] \
        [--out=benchmarks/v5e8_projection.json]

ICI model (assumptions recorded in the artifact):
  * v5e ICI: 45 GB/s/link one-way; the 1-D DP ring uses 2 links
    (bidirectional) -> ~90 GB/s per chip for the ring all-reduce.
  * ring all-reduce cost: 2*(N-1)/N * bytes / bw.
  * small psums (BN stats, loss scalars) are latency-bound: ~10 us each.
The projection treats ALL collective time as unoverlapped (the compiled
HLO shows sync all-reduce, no -start/-done pairs) — i.e. a lower bound
on scaling efficiency for this program.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ICI_LINK_GBPS = 45e9       # v5e one-way per link
ICI_RING_BW = 2 * ICI_LINK_GBPS  # bidirectional ring on the DP axis
SMALL_PSUM_LATENCY_S = 10e-6
N = 8

DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f16": 2, "u8": 1, "s8": 1, "f64": 8, "s64": 8}


def _nbytes(ty: str) -> int:
    tot = 0
    for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", ty):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        tot += n * DTYPE_BYTES.get(dt, 4)
    return tot


def compile_v5e8_hlo() -> str:
    import numpy as np

    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from cl_tpu import train as train_lib
    from cl_tpu.config import parse_overrides
    from cl_tpu.data import pipeline

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(-1), ("data",))
    cfg = parse_overrides(["preset=baseline_5", "data.batch_size=64",
                           "method.replay_batch=8"])
    model = train_lib.build_model(cfg)
    tx = train_lib.build_optimizer(cfg)
    state_shape = jax.eval_shape(lambda: train_lib.init_state(
        cfg, model, tx))
    step = train_lib.make_train_step(cfg, model, tx, mesh=mesh)
    B = cfg.data.batch_size + cfg.method.replay_batch
    s = cfg.data.source_size
    batch_shape = pipeline.HostBatch(
        image=jax.ShapeDtypeStruct((B, s, s, 3), jnp.uint8),
        mask=jax.ShapeDtypeStruct((B, s, s), jnp.int32),
        flip=jax.ShapeDtypeStruct((B,), jnp.bool_))
    valid = jax.ShapeDtypeStruct((cfg.data.num_classes,), jnp.bool_)
    return step.lower(state_shape, batch_shape, valid).compile().as_text()


def analyze(txt: str) -> dict:
    pat = re.compile(r"=\s+(\(.*?\)|\S+)\s+all-reduce(-start|-done)?\(")
    rows = []
    async_n = 0
    for line in txt.splitlines():
        if "all-reduce" not in line or "= " not in line:
            continue
        m = pat.search(line)
        if not m:
            continue
        if m.group(2) == "-done":
            continue  # counted at -start
        if m.group(2) == "-start":
            async_n += 1
        rows.append(_nbytes(m.group(1)))
    big = [b for b in rows if b > 1e6]
    small = [b for b in rows if b <= 1e6]
    return {
        "n_all_reduce": len(rows),
        "n_async_start": async_n,
        "grad_allreduce_bytes": max(big) if big else 0,
        "big_allreduce_bytes": sum(big),
        "small_allreduce_n": len(small),
        "small_allreduce_bytes": sum(small),
    }


def project(a: dict, headline_img_s: float, per_chip_batch: float) -> dict:
    t_step_1chip = per_chip_batch / headline_img_s
    t_grad = 2 * (N - 1) / N * a["big_allreduce_bytes"] / ICI_RING_BW
    t_small = a["small_allreduce_n"] * SMALL_PSUM_LATENCY_S
    t_step_8 = t_step_1chip + t_grad + t_small
    return {
        "assumed_step_s_1chip": round(t_step_1chip, 5),
        "t_grad_allreduce_s": round(t_grad, 6),
        "t_small_psums_s": round(t_small, 6),
        "projected_step_s": round(t_step_8, 5),
        "scaling_efficiency": round(t_step_1chip / t_step_8, 4),
        "projected_images_per_sec_per_chip":
            round(per_chip_batch / t_step_8, 1),
        "projected_images_per_sec_global":
            round(N * per_chip_batch / t_step_8, 1),
    }


def main() -> int:
    headline = 191.3      # bench.py: plain step, batch 8, no methods
    b5_rate = 107.8       # ladder baseline_5 1-chip: methods step, 8+1
    out = ""
    for arg in sys.argv:
        if arg.startswith("--headline="):
            headline = float(arg.split("=", 1)[1])
        if arg.startswith("--b5_rate="):
            b5_rate = float(arg.split("=", 1)[1])
        if arg.startswith("--out="):
            out = arg.split("=", 1)[1]
    t0 = time.perf_counter()
    txt = compile_v5e8_hlo()
    a = analyze(txt)
    res = {
        "topology": "v5e:2x4 (abstract, AOT compile via relay)",
        "config": "baseline_5, global batch 64 + replay 8 (8+1/chip)",
        "compile_s": round(time.perf_counter() - t0, 1),
        "hlo": a,
        "model": {
            "ici_link_gbps_oneway": ICI_LINK_GBPS / 1e9,
            "ring_bw_gbps_per_chip": ICI_RING_BW / 1e9,
            "small_psum_latency_us": SMALL_PSUM_LATENCY_S * 1e6,
            "collectives_assumed_unoverlapped": True,
        },
        # Two bases: the headline bare step (batch 8, no CL methods —
        # the bench.py metric) and the baseline_5 1-chip ladder rate
        # (the SAME program this HLO was compiled from: methods + 8+1).
        "projection_headline_step": project(a, headline,
                                            per_chip_batch=8.0),
        "projection_baseline_5": project(a, b5_rate, per_chip_batch=9.0),
        "inputs": {"headline_img_s_1chip": headline,
                   "baseline_5_img_s_1chip": b5_rate},
    }
    print(json.dumps(res, indent=1))
    if out:
        with open(out, "w") as f:
            json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
