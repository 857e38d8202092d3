"""Minimal Mosaic repro: do back-to-back same-shape MXU dots pipeline?
(VERDICT r3 next #9 — the conv backward's residual floor gap.)

The packed conv kernels issue 3 center dots [rows,128]@[128,128] per
kernel row; r3's merged-center-dot experiment showed one wide
[rows,384]@[384,128] dot beats the 3-dot sequence in-step (+1.1%
headline, shipped). This micro isolates the schedule effect on
identical HBM traffic (one [rows,384] bf16 block streamed per grid
step, one [rows,128] f32 block written):

  seq         acc = d0; acc += d1; acc += d2   (serial accumulator chain)
  split       (d0 + d2) + d1                   (two chains, join at end)
  wide        one [rows,384]@[384,128] dot     (the shipped schedule)
  interleave  rows split in half; the six half-dots issued a0 b0 a1 b1
              a2 b2 (independent accumulators per half)
  copy        no MXU: same traffic — the block pipeline's streaming
              bandwidth ceiling

Measurement discipline (hard-won, r4): the kernel takes the scan CARRY
as an SMEM scalar and adds it to the output, so the pallas_call DEPENDS
on the previous iteration and XLA cannot hoist it out of the scan as
loop-invariant (an earlier version of this micro measured exactly that
hoist: 140 reps == 20 reps wall). The relay's fixed dispatch+readback
cost (~22 ms observed) is cancelled by the two-point slope
(wall(REPS_HI) − wall(REPS_LO)) / (REPS_HI − REPS_LO).

    python benchmarks/mosaic_dots_micro.py          # on the chip
    MD_ROWS=8192 MD_TILES=16 python benchmarks/mosaic_dots_micro.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = int(os.environ.get("MD_ROWS", 2048))
K = 128
PIECES = 3
N_TILES = int(os.environ.get("MD_TILES", 64))
REPS_LO = 20
REPS_HI = 80
DTYPE = jnp.bfloat16


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def kernel(s_ref, x_ref, w_ref, o_ref, *, variant):
    x = x_ref[0]                       # [ROWS, 3K]
    w = w_ref[:]                       # [3K, K]
    if variant == "wide":
        acc = _dot(x, w)
    elif variant == "seq":
        acc = _dot(x[:, 0:K], w[0:K])
        acc = acc + _dot(x[:, K:2 * K], w[K:2 * K])
        acc = acc + _dot(x[:, 2 * K:3 * K], w[2 * K:3 * K])
    elif variant == "split":
        a = _dot(x[:, 0:K], w[0:K]) + _dot(x[:, 2 * K:3 * K],
                                           w[2 * K:3 * K])
        b = _dot(x[:, K:2 * K], w[K:2 * K])
        acc = a + b
    elif variant == "copy":
        acc = x[:, 0:K].astype(jnp.float32)
    elif variant == "interleave":
        h = ROWS // 2
        xa, xb = x[:h], x[h:]
        a0 = _dot(xa[:, 0:K], w[0:K])
        b0 = _dot(xb[:, 0:K], w[0:K])
        a1 = _dot(xa[:, K:2 * K], w[K:2 * K])
        b1 = _dot(xb[:, K:2 * K], w[K:2 * K])
        a2 = _dot(xa[:, 2 * K:3 * K], w[2 * K:3 * K])
        b2 = _dot(xb[:, 2 * K:3 * K], w[2 * K:3 * K])
        acc = jnp.concatenate([a0 + a1 + a2, b0 + b1 + b2], axis=0)
    else:
        raise ValueError(variant)
    # carry dependence: the scan's previous output feeds this call
    o_ref[0] = acc + s_ref[0, 0]


def build(variant, reps):
    call = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid=(N_TILES,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ROWS, PIECES * K), lambda i: (i, 0, 0)),
            pl.BlockSpec((PIECES * K, K), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ROWS, K), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N_TILES, ROWS, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def run(x, w):
        def body(c, _):
            y = call(c.reshape(1, 1) * 1e-30, x, w)
            return y[0, 0, 0], None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return out

    return run


def main() -> int:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N_TILES, ROWS, PIECES * K)
                    .astype(np.float32)).astype(DTYPE)
    w = jnp.asarray(rng.randn(PIECES * K, K).astype(np.float32)
                    * 0.1).astype(DTYPE)
    results = {"rows": ROWS, "tiles": N_TILES}
    variants = os.environ.get(
        "MD_VARIANTS", "wide,seq,split,interleave,copy").split(",")
    for variant in variants:
        walls = {}
        for reps in (REPS_LO, REPS_HI):
            run = build(variant, reps)
            float(run(x, w))  # compile + warm
            walls[reps] = min(
                _timed(run, x, w) for _ in range(3))
        per = (walls[REPS_HI] - walls[REPS_LO]) / (REPS_HI - REPS_LO)
        fixed = walls[REPS_LO] * 1000 - per * 1000 * REPS_LO
        results[variant] = round(per * 1000, 4)
        print(f"# {variant}: {per * 1000:.4f} ms/rep "
              f"(fixed ~{fixed:.1f} ms)", file=sys.stderr, flush=True)
    flops = N_TILES * ROWS * PIECES * K * K * 2
    results["mxu_floor_ms"] = round(flops / 197e12 * 1000, 4)
    results["hbm_floor_ms"] = round(
        (N_TILES * ROWS * PIECES * K * 2 + N_TILES * ROWS * K * 4)
        / 819e9 * 1000, 4)
    print(json.dumps(results))
    return 0


def _timed(run, x, w):
    t0 = time.perf_counter()
    float(run(x, w))
    return time.perf_counter() - t0


if __name__ == "__main__":
    raise SystemExit(main())
