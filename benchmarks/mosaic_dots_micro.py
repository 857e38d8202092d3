"""Minimal Mosaic repro: do back-to-back same-shape MXU dots pipeline?
(VERDICT r3 next #9 — the conv backward's residual floor gap.)

The packed conv kernels issue 3 center dots [rows,128]@[128,128] per
kernel row; r3's merged-center-dot experiment showed one wide
[rows,384]@[384,128] dot beats the 3-dot sequence by ~10% (shipped).
This micro isolates WHY and A/Bs every schedule shape on identical HBM
traffic (one [rows,384] bf16 block streamed per grid step, one
[rows,128] f32 block written):

  seq         acc = d0; acc += d1; acc += d2   (serial accumulator chain)
  split       (d0 + d2) + d1                   (two chains, join at end)
  wide        one [rows,384]@[384,128] dot     (the shipped schedule)
  interleave  rows split in half; the six half-dots issued a0 b0 a1 b1
              a2 b2 (independent accumulators per half — maximum ILP
              visible to the scheduler)

If `split`/`interleave` close the gap to `wide`, the limiter is the
accumulator dependence chain (fixable by restructuring _conv_dots); if
they don't, Mosaic serializes same-shape dot issue itself and the
DESIGN.md blocker chapter gets its evidence.

    python benchmarks/mosaic_dots_micro.py         # on the chip
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

ROWS = 2048
K = 128
PIECES = 3
N_TILES = 64
REPS = 30
DTYPE = jnp.bfloat16


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def kernel(x_ref, w_ref, o_ref, *, variant):
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
    o_ref[0] = acc


def build(variant):
    call = pl.pallas_call(
        functools.partial(kernel, variant=variant),
        grid=(N_TILES,),
        in_specs=[
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
            y = call(x, w)
            return c + y[0, 0, 0].astype(jnp.float32), None
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return out

    return run


def main() -> int:
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N_TILES, ROWS, PIECES * K)
                    .astype(np.float32)).astype(DTYPE)
    w = jnp.asarray(rng.randn(PIECES * K, K).astype(np.float32)
                    * 0.1).astype(DTYPE)
    results = {}
    for variant in ("wide", "seq", "split", "interleave"):
        run = build(variant)
        s = float(run(x, w))  # compile + warm
        t0 = time.perf_counter()
        s = float(run(x, w))
        dt = (time.perf_counter() - t0) / REPS * 1000
        results[variant] = round(dt, 4)
        print(f"# {variant}: {dt:.4f} ms/rep (checksum {s:.3e})",
              file=sys.stderr, flush=True)
    # FLOP floor: N_TILES·ROWS·3K·K·2 MACs @ 197 TFLOP/s bf16 (v5e)
    flops = N_TILES * ROWS * PIECES * K * K * 2
    results["mxu_floor_ms"] = round(flops / 197e12 * 1000, 4)
    results["hbm_floor_ms"] = round(
        (N_TILES * ROWS * PIECES * K * 2 + N_TILES * ROWS * K * 4)
        / 819e9 * 1000, 4)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
