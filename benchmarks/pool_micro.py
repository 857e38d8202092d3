"""Microbench: packed maxpool backward at the level-0 shape.

In-step numbers (benchmarks/attribute_step.py) put the pool backwards at
~6.2 ms of the 48.9 ms packed step (pool0 3.9, pool1 1.6, pool2 0.65) —
~10x their HBM bound, i.e. VPU-bound on quarter-lane-width selects.
This tool times fwd-only and fwd+bwd scan loops per level shape so a
kernel variant can be judged in isolation (same scan discipline as
bench.py — per-call timings are meaningless through the relay).

MEASURED NEGATIVE RESULT (kept for the record): a full-lane-width
backward that aligns odd column blocks onto even partners with static
lane rotates (slice+concat) passes interpret-mode tests but lowers to
catastrophically slow Mosaic code on v5e — in-step pool0 bwd went
3.91 -> 10.2 ms and the whole step 48.9 -> 57.3 ms
(benchmarks/attr_b8_512_poolfix.json). Misaligned lane shifts on bf16
cost far more than quarter-width selects; the committed kernel keeps
the per-(u, parity) select form.

    python benchmarks/pool_micro.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cl_tpu.pallas.pool_pack import maxpool2x2_packed

REPS = 50


def timed(fn, *args):
    r = jax.jit(fn)

    def loop(x):
        def body(c, _):
            return jax.tree.map(lambda a: a * 0.999, r(*((c,) + args[1:]))), 0
        out, _ = jax.lax.scan(body, x, None, length=REPS)
        return out

    lj = jax.jit(loop)
    o = lj(args[0])
    jax.tree.map(lambda a: a.block_until_ready(), o)
    float(jax.tree.leaves(o)[0].ravel()[0])
    t0 = time.perf_counter()
    o = lj(args[0])
    float(jax.tree.leaves(o)[0].ravel()[0])
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    for level, (h, c) in enumerate([(512, 32), (256, 64), (128, 128)]):
        p = 4  # the packed UNet's uniform pack factor (pick_pack(32, 32))
        g = h // p
        lanes = p * c
        x = jnp.asarray(
            jax.random.normal(jax.random.PRNGKey(level), (8, h, g, lanes)),
            jnp.bfloat16)

        def fwd(x):
            y = maxpool2x2_packed(x, c)
            # keep the carry shape: fold a y-dependency into x
            return (x * (1.0 + 0.0 * y[0, 0, 0, 0].astype(jnp.float32))
                    ).astype(x.dtype)

        def fwdbwd(x):
            def loss(x):
                return jnp.sum(maxpool2x2_packed(x, c).astype(jnp.float32))
            g_ = jax.grad(loss)(x)
            return g_

        tf = timed(fwd, x)
        # fwd+bwd needs matching in/out tree for the scan carry: dx has
        # x's shape, so carry dx directly.
        tb = timed(fwdbwd, x)
        print(f"level{level} [8,{h},{g},{lanes}] c={c}: "
              f"fwd {tf:.3f} ms  fwd+bwd {tb:.3f} ms")


if __name__ == "__main__":
    main()
