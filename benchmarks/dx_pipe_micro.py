"""Per-call micro of the packed dx backward kernel (r5 pipeline A/B).

Times `_dx_bn_impl` at a UNet level shape with the carry-fed +
two-point-slope discipline from mosaic_dots_micro.py: the scan body
perturbs ds1 by carry*1e-30 so the pallas_call depends on the previous
iteration (no loop-invariant hoisting), and per-call time is
(wall(HI) - wall(LO)) / (HI - LO) to cancel the relay's fixed
dispatch+readback cost (~23 ms).

    CL_TPU_DX_PIPE=0 python benchmarks/dx_pipe_micro.py --shape=enc0
    CL_TPU_DX_PIPE=1 python benchmarks/dx_pipe_micro.py --shape=enc0

Shapes are (b, h, wg, c_in, c_out, p) of the FORWARD conv whose dx is
taken (dy lanes = p*c_out, dx lanes = p*c_in).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu.pallas import conv3x3_v3 as pc3

SHAPES = {
    # b, h, wg, c_in, c_out, p  (packed-domain level geometries @512²)
    "enc0": (8, 512, 128, 32, 32, 4),
    "enc1": (8, 256, 64, 64, 64, 4),
    "dec0": (8, 512, 128, 64, 32, 4),  # dec0 conv0: 64 -> 32
}
LO, HI = 8, 40


def main():
    shape = "enc0"
    prologue = True
    dw = "--dw" in sys.argv
    for a in sys.argv:
        if a.startswith("--shape="):
            shape = a.split("=", 1)[1]
        if a == "--slim":
            prologue = False
    b, h, wg, c_in, c_out, p = SHAPES[shape]
    lanes_in, lanes_dy = p * c_in, p * c_out
    rng = np.random.RandomState(0)
    dy = jnp.asarray(rng.randn(b, h, wg, lanes_dy), jnp.bfloat16)
    y = jnp.asarray(rng.randn(b, h, wg, lanes_dy), jnp.bfloat16)
    xp = jnp.asarray(rng.randn(b, h, wg, lanes_in), jnp.bfloat16)
    w_dx = jnp.asarray(rng.randn(3, 3, c_out, c_in), jnp.bfloat16)
    ds1 = jnp.asarray(rng.randn(lanes_dy), jnp.float32)
    ds2 = jnp.asarray(rng.randn(lanes_dy), jnp.float32)
    a_l = jnp.asarray(rng.rand(lanes_in) + 0.5, jnp.float32)
    b_l = jnp.asarray(rng.randn(lanes_in), jnp.float32)
    args = (dy, y, xp, w_dx, ds1, ds2, a_l, b_l)

    def make(reps):
        @jax.jit
        def go(dy, y, xp, w_dx, ds1, ds2, a_l, b_l):
            def body(c, _):
                if dw:
                    dwp = pc3._dw_bn2_impl(
                        xp, dy, y, ds1 + c * 1e-30, ds2, c_in, a_l, b_l,
                        p, prologue)
                    return dwp[0, 0, 0, 0].astype(jnp.float32) * 1e-30, None
                dxp, _da, _db = pc3._dx_bn_impl(
                    dy, y, xp, w_dx, ds1 + c * 1e-30, ds2, a_l, b_l,
                    p, prologue)
                return dxp[0, 0, 0, 0].astype(jnp.float32) * 1e-30, None
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
            return c
        return go

    walls = {}
    for reps in (LO, HI):
        go = make(reps)
        float(go(*args))          # compile + warm
        t0 = time.perf_counter()
        float(go(*args))
        walls[reps] = time.perf_counter() - t0
    per_call_ms = (walls[HI] - walls[LO]) / (HI - LO) * 1e3
    if dw:
        # traffic: xp (halo'd) + dy + y streams; dW output is tiny
        bytes_moved = b * h * wg * (lanes_in + 2 * lanes_dy) * 2
    else:
        # traffic: dy+y reads (+halo ~1%), dx write, xp read (prologue)
        bytes_moved = b * h * wg * (2 * lanes_dy + lanes_in
                                    + (lanes_in if prologue else 0)) * 2
    print(json.dumps({
        "shape": shape, "prologue": prologue, "kernel": "dw" if dw else "dx",
        "pipe": os.environ.get("CL_TPU_DX_PIPE", "0"),
        "per_call_ms": round(per_call_ms, 3),
        "gbps": round(bytes_moved / (per_call_ms / 1e3) / 1e9, 1),
        "walls": {k: round(v, 3) for k, v in walls.items()},
    }))


if __name__ == "__main__":
    main()
