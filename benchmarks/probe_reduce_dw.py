"""On-chip probes for the two remaining step inefficiencies (r2, DESIGN.md §8):

1. BN-backward reduces: XLA's standalone [8,512,512,32]->[32] reduce runs at
   ~3 ms (~70x under HBM bandwidth).  Probe cheaper formulations: lane-folded
   reshape reduce, ones-vector matmul-as-reduce, and a Pallas column reduce.
2. dW matmul orientation: the level-0 weight gradient is a tiny-output
   huge-contraction product; probe dot orientations in XLA and in-kernel.

Usage: python benchmarks/probe_reduce_dw.py [--reduce] [--dw] [--dot]
Prints one JSON line per variant.
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


def timeit(f, *args, n=50):
    out = f(*args)
    s = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out)[...])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    s = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out)[...])
    _ = s
    return (time.perf_counter() - t0) / n


def emit(name, ms, **kw):
    print(json.dumps({"probe": name, "ms": round(ms * 1e3, 3), **kw}),
          flush=True)


# -------------------------------------------------------------- BN reduces
B, H, W, C = 8, 512, 512, 32
N = B * H * W


@jax.jit
def r0_direct(dz):
    return jnp.sum(dz.astype(jnp.float32), axis=(0, 1, 2))


@jax.jit
def r1_fold(dz):
    # lane-fold: 4 adjacent pixels' channels share a 128-lane row; the
    # [N/4, 128] column reduce runs with every lane live, then the 4
    # pixel groups fold on a [4, 32] add.
    z = dz.reshape(N // 4, 128).astype(jnp.float32)
    return jnp.sum(z, axis=0).reshape(4, C).sum(axis=0)


@jax.jit
def r2_matmul(dz):
    # ones-vector matmul-as-reduce on the MXU over the lane-folded view.
    z = dz.reshape(N // 4, 128)
    ones = jnp.ones((1, N // 4), jnp.bfloat16)
    s = jax.lax.dot_general(ones, z, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return s.reshape(4, C).sum(axis=0)


@jax.jit
def r3_both(dz, xh):
    # the real BN-backward payload: sum(dz) and sum(dz*xh) in one pass.
    a = jnp.sum(dz.astype(jnp.float32), axis=(0, 1, 2))
    b = jnp.sum((dz * xh).astype(jnp.float32), axis=(0, 1, 2))
    return a, b


@jax.jit
def r4_both_fold(dz, xh):
    z = dz.reshape(N // 4, 128).astype(jnp.float32)
    p = (dz * xh).reshape(N // 4, 128).astype(jnp.float32)
    zz = jnp.concatenate([z, p], axis=1)  # one 256-lane pass
    s = jnp.sum(zz, axis=0)
    return (s[:128].reshape(4, C).sum(0), s[128:].reshape(4, C).sum(0))


def _pallas_red_kernel(dz_ref, xh_ref, out_ref, acc, *, steps):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    dz = dz_ref[:].astype(jnp.float32)
    p = dz * xh_ref[:].astype(jnp.float32)
    acc[0:1] += jnp.sum(dz, axis=0, keepdims=True)
    acc[1:2] += jnp.sum(p, axis=0, keepdims=True)

    @pl.when(i == steps - 1)
    def _():
        out_ref[:] = acc[:]


@jax.jit
def r5_pallas(dz, xh):
    rows = 2048
    steps = (N // 4) // rows
    z = dz.reshape(N // 4, 128)
    x2 = xh.reshape(N // 4, 128)
    out = pl.pallas_call(
        functools.partial(_pallas_red_kernel, steps=steps),
        grid=(steps,),
        in_specs=[pl.BlockSpec((rows, 128), lambda i: (i, 0)),
                  pl.BlockSpec((rows, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((2, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, 128), jnp.float32)],
    )(z, x2)
    return (out[0].reshape(4, C).sum(0), out[1].reshape(4, C).sum(0))


# ------------------------------------------------------------- dW orientations
M2 = B * H * W  # 2M pixel rows
K9 = 288        # 9 * 32 window features


@jax.jit
def t1_AtB(a, dy):       # [2M,288]^T @ [2M,32] -> [288,32]
    return jax.lax.dot_general(a, dy, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@jax.jit
def t2_BtA(a, dy):       # [2M,32]^T @ [2M,288] -> [32,288]
    return jax.lax.dot_general(dy, a, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@jax.jit
def t3_packed(ap, dyp):  # packed: [2M/4,192]^T @ [2M/4,128] -> [192,128]
    return jax.lax.dot_general(ap, dyp, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


@jax.jit
def t4_conv_dw(x, dy):
    # what conv AD emits for dW at enc0b, isolated.
    f = lambda k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    k0 = jnp.zeros((3, 3, 32, 32), jnp.bfloat16)
    return jax.vjp(f, k0)[1](dy)[0]


# ------------------------------------------------------- in-kernel dot probes
def _dot_kernel(a_ref, b_ref, o_ref, *, mode, reps):
    acc = jnp.zeros((o_ref.shape[0], 128), jnp.float32)
    for _ in range(reps):
        if mode == "AtB":     # contract sublanes of both: [K,M]^T@[K,N]
            acc += jax.lax.dot_general(
                a_ref[:], b_ref[:], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:                 # native [M,K]@[K,N]
            acc += jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[:] = acc


def dot_probe(mode, m, k, n, reps=64, steps=64):
    a_shape = (k, m) if mode == "AtB" else (m, k)
    a = jnp.ones(a_shape, jnp.bfloat16)
    b = jnp.ones((k, n), jnp.bfloat16)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            functools.partial(_dot_kernel, mode=mode, reps=reps),
            grid=(steps,),
            in_specs=[pl.BlockSpec(a_shape, lambda i: (0, 0)),
                      pl.BlockSpec((k, n), lambda i: (0, 0))],
            out_specs=pl.BlockSpec((m if mode != "AtB" else m, n),
                                   lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        )(a, b)

    ms = timeit(run, a, b, n=20)
    flops = 2 * m * k * n * reps * steps
    emit(f"dot_{mode}", ms, m=m, k=k, n=n,
         tf=round(flops / ms / 1e12, 1))


def main():
    args = sys.argv[1:]
    do_all = not args
    key = jax.random.PRNGKey(0)
    if do_all or "--reduce" in args:
        dz = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        xh = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
        emit("r0_direct", timeit(r0_direct, dz))
        emit("r1_fold", timeit(r1_fold, dz))
        emit("r2_matmul", timeit(r2_matmul, dz))
        emit("r3_both", timeit(r3_both, dz, xh))
        emit("r4_both_fold", timeit(r4_both_fold, dz, xh))
        emit("r5_pallas", timeit(r5_pallas, dz, xh))
    if do_all or "--dw" in args:
        a = jax.random.normal(key, (M2, K9), jnp.bfloat16)
        dy = jax.random.normal(key, (M2, 32), jnp.bfloat16)
        ap = jax.random.normal(key, (M2 // 4, 192), jnp.bfloat16)
        dyp = dy.reshape(M2 // 4, 128)
        x = jax.random.normal(key, (B, H, W, 32), jnp.bfloat16)
        gf1 = 2 * M2 * K9 * 32 / 1e9
        gf3 = 2 * (M2 // 4) * 192 * 128 / 1e9
        ms = timeit(t1_AtB, a, dy); emit("t1_AtB_288x32", ms, tf=round(gf1 / ms / 1e3, 1))
        ms = timeit(t2_BtA, a, dy); emit("t2_BtA_32x288", ms, tf=round(gf1 / ms / 1e3, 1))
        ms = timeit(t3_packed, ap, dyp); emit("t3_packed_192x128", ms, tf=round(gf3 / ms / 1e3, 1))
        ms = timeit(t4_conv_dw, x, dy.reshape(B, H, W, 32))
        emit("t4_conv_dw_enc0b", ms, tf=round(gf1 / ms / 1e3, 1))
    if do_all or "--dot" in args:
        dot_probe("AB", 128, 2048, 128)
        dot_probe("AtB", 128, 2048, 128)
        dot_probe("AB", 192, 2048, 128)
        dot_probe("AtB", 192, 2048, 128)


if __name__ == "__main__":
    main()
