"""Per-UNet-level 3x3 conv microbenchmark: XLA emitter vs the lane-packed
Pallas kernel (fwd and fwd+bwd), on the real chip.

Usage: python benchmarks/conv_micro.py [--bwd | --dw]
Prints one JSON line per (level, impl). ``--dw`` isolates the WEIGHT
gradient (the [K≈2M-contraction, 9·Cin×Cout-output] reduction XLA runs
at ~0.5–2% MFU — the hybrid-conv candidate: dW is a fusion SINK, so a
kernel win there cannot be eaten by lost producer/consumer fusion the
way the fwd/dx replacements were, DESIGN.md §8).
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

from cl_tpu.pallas import conv3x3 as pc

B = 8
# (H, W, Cin, Cout) for every distinct conv shape in UNet-32 @ 512**2
# (enc convs, dec convs after skip-concat; the RGB stem is XLA-only).
SHAPES = [
    ("enc0b", 512, 512, 32, 32),
    ("enc1a", 256, 256, 32, 64),
    ("enc1b", 256, 256, 64, 64),
    ("enc2a", 128, 128, 64, 128),
    ("enc2b", 128, 128, 128, 128),
    ("enc3a", 64, 64, 128, 256),
    ("enc3b", 64, 64, 256, 256),
    ("bot_a", 32, 32, 256, 512),
    ("bot_b", 32, 32, 512, 512),
    ("dec0a", 512, 512, 64, 32),
]


def timeit(f, *args, n=20):
    out = f(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # loss-fetch sync (relay-safe): chain a scalar through the outputs
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out)[...])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    s = float(jnp.sum(out[0] if isinstance(out, tuple) else out)[...])
    _ = s
    return (time.perf_counter() - t0) / n


def xla_conv(x, k):
    # what flax nn.Conv emits for the model path: plain bf16 SAME conv
    # (MXU accumulates f32 internally; no preferred_element_type so the
    # conv transpose rule stays bf16-differentiable)
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    bwd = "--bwd" in sys.argv
    dw = "--dw" in sys.argv
    for name, h, w, ci, co in SHAPES:
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(B, h, w, ci).astype(np.float32),
                        jnp.bfloat16)
        k = jnp.asarray(np.random.RandomState(1)
                        .randn(3, 3, ci, co).astype(np.float32) * 0.05,
                        jnp.bfloat16)
        flops = 2 * B * h * w * 9 * ci * co
        if dw:
            dy = jnp.asarray(np.random.RandomState(2)
                             .randn(B, h, w, co).astype(np.float32),
                             jnp.bfloat16)

            def xla_dw(x, dy, k):
                # exactly the dW conv AD emits (fwd result is DCE'd)
                return jax.vjp(lambda kk: xla_conv(x, kk), k)[1](dy)[0]

            row = {"conv": name, "shape": [B, h, w, ci, co], "pass": "dw"}
            t = timeit(jax.jit(xla_dw), x, dy, k)
            row["xla_ms"] = round(t * 1e3, 3)
            row["xla_tf"] = round(flops / t / 1e12, 1)
            if pc.supported(h, w, ci, co):
                t = timeit(jax.jit(pc._conv_dw_impl), x, dy)
                row["pallas_ms"] = round(t * 1e3, 3)
                row["pallas_tf"] = round(flops / t / 1e12, 1)
                row["p"] = pc.pick_pack(ci, co)
            print(json.dumps(row), flush=True)
            continue
        if bwd:
            flops *= 3

            def run(fn):
                def g(x, k):
                    def loss(x, k):
                        return jnp.sum(fn(x, k).astype(jnp.float32) ** 2)
                    return jax.grad(loss, argnums=(0, 1))(x, k)
                return jax.jit(g)
        else:
            def run(fn):
                return jax.jit(fn)

        row = {"conv": name, "shape": [B, h, w, ci, co], "bwd": bwd}
        t = timeit(run(xla_conv), x, k)
        row["xla_ms"] = round(t * 1e3, 3)
        row["xla_tf"] = round(flops / t / 1e12, 1)
        if pc.supported(h, w, ci, co):
            t = timeit(run(pc.conv3x3), x, k)
            row["pallas_ms"] = round(t * 1e3, 3)
            row["pallas_tf"] = round(flops / t / 1e12, 1)
            row["p"] = pc.pick_pack(ci, co)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
