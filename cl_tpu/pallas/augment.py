"""Fused device-side augmentation kernel: uint8 → resize → flip → normalize.

The device half of the reference's decode→resize→flip→normalize path
(BASELINE.json:5; host keeps byte decode — SURVEY.md §7 hard parts). Two
Pallas programs cover a batch in a single HBM round trip each:

  * image kernel, grid (B, 3): per (image, channel) bilinear resize as two
    MXU matmuls (Rv·X·Rhᵀ) using the framework-wide half-pixel
    coefficients (cl_tpu/data/resize.py) — the same arithmetic as the jnp
    fallback and the torch oracle — with mean/std normalization fused and
    the output written once in the compute dtype (bf16 for config 5);
  * mask kernel, grid (B,): nearest resize as a one-hot selection matmul
    (exact: one 1 per row; f32 matmul of labels ≤255 is integer-exact).

The horizontal flip is FOLDED INTO the second matmul: flipping output
columns equals using the row-reversed Rh, so flipped images cost zero
extra work — the per-image flag just selects which matrix feeds the MXU.

Why per-channel programs: a whole 576²×3 image plus matrices and temps is
~14 MB of VMEM — over budget at 512-class shapes; one channel per program
stays ~7 MB. Input is planarized to [B, 3, S, S] (one cheap XLA transpose
of uint8) so each channel is a clean 2-D tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cl_tpu.data import resize as resize_lib
from cl_tpu.pallas import common


@functools.lru_cache(maxsize=16)
def _matrices(src: int, dst: int):
    rv = resize_lib.bilinear_matrix(src, dst)          # f32 [dst, src]
    sv = np.zeros((dst, src), np.float32)              # one-hot nearest
    sv[np.arange(dst), resize_lib.nearest_indices(src, dst)] = 1.0
    return rv, rv[::-1].copy(), sv, sv[::-1].copy()


def _img_kernel(img_ref, flip_ref, rv_ref, rvf_ref, mean_ref, std_ref,
                out_ref):
    b = pl.program_id(0)
    c = pl.program_id(1)
    flip = flip_ref[b, 0] != 0
    # Row-reversed second-pass matrix implements the flip for free.
    rh = jax.lax.cond(flip, lambda: rvf_ref[:], lambda: rv_ref[:])
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    xc = img_ref[0, 0].astype(jnp.int32).astype(jnp.float32)   # [S, S]
    a = jnp.dot(rv_ref[:], xc, preferred_element_type=jnp.float32)
    yc = jax.lax.dot_general(
        a, rh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # [D, D]
    yc = (yc - mean_ref[0, c]) / std_ref[0, c]
    out_ref[0, 0] = yc.astype(out_ref.dtype)


def _mask_kernel(mask_ref, flip_ref, sv_ref, svf_ref, out_ref):
    b = pl.program_id(0)
    flip = flip_ref[b, 0] != 0
    sh = jax.lax.cond(flip, lambda: svf_ref[:], lambda: sv_ref[:])
    m = mask_ref[0].astype(jnp.int32).astype(jnp.float32)
    am = jnp.dot(sv_ref[:], m, preferred_element_type=jnp.float32)
    ym = jax.lax.dot_general(
        am, sh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0] = (ym + 0.5).astype(jnp.int32)  # exact integers; round


def augment(image_u8, mask, flip, *, out_size, mean, std,
            compute_dtype=jnp.float32):
    """Same contract as ``cl_tpu.augment.augment_jnp``: uint8 NHWC batch →
    (x [B,D,D,3] compute_dtype, y [B,D,D] int32)."""
    B, S = image_u8.shape[0], image_u8.shape[1]
    D = out_size
    rv, rvf, sv, svf = _matrices(S, D)

    img_pl = jnp.transpose(image_u8, (0, 3, 1, 2))  # [B, 3, S, S] uint8
    flip_i = flip.astype(jnp.int32)[:, None]        # [B, 1] SMEM
    mean_a = (jnp.asarray(mean, jnp.float32) * 255.0)[None, :]
    std_a = (jnp.asarray(std, jnp.float32) * 255.0)[None, :]

    interp = common.interpret_mode()
    mat = lambda n: pl.BlockSpec((D, S), lambda *_: (0, 0),
                                 memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    x_pl = pl.pallas_call(
        _img_kernel,
        out_shape=jax.ShapeDtypeStruct((B, 3, D, D), compute_dtype),
        grid=(B, 3),
        in_specs=[
            pl.BlockSpec((1, 1, S, S), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM),
            smem,                   # flip flags [B, 1]
            mat(0), mat(1),
            smem, smem,             # mean/std [1, 3]
        ],
        out_specs=pl.BlockSpec((1, 1, D, D), lambda b, c: (b, c, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interp,
    )(img_pl, flip_i, jnp.asarray(rv), jnp.asarray(rvf), mean_a, std_a)

    y_pl = pl.pallas_call(
        _mask_kernel,
        out_shape=jax.ShapeDtypeStruct((B, D, D), jnp.int32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, S, S), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            smem,
            mat(0), mat(1),
        ],
        out_specs=pl.BlockSpec((1, D, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interp,
    )(mask, flip_i, jnp.asarray(sv), jnp.asarray(svf))

    return jnp.transpose(x_pl, (0, 2, 3, 1)), y_pl
