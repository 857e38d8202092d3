"""Device-side fused augmentation: uint8 → resize → flip → normalize.

The on-device half of the reference's decode→resize→flip→normalize path
(BASELINE.json:5; SURVEY.md §2.1 "Augmentation"). Decode-to-uint8 stays on
the host (SURVEY.md §7 "hard parts"); this module consumes uint8 batches and
produces normalized NHWC activations in the compute dtype.

Two implementations, numerically identical:
  * this jnp version — XLA fuses it into the train step; the bilinear resize
    is two matmuls (MXU) with coefficients from ``cl_tpu/data/resize.py``;
  * ``cl_tpu.pallas.augment`` — a single Pallas kernel doing one HBM
    round-trip (enabled by ``train.use_pallas``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu.data import resize as resize_lib


@functools.lru_cache(maxsize=32)
def _resize_constants(src: int, dst: int):
    # numpy (not jnp) on purpose: jnp arrays created under a jit trace are
    # tracers and must not be cached across traces. As numpy constants they
    # are baked into each compiled program.
    rv = resize_lib.bilinear_matrix(src, dst)   # f32 [dst, src]
    iv = resize_lib.nearest_indices(src, dst)   # i32 [dst]
    return rv, iv


def augment_jnp(
    image_u8: jax.Array,  # uint8 [B, S, S, 3]
    mask: jax.Array,      # uint8 [B, S, S]
    flip: jax.Array,      # bool  [B]
    *,
    out_size: int,
    mean: tuple[float, float, float],
    std: tuple[float, float, float],
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Returns (x [B, H, W, 3] compute_dtype normalized, y [B, H, W] int32)."""
    src = image_u8.shape[1]
    r, nn_idx = _resize_constants(src, out_size)

    x = image_u8.astype(jnp.float32)
    # Separable bilinear resize as two MXU matmuls (square images: Rv == Rh).
    x = jnp.einsum("os,bstc->botc", r, x)
    x = jnp.einsum("pt,botc->bopc", r, x)
    y = mask[:, nn_idx][:, :, nn_idx].astype(jnp.int32)

    # Horizontal flip (after resize — the reference order, SURVEY.md §2.1).
    fl = flip[:, None, None]
    y = jnp.where(fl, y[:, :, ::-1], y)
    x = jnp.where(fl[..., None], x[:, :, ::-1, :], x)

    mean_a = jnp.asarray(mean, jnp.float32) * 255.0
    std_a = jnp.asarray(std, jnp.float32) * 255.0
    x = (x - mean_a) / std_a
    return x.astype(compute_dtype), y


def augment_reference_np(
    image_u8: np.ndarray, mask: np.ndarray, flip: np.ndarray, *,
    out_size: int, mean, std,
) -> tuple[np.ndarray, np.ndarray]:
    """Pure-numpy oracle used by unit tests AND by the torch-CPU reference
    implementation — guaranteeing identical augmentation arithmetic
    (SURVEY.md §6 determinism target)."""
    xs, ys = [], []
    for b in range(image_u8.shape[0]):
        x = resize_lib.resize_bilinear_np(image_u8[b].astype(np.float32),
                                          out_size)
        y = resize_lib.resize_nearest_np(mask[b], out_size)
        if flip[b]:
            x = x[:, ::-1, :]
            y = y[:, ::-1]
        x = (x - np.asarray(mean, np.float32) * 255.0) / \
            (np.asarray(std, np.float32) * 255.0)
        xs.append(x)
        ys.append(y)
    return np.stack(xs), np.stack(ys).astype(np.int32)
