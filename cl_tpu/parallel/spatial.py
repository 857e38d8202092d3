"""Spatial (height-sharded) UNet forward with halo exchange over ICI.

SURVEY.md §5.7: the reference's analogue of "context length" is spatial
resolution; nothing in the acceptance ladder exceeds one chip's HBM, so
this is the documented-and-built extension path, not an acceptance
requirement. The design is the TPU-native recipe for activations larger
than HBM:

  * the image height dim is sharded over a 'space' mesh axis
    (``shard_map``); each 3×3 conv first exchanges ONE boundary row with
    each neighbor via ``jax.lax.ppermute`` — edge shards receive zeros,
    which reproduces SAME-padding exactly;
  * 2×2 maxpool and the k2/s2 transposed conv never cross shard
    boundaries (shard heights stay even), so only the 3×3 convs pay a
    halo;
  * GroupNorm statistics are global: local sums are ``psum``-ed over the
    space axis before normalizing (BatchNorm's cross-device batch stats
    are the reason the spatial path uses norm="group").

It consumes the STANDARD ``UNet.init`` params pytree — same weights, same
math; ``spatial_apply`` == ``model.apply`` to float tolerance (tested on
the virtual 8-device mesh). The path is differentiable end-to-end:
``jax.grad`` through the shard_map (ppermute halo transposes + psum'd
GroupNorm stats) reproduces the unsharded model's parameter gradients
(tested), so resolutions beyond one chip's HBM can TRAIN, not just infer.
Hot path stays XLA convs on the MXU; the halos ride ICI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

SPACE_AXIS = "space"


def _axis_size(axis: str) -> int:
    return jax.lax.axis_size(axis)


def _halo_rows(x: jax.Array, axis: str) -> jax.Array:
    """[B, h, W, C] -> [B, h+2, W, C]: neighbors' boundary rows appended;
    edge shards get zero rows (ppermute drops/zero-fills at the ends =
    SAME padding)."""
    n = _axis_size(axis)
    if n == 1:
        return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    down = jax.lax.ppermute(x[:, -1:], axis,
                            [(i, i + 1) for i in range(n - 1)])
    up = jax.lax.ppermute(x[:, :1], axis,
                          [(i + 1, i) for i in range(n - 1)])
    return jnp.concatenate([down, x, up], axis=1)


def _conv3x3(x: jax.Array, kernel: jax.Array, axis: str) -> jax.Array:
    """SAME 3×3 conv on a height shard: halo on H, SAME on W."""
    xh = _halo_rows(x, axis)
    return jax.lax.conv_general_dilated(
        xh, kernel, window_strides=(1, 1),
        padding=((0, 0), (1, 1)),  # H already haloed; SAME on W
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _conv1x1(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    y = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _conv_transpose2x2(x: jax.Array, kernel: jax.Array,
                       bias: jax.Array) -> jax.Array:
    """k2/s2 upsample — no overlap, no halo (matches flax ConvTranspose)."""
    y = jax.lax.conv_transpose(
        x, kernel, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


def _group_norm(x: jax.Array, scale, bias, *, groups: int,
                axis: str, eps: float = 1e-6) -> jax.Array:
    """GroupNorm with spatially-global statistics: local sums psum over the
    space axis (flax GroupNorm semantics on the unsharded tensor)."""
    B, h, W, C = x.shape
    in_dtype = x.dtype
    g = x.reshape(B, h, W, groups, C // groups).astype(jnp.float32)
    local_n = jnp.float32(h * W * (C // groups))
    s1 = jnp.sum(g, axis=(1, 2, 4))                       # [B, groups]
    s2 = jnp.sum(g * g, axis=(1, 2, 4))
    n = jax.lax.psum(local_n, axis)
    s1 = jax.lax.psum(s1, axis)
    s2 = jax.lax.psum(s2, axis)
    mean = s1 / n
    var = s2 / n - mean * mean
    mean = mean[:, None, None, :, None]
    inv = jax.lax.rsqrt(var + eps)[:, None, None, :, None]
    out = ((g - mean) * inv).reshape(B, h, W, C)
    return (out * scale + bias).astype(in_dtype)


def _double_conv(x, p, *, axis: str):
    for i in range(2):
        x = _conv3x3(x, p[f"conv{i}"]["kernel"].astype(x.dtype), axis)
        gn = p[f"gn{i}"]
        groups = min(8, x.shape[-1])
        x = _group_norm(x, gn["scale"], gn["bias"], groups=groups, axis=axis)
        x = jax.nn.relu(x)
    return x


def _unet_forward_local(params, x, *, depth: int, axis: str):
    """Per-shard UNet forward (runs inside shard_map). Runs in ``x``'s
    dtype (bf16 compute casts params per-op, like the flax path); norm
    statistics are always f32."""
    skips = []
    for level in range(depth):
        x = _double_conv(x, params[f"enc{level}"], axis=axis)
        skips.append(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    x = _double_conv(x, params["bottleneck"], axis=axis)
    for level in reversed(range(depth)):
        up = params[f"up{level}"]
        x = _conv_transpose2x2(x, up["kernel"].astype(x.dtype),
                               up["bias"].astype(x.dtype))
        x = jnp.concatenate([skips[level], x], axis=-1)
        x = _double_conv(x, params[f"dec{level}"], axis=axis)
    head = params["head"]
    return _conv1x1(x, head["kernel"].astype(x.dtype),
                    head["bias"].astype(x.dtype)).astype(jnp.float32)


def make_space_mesh(n: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())[:n]
    return Mesh(np.asarray(devices), (SPACE_AXIS,))


def spatial_apply(params, x: jax.Array, mesh: Mesh, *, depth: int = 4,
                  dtype=None):
    """UNet forward with H sharded over ``mesh``'s space axis.

    ``params`` is the standard ``UNet.init`` params tree with norm="group".
    H must be divisible by n_devices · 2^depth (even shard heights at
    every pooling level). ``dtype`` sets the compute/activation dtype
    (bf16 casts params per-op; GroupNorm stats stay f32).
    """
    if dtype is not None:
        x = x.astype(dtype)
    n = mesh.shape[SPACE_AXIS]
    H = x.shape[1]
    if H % (n * (1 << depth)):
        raise ValueError(f"H={H} must divide by n*2^depth={n * (1 << depth)}")
    fn = jax.shard_map(
        lambda p, xs: _unet_forward_local(p, xs, depth=depth,
                                          axis=SPACE_AXIS),
        mesh=mesh,
        in_specs=(P(), P(None, SPACE_AXIS)),
        out_specs=P(None, SPACE_AXIS),
    )
    return fn(params, x)
