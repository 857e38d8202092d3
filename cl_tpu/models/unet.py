"""UNet encoder-decoder in Flax linen — NHWC, bf16-capable.

Capability contract: SURVEY.md §2.1 "UNet" and §3.2 — 4-level encoder
(each level 2×[conv3×3 + BN + ReLU] then maxpool-2), bottleneck, 4-level
decoder (transposed-conv stride 2 → concat skip → double conv), 1×1 head.
Base width 32 ("UNet-small") or 64, doubling per level (BASELINE.json:5,7-8).

TPU-first notes:
  * NHWC layout end-to-end — the layout XLA:TPU tiles onto the MXU without
    transposes.
  * ``dtype`` is the compute/activation dtype (bf16 for config 5);
    ``param_dtype`` stays f32 — optimizer state, Fisher, and BN statistics
    must be f32 (SURVEY.md §7 "Fisher in bf16").
  * The 1×1 head is width ``num_classes`` = the FULL global label space
    ("padded head", SURVEY.md §7): class-incremental validity is enforced by
    logit masking in the loss, not by reshaping the head, so the train step
    compiles exactly once across all tasks. ``head_width`` overrides this for
    the grow-the-head variant (recompiles per task, parity with the
    reference's expand-head behavior — SURVEY.md §3.1).
  * BatchNorm statistics: momentum 0.9 / eps 1e-5 — the torch-CPU oracle's
    defaults (``reference_impl/unet.py``), required for train-mode parity.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def _pool_quads(x):
    """The four stride-2 phases of a 2×2 window: x[..., 2i+u, 2j+v, :]."""
    b, h, w, c = x.shape
    x6 = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return (x6[:, :, 0, :, 0], x6[:, :, 0, :, 1],
            x6[:, :, 1, :, 0], x6[:, :, 1, :, 1])


@jax.custom_vjp
def maxpool2x2(x):
    """2×2/stride-2 max pool with an elementwise backward.

    Forward is a 4-way elementwise max over the window phases (no
    reduce_window). The custom VJP routes dy to the FIRST maximal
    element in window scan order — the same tie rule as XLA's
    ``select_and_scatter`` (and torch's first-argmax routing) — using
    only selects and a pixel-interleave reshape.

    Measured NEGATIVE result, kept as reference (DESIGN.md §8): at
    512²/b8 bf16 the phase slices + interleave cost ~9 ms/step vs the
    1.8 ms ``select_and_scatter`` they replace (strided sublane access
    beats sequential reduce_window on paper, loses on the real layout),
    so the model uses ``nn.max_pool`` and this stays unwired."""
    x00, x01, x10, x11 = _pool_quads(x)
    return jnp.maximum(jnp.maximum(x00, x01), jnp.maximum(x10, x11))


def _maxpool2x2_fwd(x):
    return maxpool2x2(x), x


def _maxpool2x2_bwd(x, dy):
    x00, x01, x10, x11 = _pool_quads(x)
    m01 = jnp.maximum(x00, x01)
    m23 = jnp.maximum(x10, x11)
    sel_a = m01 >= m23          # tie -> first pair
    sel0 = x00 >= x01           # tie -> first element
    sel1 = x10 >= x11
    zero = jnp.zeros_like(dy)
    top = jnp.where(sel_a, dy, zero)
    bot = jnp.where(sel_a, zero, dy)
    d00 = jnp.where(sel0, top, zero)
    d01 = jnp.where(sel0, zero, top)
    d10 = jnp.where(sel1, bot, zero)
    d11 = jnp.where(sel1, zero, bot)
    b, hh, ww, c = dy.shape
    row0 = jnp.stack([d00, d01], axis=3)   # [b,hh,ww,2,c] (v)
    row1 = jnp.stack([d10, d11], axis=3)
    dx6 = jnp.stack([row0, row1], axis=2)  # [b,hh,2,ww,2,c] (u,v)
    return (dx6.reshape(b, 2 * hh, 2 * ww, c),)


maxpool2x2.defvjp(_maxpool2x2_fwd, _maxpool2x2_bwd)


class Conv3x3(nn.Module):
    """3×3 SAME no-bias conv with a selectable implementation.

    ``conv_impl="pallas"`` routes supported shapes through the
    lane-packed Pallas kernel (`cl_tpu/pallas/conv3x3.py`, DESIGN.md §8);
    everything else (and ``"xla"``) uses the plain lax conv. The param
    tree (``kernel``, f32, lecun-normal) is identical either way, so
    checkpoints and the torch-parity importer are impl-agnostic."""

    features: int
    conv_impl: str = "xla"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c_in, self.features), jnp.float32)
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if self.conv_impl == "hybrid":
            # XLA fwd/dx (same fusion as "xla"), Pallas dW where it wins
            # (falls back internally elsewhere) — DESIGN.md §8.
            from cl_tpu.pallas import conv3x3 as pc
            return pc.conv3x3_hybrid(x, k)
        if self.conv_impl in ("v3", "auto"):
            # Gen-3 zero-prep kernel: free-reshape input, DMA row halo,
            # block-shift column halo. Measured faster than the XLA
            # emitter fwd AND bwd on every supported shape
            # (DESIGN.md §8, chain benchmarks).
            from cl_tpu.pallas import conv3x3_v3 as pc3
            ok = (pc3.profitable if self.conv_impl == "auto"
                  else pc3.supported)
            if ok(x.shape[1], x.shape[2], c_in, self.features):
                return pc3.conv3x3(x, k)
        if self.conv_impl == "pallas":
            from cl_tpu.pallas import conv3x3 as pc
            if pc.supported(x.shape[1], x.shape[2], c_in, self.features):
                return pc.conv3x3(x, k)
        return jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class UpConv2x2(nn.Module):
    """k=2/s=2 transposed conv as matmul + pixel shuffle.

    With no kernel overlap, every output pixel (2h+a, 2w+b) is a single
    tap: y = x @ K[a,b] + bias. Writing it as one [B·H·W, Cin]×[Cin,
    4·Cout] einsum plus a (h,w,a,b)→(h,a,w,b) pixel-shuffle transpose
    keeps the MXU fed (contraction Cin, 4·Cout lanes) instead of XLA's
    transposed-conv emitter (~10× slower at the 512² level, DESIGN.md
    §8). Param tree (kernel [2,2,Cin,Cout], bias) and init match
    nn.ConvTranspose, so checkpoints/importer are impl-agnostic."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        x = x.astype(self.dtype)
        b, h, w, _ = x.shape
        # lax.conv_transpose places the SPATIALLY FLIPPED kernel at each
        # output site (verified exact vs nn.ConvTranspose): tap (u,v) of
        # output (2h+u, 2w+v) is K[1-u, 1-v].
        k = jnp.flip(kernel.astype(self.dtype), (0, 1))
        t = jnp.einsum("nhwc,uvco->nhwuvo", x, k)
        y = t.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, 2 * h, 2 * w, self.features)
        return y + bias.astype(self.dtype)


class DoubleConv(nn.Module):
    """(conv3x3 → norm → ReLU) × 2."""

    features: int
    norm: str = "batch"
    dtype: Any = jnp.float32
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, *, train: bool):
        for i in range(2):
            x = Conv3x3(self.features, conv_impl=self.conv_impl,
                        dtype=self.dtype, name=f"conv{i}")(x)
            if self.norm == "batch":
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=jnp.float32, name=f"bn{i}")(x)
            elif self.norm == "group":
                x = nn.GroupNorm(num_groups=min(8, self.features),
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """UNet(x: [B, H, W, 3]) -> logits [B, H, W, num_classes] (f32)."""

    num_classes: int
    base_channels: int = 32
    depth: int = 4
    norm: str = "batch"
    dtype: Any = jnp.float32
    head_width: int | None = None  # None => num_classes (padded head)
    conv_impl: str = "xla"  # "pallas" = lane-packed kernel (DESIGN.md §8)
    upconv_impl: str = "xla"  # "xla" | "matmul" = einsum+pixel-shuffle

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 return_features: bool = False):
        """``return_features=True`` returns the pre-head activations
        [B, H, W, base_channels] in compute dtype instead of logits —
        the operand of the fused head+CE kernel (pallas/head_ce.py),
        which applies the head's own params tile-wise in VMEM. The head
        module is not visited then; its params still exist in the tree
        (created at init, trained through the fused kernel's VJP)."""
        c = self.base_channels
        x = x.astype(self.dtype)

        skips = []
        for level in range(self.depth):
            x = DoubleConv(c * (2 ** level), norm=self.norm, dtype=self.dtype,
                           conv_impl=self.conv_impl,
                           name=f"enc{level}")(x, train=train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = DoubleConv(c * (2 ** self.depth), norm=self.norm, dtype=self.dtype,
                       conv_impl=self.conv_impl,
                       name="bottleneck")(x, train=train)

        for level in reversed(range(self.depth)):
            feats = c * (2 ** level)
            # k=2 / s=2 transposed conv: clean 2× upsample, no overlap
            # (SURVEY.md §7 "ConvTranspose parity").
            if self.upconv_impl == "matmul" or self.conv_impl == "pallas":
                x = UpConv2x2(feats, dtype=self.dtype,
                              name=f"up{level}")(x)
            else:
                x = nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                     padding="VALID", use_bias=True,
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name=f"up{level}")(x)
            x = jnp.concatenate([skips[level], x], axis=-1)
            x = DoubleConv(feats, norm=self.norm, dtype=self.dtype,
                           conv_impl=self.conv_impl,
                           name=f"dec{level}")(x, train=train)

        if return_features:
            return x
        width = self.head_width or self.num_classes
        logits = nn.Conv(width, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(x)
        # Loss/eval arithmetic is f32 regardless of compute dtype
        # (SURVEY.md §6 determinism, §7 bf16 notes).
        return logits.astype(jnp.float32)


def init_variables(model: UNet, rng: jax.Array, image_size: int,
                   batch_size: int = 1):
    x = jnp.zeros((batch_size, image_size, image_size, 3), jnp.float32)
    return model.init(rng, x, train=False)


def expand_head_params(params, new_width: int, rng: jax.Array):
    """Grow the 1×1 head to ``new_width`` outputs, copying old-class weights
    exactly and initializing the new columns (the reference's
    ``model.expand_head`` behavior, SURVEY.md §3.1; used when
    ``model.padded_head=False``). Returns a NEW params pytree."""
    head = params["head"]
    kernel, bias = head["kernel"], head["bias"]
    old_w = kernel.shape[-1]
    if new_width <= old_w:
        return params
    fan_in = kernel.shape[-2]
    k_rng, _ = jax.random.split(rng)
    # lecun_normal — flax nn.Conv's default kernel init
    new_cols = jax.random.normal(
        k_rng, kernel.shape[:-1] + (new_width - old_w,),
        jnp.float32) * jnp.sqrt(1.0 / fan_in)
    new_kernel = jnp.concatenate([kernel, new_cols], axis=-1)
    new_bias = jnp.concatenate(
        [bias, jnp.zeros((new_width - old_w,), bias.dtype)])
    out = dict(params)
    out["head"] = {"kernel": new_kernel, "bias": new_bias}
    return out


def expand_head_zeros(tree, new_width: int):
    """Expand head leaves of an auxiliary pytree (EWC anchor/Fisher, LwF
    snapshot) with ZERO columns — no penalty / no signal on classes that
    did not exist when the state was recorded."""
    if tree is None or "head" not in tree:
        return tree
    head = tree["head"]
    out = dict(tree)
    new_head = {}
    for name, leaf in head.items():
        pad = new_width - leaf.shape[-1]
        if pad > 0:
            zeros = jnp.zeros(leaf.shape[:-1] + (pad,), leaf.dtype)
            leaf = jnp.concatenate([leaf, zeros], axis=-1)
        new_head[name] = leaf
    out["head"] = new_head
    return out


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
