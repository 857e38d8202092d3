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


_BN_EPS = 1e-5
_BN_MOMENTUM = 0.9


@jax.custom_vjp
def _bn_relu_train(yp, mu, var, gamma_l, beta_l):
    """Fused train-mode BN-apply + ReLU on a lane-packed view.

    ``yp`` is [B,H,G,L] with L = p·C (p spatial positions per lane
    group); ``mu``/``var`` are the batch stats [C] computed FROM yp;
    ``gamma_l``/``beta_l`` are the scale/shift pre-tiled to [L].  The
    custom VJP implements the full train-mode BatchNorm gradient
    (including the μ/σ² paths) analytically in TWO passes — one fused
    pair of packed column reduces and one elementwise pass — instead of
    the 4+ passes AD emits; μ/var receive zero cotangent because their
    contribution is baked into dyp (valid precisely because they are
    yp's own batch stats — the eval path below uses plain AD)."""
    zp, _ = _bn_relu_fwd_impl(yp, mu, var, gamma_l, beta_l)
    return zp


def _bn_relu_fwd_impl(yp, mu, var, gamma_l, beta_l):
    c = mu.shape[0]
    p = gamma_l.shape[0] // c
    r = jax.lax.rsqrt(var + _BN_EPS)
    scale_l = jnp.tile(r, p) * gamma_l
    shift_l = beta_l - jnp.tile(mu * r, p) * gamma_l
    t = yp.astype(jnp.float32) * scale_l + shift_l
    zp = jnp.maximum(t, 0.0).astype(yp.dtype)
    return zp, (yp, mu, var, gamma_l, beta_l)


def _bn_relu_bwd_impl(res, dz):
    yp, mu, var, gamma_l, beta_l = res
    c = mu.shape[0]
    p = gamma_l.shape[0] // c
    n = yp.shape[0] * yp.shape[1] * yp.shape[2] * p
    r = jax.lax.rsqrt(var + _BN_EPS)
    r_l = jnp.tile(r, p)
    mu_l = jnp.tile(mu, p)
    yf = yp.astype(jnp.float32)
    yhat = (yf - mu_l) * r_l
    mask = (yhat * gamma_l + beta_l) > 0
    g = jnp.where(mask, dz.astype(jnp.float32), 0.0)
    # one fused pair of packed column reduces
    s1_l = jnp.sum(g, axis=(0, 1, 2))
    s2_l = jnp.sum(g * yhat, axis=(0, 1, 2))
    s1 = s1_l.reshape(p, c).sum(0)
    s2 = s2_l.reshape(p, c).sum(0)
    # one elementwise pass: full BN gradient incl. the stats paths
    gam_c = gamma_l.reshape(p, c)[0]
    coef = r * gam_c
    dyp = (jnp.tile(coef, p) * (g - (jnp.tile(s1, p)
                                     + yhat * jnp.tile(s2, p)) / n)
           ).astype(yp.dtype)
    # per-lane cotangents; the upstream tile()'s own vjp folds them to [C]
    return (dyp, jnp.zeros_like(mu), jnp.zeros_like(var), s2_l, s1_l)


def _bn_relu_fwd(yp, mu, var, gamma_l, beta_l):
    return _bn_relu_fwd_impl(yp, mu, var, gamma_l, beta_l)


_bn_relu_train.defvjp(_bn_relu_fwd, _bn_relu_bwd_impl)


class PackedBatchNorm(nn.Module):
    """BatchNorm + ReLU on a lane-packed [B,H,G,p·C] view.

    Variable tree is IDENTICAL to ``nn.BatchNorm`` (params ``scale``/
    ``bias``, batch_stats ``mean``/``var``, all [C] f32) so checkpoints
    and the torch importer are layout-agnostic.  Stats are computed from
    the packed view (column reduce + p-fold — numerically the same mean/
    fast-variance as flax over NHWC, different f32 association only).
    Train-mode backward goes through the analytic two-pass custom VJP
    above; eval mode is plain elementwise on running stats."""

    features: int
    pack: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, yp, *, train: bool):
        c, p = self.features, self.pack
        gamma = self.param("scale", nn.initializers.ones_init(), (c,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        gamma_l = jnp.tile(gamma, p)
        beta_l = jnp.tile(beta, p)
        if not train:
            r = jax.lax.rsqrt(ra_var.value + _BN_EPS)
            scale_l = jnp.tile(r, p) * gamma_l
            shift_l = beta_l - jnp.tile(ra_mean.value * r, p) * gamma_l
            t = yp.astype(jnp.float32) * scale_l + shift_l
            return jnp.maximum(t, 0.0).astype(yp.dtype)
        yf = yp.astype(jnp.float32)
        n = yp.shape[0] * yp.shape[1] * yp.shape[2] * p
        s1 = jnp.sum(yf, axis=(0, 1, 2)).reshape(p, c).sum(0)
        s2 = jnp.sum(yf * yf, axis=(0, 1, 2)).reshape(p, c).sum(0)
        mu = s1 / n
        var = s2 / n - mu * mu
        if not self.is_initializing():
            ra_mean.value = (_BN_MOMENTUM * ra_mean.value
                             + (1.0 - _BN_MOMENTUM) * mu)
            ra_var.value = (_BN_MOMENTUM * ra_var.value
                            + (1.0 - _BN_MOMENTUM) * var)
        return _bn_relu_train(yp, mu, var, gamma_l, beta_l)


def packed_level_geometry(h, w, c_in, features, conv_impl):
    """The packed-domain gate for a DoubleConv level: both convs must be
    kernel-routable at a UNIFORM pack view (conv0's packed output view ==
    conv1's native input view).  Returns (p, wg, lanes_in) or None."""
    from cl_tpu.pallas import conv3x3_v3 as pc3
    ok = pc3.profitable if conv_impl == "auto" else pc3.supported
    if not (ok(h, w, c_in, features) and ok(h, w, features, features)):
        return None
    p0 = pc3.pick_pack(c_in, features)
    p1 = pc3.pick_pack(features, features)
    if p0 != p1:
        return None
    return p0, w // p0, p0 * c_in


class DoubleConv(nn.Module):
    """(conv3x3 → norm → ReLU) × 2.

    With ``conv_impl`` "v3"/"auto" on batch-norm levels whose geometry
    the gen-3 kernel supports, the WHOLE level runs in the lane-packed
    domain — conv (pallas), BN stats (packed column reduces), normalize
    + ReLU (elementwise) — entering and leaving through free reshapes,
    so no layout round-trips exist between the level's ops (the in-step
    cost that made per-conv kernel routing a net loss, DESIGN.md §8)."""

    features: int
    norm: str = "batch"
    dtype: Any = jnp.float32
    conv_impl: str = "xla"
    dp_axis: str | None = None  # BatchNorm axis_name under DP shard_map

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ``train`` is positional-or-keyword so nn.remat can mark it
        # static (static_argnums=(2,)) under train.remat.
        if (self.conv_impl in ("v3", "auto") and self.norm == "batch"
                and self.dp_axis is None):
            geo = packed_level_geometry(x.shape[1], x.shape[2],
                                        x.shape[-1], self.features,
                                        self.conv_impl)
            if geo is not None:
                return self._packed(x, geo, train=train)
        for i in range(2):
            x = Conv3x3(self.features, conv_impl=self.conv_impl,
                        dtype=self.dtype, name=f"conv{i}")(x)
            if self.norm == "batch":
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype,
                                 param_dtype=jnp.float32,
                                 axis_name=(None if self.is_initializing()
                                            else self.dp_axis),
                                 name=f"bn{i}")(x)
            elif self.norm == "group":
                x = nn.GroupNorm(num_groups=min(8, self.features),
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name=f"gn{i}")(x)
            x = nn.relu(x)
        return x

    def _packed(self, x, geo, *, train: bool):
        from cl_tpu.pallas import conv3x3_v3 as pc3
        p, wg, lanes = geo
        b, h, w, c_in = x.shape
        xp = x.astype(self.dtype).reshape(b, h, wg, lanes)
        for i in range(2):
            ci = c_in if i == 0 else self.features
            k = Conv3x3Param(self.features, ci, name=f"conv{i}")()
            yp = pc3.conv3x3_packed(xp, k.astype(self.dtype))
            xp = PackedBatchNorm(self.features, p, dtype=self.dtype,
                                 name=f"bn{i}")(yp, train=train)
        return xp.reshape(b, h, w, self.features)


class Conv3x3Param(nn.Module):
    """Parameter-only holder producing the same ``conv{i}/kernel`` tree
    as :class:`Conv3x3` for the packed-level path."""

    features: int
    c_in: int

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          (3, 3, self.c_in, self.features), jnp.float32)


class DeferredBatchNorm(nn.Module):
    """BatchNorm parameters/stats whose APPLICATION is deferred to the
    consumer's in-kernel prologue (conv_bn_fused).  Same variable tree
    as ``nn.BatchNorm`` ([C] f32 scale/bias + batch_stats mean/var).
    ``__call__`` takes the producer kernel's per-lane stat sums and
    returns per-CHANNEL (scale, shift) vectors; the caller tiles them to
    the consumer's lane view."""

    features: int
    pack: int
    dtype: Any = jnp.float32
    dp_axis: str | None = None  # psum batch stats over this mesh axis
    #                             (the packed body under data-parallel
    #                             shard_map — global-batch stats, same
    #                             semantics as nn.BatchNorm(axis_name))

    @nn.compact
    def __call__(self, s1_l, s2_l, n, *, train: bool):
        c, p = self.features, self.pack
        gamma = self.param("scale", nn.initializers.ones_init(), (c,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros_init(), (c,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            if self.dp_axis is not None and not self.is_initializing():
                s1_l = jax.lax.psum(s1_l, self.dp_axis)
                s2_l = jax.lax.psum(s2_l, self.dp_axis)
                n = n * jax.lax.psum(1, self.dp_axis)
            mu = s1_l.reshape(p, c).sum(0) / n
            var = s2_l.reshape(p, c).sum(0) / n - mu * mu
            if not self.is_initializing():
                ra_mean.value = (_BN_MOMENTUM * ra_mean.value
                                 + (1.0 - _BN_MOMENTUM) * mu)
                ra_var.value = (_BN_MOMENTUM * ra_var.value
                                + (1.0 - _BN_MOMENTUM) * var)
        else:
            mu, var = ra_mean.value, ra_var.value
        scale = jax.lax.rsqrt(var + _BN_EPS) * gamma
        shift = beta - mu * scale
        return scale, shift


def bn_relu_apply(y, scale, shift, p):
    """Materialized z = relu(y·scale+shift) on a packed view for
    consumers whose kernels don't take the prologue (pool, up-conv,
    head).

    Runs as a Pallas kernel with an analytic VJP
    (pallas/packed_eltwise.py): as jnp elementwise, XLA's layout
    assignment re-associates the p-periodic vector broadcast onto the
    unpacked [N,C] view and inserts ~2 ms f32 retiling copies per pass
    at 512² around the neighbouring custom calls (measured, DESIGN.md
    §8; an optimization barrier protects the vectors but not the layout
    choice)."""
    from cl_tpu.pallas.packed_eltwise import bn_relu_packed
    return bn_relu_packed(y, scale, shift, p)


class PackedLevel(nn.Module):
    """One UNet DoubleConv level on lane-packed views with the BN·ReLU
    between its convs FUSED into the second conv's prologue and both
    convs' output stats computed by in-kernel epilogues (conv_bn_fused).
    Variable tree identical to :class:`DoubleConv` with batch norm.

    Returns ``(y2, scale1[C], shift1[C])`` — the level's LAST BatchNorm
    is deferred to the consumer (pool / decoder conv / up-conv / head),
    which applies z = relu(y2·scale+shift) itself.

    Modes: ``stem`` (conv0 = XLA RGB stem + nn.BatchNorm + ReLU, then
    pack), ``plain`` (both convs packed; input is an ALREADY-APPLIED
    packed z), ``split`` (decoder entry: conv0 distributed over the two
    concat operands — skip z and raw up output).
    """

    features: int
    c_in: int
    p: int
    mode: str = "plain"
    dtype: Any = jnp.float32
    dp_axis: str | None = None  # psum BN stats over this axis (DP)
    act_q: bool = False  # int8 saved-activation storage (conv_bn_fused_q)

    def _conv(self, xp, xq, k, a_l, b_l, prologue):
        """conv_bn_fused, with int8 saved-activation storage when
        ``act_q`` (r4): returns ``(y, s1, s2, qpair | None)``.  ``xq``
        is the producer conv's own (q, sc) pair for xp (intra-level
        threading: conv0's y_q becomes conv1's xp residual) or None."""
        from cl_tpu.pallas import conv3x3_v3 as pc3
        if self.act_q and pc3.q_supported(xp.shape[2]):
            return pc3.conv_bn_fused_q(xp, xq, k, a_l, b_l, self.p,
                                       prologue)
        y, s1, s2 = pc3.conv_bn_fused(xp, k, a_l, b_l, self.p, prologue)
        return y, s1, s2, None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # positional-or-keyword ``train``: see DoubleConv.__call__
        from cl_tpu.pallas import conv3x3_v3 as pc3
        f = self.features
        ones = jnp.ones((1,), jnp.float32)
        if self.mode == "stem":
            # RGB stem IN the packed domain: pad channels 3 → 128/p so
            # the input's packed view is lane-aligned, then conv0 runs as
            # a conv_bn_fused kernel (stats epilogue) — replacing the XLA
            # conv + BatchNorm + ReLU + pack-relayout chain (~8 ms at
            # 512², DESIGN.md §8).  The pad+reshape is the only XLA copy
            # left on this path; dx of the image is dead code (DCE'd).
            c_pad = 128 // self.p
            b, h, w, _ = x.shape
            xpad = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c_pad - 3)))
            xp0 = xpad.reshape(b, h, w // self.p, self.p * c_pad)
            k0 = Conv3x3Param(f, 3, name="conv0")()
            k0p = jnp.pad(k0, ((0, 0), (0, 0), (0, c_pad - 3), (0, 0)))
            ones0 = jnp.ones((self.p * c_pad,), jnp.float32)
            zeros0 = jnp.zeros((self.p * c_pad,), jnp.float32)
            y0, s1z, s2z, q0 = self._conv(
                xp0, None, k0p.astype(self.dtype), ones0, zeros0, False)
            n0 = y0.shape[0] * y0.shape[1] * y0.shape[2] * self.p
            sc0, sh0 = DeferredBatchNorm(f, self.p, dtype=self.dtype,
                                         dp_axis=self.dp_axis,
                                         name="bn0")(s1z, s2z, n0,
                                                     train=train)
            xp = y0
            a0 = jnp.tile(sc0, self.p)
            b0 = jnp.tile(sh0, self.p)
            prologue0 = True
        elif self.mode == "split":
            skip_z, up_raw = x
            k0 = Conv3x3Param(f, 2 * f, name="conv0")()
            ks = k0[:, :, :f].astype(self.dtype)
            ku = k0[:, :, f:].astype(self.dtype)
            zeros_l = jnp.zeros((self.p * f,), jnp.float32)
            ones_l = jnp.ones((self.p * f,), jnp.float32)
            ys, s1a, s2a, _ = self._conv(skip_z, None, ks, ones_l,
                                         zeros_l, False)
            yu, s1b, s2b, _ = self._conv(up_raw, None, ku, ones_l,
                                         zeros_l, False)
            # stats of the SUM are not the sum of stats — recompute the
            # first-BN stats from the summed tensor (one fused in-kernel
            # pass; pallas/packed_eltwise.py).
            from cl_tpu.pallas.packed_eltwise import add_stats_packed
            yp, s1, s2 = add_stats_packed(ys, yu)
            n = yp.shape[0] * yp.shape[1] * yp.shape[2] * self.p
            sc0, sh0 = DeferredBatchNorm(f, self.p, dtype=self.dtype,
                                         dp_axis=self.dp_axis,
                                         name="bn0")(s1, s2, n,
                                                     train=train)
            k1 = Conv3x3Param(f, f, name="conv1")()
            # yp comes from add_stats_packed, which has no q producer —
            # conv1's xp residual stays in the compute dtype here.
            y2, s1c, s2c, _ = self._conv(
                yp, None, k1.astype(self.dtype), jnp.tile(sc0, self.p),
                jnp.tile(sh0, self.p), True)
            n2 = y2.shape[0] * y2.shape[1] * y2.shape[2] * self.p
            sc1, sh1 = DeferredBatchNorm(f, self.p, dtype=self.dtype,
                                         dp_axis=self.dp_axis,
                                         name="bn1")(s1c, s2c, n2,
                                                     train=train)
            return y2, sc1, sh1
        else:
            xp = x
            a0 = jnp.ones((self.p * self.c_in,), jnp.float32)
            b0 = jnp.zeros((self.p * self.c_in,), jnp.float32)
            prologue0 = False
        k0m = (Conv3x3Param(f, self.c_in, name="conv0")()
               if self.mode == "plain" else None)
        if self.mode == "plain":
            # plain-level conv0's xp is the pool output (no q producer)
            y1, s1, s2, q1 = self._conv(xp, None, k0m.astype(self.dtype),
                                        a0, b0, prologue0)
        else:  # stem: conv1 is the only packed conv of the level
            k1 = Conv3x3Param(f, f, name="conv1")()
            y1, s1, s2, q1 = self._conv(xp, q0, k1.astype(self.dtype),
                                        a0, b0, prologue0)
            n1 = y1.shape[0] * y1.shape[1] * y1.shape[2] * self.p
            sc1, sh1 = DeferredBatchNorm(f, self.p, dtype=self.dtype,
                                         dp_axis=self.dp_axis,
                                         name="bn1")(s1, s2, n1,
                                                     train=train)
            return y1, sc1, sh1
        n1 = y1.shape[0] * y1.shape[1] * y1.shape[2] * self.p
        sc0, sh0 = DeferredBatchNorm(f, self.p, dtype=self.dtype,
                                     dp_axis=self.dp_axis, name="bn0")(s1, s2, n1, train=train)
        k1 = Conv3x3Param(f, f, name="conv1")()
        # intra-level threading: conv0's (q, sc) pair replaces conv1's
        # bf16 xp residual (y1 itself dies after this forward)
        y2, s1b, s2b, _ = self._conv(
            y1, q1, k1.astype(self.dtype), jnp.tile(sc0, self.p),
            jnp.tile(sh0, self.p), True)
        n2 = y2.shape[0] * y2.shape[1] * y2.shape[2] * self.p
        sc1, sh1 = DeferredBatchNorm(f, self.p, dtype=self.dtype,
                                     dp_axis=self.dp_axis, name="bn1")(s1b, s2b, n2,
                                                 train=train)
        return y2, sc1, sh1


class PackedUp(nn.Module):
    """k2/s2 transposed conv on packed views (pallas/upconv_pack.py) with
    the same parameter tree as ``nn.ConvTranspose`` (kernel [2,2,Cin,Cout],
    bias) — drop-in for checkpoints and the torch importer."""

    features: int
    c_in: int
    dims_out: tuple  # (g_out, lanes_out) consumer view
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xp):
        from cl_tpu.pallas import upconv_pack
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (2, 2, self.c_in, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        p_in = xp.shape[-1] // self.c_in
        # flipped placement — see UpConv2x2 / nn.ConvTranspose semantics
        wp = upconv_pack.pack_up_weights(
            jnp.flip(kernel.astype(self.dtype), (0, 1)), p_in)
        bias_l = jnp.tile(bias.astype(jnp.float32), 2 * p_in)
        return upconv_pack.upconv2x2_packed(xp.astype(self.dtype), wp,
                                            bias_l, self.dims_out)


def packed_prefix(image_size: int, base_channels: int, depth: int,
                  itemsize: int = 2) -> int:
    """How many leading UNet levels can run fully packed at the uniform
    pack factor P = pick_pack(base, base): every level needs both convs
    kernel-supported at forced P, the packed pool, and the matching
    packed up-conv geometry.  0 = packed execution unavailable."""
    from cl_tpu.pallas import conv3x3_v3 as pc3
    from cl_tpu.pallas import pool_pack, upconv_pack
    P = pc3.pick_pack(base_channels, base_channels)
    k = 0
    for l in range(depth):
        h = image_size // (2 ** l)
        feats = base_channels * (2 ** l)
        c_in = 3 if l == 0 else feats // 2
        g = h // P
        if l == 0:
            # stem: conv0 runs packed on the channel-padded (3 → 128/P)
            # input view, conv1 on the [*, P·feats] view
            convs_ok = (pc3.supported(h, h, 128 // P, feats, itemsize,
                                      p=P)
                        and pc3.supported(h, h, feats, feats, itemsize,
                                          p=P))
        else:
            convs_ok = (pc3.supported(h, h, c_in, feats, itemsize, p=P)
                        and pc3.supported(h, h, feats, feats, itemsize,
                                          p=P))
        # decoder entry at this level: split convs (feats->feats) + the
        # up-conv from the level below into this level's view
        split_ok = pc3.supported(h, h, feats, feats, itemsize, p=P)
        pool_ok = pool_pack.supported(h, g, P * feats, feats, itemsize)
        c_below = feats * 2
        h_below = h // 2
        p_in_up = P if l + 1 < depth else P  # packed or packed-on-entry
        up_ok = upconv_pack.geometry(
            h_below, h_below // p_in_up, p_in_up * c_below, c_below,
            feats, P) is not None
        if not (convs_ok and split_ok and pool_ok and up_ok):
            return k
        k = l + 1
    return k


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
    packed: bool = False  # run leading levels fully lane-packed
    pool_tee: bool = True  # fuse the skip-cotangent add into pool bwd
    act_q: bool = False  # int8 saved-activation storage in the packed
    #                      convs' backward (model.conv_act_store=int8)
    remat: bool = False  # per-level rematerialization (train.remat):
    #                      only level-boundary activations stay resident;
    #                      each level's internals are recomputed in the
    #                      backward (jax.checkpoint via nn.remat) —
    #                      trades ~⅓ more FLOPs for ~the level-internal
    #                      share of activation HBM
    dp_axis: str | None = None  # data-parallel shard_map axis: BN stats
    #                             psum over it (packed AND standard body)

    @nn.compact
    def __call__(self, x, *, train: bool = False,
                 return_features: bool = False,
                 packed_features: bool = False):
        """``return_features=True`` returns the pre-head activations
        [B, H, W, base_channels] in compute dtype instead of logits —
        the operand of the fused head+CE kernel (pallas/head_ce.py),
        which applies the head's own params tile-wise in VMEM. The head
        module is not visited then; its params still exist in the tree
        (created at init, trained through the fused kernel's VJP).

        ``packed_features=True`` (with ``return_features``) returns the
        packed body's RAW lane-packed output plus its deferred BN
        vectors, ``(y [B,H,G,p·C], scale [C], shift [C])`` — the operands
        of ``head_ce.head_cross_entropy_packed_bn``, which applies the
        final BN·ReLU in-kernel — skipping both the eltwise_out
        materialization and the unpack relayout; the caller detects
        engagement from the tuple. No-op (plain NHWC features) when the
        packed body didn't engage."""
        c = self.base_channels
        x = x.astype(self.dtype)

        prefix = 0
        if self.packed and self.norm == "batch" and x.shape[1] == x.shape[2]:
            prefix = packed_prefix(x.shape[1], c, self.depth,
                                   jnp.dtype(self.dtype).itemsize)
        if prefix > 0:
            keep = return_features and packed_features
            x = self._packed_body(x, prefix, train=train,
                                  keep_packed=keep)
        else:
            x = self._standard_body(x, train=train)

        if return_features:
            return x
        width = self.head_width or self.num_classes
        logits = nn.Conv(width, (1, 1), dtype=self.dtype,
                         param_dtype=jnp.float32, name="head")(x)
        # Loss/eval arithmetic is f32 regardless of compute dtype
        # (SURVEY.md §6 determinism, §7 bf16 notes).
        return logits.astype(jnp.float32)

    def _packed_body(self, x, prefix, *, train, keep_packed=False):
        """Levels [0, prefix) in the packed domain; deeper levels via the
        standard NHWC modules (same names — checkpoint-compatible), with
        pack/unpack conversions only at the (small) deep boundaries."""
        from cl_tpu.pallas import conv3x3_v3 as pc3
        from cl_tpu.pallas import pool_pack
        from cl_tpu.pallas.pool_pack import (maxpool2x2_packed,
                                             maxpool2x2_packed_tee)
        c = self.base_channels
        P = pc3.pick_pack(c, c)
        b = x.shape[0]
        Lvl = (nn.remat(PackedLevel, static_argnums=(2,))
               if self.remat else PackedLevel)
        DC = (nn.remat(DoubleConv, static_argnums=(2,))
              if self.remat else DoubleConv)

        skips_p = []  # materialized z per level (pool + decoder reuse it)
        for level in range(prefix):
            feats = c * (2 ** level)
            c_in = 3 if level == 0 else feats // 2
            mode = "stem" if level == 0 else "plain"
            yp, sc, sh = Lvl(
                feats, c_in, P, mode=mode, dtype=self.dtype,
                act_q=self.act_q, dp_axis=self.dp_axis,
                name=f"enc{level}")(x if level == 0 else xp, train)
            with jax.named_scope(f"eltwise{level}"):
                zp = bn_relu_apply(yp, sc, sh, P)
            with jax.named_scope(f"pool{level}"):
                # the skip is the pool input: the tee variant fuses the
                # decoder's skip cotangent into the pool backward (one
                # fewer full-resolution XLA add per level)
                _, hh, gg, ll = zp.shape
                if self.pool_tee and pool_pack.tee_supported(
                        hh, gg, ll, feats, zp.dtype.itemsize):
                    zs, xp = maxpool2x2_packed_tee(zp, feats)
                else:
                    zs, xp = zp, maxpool2x2_packed(zp, feats)
            skips_p.append(zs)

        # deep region in NHWC (standard modules)
        h_deep = x.shape[1] // (2 ** prefix)
        c_deep_in = c * (2 ** (prefix - 1))
        xd = xp.reshape(b, h_deep, h_deep, c_deep_in)
        skips_d = []
        for level in range(prefix, self.depth):
            xd = DC(c * (2 ** level), norm=self.norm,
                    dtype=self.dtype, conv_impl="xla", dp_axis=self.dp_axis,
                    name=f"enc{level}")(xd, train)
            skips_d.append(xd)
            xd = nn.max_pool(xd, (2, 2), strides=(2, 2))
        xd = DC(c * (2 ** self.depth), norm=self.norm,
                dtype=self.dtype, conv_impl="xla", dp_axis=self.dp_axis,
                name="bottleneck")(xd, train)
        for level in reversed(range(prefix, self.depth)):
            feats = c * (2 ** level)
            xd = nn.ConvTranspose(feats, (2, 2), strides=(2, 2),
                                  padding="VALID", use_bias=True,
                                  dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  name=f"up{level}")(xd)
            xd = jnp.concatenate([skips_d[level - prefix], xd], axis=-1)
            xd = DC(feats, norm=self.norm, dtype=self.dtype,
                    conv_impl="xla", dp_axis=self.dp_axis,
                    name=f"dec{level}")(xd, train)

        # packed decoder
        dec_sc = dec_sh = None
        for level in reversed(range(prefix)):
            feats = c * (2 ** level)
            c_below = feats * 2
            h_out = x.shape[1] // (2 ** level)
            g_out, lanes_out = h_out // P, P * feats
            if level + 1 == prefix:
                # below is NHWC — pack on entry (small at deep levels)
                bb, hh, ww, cc = xd.shape
                below_p = xd.reshape(bb, hh, ww // P, P * cc)
            else:
                with jax.named_scope(f"eltwise_dec{level}"):
                    below_p = bn_relu_apply(xp, dec_sc, dec_sh, P)
            up_p = PackedUp(feats, c_below, (g_out, lanes_out),
                            dtype=self.dtype, name=f"up{level}")(below_p)
            xp, dec_sc, dec_sh = Lvl(
                feats, feats, P, mode="split", dtype=self.dtype,
                act_q=self.act_q, dp_axis=self.dp_axis,
                name=f"dec{level}")((skips_p[level], up_p), train)
        if keep_packed:
            # raw last-conv output + its deferred BN vectors: the fused
            # head+CE kernel applies relu(xp·scale+shift) in VMEM
            # (head_ce.head_cross_entropy_packed_bn) — the eltwise_out
            # materialization pass disappears from the step
            return xp, dec_sc, dec_sh       # [B, H, G, P·c] packed view
        with jax.named_scope("eltwise_out"):
            z0 = bn_relu_apply(xp, dec_sc, dec_sh, P)
        return z0.reshape(b, x.shape[1], x.shape[2], c)

    def _standard_body(self, x, *, train):
        c = self.base_channels
        DC = (nn.remat(DoubleConv, static_argnums=(2,))
              if self.remat else DoubleConv)
        skips = []
        for level in range(self.depth):
            x = DC(c * (2 ** level), norm=self.norm, dtype=self.dtype,
                   conv_impl=self.conv_impl, dp_axis=self.dp_axis,
                   name=f"enc{level}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        x = DC(c * (2 ** self.depth), norm=self.norm, dtype=self.dtype,
               conv_impl=self.conv_impl, dp_axis=self.dp_axis,
               name="bottleneck")(x, train)

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
            x = DC(feats, norm=self.norm, dtype=self.dtype,
                   conv_impl=self.conv_impl, dp_axis=self.dp_axis,
                   name=f"dec{level}")(x, train)
        return x


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
