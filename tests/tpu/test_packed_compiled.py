"""Compiled-on-chip gates for the packed-domain kernel suite.

The production 512² step is carried entirely by these kernels
(conv3x3_v3 packed fwd/dx/dW, pool_pack, upconv_pack, packed_eltwise,
packed head+CE) yet round 2 gated them only in interpret mode on CPU —
a Mosaic regression would have shipped silently (VERDICT r2 weak #2 /
next #2). Each test here runs the real compiled kernel on the TPU chip
against the same oracle its interpret-mode unit test uses
(tests/unit/test_pallas_conv_v3.py, test_packed_boundary.py,
test_packed_eltwise.py), plus one production-geometry train-step gate
at 512². SURVEY.md §4.4.
"""

import os

import pytest

if os.environ.get("CL_TPU_TESTS") != "1":
    pytest.skip("real-TPU suite; set CL_TPU_TESTS=1", allow_module_level=True)

import jax
import jax.numpy as jnp
import numpy as np

if jax.default_backend() != "tpu":
    pytest.skip("no TPU backend", allow_module_level=True)

from cl_tpu.pallas import conv3x3_v3 as v3
from cl_tpu.pallas import pool_pack, upconv_pack
from cl_tpu.pallas.conv3x3 import conv3x3_reference


def _rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32)
    ).astype(dtype)


# ---------------------------------------------------------------------------
# conv3x3_v3: packed fwd / dx / dW on chip
# ---------------------------------------------------------------------------


def test_conv3x3_v3_forward_compiled():
    b, h, w, ci, co = 1, 16, 64, 32, 32
    assert v3.supported(h, w, ci, co, itemsize=4)
    x = _rand((b, h, w, ci), seed=1)
    k = _rand((3, 3, ci, co), seed=2)
    got = jax.jit(v3.conv3x3)(x, k)
    want = jax.jit(conv3x3_reference)(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_conv3x3_v3_grads_compiled():
    """dx AND dW through the compiled packed backward kernels."""
    b, h, w, ci, co = 1, 16, 64, 32, 32
    x = _rand((b, h, w, ci), seed=3)
    k = _rand((3, 3, ci, co), seed=4)
    cot = _rand((b, h, w, co), seed=5)

    def loss(fn):
        return lambda x, k: jnp.sum(fn(x, k) * cot)

    gx, gw = jax.jit(jax.grad(loss(v3.conv3x3), argnums=(0, 1)))(x, k)
    rx, rw = jax.jit(jax.grad(loss(conv3x3_reference),
                              argnums=(0, 1)))(x, k)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               atol=1e-4, rtol=1e-4)


def test_conv_bn_fused_compiled():
    """The production level entry (conv_bn_fused: BN·ReLU prologue +
    conv + stats epilogue) compiled, fwd and grads, vs the composition
    it fuses."""
    rng = np.random.RandomState(7)
    b, h, wid, ci, co = 1, 16, 64, 32, 32
    p = v3.pick_pack(ci, co)
    wg = wid // p
    x = jnp.asarray(rng.randn(b, h, wg, p * ci).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.2)
    a = jnp.asarray(rng.rand(p * ci).astype(np.float32) + 0.5)
    bb = jnp.asarray(rng.randn(p * ci).astype(np.float32) * 0.1)

    def fused(x, w, a, bb):
        y, s1, s2 = v3.conv_bn_fused(x, w, a, bb, p, True)
        return y, s1, s2

    def oracle(x, w, a, bb):
        z = jnp.maximum(x.astype(jnp.float32) * a + bb, 0.0).astype(x.dtype)
        zn = z.reshape(b, h, wid, ci)
        y = conv3x3_reference(zn, w).reshape(b, h, wg, p * co)
        s1 = jnp.sum(y.astype(jnp.float32), axis=(0, 1, 2))
        s2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=(0, 1, 2))
        return y, s1, s2

    got = jax.jit(fused)(x, w, a, bb)
    want = jax.jit(oracle)(x, w, a, bb)
    for g_, w_, tol in zip(got, want, (1e-4, 2e-2, 5e-2)):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   atol=tol, rtol=1e-4)

    def scalar(fn):
        def f(x, w, a, bb):
            y, s1, s2 = fn(x, w, a, bb)
            return jnp.sum(y * y) + jnp.sum(s1 * 0.3) + jnp.sum(s2 * 0.1)
        return f

    gf = jax.jit(jax.grad(scalar(fused), argnums=(0, 1, 2, 3)))(x, w, a, bb)
    go = jax.jit(jax.grad(scalar(oracle), argnums=(0, 1, 2, 3)))(x, w, a, bb)
    for u, v_ in zip(gf, go):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v_),
                                   rtol=2e-3, atol=2e-2)


# ---------------------------------------------------------------------------
# pool_pack: forward, gradient routing, tee variant — compiled
# ---------------------------------------------------------------------------


def test_pool_pack_compiled():
    import flax.linen as nn

    p, c, g, h, b = 4, 32, 16, 8, 2
    lanes, w = p * c, g * p
    x = _rand((b, h, w, c), seed=11)
    xp = x.reshape(b, h, g, lanes)
    assert pool_pack.supported(h, g, lanes, c, 4)
    yp = jax.jit(lambda xp: pool_pack.maxpool2x2_packed(xp, c))(xp)
    want = nn.max_pool(x, (2, 2), strides=(2, 2))
    np.testing.assert_array_equal(
        np.asarray(yp.reshape(want.shape)), np.asarray(want))

    # tie-heavy input: first-max routing must match select_and_scatter
    base = np.random.RandomState(12).randint(0, 3, (b, h, w, c))
    xt = jnp.asarray(base.astype(np.float32))
    cot = _rand((b, h // 2, w // 2, c), seed=13)
    gp = jax.jit(jax.grad(lambda xp: jnp.sum(
        pool_pack.maxpool2x2_packed(xp, c).reshape(cot.shape) * cot)))(
        xt.reshape(b, h, g, lanes)).reshape(xt.shape)
    go = jax.jit(jax.grad(lambda x: jnp.sum(
        nn.max_pool(x, (2, 2), strides=(2, 2)) * cot)))(xt)
    np.testing.assert_array_equal(np.asarray(gp), np.asarray(go))


def test_pool_tee_compiled():
    """Tee variant (skip-cotangent fused into pool bwd) compiled:
    bit-identical gradients to the unfused composition, bf16."""
    p, c, g, h, b = 4, 32, 16, 8, 1
    lanes = p * c
    x = _rand((b, h, g * p, c), jnp.bfloat16, seed=14)
    xp = x.reshape(b, h, g, lanes)
    assert pool_pack.tee_supported(h, g, lanes, c, 2)
    cot = _rand((b, h // 2, g // 2, lanes), jnp.bfloat16, seed=15)
    cot2 = _rand((b, h, g, lanes), jnp.bfloat16, seed=16)

    def loss_tee(xp):
        s, yp = pool_pack.maxpool2x2_packed_tee(xp, c)
        return jnp.sum((yp * cot).astype(jnp.float32)) + \
            jnp.sum((s * cot2).astype(jnp.float32))

    def loss_plain(xp):
        yp = pool_pack.maxpool2x2_packed(xp, c)
        return jnp.sum((yp * cot).astype(jnp.float32)) + \
            jnp.sum((xp * cot2).astype(jnp.float32))

    gt = jax.jit(jax.grad(loss_tee))(xp)
    gu = jax.jit(jax.grad(loss_plain))(xp)
    np.testing.assert_array_equal(np.asarray(gt, np.float32),
                                  np.asarray(gu, np.float32))


# ---------------------------------------------------------------------------
# upconv_pack — compiled
# ---------------------------------------------------------------------------


def test_upconv_pack_compiled():
    import flax.linen as nn

    p_in, c_in, c_out, p_out = 2, 64, 32, 4
    b, h, g_in = 1, 4, 8
    lanes_in = p_in * c_in
    w_in = g_in * p_in
    geo = upconv_pack.geometry(h, g_in, lanes_in, c_in, c_out, p_out)
    assert geo is not None
    _, g_out, lanes_out = geo
    x = _rand((b, h, w_in, c_in), seed=21)
    k = _rand((2, 2, c_in, c_out), seed=22) * 0.1
    bias = _rand((c_out,), seed=23) * 0.1

    def run_packed(x, k, bias):
        xp = x.reshape(b, h, g_in, lanes_in)
        wp = upconv_pack.pack_up_weights(jnp.flip(k, (0, 1)), p_in)
        bias_l = jnp.tile(bias, 2 * p_in)
        yp = upconv_pack.upconv2x2_packed(xp, wp, bias_l,
                                          (g_out, lanes_out))
        return yp.reshape(b, 2 * h, 2 * w_in, c_out)

    def oracle(x, k, bias):
        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.ConvTranspose(c_out, (2, 2), strides=(2, 2),
                                        padding="VALID", use_bias=True)(x)
        return M().apply(
            {"params": {"ConvTranspose_0": {"kernel": k, "bias": bias}}}, x)

    got = jax.jit(run_packed)(x, k, bias)
    want = jax.jit(oracle)(x, k, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    cot = _rand((b, 2 * h, 2 * w_in, c_out), seed=24)
    gp = jax.jit(jax.grad(lambda *a: jnp.sum(run_packed(*a) * cot),
                          argnums=(0, 1, 2)))(x, k, bias)
    go = jax.jit(jax.grad(lambda *a: jnp.sum(oracle(*a) * cot),
                          argnums=(0, 1, 2)))(x, k, bias)
    for a_, b_ in zip(gp, go):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# packed_eltwise — compiled
# ---------------------------------------------------------------------------


def test_packed_eltwise_compiled():
    from cl_tpu.pallas.packed_eltwise import bn_relu_packed

    rng = np.random.RandomState(31)
    p, c = 4, 32
    y = jnp.asarray(rng.randn(2, 8, 16, p * c).astype(np.float32))
    scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)

    def oracle(y, scale, shift):
        s_l, t_l = jnp.tile(scale, p), jnp.tile(shift, p)
        return jnp.maximum(y.astype(jnp.float32) * s_l + t_l,
                           0.0).astype(y.dtype)

    got = jax.jit(lambda *a: bn_relu_packed(*a, p))(y, scale, shift)
    want = jax.jit(oracle)(y, scale, shift)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)

    cot = jnp.asarray(rng.randn(*y.shape).astype(np.float32))
    gk = jax.jit(jax.grad(lambda *a: jnp.sum(bn_relu_packed(*a, p) * cot),
                          argnums=(0, 1, 2)))(y, scale, shift)
    go = jax.jit(jax.grad(lambda *a: jnp.sum(oracle(*a) * cot),
                          argnums=(0, 1, 2)))(y, scale, shift)
    for a_, b_ in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_add_stats_packed_compiled():
    from cl_tpu.pallas.packed_eltwise import add_stats_packed

    rng = np.random.RandomState(32)
    p, c = 4, 32
    ys = jnp.asarray(rng.randn(1, 8, 16, p * c).astype(np.float32))
    yu = jnp.asarray(rng.randn(1, 8, 16, p * c).astype(np.float32))
    z, s1, s2 = jax.jit(add_stats_packed)(ys, yu)
    zf = np.asarray(ys, np.float32) + np.asarray(yu, np.float32)
    np.testing.assert_allclose(np.asarray(z), zf, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1), zf.sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), (zf * zf).sum((0, 1, 2)),
                               rtol=1e-4, atol=1e-2)


# ---------------------------------------------------------------------------
# packed head+CE — compiled
# ---------------------------------------------------------------------------


def _ce_oracle(logits, labels, valid, ignore_index=255):
    from cl_tpu import losses
    return losses.cross_entropy(logits, labels, valid,
                                ignore_index=ignore_index)


def test_head_ce_packed_compiled():
    from cl_tpu.pallas import head_ce

    rng = np.random.RandomState(41)
    b, h, w, cin, p, C = 1, 16, 64, 32, 4, 19
    feats = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    fp = feats.reshape(b, h, w // p, p * cin)
    hk = jnp.asarray(rng.randn(1, 1, cin, C).astype(np.float32) * 0.1)
    hb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, C, (b, h, w)).astype(np.int32))
    valid = jnp.asarray(np.arange(C) < 10)

    def fused(fp, hk, hb):
        loss, n = head_ce.head_cross_entropy_packed(
            fp, hk, hb, labels, valid, p=p)
        return loss

    def oracle(fp, hk, hb):
        logits = (fp.reshape(b, h, w, cin) @ hk.reshape(cin, C)) + hb
        loss, n = _ce_oracle(logits, labels, valid)
        return loss

    got = jax.jit(fused)(fp, hk, hb)
    want = jax.jit(oracle)(fp, hk, hb)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    gk = jax.jit(jax.grad(fused, argnums=(0, 1, 2)))(fp, hk, hb)
    go = jax.jit(jax.grad(oracle, argnums=(0, 1, 2)))(fp, hk, hb)
    for a_, b_ in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-5, rtol=1e-4)


def test_head_ce_packed_bn_compiled():
    """BN·ReLU-prologue head+CE vs the bn_relu_packed → packed-head
    composition it fuses — compiled."""
    from cl_tpu.pallas import head_ce
    from cl_tpu.pallas.packed_eltwise import bn_relu_packed

    rng = np.random.RandomState(42)
    b, h, w, cin, p, C = 1, 16, 64, 32, 4, 19
    raw = jnp.asarray(rng.randn(b, h, w // p, p * cin).astype(np.float32))
    scale = jnp.asarray(rng.rand(cin).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.randn(cin).astype(np.float32) * 0.1)
    hk = jnp.asarray(rng.randn(1, 1, cin, C).astype(np.float32) * 0.1)
    hb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, C, (b, h, w)).astype(np.int32))
    valid = jnp.asarray(np.arange(C) < 10)

    def fused(raw, scale, shift, hk, hb):
        loss, _ = head_ce.head_cross_entropy_packed_bn(
            raw, scale, shift, hk, hb, labels, valid, p=p)
        return loss

    def comp(raw, scale, shift, hk, hb):
        z = bn_relu_packed(raw, scale, shift, p)
        loss, _ = head_ce.head_cross_entropy_packed(
            z, hk, hb, labels, valid, p=p)
        return loss

    got = jax.jit(fused)(raw, scale, shift, hk, hb)
    want = jax.jit(comp)(raw, scale, shift, hk, hb)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    gk = jax.jit(jax.grad(fused, argnums=(0, 1, 2, 3, 4)))(
        raw, scale, shift, hk, hb)
    go = jax.jit(jax.grad(comp, argnums=(0, 1, 2, 3, 4)))(
        raw, scale, shift, hk, hb)
    for a_, b_ in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_head_ce_kd_packed_bn_compiled():
    """KD-fused BN-prologue head (the baseline_4/5 production path)
    compiled: CE and KD match the materialized-logits composition."""
    from cl_tpu import losses
    from cl_tpu.pallas import head_ce
    from cl_tpu.pallas.packed_eltwise import bn_relu_packed

    rng = np.random.RandomState(43)
    b, h, w, cin, p, C = 1, 16, 64, 32, 4, 19
    T = 2.0
    raw = jnp.asarray(rng.randn(b, h, w // p, p * cin).astype(np.float32))
    traw = jnp.asarray(rng.randn(b, h, w // p, p * cin).astype(np.float32))
    sc = jnp.asarray(rng.rand(cin).astype(np.float32) + 0.5)
    sh = jnp.asarray(rng.randn(cin).astype(np.float32) * 0.1)
    tsc = jnp.asarray(rng.rand(cin).astype(np.float32) + 0.5)
    tsh = jnp.asarray(rng.randn(cin).astype(np.float32) * 0.1)
    hk = jnp.asarray(rng.randn(1, 1, cin, C).astype(np.float32) * 0.1)
    hb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    thk = jnp.asarray(rng.randn(1, 1, cin, C).astype(np.float32) * 0.1)
    thb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, 10, (b, h, w)).astype(np.int32))
    valid = jnp.asarray(np.arange(C) < 12)
    ov = jnp.asarray(np.arange(C) < 7)

    def fused(raw, sc, sh, hk, hb):
        ce, kd, _ = head_ce.head_cross_entropy_kd_packed_bn(
            raw, sc, sh, hk, hb, traw, tsc, tsh, thk, thb, labels,
            valid, ov, p=p, temperature=T)
        return ce, kd

    def comp(raw, sc, sh, hk, hb):
        z = bn_relu_packed(raw, sc, sh, p).reshape(b, h, w, cin)
        logits = (z @ hk.reshape(cin, C)) + hb
        ce, _ = losses.cross_entropy(logits, labels, valid)
        zt = bn_relu_packed(traw, tsc, tsh, p).reshape(b, h, w, cin)
        tl = (zt @ thk.reshape(cin, C)) + thb
        kd = losses.kd_loss_jnp(logits, tl, ov, labels, temperature=T)
        return ce, kd

    args = (raw, sc, sh, hk, hb)
    got = jax.jit(fused)(*args)
    want = jax.jit(comp)(*args)
    np.testing.assert_allclose(float(got[0]), float(want[0]), rtol=2e-4)
    np.testing.assert_allclose(float(got[1]), float(want[1]), atol=2e-4)

    def scalar(fn):
        return lambda *a: fn(*a)[0] + 0.7 * fn(*a)[1]

    gk = jax.jit(jax.grad(scalar(fused), argnums=(0, 1, 2, 3, 4)))(*args)
    go = jax.jit(jax.grad(scalar(comp), argnums=(0, 1, 2, 3, 4)))(*args)
    for a_, b_ in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# Production-geometry gates: the 512² packed step, compiled end to end
# ---------------------------------------------------------------------------


def _packed_cfg(extra=()):
    from cl_tpu.config import parse_overrides
    return parse_overrides([
        "data.num_classes=19", "data.image_size=512",
        "data.source_size=576", "data.batch_size=2",
        "data.train_images_per_task=4", "data.val_images_per_task=2",
        "model.base_channels=32", "train.compute_dtype=bfloat16",
        "train.data_parallel=false", *extra])


def test_packed_train_step_512_compiled():
    """One production-geometry (512², 32 ch, bf16, packed body + packed
    head+CE) train step: compiles, runs, finite loss."""
    import jax.numpy as jnp

    from cl_tpu import train as train_lib
    from cl_tpu.data import pipeline, tasks as task_lib
    from cl_tpu.models.unet import packed_prefix

    cfg = _packed_cfg()
    model = train_lib.build_model(cfg)
    assert model.packed, "packed body must engage at 512²/32ch"
    assert packed_prefix(512, 32, 4, 2) > 0
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    step = train_lib.make_train_step(cfg, model, tx, mesh=None)
    valid = jnp.asarray(task_lib.valid_class_mask(
        19, task_lib.seen_classes(cfg.classes_per_task, 0)))
    for b in pipeline.train_batches(cfg, 0, 0):
        batch = pipeline.HostBatch(jnp.asarray(b.image),
                                   jnp.asarray(b.mask),
                                   jnp.asarray(b.flip))
        state, aux = step(state, batch, valid)
    assert np.isfinite(float(aux["loss"]))


def test_packed_epoch_scan_512_compiled():
    """Full driver at 512² with the HBM cache + one-dispatch-per-epoch
    lax.scan (the production ladder mode) on the packed body."""
    from cl_tpu.config import parse_overrides
    from cl_tpu.train import train

    cfg = _packed_cfg(["data.device_cache=true", "data.epoch_scan=true",
                       "train.num_tasks=1", "train.epochs_per_task=1"])
    report = train(cfg)
    assert np.isfinite(report["final_per_task_miou"]).all()


def test_conv_bn_fused_q_compiled():
    """int8 saved-activation storage (r4) compiled on chip at a
    production-like geometry (wg=64 ≥ the 32-sublane int8 tiling gate):
    forward bit-equal to the exact kernel, q pair matching the per-row
    reference quantizer, and the threaded two-conv chain's gradients
    within quantization-noise tolerance of the exact chain."""
    rng = np.random.RandomState(2)
    b, h, wid, ci, co = 1, 64, 256, 32, 32
    p = v3.pick_pack(ci, co)
    wg = wid // p
    assert v3.q_supported(wg)
    x = _rand((b, h, wg, p * ci), jnp.bfloat16, seed=1)
    w0 = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32)
                     * 0.2).astype(jnp.bfloat16)
    w1 = jnp.asarray(np.random.RandomState(3).randn(3, 3, co, co)
                     .astype(np.float32) * 0.2).astype(jnp.bfloat16)
    a = jnp.asarray(rng.rand(p * ci).astype(np.float32) + 0.5)
    bb = jnp.asarray(rng.randn(p * ci).astype(np.float32) * 0.1)
    zeros = jnp.zeros((p * ci,), jnp.float32)
    ones = jnp.ones((p * ci,), jnp.float32)
    dy = _rand((b, h, wg, p * co), jnp.bfloat16, seed=5)

    # forward exactness + quantizer contract
    y0, s10, s20 = jax.jit(
        lambda x, w: v3.conv_bn_fused(x, w, ones, zeros, p, False)
    )(x, w0)
    y, s1, s2, (yq, ysc) = jax.jit(
        lambda x, w: v3.conv_bn_fused_q(x, None, w, ones, zeros, p,
                                        False))(x, w0)
    np.testing.assert_array_equal(
        np.asarray(y.astype(jnp.float32)),
        np.asarray(y0.astype(jnp.float32)))
    yf = np.asarray(y.astype(jnp.float32))
    m = np.abs(yf).max(axis=2, keepdims=True)
    np.testing.assert_allclose(np.asarray(ysc), m / 127.0,
                               rtol=1e-5, atol=1e-8)
    err = np.abs(np.asarray(yq, np.float32) * np.asarray(ysc) - yf)
    assert (err <= np.broadcast_to(np.asarray(ysc) * 0.5 + 1e-6,
                                   err.shape)).all()

    # threaded chain grads vs the exact chain
    def f_q(x, w0, w1):
        y1, _, _, q1 = v3.conv_bn_fused_q(x, None, w0, ones, zeros, p,
                                          False)
        y2, s1b, _, _ = v3.conv_bn_fused_q(y1, q1, w1, a, bb, p, True)
        return (jnp.sum(y2.astype(jnp.float32)
                        * dy.astype(jnp.float32))
                + jnp.sum(s1b) * 0.1)

    def f_p(x, w0, w1):
        y1, _, _ = v3.conv_bn_fused(x, w0, ones, zeros, p, False)
        y2, s1b, _ = v3.conv_bn_fused(y1, w1, a, bb, p, True)
        return (jnp.sum(y2.astype(jnp.float32)
                        * dy.astype(jnp.float32))
                + jnp.sum(s1b) * 0.1)

    gq = jax.jit(jax.grad(f_q, argnums=(0, 1, 2)))(x, w0, w1)
    gp = jax.jit(jax.grad(f_p, argnums=(0, 1, 2)))(x, w0, w1)
    for name, u, v in zip(("gx", "gw0", "gw1"), gq, gp):
        u = np.asarray(u.astype(jnp.float32))
        v = np.asarray(v.astype(jnp.float32))
        rms = (np.sqrt(((u - v) ** 2).mean())
               / (np.sqrt((v ** 2).mean()) + 1e-9))
        assert rms < 8e-2, f"{name} rms rel gap {rms}"
