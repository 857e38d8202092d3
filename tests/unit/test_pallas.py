"""Pallas kernels vs pure-jnp oracles, interpret mode on CPU (SURVEY.md
§4.1: every kernel has an exact oracle test)."""

import jax
import jax.numpy as jnp
import numpy as np

from cl_tpu import losses
from cl_tpu.methods import ewc as ewc_lib
from cl_tpu.pallas import ewc_fused, kd_loss as kd_pallas


def _params(seed=0, sizes=((64,), (33, 7), (128, 128), (5,))):
    rng = np.random.RandomState(seed)
    return {f"p{i}": jnp.asarray(rng.randn(*s).astype(np.float32))
            for i, s in enumerate(sizes)}


def test_ewc_penalty_matches_treemap_online():
    params = _params(0)
    anchor = _params(1)
    fisher = jax.tree.map(lambda p: jnp.abs(p), _params(2))
    state = ewc_lib.EWCState(anchor=anchor, fisher=fisher,
                             weight=jnp.float32(1.0), n_tasks=jnp.int32(1))
    ref = ewc_lib.penalty(params, state, mode="online")
    got = ewc_fused.penalty(params, state, mode="online")
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)


def test_ewc_penalty_matches_treemap_separate():
    params = _params(0)
    T = 3

    def stack(seed):
        rng = np.random.RandomState(seed)
        return jax.tree.map(
            lambda p: jnp.asarray(
                rng.randn(T, *p.shape).astype(np.float32)), params)

    state = ewc_lib.EWCState(anchor=stack(1),
                             fisher=jax.tree.map(jnp.abs, stack(2)),
                             weight=jnp.float32(1.0), n_tasks=jnp.int32(T))
    ref = ewc_lib.penalty(params, state, mode="separate")
    got = ewc_fused.penalty(params, state, mode="separate")
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_ewc_penalty_gradient_matches():
    params = _params(0)
    anchor = _params(1)
    fisher = jax.tree.map(jnp.abs, _params(2))
    state = ewc_lib.EWCState(anchor=anchor, fisher=fisher,
                             weight=jnp.float32(1.0), n_tasks=jnp.int32(1))
    g_ref = jax.grad(lambda p: ewc_lib.penalty(p, state, mode="online"))(
        params)
    g_got = jax.grad(lambda p: ewc_fused.penalty(p, state, mode="online"))(
        params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)


def test_sq_accumulate_matches_treemap():
    acc = jax.tree.map(jnp.zeros_like, _params(0))
    grads = _params(3)
    ref = jax.tree.map(lambda a, g: a + g * g, acc, grads)
    got = ewc_fused.sq_accumulate(acc, grads)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6)


def _kd_fixture(seed=0, b=2, h=8, w=8, c=5):
    rng = np.random.RandomState(seed)
    new = rng.randn(b, h, w, c).astype(np.float32)
    old = rng.randn(b, h, w, c).astype(np.float32)
    labels = rng.randint(0, c, size=(b, h, w)).astype(np.int32)
    labels[0, 0, :3] = 255
    valid = np.array([True, True, True, False, False])
    return (jnp.asarray(new), jnp.asarray(old), jnp.asarray(valid),
            jnp.asarray(labels))


def test_kd_loss_matches_jnp():
    new, old, valid, labels = _kd_fixture()
    ref = losses.kd_loss_jnp(new, old, valid, labels, temperature=2.0)
    got = kd_pallas.kd_loss(new, old, valid, labels, temperature=2.0)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_kd_loss_gradient_matches_jnp():
    new, old, valid, labels = _kd_fixture()

    g_ref = jax.grad(lambda x: losses.kd_loss_jnp(
        x, old, valid, labels, temperature=2.0))(new)
    g_got = jax.grad(lambda x: kd_pallas.kd_loss(
        x, old, valid, labels, temperature=2.0))(new)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-6)


def test_kd_loss_zero_when_equal():
    new, _, valid, labels = _kd_fixture()
    got = kd_pallas.kd_loss(new, new, valid, labels, temperature=2.0)
    assert abs(float(got)) < 1e-6


def test_kd_loss_wide_class_dim():
    # C > 128 exercises lane padding
    new, old, valid, labels = _kd_fixture(c=5)
    rng = np.random.RandomState(7)
    c = 200
    new = jnp.asarray(rng.randn(1, 4, 4, c).astype(np.float32))
    old = jnp.asarray(rng.randn(1, 4, 4, c).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, c, size=(1, 4, 4)).astype(np.int32))
    valid = jnp.asarray(np.arange(c) < 150)
    ref = losses.kd_loss_jnp(new, old, valid, labels, temperature=3.0)
    got = kd_pallas.kd_loss(new, old, valid, labels, temperature=3.0)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_replay_gather_matches_take():
    from cl_tpu.pallas import replay_gather

    rng = np.random.RandomState(5)
    buf = jnp.asarray(rng.randint(0, 256, size=(10, 16, 16, 3),
                                  dtype=np.uint8))
    idx = jnp.asarray(np.array([3, 0, 7, 3], np.int32))
    got = replay_gather.gather(buf, idx)
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(buf)[np.asarray(idx)])


def test_device_replay_buffer():
    from cl_tpu.data.synthetic import SyntheticSegDataset
    from cl_tpu.pallas.replay_gather import DeviceReplayBuffer

    ds = SyntheticSegDataset(num_images=12, size=16, task_classes=[1], seed=0)
    buf = DeviceReplayBuffer(8, 16, seed=3)
    buf.add_examples(ds, 6, task_id=0)
    assert len(buf) == 6
    buf.add_examples(ds, 6, task_id=1)
    assert len(buf) == 8  # capacity bound
    idx = buf.sample_indices(4)
    imgs, masks = buf.gather(idx)
    assert imgs.shape == (4, 16, 16, 3) and masks.shape == (4, 16, 16)
    # gathered rows are actual stored rows
    np.testing.assert_array_equal(
        np.asarray(imgs[0]), np.asarray(buf.images)[int(idx[0])])


def test_ce_loss_matches_jnp():
    from cl_tpu.pallas import ce_loss as ce_pallas

    rng = np.random.RandomState(11)
    logits = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    labels = rng.randint(0, 5, size=(2, 8, 8)).astype(np.int32)
    labels[0, :2] = 255
    labels_j = jnp.asarray(labels)
    valid = jnp.asarray(np.array([True, True, True, False, False]))
    ref, n_ref = losses.cross_entropy(logits, labels_j, valid)
    got, n_got = ce_pallas.cross_entropy(logits, labels_j, valid)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    assert float(n_got) == float(n_ref)


def test_ce_loss_gradient_matches_jnp():
    from cl_tpu.pallas import ce_loss as ce_pallas

    rng = np.random.RandomState(12)
    logits = jnp.asarray(rng.randn(1, 8, 8, 7).astype(np.float32))
    labels = rng.randint(0, 6, size=(1, 8, 8)).astype(np.int32)
    labels[0, 0] = 255
    labels_j = jnp.asarray(labels)
    valid = jnp.asarray(np.arange(7) < 6)
    g_ref = jax.grad(lambda x: losses.cross_entropy(x, labels_j, valid)[0])(
        logits)
    g_got = jax.grad(
        lambda x: ce_pallas.cross_entropy(x, labels_j, valid)[0])(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-6)


def test_ce_loss_odd_pixel_count():
    # P=3*5*5=75 is not a multiple of 128: exercises the lane-padding path
    # (padding carries ignore_index so padded pixels contribute nothing).
    from cl_tpu.pallas import ce_loss as ce_pallas

    rng = np.random.RandomState(13)
    logits = jnp.asarray(rng.randn(3, 5, 5, 6).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 6, size=(3, 5, 5)).astype(np.int32))
    valid = jnp.asarray(np.ones(6, bool))
    ref, _ = losses.cross_entropy(logits, labels, valid)
    got, _ = ce_pallas.cross_entropy(logits, labels, valid)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    g_ref = jax.grad(lambda x: losses.cross_entropy(x, labels, valid)[0])(
        logits)
    g_got = jax.grad(
        lambda x: ce_pallas.cross_entropy(x, labels, valid)[0])(logits)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-6)


def test_ce_loss_all_ignored():
    # Every pixel ignored: loss 0, grad 0, n clamps to 1 (no div-by-zero).
    from cl_tpu.pallas import ce_loss as ce_pallas

    rng = np.random.RandomState(14)
    logits = jnp.asarray(rng.randn(1, 8, 8, 5).astype(np.float32))
    labels = jnp.full((1, 8, 8), 255, np.int32)
    valid = jnp.asarray(np.ones(5, bool))
    got, n = ce_pallas.cross_entropy(logits, labels, valid)
    assert float(got) == 0.0 and float(n) == 1.0
    g = jax.grad(
        lambda x: ce_pallas.cross_entropy(x, labels, valid)[0])(logits)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_ce_loss_bf16_logits():
    # bf16 logits (the train step's compute dtype): the kernel upcasts to
    # f32 internally; result equals the jnp oracle fed the same bf16 input.
    from cl_tpu.pallas import ce_loss as ce_pallas

    rng = np.random.RandomState(15)
    logits = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    logits_bf = logits.astype(jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 5, size=(2, 8, 8)).astype(np.int32))
    valid = jnp.asarray(np.ones(5, bool))
    ref, _ = losses.cross_entropy(logits_bf, labels, valid)
    got, _ = ce_pallas.cross_entropy(logits_bf, labels, valid)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_kd_loss_odd_pixel_count():
    from cl_tpu.pallas import kd_loss as kd_odd

    rng = np.random.RandomState(16)
    new = jnp.asarray(rng.randn(1, 7, 9, 5).astype(np.float32))
    old = jnp.asarray(rng.randn(1, 7, 9, 5).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 5, size=(1, 7, 9)).astype(np.int32))
    valid = jnp.asarray(np.array([True, True, True, False, False]))
    ref = losses.kd_loss_jnp(new, old, valid, labels, temperature=2.0)
    got = kd_odd.kd_loss(new, old, valid, labels, temperature=2.0)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    g_ref = jax.grad(lambda x: losses.kd_loss_jnp(
        x, old, valid, labels, temperature=2.0))(new)
    g_got = jax.grad(lambda x: kd_odd.kd_loss(
        x, old, valid, labels, temperature=2.0))(new)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-6)


# ---------------------------------------------------------------------------
# Fused head+CE (pallas/head_ce.py) vs 1×1-conv + CE oracle
# ---------------------------------------------------------------------------


def _head_fixture(seed=21, cin=16, classes=9, width=None, hw=(2, 8, 8)):
    rng = np.random.RandomState(seed)
    b, h, w = hw
    width = width or classes
    feats = jnp.asarray(rng.randn(b, h, w, cin).astype(np.float32))
    kern = jnp.asarray((rng.randn(1, 1, cin, width) * 0.3)
                       .astype(np.float32))
    bias = jnp.asarray((rng.randn(width) * 0.3).astype(np.float32))
    labels = rng.randint(0, min(width, classes), size=(b, h, w))
    labels[0, :2] = 255
    labels_j = jnp.asarray(labels.astype(np.int32))
    valid = jnp.asarray((np.arange(classes) < min(width, classes) - 1)
                        .astype(np.float32))
    return feats, kern, bias, labels_j, valid


def _head_oracle(feats, kern, bias, labels, valid, classes):
    logits = jax.lax.conv_general_dilated(
        feats, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    if logits.shape[-1] != classes:
        logits = jnp.pad(
            logits, ((0, 0),) * 3 + ((0, classes - logits.shape[-1]),),
            constant_values=losses.NEG_INF)
    return losses.cross_entropy(logits, labels, valid)


def test_head_ce_matches_oracle():
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture()
    ref, n_ref = _head_oracle(feats, kern, bias, labels, valid, 9)
    got, n_got = head_ce.head_cross_entropy(feats, kern, bias, labels,
                                            valid)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    assert float(n_got) == float(n_ref)


def test_head_ce_gradients_match_oracle():
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture(seed=22)
    g_ref = jax.grad(
        lambda f, k, b: _head_oracle(f, k, b, labels, valid, 9)[0],
        argnums=(0, 1, 2))(feats, kern, bias)
    g_got = jax.grad(
        lambda f, k, b: head_ce.head_cross_entropy(
            f, k, b, labels, valid)[0],
        argnums=(0, 1, 2))(feats, kern, bias)
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(g).reshape(r.shape),
                                   np.asarray(r), rtol=1e-4, atol=1e-6)


def test_head_ce_grow_mode_padded_width():
    """Grow-the-head: width < num_classes — fused pads W/b with zeros and
    grads slice back to the caller's width (oracle pads logits -inf)."""
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture(seed=23, width=6)
    ref, _ = _head_oracle(feats, kern, bias, labels, valid, 9)
    got, _ = head_ce.head_cross_entropy(feats, kern, bias, labels, valid)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    g_ref = jax.grad(
        lambda k, b: _head_oracle(feats, k, b, labels, valid, 9)[0],
        argnums=(0, 1))(kern, bias)
    g_got = jax.grad(
        lambda k, b: head_ce.head_cross_entropy(
            feats, k, b, labels, valid)[0],
        argnums=(0, 1))(kern, bias)
    assert g_got[0].shape == kern.shape and g_got[1].shape == bias.shape
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)


def test_head_ce_bf16_features():
    """bf16 features: dx comes back bf16, dW/db stay f32 (the optimizer
    and params are f32 — SURVEY.md §7 bf16 discipline)."""
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture(seed=24)
    fb = feats.astype(jnp.bfloat16)
    got, _ = head_ce.head_cross_entropy(fb, kern, bias, labels, valid)
    ref, _ = _head_oracle(fb.astype(jnp.float32), kern, bias, labels,
                          valid, 9)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-2)
    g = jax.grad(
        lambda f, k, b: head_ce.head_cross_entropy(
            f, k, b, labels, valid)[0],
        argnums=(0, 1, 2))(fb, kern, bias)
    assert g[0].dtype == jnp.bfloat16
    assert g[1].dtype == jnp.float32 and g[2].dtype == jnp.float32


def test_head_ce_odd_pixel_count():
    """Pixel count not a multiple of the lane block: padded pixels carry
    ignore_index and contribute nothing."""
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture(seed=25, hw=(1, 5, 7))
    ref, n_ref = _head_oracle(feats, kern, bias, labels, valid, 9)
    got, n_got = head_ce.head_cross_entropy(feats, kern, bias, labels,
                                            valid)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    assert float(n_got) == float(n_ref)


def test_head_ce_all_ignored():
    from cl_tpu.pallas import head_ce

    feats, kern, bias, _, valid = _head_fixture(seed=26)
    labels = jnp.full(feats.shape[:3], 255, jnp.int32)
    got, n = head_ce.head_cross_entropy(feats, kern, bias, labels, valid)
    assert float(got) == 0.0 and float(n) == 1.0
    g = jax.grad(
        lambda f: head_ce.head_cross_entropy(
            f, kern, bias, labels, valid)[0])(feats)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_head_ce_train_step_matches_unfused():
    """The full jitted train step with train.fused_head_ce on vs off:
    identical loss sequence and near-identical params (f32 sum-order)."""
    from cl_tpu import train as train_lib
    from cl_tpu.config import parse_overrides
    from cl_tpu.data import pipeline, tasks as task_lib

    def run(fused):
        cfg = parse_overrides([
            "data.num_classes=7", "data.image_size=32",
            "data.source_size=40", "data.batch_size=2",
            "data.train_images_per_task=4", "model.base_channels=8",
            "method.methods=ewc", "train.data_parallel=false",
            f"train.fused_head_ce={'true' if fused else 'false'}"])
        model = train_lib.build_model(cfg)
        tx = train_lib.build_optimizer(cfg)
        state = train_lib.init_state(cfg, model, tx)
        step = train_lib.make_train_step(cfg, model, tx, mesh=None)
        valid = jnp.asarray(task_lib.valid_class_mask(
            cfg.data.num_classes,
            task_lib.seen_classes(cfg.classes_per_task, 0)))
        out = []
        for b in pipeline.train_batches(cfg, 0, epoch=0):
            bb = pipeline.HostBatch(jnp.asarray(b.image),
                                    jnp.asarray(b.mask),
                                    jnp.asarray(b.flip))
            state, aux = step(state, bb, valid)
            out.append(float(aux["loss"]))
        return out, state

    l_ref, s_ref = run(False)
    l_got, s_got = run(True)
    np.testing.assert_allclose(l_got, l_ref, rtol=1e-5)
    # Adam's g/√v normalization amplifies f32 sum-order differences on
    # the first steps; the loss equality above is the math gate, the
    # param bound only catches gross wiring errors.
    diffs = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                         s_ref.params, s_got.params)
    assert max(jax.tree.leaves(diffs)) < 1e-3


def test_head_ce_packed_matches_oracle():
    """Packed (pixel-major) head+CE vs the same 1×1-conv + CE oracle:
    the packed view is a free reshape of NHWC, so loss and grads must
    match the class-major kernel's oracle."""
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture(seed=24)
    p = 128 // feats.shape[-1]                 # cin=16 → p=8, lanes=128
    b, h, w, cin = feats.shape
    fp = feats.reshape(b, h, w // p, p * cin)
    ref, n_ref = _head_oracle(feats, kern, bias, labels, valid, 9)
    got, n_got = head_ce.head_cross_entropy_packed(fp, kern, bias,
                                                   labels, valid, p=p)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    assert float(n_got) == float(n_ref)


def test_head_ce_packed_gradients_match_oracle():
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture(seed=25)
    p = 128 // feats.shape[-1]
    b, h, w, cin = feats.shape

    def f_ref(f, k, bb):
        return _head_oracle(f, k, bb, labels, valid, 9)[0]

    def f_pk(f, k, bb):
        fp = f.reshape(b, h, w // p, p * cin)
        return head_ce.head_cross_entropy_packed(fp, k, bb, labels,
                                                 valid, p=p)[0]

    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(feats, kern, bias)
    g_got = jax.grad(f_pk, argnums=(0, 1, 2))(feats, kern, bias)
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(g).reshape(r.shape),
                                   np.asarray(r), rtol=1e-4, atol=1e-6)


def test_head_ce_packed_grow_mode():
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture(seed=26, width=6)
    p = 128 // feats.shape[-1]
    b, h, w, cin = feats.shape
    fp = feats.reshape(b, h, w // p, p * cin)
    ref, _ = _head_oracle(feats, kern, bias, labels, valid, 9)
    got, _ = head_ce.head_cross_entropy_packed(fp, kern, bias, labels,
                                               valid, p=p)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)
    g_got = jax.grad(
        lambda k, bb: head_ce.head_cross_entropy_packed(
            fp, k, bb, labels, valid, p=p)[0], argnums=(0, 1))(kern, bias)
    g_ref = jax.grad(
        lambda k, bb: _head_oracle(feats, k, bb, labels, valid, 9)[0],
        argnums=(0, 1))(kern, bias)
    assert g_got[0].shape == kern.shape and g_got[1].shape == bias.shape
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-4, atol=1e-6)


def test_head_ce_packed_more_classes_than_cin():
    """C > Cin = lanes/p (e.g. 21 VOC classes on a base-16 model): the
    gen-3 kernel is class-major inside, so no lane-block class limit —
    this backs the removal of the C<=base_channels gate in train.py."""
    from cl_tpu.pallas import head_ce

    feats, kern, bias, labels, valid = _head_fixture(seed=27, cin=16,
                                                     classes=21, width=21)
    p = 128 // feats.shape[-1]
    b, h, w, cin = feats.shape
    fp = feats.reshape(b, h, w // p, p * cin)
    ref, _ = _head_oracle(feats, kern, bias, labels, valid, 21)
    got, _ = head_ce.head_cross_entropy_packed(fp, kern, bias, labels,
                                               valid, p=p)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)

    def f_pk(f, k, bb):
        return head_ce.head_cross_entropy_packed(
            f.reshape(b, h, w // p, p * cin), k, bb, labels, valid,
            p=p)[0]

    g_ref = jax.grad(
        lambda f, k, bb: _head_oracle(f, k, bb, labels, valid, 21)[0],
        argnums=(0, 1, 2))(feats, kern, bias)
    g_got = jax.grad(f_pk, argnums=(0, 1, 2))(feats, kern, bias)
    for r, g in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(g).reshape(r.shape),
                                   np.asarray(r), rtol=1e-4, atol=1e-6)


def test_head_ce_packed_bn_matches_composition():
    """BN·ReLU-prologue packed head+CE == bn_relu_packed then the plain
    packed head+CE, bit-for-bit (loss AND all five gradients) — the
    in-kernel prologue rounds z to the feature dtype exactly where the
    materialized eltwise kernel stores it."""
    from cl_tpu.pallas import head_ce
    from cl_tpu.pallas.packed_eltwise import bn_relu_packed

    feats, kern, bias, labels, valid = _head_fixture(seed=31)
    rng = np.random.RandomState(31)
    cin = feats.shape[-1]
    p = 128 // cin
    b, h, w, _ = feats.shape
    fp = feats.reshape(b, h, w // p, p * cin)
    scale = jnp.asarray(rng.randn(cin).astype(np.float32))
    shift = jnp.asarray((rng.randn(cin) * 0.1).astype(np.float32))

    def f_ref(f, sc, sh, k, bb):
        z = bn_relu_packed(f, sc, sh, p)
        return head_ce.head_cross_entropy_packed(z, k, bb, labels,
                                                 valid, p=p)[0]

    def f_bn(f, sc, sh, k, bb):
        return head_ce.head_cross_entropy_packed_bn(
            f, sc, sh, k, bb, labels, valid, p=p)[0]

    args = (fp, scale, shift, kern, bias)
    ref = f_ref(*args)
    got = f_bn(*args)
    assert float(got) == float(ref)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3, 4))(*args)
    g_got = jax.grad(f_bn, argnums=(0, 1, 2, 3, 4))(*args)
    # dfeat/dkern/dbias are bit-equal; the BN-vector grads may differ by
    # 1 f32 ulp (the same colsum math compiles inside a different kernel,
    # so XLA may reassociate the lane reduction differently).
    for name, r, g in zip(("dfeat", "dkern", "dbias"),
                          (g_ref[0], g_ref[3], g_ref[4]),
                          (g_got[0], g_got[3], g_got[4])):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r),
                                      err_msg=name)
    for name, r, g in zip(("dscale", "dshift"), g_ref[1:3], g_got[1:3]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-9, err_msg=name)


def test_head_ce_packed_bn_bf16_and_grow():
    """bf16 features + grow-mode head width < classes through the BN
    prologue variant."""
    from cl_tpu.pallas import head_ce
    from cl_tpu.pallas.packed_eltwise import bn_relu_packed

    feats, kern, bias, labels, valid = _head_fixture(seed=32, width=6)
    rng = np.random.RandomState(32)
    cin = feats.shape[-1]
    p = 128 // cin
    b, h, w, _ = feats.shape
    fp = feats.astype(jnp.bfloat16).reshape(b, h, w // p, p * cin)
    scale = jnp.asarray(rng.randn(cin).astype(np.float32))
    shift = jnp.asarray((rng.randn(cin) * 0.1).astype(np.float32))

    def f_ref(f, sc, sh, k, bb):
        z = bn_relu_packed(f, sc, sh, p)
        return head_ce.head_cross_entropy_packed(z, k, bb, labels,
                                                 valid, p=p)[0]

    def f_bn(f, sc, sh, k, bb):
        return head_ce.head_cross_entropy_packed_bn(
            f, sc, sh, k, bb, labels, valid, p=p)[0]

    args = (fp, scale, shift, kern, bias)
    assert float(f_bn(*args)) == float(f_ref(*args))
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(*args)
    g_got = jax.grad(f_bn, argnums=(0, 1, 2, 3))(*args)
    for name, r, g in zip(("dfeat", "dkern"), (g_ref[0], g_ref[3]),
                          (g_got[0], g_got[3])):
        np.testing.assert_array_equal(
            np.asarray(g).astype(np.float32),
            np.asarray(r).astype(np.float32), err_msg=name)
    for name, r, g in zip(("dscale", "dshift"), g_ref[1:3], g_got[1:3]):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=1e-6, atol=1e-9, err_msg=name)
