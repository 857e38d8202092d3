"""KD-fused head kernels vs the materialized-logits composition
(interpret on CPU).

LwF under the fused head (pallas/head_ce.py KD section): CE + the LwF
distillation KL computed in one tile pass, teacher logit tile from
teacher pre-head features — must equal ``losses.cross_entropy`` +
``losses.kd_loss_jnp`` of the materialized logit tensors, gradients
included (the teacher side receives none). SURVEY.md §2.1 "LwF";
VERDICT r2 next #4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu import losses
from cl_tpu.pallas import head_ce
from cl_tpu.pallas.packed_eltwise import bn_relu_packed

B, H, W, CIN, P, C = 1, 16, 64, 32, 4, 19
T = 2.0


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    d = dict(
        feats=jnp.asarray(rng.randn(B, H, W, CIN).astype(np.float32)),
        tfeats=jnp.asarray(rng.randn(B, H, W, CIN).astype(np.float32)),
        hk=jnp.asarray(rng.randn(1, 1, CIN, C).astype(np.float32) * 0.1),
        hb=jnp.asarray(rng.randn(C).astype(np.float32) * 0.1),
        thk=jnp.asarray(rng.randn(1, 1, CIN, C).astype(np.float32) * 0.1),
        thb=jnp.asarray(rng.randn(C).astype(np.float32) * 0.1),
        raw=jnp.asarray(rng.randn(B, H, W // P, P * CIN).astype(np.float32)),
        traw=jnp.asarray(rng.randn(B, H, W // P, P * CIN).astype(np.float32)),
        sc=jnp.asarray(rng.rand(CIN).astype(np.float32) + 0.5),
        sh=jnp.asarray(rng.randn(CIN).astype(np.float32) * 0.1),
        tsc=jnp.asarray(rng.rand(CIN).astype(np.float32) + 0.5),
        tsh=jnp.asarray(rng.randn(CIN).astype(np.float32) * 0.1),
    )
    # labels inside the valid set, with some ignore pixels
    labels = rng.randint(0, 12, (B, H, W)).astype(np.int32)
    labels[0, 0, :7] = 255
    d["labels"] = jnp.asarray(labels)
    d["valid"] = jnp.asarray(np.arange(C) < 12)
    d["ov"] = jnp.asarray(np.arange(C) < 7)
    return d


def _logits(feats, hk, hb):
    return (feats @ hk.reshape(CIN, C)) + hb


def test_plain_kd_matches_composition(data):
    dd = data

    def comp(feats, hk, hb):
        ce, _ = losses.cross_entropy(_logits(feats, hk, hb), dd["labels"],
                                     dd["valid"])
        kd = losses.kd_loss_jnp(_logits(feats, hk, hb),
                                _logits(dd["tfeats"], dd["thk"], dd["thb"]),
                                dd["ov"], dd["labels"], temperature=T)
        return ce, kd

    def fused(feats, hk, hb):
        ce, kd, _ = head_ce.head_cross_entropy_kd(
            feats, hk, hb, dd["tfeats"], dd["thk"], dd["thb"],
            dd["labels"], dd["valid"], dd["ov"], temperature=T)
        return ce, kd

    ce_c, kd_c = comp(dd["feats"], dd["hk"], dd["hb"])
    ce_f, kd_f = fused(dd["feats"], dd["hk"], dd["hb"])
    np.testing.assert_allclose(float(ce_f), float(ce_c), rtol=1e-5)
    np.testing.assert_allclose(float(kd_f), float(kd_c), rtol=1e-5)

    def scalar(fn):
        return lambda *a: fn(*a)[0] + 0.7 * fn(*a)[1]

    gc = jax.grad(scalar(comp), argnums=(0, 1, 2))(dd["feats"], dd["hk"],
                                                   dd["hb"])
    gf = jax.grad(scalar(fused), argnums=(0, 1, 2))(dd["feats"], dd["hk"],
                                                    dd["hb"])
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_packed_bn_kd_matches_composition(data):
    dd = data

    def comp(raw, sc, sh, hk, hb):
        z = bn_relu_packed(raw, sc, sh, P).reshape(B, H, W, CIN)
        ce, _ = losses.cross_entropy(_logits(z, hk, hb), dd["labels"],
                                     dd["valid"])
        zt = bn_relu_packed(dd["traw"], dd["tsc"], dd["tsh"],
                            P).reshape(B, H, W, CIN)
        kd = losses.kd_loss_jnp(_logits(z, hk, hb),
                                _logits(zt, dd["thk"], dd["thb"]),
                                dd["ov"], dd["labels"], temperature=T)
        return ce, kd

    def fused(raw, sc, sh, hk, hb):
        ce, kd, _ = head_ce.head_cross_entropy_kd_packed_bn(
            raw, sc, sh, hk, hb, dd["traw"], dd["tsc"], dd["tsh"],
            dd["thk"], dd["thb"], dd["labels"], dd["valid"], dd["ov"],
            p=P, temperature=T)
        return ce, kd

    args = (dd["raw"], dd["sc"], dd["sh"], dd["hk"], dd["hb"])
    ce_c, kd_c = comp(*args)
    ce_f, kd_f = fused(*args)
    np.testing.assert_allclose(float(ce_f), float(ce_c), rtol=1e-5)
    np.testing.assert_allclose(float(kd_f), float(kd_c), rtol=1e-5)

    def scalar(fn):
        return lambda *a: fn(*a)[0] + 0.7 * fn(*a)[1]

    gc = jax.grad(scalar(comp), argnums=(0, 1, 2, 3, 4))(*args)
    gf = jax.grad(scalar(fused), argnums=(0, 1, 2, 3, 4))(*args)
    for a, b in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_kd_zero_when_no_old_classes(data):
    """Task 0: old_valid all-False must give exactly kd == 0 (the
    weight gate multiplies it anyway; both sides must be finite)."""
    dd = data
    ov0 = jnp.zeros(C, bool)
    _, kd, _ = head_ce.head_cross_entropy_kd(
        dd["feats"], dd["hk"], dd["hb"], dd["tfeats"], dd["thk"],
        dd["thb"], dd["labels"], dd["valid"], ov0, temperature=T)
    assert float(kd) == 0.0
    g = jax.grad(lambda f: head_ce.head_cross_entropy_kd(
        f, dd["hk"], dd["hb"], dd["tfeats"], dd["thk"], dd["thb"],
        dd["labels"], dd["valid"], ov0, temperature=T)[1])(dd["feats"])
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-7)


def test_grow_mode_narrow_heads(data):
    """Grow-the-head: student and teacher head widths below C are
    zero-padded inside the wrappers; grads slice back to the narrow
    shapes."""
    dd = data
    ws, wt = 12, 7  # student grew to 12 classes, teacher knew 7
    hk_n = dd["hk"][..., :ws]
    hb_n = dd["hb"][:ws]
    thk_n = dd["thk"][..., :wt]
    thb_n = dd["thb"][:wt]

    def comp(feats, hk, hb):
        logits = jnp.pad((feats @ hk.reshape(CIN, ws)) + hb,
                         ((0, 0), (0, 0), (0, 0), (0, C - ws)))
        tl = jnp.pad((dd["tfeats"] @ thk_n.reshape(CIN, wt)) + thb_n,
                     ((0, 0), (0, 0), (0, 0), (0, C - wt)))
        ce, _ = losses.cross_entropy(logits, dd["labels"], dd["valid"])
        kd = losses.kd_loss_jnp(logits, tl, dd["ov"], dd["labels"],
                                temperature=T)
        return ce, kd

    def fused(feats, hk, hb):
        ce, kd, _ = head_ce.head_cross_entropy_kd(
            feats, hk, hb, dd["tfeats"], thk_n, thb_n, dd["labels"],
            dd["valid"], dd["ov"], temperature=T)
        return ce, kd

    ce_c, kd_c = comp(dd["feats"], hk_n, hb_n)
    ce_f, kd_f = fused(dd["feats"], hk_n, hb_n)
    np.testing.assert_allclose(float(ce_f), float(ce_c), rtol=1e-5)
    np.testing.assert_allclose(float(kd_f), float(kd_c), rtol=1e-5)
    gc = jax.grad(lambda *a: comp(*a)[0] + comp(*a)[1],
                  argnums=(1, 2))(dd["feats"], hk_n, hb_n)
    gf = jax.grad(lambda *a: fused(*a)[0] + fused(*a)[1],
                  argnums=(1, 2))(dd["feats"], hk_n, hb_n)
    for a, b in zip(gf, gc):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_packed_bn_kd_p2_odd_classes():
    """p=2 (the 64-ch pack factor) with a non-power-of-two class count
    and a narrow teacher — the geometry baseline_2-style shapes would
    hit if the envelope ever opens."""
    rng = np.random.RandomState(7)
    b, h, w, cin, p, C = 1, 8, 32, 64, 2, 11
    raw = jnp.asarray(rng.randn(b, h, w // p, p * cin).astype(np.float32))
    traw = jnp.asarray(rng.randn(b, h, w // p, p * cin).astype(np.float32))
    sc = jnp.asarray(rng.rand(cin).astype(np.float32) + 0.5)
    sh = jnp.asarray(rng.randn(cin).astype(np.float32) * 0.1)
    tsc = jnp.asarray(rng.rand(cin).astype(np.float32) + 0.5)
    tsh = jnp.asarray(rng.randn(cin).astype(np.float32) * 0.1)
    hk = jnp.asarray(rng.randn(1, 1, cin, C).astype(np.float32) * 0.1)
    hb = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    thk = jnp.asarray(rng.randn(1, 1, cin, 6).astype(np.float32) * 0.1)
    thb = jnp.asarray(rng.randn(6).astype(np.float32) * 0.1)
    labels = jnp.asarray(rng.randint(0, 8, (b, h, w)).astype(np.int32))
    valid = jnp.asarray(np.arange(C) < 8)
    ov = jnp.asarray(np.arange(C) < 6)

    def comp(raw, sc, sh, hk, hb):
        z = bn_relu_packed(raw, sc, sh, p).reshape(b, h, w, cin)
        logits = (z @ hk.reshape(cin, C)) + hb
        ce, _ = losses.cross_entropy(logits, labels, valid)
        zt = bn_relu_packed(traw, tsc, tsh, p).reshape(b, h, w, cin)
        tl = jnp.pad((zt @ thk.reshape(cin, 6)) + thb,
                     ((0, 0), (0, 0), (0, 0), (0, C - 6)))
        kd = losses.kd_loss_jnp(logits, tl, ov, labels, temperature=2.0)
        return ce + 0.7 * kd

    def fused(raw, sc, sh, hk, hb):
        ce, kd, _ = head_ce.head_cross_entropy_kd_packed_bn(
            raw, sc, sh, hk, hb, traw, tsc, tsh, thk, thb, labels,
            valid, ov, p=p, temperature=2.0)
        return ce + 0.7 * kd

    args = (raw, sc, sh, hk, hb)
    np.testing.assert_allclose(float(fused(*args)), float(comp(*args)),
                               rtol=1e-5)
    gc = jax.grad(comp, argnums=(0, 1, 2, 3, 4))(*args)
    gf = jax.grad(fused, argnums=(0, 1, 2, 3, 4))(*args)
    for a, b_ in zip(gf, gc):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_bf16_kd_close(data):
    """Production dtype: bf16 features through the packed_bn KD kernel
    track the f32 composition at bf16 tolerance."""
    dd = data
    raw = dd["raw"].astype(jnp.bfloat16)
    traw = dd["traw"].astype(jnp.bfloat16)
    ce_f, kd_f, _ = head_ce.head_cross_entropy_kd_packed_bn(
        raw, dd["sc"], dd["sh"], dd["hk"], dd["hb"], traw, dd["tsc"],
        dd["tsh"], dd["thk"], dd["thb"], dd["labels"], dd["valid"],
        dd["ov"], p=P, temperature=T)
    z = bn_relu_packed(dd["raw"], dd["sc"], dd["sh"], P).reshape(
        B, H, W, CIN)
    zt = bn_relu_packed(dd["traw"], dd["tsc"], dd["tsh"], P).reshape(
        B, H, W, CIN)
    ce_c, _ = losses.cross_entropy(_logits(z, dd["hk"], dd["hb"]),
                                   dd["labels"], dd["valid"])
    kd_c = losses.kd_loss_jnp(_logits(z, dd["hk"], dd["hb"]),
                              _logits(zt, dd["thk"], dd["thb"]),
                              dd["ov"], dd["labels"], temperature=T)
    np.testing.assert_allclose(float(ce_f), float(ce_c), rtol=3e-2)
    np.testing.assert_allclose(float(kd_f), float(kd_c), atol=3e-2)
