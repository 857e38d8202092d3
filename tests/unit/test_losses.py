"""Loss arithmetic vs torch (CE w/ ignore_index, LwF KD) and EWC identities."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from cl_tpu import losses
from cl_tpu.methods import ewc as ewc_lib
from reference_impl import methods as tref


def _fixture(seed=0, b=2, h=8, w=8, c=5):
    rng = np.random.RandomState(seed)
    logits = rng.randn(b, h, w, c).astype(np.float32)
    labels = rng.randint(0, c, size=(b, h, w)).astype(np.int32)
    labels[0, 0, :2] = 255  # ignore pixels
    valid = np.ones(c, bool)
    return logits, labels, valid


def test_ce_matches_torch():
    logits, labels, valid = _fixture()
    ours, n = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(valid))
    theirs = F.cross_entropy(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)),
        torch.from_numpy(labels.astype(np.int64)), ignore_index=255)
    np.testing.assert_allclose(float(ours), float(theirs), atol=1e-5)
    assert int(n) == (labels != 255).sum()


def test_ce_class_mask_excludes_unseen():
    logits, labels, _ = _fixture(c=5)
    labels = np.clip(labels, 0, 2)  # only classes 0..2 present
    valid = np.array([True, True, True, False, False])
    ours, _ = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                   jnp.asarray(valid))
    # equivalent: slice away invalid logit columns entirely
    sliced, _ = losses.cross_entropy(
        jnp.asarray(logits[..., :3]), jnp.asarray(labels),
        jnp.asarray(valid[:3]))
    np.testing.assert_allclose(float(ours), float(sliced), atol=1e-5)


def test_kd_zero_when_logits_equal():
    logits, labels, valid = _fixture()
    kd = losses.kd_loss_jnp(jnp.asarray(logits), jnp.asarray(logits),
                            jnp.asarray(valid), jnp.asarray(labels),
                            temperature=2.0)
    assert abs(float(kd)) < 1e-6


def test_kd_matches_torch_reference():
    logits, labels, _ = _fixture()
    old = _fixture(seed=1)[0]
    old_valid = np.array([True, True, True, False, False])
    ours = losses.kd_loss_jnp(jnp.asarray(logits), jnp.asarray(old),
                              jnp.asarray(old_valid), jnp.asarray(labels),
                              temperature=2.0)
    lwf = tref.LwF(temperature=2.0)

    class _Frozen:
        def __call__(self, x):
            return torch.from_numpy(old.transpose(0, 3, 1, 2))
        def eval(self):
            return self
        def parameters(self):
            return []

    lwf.old_model = _Frozen()
    lwf.old_valid = torch.from_numpy(old_valid)
    theirs = lwf.distill_loss(
        torch.from_numpy(logits.transpose(0, 3, 1, 2)), None,
        torch.from_numpy(labels.astype(np.int64)))
    np.testing.assert_allclose(float(ours), float(theirs), atol=1e-5)


def test_ewc_penalty_zero_at_anchor():
    params = {"a": jnp.arange(4.0), "b": jnp.ones((2, 2))}
    state = ewc_lib.make_ewc_state(params, mode="online")
    state = ewc_lib.ewc_after_task(
        state, params, jax.tree.map(jnp.ones_like, params),
        mode="online", gamma=1.0, task_id=0)
    pen = ewc_lib.penalty(params, state, mode="online")
    assert float(pen) == 0.0


def test_ewc_penalty_quadratic_closed_form():
    params = {"w": jnp.asarray([1.0, 2.0])}
    fisher = {"w": jnp.asarray([3.0, 4.0])}
    state = ewc_lib.make_ewc_state(params, mode="online")
    state = ewc_lib.ewc_after_task(state, params, fisher, mode="online",
                                   gamma=1.0, task_id=0)
    moved = {"w": jnp.asarray([2.0, 0.0])}
    pen = ewc_lib.penalty(moved, state, mode="online")
    # 0.5 * (3*(2-1)^2 + 4*(0-2)^2) = 0.5 * (3 + 16)
    np.testing.assert_allclose(float(pen), 9.5, atol=1e-6)


def test_ewc_separate_mode_sums_tasks():
    params = {"w": jnp.asarray([0.0])}
    state = ewc_lib.make_ewc_state(params, mode="separate", max_tasks=2)
    state = ewc_lib.ewc_after_task(state, {"w": jnp.asarray([1.0])},
                                   {"w": jnp.asarray([2.0])},
                                   mode="separate", gamma=1.0, task_id=0)
    state = ewc_lib.ewc_after_task(state, {"w": jnp.asarray([3.0])},
                                   {"w": jnp.asarray([1.0])},
                                   mode="separate", gamma=1.0, task_id=1)
    pen = ewc_lib.penalty({"w": jnp.asarray([3.0])}, state, mode="separate")
    # 0.5 * [2*(3-1)^2 + 1*(3-3)^2] = 4.0
    np.testing.assert_allclose(float(pen), 4.0, atol=1e-6)


def test_fisher_quadratic_model_closed_form():
    """For CE on a 2-class 1-pixel model with logits = [w, 0], the empirical
    Fisher is (dCE/dw)^2 = (softmax(w)[label!=0 case]) — check vs autograd."""
    w = jnp.asarray(0.3)

    def ce(w):
        logits = jnp.stack([w, jnp.zeros_like(w)])
        return -jax.nn.log_softmax(logits)[0]

    g = jax.grad(ce)(w)
    np.testing.assert_allclose(
        float(g) ** 2, float((jax.nn.softmax(jnp.stack([w, 0.0]))[1]) ** 2),
        atol=1e-6)
