"""Property-based replay-buffer tests (SURVEY.md §4.1: "sampling
distribution (hypothesis)")."""

import numpy as np
from hypothesis import given, settings, strategies as st

from cl_tpu.data.synthetic import SyntheticSegDataset
from cl_tpu.methods.replay import ReplayBuffer


def _ds(n, seed=0):
    return SyntheticSegDataset(num_images=n, size=8, task_classes=[1],
                               seed=seed)


@settings(max_examples=25, deadline=None)
@given(cap=st.integers(1, 16), adds=st.lists(st.integers(1, 10),
                                             min_size=1, max_size=4),
       seed=st.integers(0, 2**31 - 1))
def test_capacity_invariant_holds_for_any_sequence(cap, adds, seed):
    buf = ReplayBuffer(cap, seed=seed)
    total = 0
    for t, n in enumerate(adds):
        buf.add_examples(_ds(max(n, 1), seed=t), n, task_id=t)
        total += n
        assert len(buf) == min(cap, total)


@settings(max_examples=10, deadline=None)
@given(k=st.integers(1, 8), seed=st.integers(0, 2**31 - 1))
def test_sample_shapes_and_membership(k, seed):
    buf = ReplayBuffer(8, seed=seed)
    buf.add_examples(_ds(8), 8, task_id=0)
    s = buf.sample(k, flip_prob=0.5)
    assert s.image.shape == (k, 8, 8, 3)
    stored = np.stack(buf.images)
    for row in s.image:
        assert any((row == img).all() for img in stored)


def test_reservoir_is_approximately_uniform():
    """Each of N items should survive in the buffer with ~cap/N probability;
    over many seeds the empirical retention of early vs late items must not
    differ wildly (reservoir property)."""
    N, cap, trials = 40, 10, 200
    keep_counts = np.zeros(N)
    for s in range(trials):
        buf = ReplayBuffer(cap, seed=s)
        ds = _ds(N, seed=0)
        buf.add_examples(ds, N, task_id=0)
        # recover which dataset indices survived by matching bytes
        imgs = [ds[i][0] for i in range(N)]
        for kept in buf.images:
            for i, img in enumerate(imgs):
                if (kept == img).all():
                    keep_counts[i] += 1
                    break
    rates = keep_counts / trials
    # expected rate cap/N = 0.25; allow generous tolerance but catch
    # catastrophic bias (e.g. only-last-items retention would be 0/1)
    assert rates.mean() > 0.15
    assert rates.min() > 0.05 and rates.max() < 0.6
