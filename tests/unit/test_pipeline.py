import numpy as np

from cl_tpu.config import get_preset
from cl_tpu.data import pipeline
from cl_tpu.data.synthetic import SyntheticSegDataset


def _collect(it):
    return list(it)


def test_batch_stream_deterministic():
    cfg = get_preset("smoke")
    a = _collect(pipeline.train_batches(cfg, 0, epoch=0))
    b = _collect(pipeline.train_batches(cfg, 0, epoch=0))
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.image, y.image)
        np.testing.assert_array_equal(x.flip, y.flip)


def test_epochs_differ():
    cfg = get_preset("smoke")
    a = _collect(pipeline.train_batches(cfg, 0, epoch=0))
    b = _collect(pipeline.train_batches(cfg, 0, epoch=1))
    assert not all(np.array_equal(x.image, y.image) for x, y in zip(a, b))


def test_drops_trailing_partial_batch():
    ds = SyntheticSegDataset(num_images=10, size=16, task_classes=[1], seed=0)
    got = _collect(pipeline.batches(ds, batch_size=4, epoch=0, seed=0,
                                    shuffle=False, flip_prob=0.0))
    assert len(got) == 2 and all(b.image.shape[0] == 4 for b in got)


def test_val_batches_unshuffled_unflipped():
    cfg = get_preset("smoke")
    a = _collect(pipeline.val_batches(cfg, 0))
    assert all(not b.flip.any() for b in a)
    b = _collect(pipeline.val_batches(cfg, 0))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.image, y.image)


def test_prefetch_preserves_order_and_values(eight_devices):
    cfg = get_preset("smoke")
    host = _collect(pipeline.train_batches(cfg, 0, epoch=0))
    dev = list(pipeline.prefetch_to_device(iter(host), depth=2))
    assert len(dev) == len(host)
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h.image, np.asarray(d.image))


def test_prefetch_propagates_producer_error():
    import pytest

    def bad():
        yield from ()
        raise RuntimeError("boom")

    def gen():
        from cl_tpu.data.pipeline import HostBatch
        yield HostBatch(np.zeros((1, 4, 4, 3), np.uint8),
                        np.zeros((1, 4, 4), np.int32), np.zeros(1, bool))
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(pipeline.prefetch_to_device(gen(), depth=2))


def test_prefetch_sentinel_survives_full_queue():
    """Regression: the producer's end-of-stream sentinel must be delivered
    even when the queue is full at iterator exhaustion (a dropped sentinel
    leaves the consumer blocked in q.get() forever — hit by the Fisher
    pass, whose slow consumer keeps the depth-1 queue full)."""
    import threading
    import time

    done = threading.Event()
    got = []

    def consume():
        it = pipeline.prefetch_to_device(iter(range(3)), depth=1)
        for x in it:
            got.append(int(np.asarray(x)))
            time.sleep(0.3)  # queue is full when the producer finishes
        done.set()

    t = threading.Thread(target=consume, daemon=True)
    t.start()
    assert done.wait(timeout=20.0), "prefetch consumer hung (lost sentinel)"
    assert got == [0, 1, 2]


def test_epoch_plan_properties():
    """epoch_plan is the single source of truth for batch composition
    (host pipeline, HBM cache, torch oracle): every epoch is an exact
    permutation prefix, deterministic in (seed, epoch), trailing partial
    batch dropped."""
    from hypothesis import given, settings, strategies as st

    from cl_tpu.data.pipeline import epoch_plan

    @settings(max_examples=25, deadline=None)
    @given(n=st.integers(4, 64), bs=st.integers(1, 8),
           epoch=st.integers(0, 5), seed=st.integers(0, 2**20),
           flip_prob=st.floats(0.0, 1.0))
    def check(n, bs, epoch, seed, flip_prob):
        plan = list(epoch_plan(n, batch_size=bs, epoch=epoch, seed=seed,
                               shuffle=True, flip_prob=flip_prob))
        assert len(plan) == n // bs  # partial batch dropped
        idx = np.concatenate([i for i, _ in plan]) if plan else \
            np.zeros(0, int)
        assert len(np.unique(idx)) == len(idx)  # no repeats in an epoch
        assert all(f.shape == (bs,) and f.dtype == bool for _, f in plan)
        again = list(epoch_plan(n, batch_size=bs, epoch=epoch, seed=seed,
                                shuffle=True, flip_prob=flip_prob))
        for (i1, f1), (i2, f2) in zip(plan, again):  # deterministic
            np.testing.assert_array_equal(i1, i2)
            np.testing.assert_array_equal(f1, f2)

    check()


def test_replay_mix_concatenates():
    from cl_tpu.data.pipeline import HostBatch, replay_mix

    b = HostBatch(np.zeros((4, 8, 8, 3), np.uint8),
                  np.zeros((4, 8, 8), np.int32), np.zeros(4, bool))
    r = HostBatch(np.ones((2, 8, 8, 3), np.uint8),
                  np.ones((2, 8, 8), np.int32), np.ones(2, bool))
    m = replay_mix(b, r)
    assert m.image.shape[0] == 6 and m.flip[-1]


def test_pad_final_covers_all_images():
    # 10 images, batch 4: val must emit 3 batches (last padded with idx=-1
    # rows whose masks are all ignore) — dropping val data skews mIoU.
    plan = list(pipeline.epoch_plan(10, batch_size=4, epoch=0, seed=0,
                                    shuffle=False, flip_prob=0.0,
                                    pad_final=True))
    assert len(plan) == 3
    idx = np.concatenate([i for i, _ in plan])
    assert sorted(idx[idx >= 0].tolist()) == list(range(10))
    assert (idx == -1).sum() == 2

    ds = SyntheticSegDataset(num_images=10, size=16, task_classes=[1], seed=0)
    got = _collect(pipeline.batches(ds, batch_size=4, epoch=0, seed=0,
                                    shuffle=False, flip_prob=0.0,
                                    pad_final=True, ignore_index=255))
    assert len(got) == 3 and all(b.image.shape[0] == 4 for b in got)
    assert (got[-1].mask[2:] == 255).all()  # padded rows: pure ignore
    assert not (got[-1].mask[:2] == 255).all()


def test_pad_final_smaller_than_batch():
    # val set smaller than the batch (the degenerate case that used to
    # produce ZERO eval batches -> NaN mIoU).
    plan = list(pipeline.epoch_plan(3, batch_size=8, epoch=0, seed=0,
                                    shuffle=False, flip_prob=0.0,
                                    pad_final=True))
    assert len(plan) == 1
    idx, _ = plan[0]
    assert sorted(idx[idx >= 0].tolist()) == [0, 1, 2]
    assert (idx == -1).sum() == 5


def test_device_cache_pad_final_matches_host():
    import jax
    from cl_tpu.data.device_cache import DeviceDatasetCache

    ds = SyntheticSegDataset(num_images=6, size=16, task_classes=[1], seed=1)
    cache = DeviceDatasetCache(ds)
    kw = dict(batch_size=4, epoch=0, seed=0, shuffle=False, flip_prob=0.0,
              pad_final=True, ignore_index=255)
    host = _collect(pipeline.batches(ds, **kw))
    dev = _collect(cache.batches(**kw))
    assert len(host) == len(dev) == 2
    for h, d in zip(host, dev):
        np.testing.assert_array_equal(h.mask, np.asarray(jax.device_get(d.mask)))
        np.testing.assert_array_equal(h.image, np.asarray(jax.device_get(d.image)))
