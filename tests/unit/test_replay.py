import numpy as np

from cl_tpu.data.pipeline import HostBatch
from cl_tpu.data.synthetic import SyntheticSegDataset
from cl_tpu.methods.replay import ReplayBuffer


def _ds(n=10, seed=0):
    return SyntheticSegDataset(num_images=n, size=16, task_classes=[1],
                               seed=seed)


def test_capacity_never_exceeded():
    buf = ReplayBuffer(4, seed=0)
    for t in range(3):
        buf.add_examples(_ds(seed=t), 5, task_id=t)
        assert len(buf) <= 4


def test_deterministic_given_seed():
    a, b = ReplayBuffer(8, seed=7), ReplayBuffer(8, seed=7)
    for buf in (a, b):
        buf.add_examples(_ds(), 6, task_id=0)
    sa = a.sample(3, flip_prob=0.5)
    sb = b.sample(3, flip_prob=0.5)
    np.testing.assert_array_equal(sa.image, sb.image)
    np.testing.assert_array_equal(sa.flip, sb.flip)


def test_empty_buffer_sample_is_none():
    assert ReplayBuffer(4, seed=0).sample(2, flip_prob=0.0) is None


def test_sample_or_current_keeps_batch_shape():
    buf = ReplayBuffer(4, seed=0)
    batch = HostBatch(image=np.zeros((8, 16, 16, 3), np.uint8),
                      mask=np.zeros((8, 16, 16), np.int32),
                      flip=np.zeros(8, bool))
    rb = buf.sample_or_current(3, batch, flip_prob=0.0)
    assert rb.image.shape == (3, 16, 16, 3)


def test_state_dict_roundtrip():
    buf = ReplayBuffer(8, seed=3)
    buf.add_examples(_ds(), 5, task_id=0)
    sd = buf.state_dict()
    buf2 = ReplayBuffer(1, seed=99)
    buf2.load_state_dict(sd)
    assert len(buf2) == len(buf) and buf2.capacity == 8
    np.testing.assert_array_equal(buf2.sample(2, flip_prob=0.0).image,
                                  buf.sample(2, flip_prob=0.0).image)


def test_reservoir_eventually_mixes_tasks():
    buf = ReplayBuffer(10, seed=1)
    for t in range(4):
        buf.add_examples(_ds(n=10, seed=t), 10, task_id=t)
    assert len(set(buf.task_ids)) > 1
