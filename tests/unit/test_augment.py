"""Device augmentation (jnp + pallas) vs the pure-numpy oracle — exactness
guarantees the torch oracle and the JAX framework see identical inputs."""

import jax.numpy as jnp
import numpy as np
import pytest

from cl_tpu import augment
from cl_tpu.pallas import augment as augment_pallas


def _batch(seed=0, b=3, s=40):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, size=(b, s, s, 3), dtype=np.uint8)
    mask = rng.randint(0, 5, size=(b, s, s)).astype(np.int32)
    flip = np.array([True, False, True][:b])
    return img, mask, flip


MEAN = (0.485, 0.456, 0.406)
STD = (0.229, 0.224, 0.225)


@pytest.mark.parametrize("impl", [augment.augment_jnp, augment_pallas.augment])
def test_matches_numpy_oracle(impl):
    img, mask, flip = _batch()
    x, y = impl(jnp.asarray(img), jnp.asarray(mask), jnp.asarray(flip),
                out_size=32, mean=MEAN, std=STD, compute_dtype=jnp.float32)
    xo, yo = augment.augment_reference_np(img, mask, flip, out_size=32,
                                          mean=MEAN, std=STD)
    np.testing.assert_allclose(np.asarray(x), xo, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(y), yo)


def test_flip_only_flips_flagged_samples():
    img, mask, flip = _batch(b=2)
    flip = np.array([True, False])
    x, y = augment.augment_jnp(jnp.asarray(img), jnp.asarray(mask),
                               jnp.asarray(flip), out_size=40, mean=MEAN,
                               std=STD)
    x2, y2 = augment.augment_jnp(jnp.asarray(img), jnp.asarray(mask),
                                 jnp.asarray(~flip), out_size=40, mean=MEAN,
                                 std=STD)
    np.testing.assert_allclose(np.asarray(x)[0], np.asarray(x2)[0][:, ::-1],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x)[1], np.asarray(x2)[1][:, ::-1],
                               atol=1e-5)


def test_bf16_output_dtype():
    img, mask, flip = _batch()
    x, _ = augment.augment_jnp(jnp.asarray(img), jnp.asarray(mask),
                               jnp.asarray(flip), out_size=32, mean=MEAN,
                               std=STD, compute_dtype=jnp.bfloat16)
    assert x.dtype == jnp.bfloat16
