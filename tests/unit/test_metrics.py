import jax.numpy as jnp
import numpy as np

from cl_tpu import metrics


def test_iou_hand_computed():
    conf = np.array([[3, 1, 0],
                     [0, 2, 1],
                     [0, 0, 4]], dtype=np.float64)
    iou = metrics.iou_from_confusion(conf)
    # class0: 3/(4+3-3)=0.75; class1: 2/(3+3-2)=0.5; class2: 4/(4+5-4)=0.8
    np.testing.assert_allclose(iou, [0.75, 0.5, 0.8])
    np.testing.assert_allclose(metrics.miou(conf), np.mean([0.75, 0.5, 0.8]))


def test_absent_class_is_nan_and_skipped():
    conf = np.zeros((3, 3))
    conf[0, 0] = 5
    iou = metrics.iou_from_confusion(conf)
    assert np.isnan(iou[1]) and np.isnan(iou[2])
    assert metrics.miou(conf) == 1.0


def test_confusion_update_ignores_255():
    logits = np.zeros((1, 2, 2, 3), np.float32)
    logits[..., 1] = 5.0  # predict class 1 everywhere
    labels = np.array([[[1, 0], [255, 1]]], np.int32)
    conf = metrics.confusion_matrix_update(
        jnp.zeros((3, 3), jnp.float32), jnp.asarray(logits),
        jnp.asarray(labels), jnp.ones(3, bool))
    conf = np.asarray(conf)
    assert conf.sum() == 3  # ignored pixel dropped
    assert conf[1, 1] == 2 and conf[0, 1] == 1


def test_confusion_respects_valid_mask():
    logits = np.zeros((1, 1, 1, 3), np.float32)
    logits[..., 2] = 9.0  # would predict class 2, but it's not seen yet
    labels = np.zeros((1, 1, 1), np.int32)
    conf = metrics.confusion_matrix_update(
        jnp.zeros((3, 3), jnp.float32), jnp.asarray(logits),
        jnp.asarray(labels), jnp.asarray([True, True, False]))
    assert np.asarray(conf)[0, 2] == 0


def test_forgetting_report():
    m = np.array([[0.8, np.nan], [0.6, 0.7]])
    rep = metrics.forgetting_report(m)
    np.testing.assert_allclose(rep["forgetting_per_task"], [0.8 - 0.6])
    np.testing.assert_allclose(rep["mean_final_miou"], 0.65)
