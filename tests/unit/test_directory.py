"""Directory-layout loader for real VOC-/Cityscapes-style data
(SURVEY.md §2.1 "Dataset / task splits"): PNG decode, class filtering,
remap, resize, threaded batch decode, and an end-to-end train run."""

import numpy as np
import pytest

from cl_tpu.data.directory import DirectorySegDataset

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_dataset(root, *, n=8, size=24, classes=(0, 1, 2, 3, 4)):
    """n images per split; image i contains class (i % 4) + 1 in a center
    square (class 0 background elsewhere)."""
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        (root / "images" / split).mkdir(parents=True)
        (root / "masks" / split).mkdir(parents=True)
        for i in range(n):
            img = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
            mask = np.zeros((size, size), np.uint8)
            c = (i % 4) + 1
            mask[size // 4: 3 * size // 4, size // 4: 3 * size // 4] = c
            mask[0, 0] = 255  # ignore pixel survives the pipeline
            Image.fromarray(img).save(root / "images" / split / f"{i:03d}.png")
            Image.fromarray(mask).save(root / "masks" / split / f"{i:03d}.png")
    return root


def test_loads_filters_and_remaps(tmp_path):
    _write_dataset(tmp_path, n=8)
    ds = DirectorySegDataset(data_dir=str(tmp_path), split="train",
                             source_size=24, task_classes=[1, 2])
    # images containing class 1 or 2 → i % 4 in {0, 1} → 4 of 8
    assert len(ds) == 4
    img, mask = ds[0]
    assert img.shape == (24, 24, 3) and img.dtype == np.uint8
    assert mask.dtype == np.uint8
    # remap keeps task classes + background, maps others to ignore
    assert set(np.unique(mask)) <= {0, 1, 2, 255}


def test_resizes_to_source_size(tmp_path):
    _write_dataset(tmp_path, n=4, size=24)
    ds = DirectorySegDataset(data_dir=str(tmp_path), split="val",
                             source_size=16, task_classes=[1])
    img, mask = ds[0]
    assert img.shape == (16, 16, 3)
    assert mask.shape == (16, 16)
    assert set(np.unique(mask)) <= {0, 1, 255}  # nearest keeps class ids


def test_get_batch_matches_items(tmp_path):
    _write_dataset(tmp_path, n=8)
    ds = DirectorySegDataset(data_dir=str(tmp_path), split="train",
                             source_size=24, task_classes=[1, 2, 3, 4])
    idx = np.arange(len(ds))
    bi, bm = ds.get_batch(idx)
    assert bi.shape[0] == len(ds)
    for k, i in enumerate(idx):
        img, mask = ds[int(i)]
        np.testing.assert_array_equal(bi[k], img)
        np.testing.assert_array_equal(bm[k], mask)


def test_missing_directory_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        DirectorySegDataset(data_dir=str(tmp_path / "nope"), split="train",
                            source_size=16, task_classes=[1])


def test_non_square_sources_squash_to_square(tmp_path):
    # Aspect-ratio contract (documented in directory.py): non-square
    # sources are SQUASHED to source_size² (separate H/W half-pixel
    # coefficient maps), mirroring a torchvision Resize((S, S)). Masks use
    # nearest so class ids survive.
    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "masks" / "train").mkdir(parents=True)
    img = np.zeros((20, 32, 3), np.uint8)
    img[:, 16:] = 255  # right half white
    mask = np.zeros((20, 32), np.uint8)
    mask[:, 16:] = 1   # right half class 1
    Image.fromarray(img).save(tmp_path / "images" / "train" / "a.png")
    Image.fromarray(mask).save(tmp_path / "masks" / "train" / "a.png")
    ds = DirectorySegDataset(data_dir=str(tmp_path), split="train",
                             source_size=16, task_classes=[1])
    im, mk = ds[0]
    assert im.shape == (16, 16, 3) and mk.shape == (16, 16)
    # the halves land in the squashed square's halves
    assert (mk[:, :8] == 0).all() and (mk[:, 8:] == 1).all()
    assert im[:, :7].max() == 0 and im[:, 9:].min() == 255


def test_cli_train_eval_predict_roundtrip_on_png(tmp_path):
    # The least-exercised real-data user path (VERDICT round-1 item 7):
    # PNG directory → CLI train (with per-task checkpoints) → CLI eval
    # (restores, reports per-task mIoU) → CLI predict (writes masks).
    import json

    from cl_tpu.cli import main

    _write_dataset(tmp_path / "data", n=8, size=24)
    ckpt = str(tmp_path / "ckpt")
    args = ["preset=smoke", "data.dataset=voc_dir",
            f"data.data_dir={tmp_path / 'data'}", "data.num_classes=5",
            "data.source_size=24", "data.image_size=16",
            "data.batch_size=2", "train.num_tasks=2", "model.depth=2",
            "train.epochs_per_task=1", "train.data_parallel=false",
            f"train.checkpoint_dir={ckpt}"]
    assert main(args) == 0
    assert main(["eval"] + args) == 0
    assert main(["predict"] + args) == 0
    masks = np.load(f"{ckpt}/predictions/task1_val_masks.npy")
    assert masks.dtype == np.uint8 and masks.shape[1:] == (16, 16)
    assert masks.shape[0] > 0


def test_end_to_end_train_on_directory_dataset(tmp_path):
    from cl_tpu.config import parse_overrides
    from cl_tpu.train import train

    _write_dataset(tmp_path, n=8, size=24)
    cfg = parse_overrides([
        "preset=smoke", "data.dataset=voc_dir",
        f"data.data_dir={tmp_path}", "data.num_classes=5",
        "data.source_size=24", "data.image_size=16",
        "data.batch_size=2", "train.num_tasks=2",
        "model.depth=2", "train.epochs_per_task=1",
        "train.data_parallel=false",
    ])
    report = train(cfg)
    assert np.isfinite(report["final_per_task_miou"]).all()
