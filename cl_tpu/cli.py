"""L0 — command-line entry point (the public train/eval API, SURVEY.md §1).

Usage:
    python -m cl_tpu.cli preset=baseline_1 train.epochs_per_task=1 \
        method.methods=ewc,lwf train.checkpoint_dir=/tmp/ckpt
    python -m cl_tpu.cli eval preset=baseline_1 train.checkpoint_dir=/tmp/ckpt

Every BASELINE.json config is a preset (``preset=baseline_{1..5}``); any
field is overridable as ``section.key=value`` (SURVEY.md §5.6). The ``eval``
subcommand restores the latest per-task checkpoint and reports mIoU on
every seen task without training.
"""

from __future__ import annotations

import json
import sys

from cl_tpu.config import parse_overrides


def _run_eval(cfg) -> dict:
    import numpy as np

    from cl_tpu import checkpoint as ckpt_lib
    from cl_tpu import train as train_lib

    if not cfg.train.checkpoint_dir:
        raise SystemExit("eval needs train.checkpoint_dir=<dir>")
    grow = not cfg.model.padded_head
    last = ckpt_lib.latest_task(cfg)
    if last is None:
        raise SystemExit(f"no checkpoints in {cfg.train.checkpoint_dir}")
    model = train_lib.build_model(
        cfg, head_width=train_lib.task_head_width(cfg, last) if grow
        else None)
    tx = train_lib.build_optimizer(cfg)
    state = train_lib.init_state(cfg, model, tx)
    state, _, last_task, _ = ckpt_lib.restore_task(cfg, state, None, last)

    from cl_tpu.data import tasks as task_lib

    eval_step = train_lib.make_eval_step(cfg, model)
    seen = task_lib.seen_classes(cfg.classes_per_task, last_task)
    seen_valid = task_lib.valid_class_mask(cfg.data.num_classes, seen)
    out = {"task": last_task, "per_task_miou": []}
    for k in range(last_task + 1):
        res = train_lib.evaluate_task(cfg, eval_step, state, k, seen_valid)
        out["per_task_miou"].append(res["miou"])
    out["mean_miou"] = float(np.mean(out["per_task_miou"]))
    return out


def _run_predict(cfg) -> dict:
    """Restore the latest checkpoint and write predicted masks for the
    configured dataset's val split to ``<checkpoint_dir>/predictions/``."""
    import os

    import numpy as np

    from cl_tpu import predict as predict_lib
    from cl_tpu.data import pipeline

    state, last_task = predict_lib.restore_for_inference(cfg)
    _, val_ds = pipeline.make_datasets(cfg, last_task)
    masks = predict_lib.predict_dataset(cfg, state, val_ds)
    out_dir = os.path.join(cfg.train.checkpoint_dir, "predictions")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"task{last_task}_val_masks.npy")
    np.save(path, masks)
    return {"task": last_task, "n_images": int(masks.shape[0]),
            "classes_present": sorted(int(c) for c in np.unique(masks)),
            "out": path}


def _run_plot(cfg) -> dict:
    """Render matplotlib curves from the run's JSONL log (SURVEY.md §2.1
    Logging) into ``<log dir>/plots/`` (or ``<checkpoint_dir>/plots/``)."""
    import os

    from cl_tpu import plots

    if not cfg.train.log_path:
        raise SystemExit("plot needs train.log_path=<run.jsonl>")
    base = cfg.train.checkpoint_dir or os.path.dirname(
        os.path.abspath(cfg.train.log_path))
    out_dir = os.path.join(base, "plots")
    return {"written": plots.plot_run(cfg.train.log_path, out_dir)}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("-h", "--help"):
        print(__doc__)
        from cl_tpu.config import PRESETS
        print("presets:", ", ".join(sorted(PRESETS)))
        return 0
    mode = "train"
    if argv and argv[0] in ("train", "eval", "predict", "plot"):
        mode, argv = argv[0], argv[1:]
    cfg = parse_overrides(argv)
    if mode == "eval":
        print(json.dumps(_run_eval(cfg), default=float))
        return 0
    if mode == "predict":
        print(json.dumps(_run_predict(cfg), default=float))
        return 0
    if mode == "plot":
        print(json.dumps(_run_plot(cfg), default=float))
        return 0
    from cl_tpu.train import train

    report = train(cfg)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "miou_matrix"}, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
