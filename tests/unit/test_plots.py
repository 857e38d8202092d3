"""Matplotlib curve rendering from the JSONL event log (SURVEY.md §2.1
Logging row: the reference's print + matplotlib-curve logging)."""

import json
import os

import numpy as np

from cl_tpu import plots


def _write_log(path):
    events = [
        {"event": "epoch", "task": 0, "epoch": 0, "loss": 1.2, "steps": 4},
        {"event": "epoch", "task": 0, "epoch": 1, "loss": 0.8, "steps": 4},
        {"event": "eval", "after_task": 0, "task": 0, "miou": 0.9},
        {"event": "epoch", "task": 1, "epoch": 0, "loss": 1.0, "steps": 4},
        {"event": "epoch", "task": 1, "epoch": 1, "loss": 0.7, "steps": 4},
        {"event": "eval", "after_task": 1, "task": 0, "miou": 0.8},
        {"event": "eval", "after_task": 1, "task": 1, "miou": 0.85},
        {"event": "done"},
    ]
    with open(path, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")
        fh.write('{"event": "trunca')  # crash-truncated line is tolerated


def test_miou_matrix_from_events(tmp_path):
    log = str(tmp_path / "run.jsonl")
    _write_log(log)
    m = plots.miou_matrix_from_events(plots.load_events(log))
    assert m.shape == (2, 2)
    assert np.allclose(m[1], [0.8, 0.85])
    assert np.isnan(m[0, 1])  # task 1 not seen after task 0


def test_plot_run_writes_all_curves(tmp_path):
    log = str(tmp_path / "run.jsonl")
    _write_log(log)
    written = plots.plot_run(log, str(tmp_path / "plots"))
    names = {os.path.basename(p) for p in written}
    assert names == {"loss_curves.png", "miou_heatmap.png",
                     "forgetting_curves.png"}
    for p in written:
        assert os.path.getsize(p) > 1000  # a real PNG, not an empty file


def test_plot_cli_subcommand(tmp_path):
    from cl_tpu import cli

    log = str(tmp_path / "run.jsonl")
    _write_log(log)
    rc = cli.main(["plot", "preset=smoke", f"train.log_path={log}"])
    assert rc == 0
    out = tmp_path / "plots"
    assert (out / "miou_heatmap.png").exists()


def test_eval_every_epoch_logs_miou(tmp_path):
    import json

    from cl_tpu.config import parse_overrides
    from cl_tpu.train import train

    log = str(tmp_path / "run.jsonl")
    train(parse_overrides([
        "preset=smoke", "train.eval_every_epoch=true",
        "train.epochs_per_task=2", "train.data_parallel=false",
        f"train.log_path={log}"]))
    events = [json.loads(l) for l in open(log)]
    per_epoch = [e for e in events if e["event"] == "epoch_eval"]
    assert len(per_epoch) == 2
    assert all("miou" in e for e in per_epoch)
