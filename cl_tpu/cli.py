"""L0 — command-line entry point.

Usage:
    python -m cl_tpu.cli preset=baseline_1 train.epochs_per_task=1 \
        method.methods=ewc,lwf train.checkpoint_dir=/tmp/ckpt

Every BASELINE.json config is a preset (``preset=baseline_{1..5}``); any
field is overridable as ``section.key=value`` (SURVEY.md §5.6).
"""

from __future__ import annotations

import json
import sys

from cl_tpu.config import parse_overrides


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("-h", "--help"):
        print(__doc__)
        from cl_tpu.config import PRESETS
        print("presets:", ", ".join(sorted(PRESETS)))
        return 0
    cfg = parse_overrides(argv)
    from cl_tpu.train import train

    report = train(cfg)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "miou_matrix"}, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
