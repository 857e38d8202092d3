"""L5 — structured JSONL event logging (SURVEY.md §5.5).

One JSON line per event (epoch, eval, task_done, resumed, done); stdout
mirror. Replaces the reference's print-based logging.
"""

from __future__ import annotations

import json
import sys
import time


class EventLogger:
    def __init__(self, path: str = ""):
        self.path = path
        self._fh = open(path, "a") if path else None

    def log(self, **event) -> None:
        event.setdefault("t", round(time.time(), 3))
        line = json.dumps(event, default=float)
        print(line, file=sys.stdout, flush=True)
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh:
            self._fh.close()
