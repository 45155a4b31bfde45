"""Training summaries: append-only JSONL event log + console logging.

The reference trainers wire tf.summary/FileWriter + LoggingTensorHook
(modelzoo/WDL/train.py summaries, work_queue water-level summaries).
Here a summary stream is one JSONL file per run — trivially greppable,
plottable, and merge-safe across restarts (append-only, step-stamped).
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class SummaryWriter:
    def __init__(self, directory: str, name: str = "events"):
        os.makedirs(directory, exist_ok=True)
        self.path = os.path.join(directory, f"{name}.jsonl")
        self._f = open(self.path, "a", buffering=1)

    def write(self, step: int, values: Dict[str, float], **extra):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: (float(v) if hasattr(v, "dtype") or isinstance(v, (int, float))
                        else v) for k, v in values.items()})
        rec.update(extra)
        self._f.write(json.dumps(rec) + "\n")

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_events(directory: str, name: str = "events"):
    path = os.path.join(directory, f"{name}.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]
