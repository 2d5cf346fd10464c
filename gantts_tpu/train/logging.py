"""Scalar logging: TensorBoard (same series names as the reference) + JSONL.

The reference logs ~12 scalar series per epoch through tensorboard_logger
(train.py:44-45, 609-637).  We keep the exact tag strings so dashboards
transfer, write through ``torch.utils.tensorboard`` when available, and
always mirror to a JSONL sidecar (greppable, no TB dependency for tests).
"""

from __future__ import annotations

import json
import os


class ScalarWriter:
    def __init__(self, log_dir):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            self._tb = None

    def log_value(self, name, value, step):
        value = float(value)
        self._jsonl.write(json.dumps(
            {"tag": name, "value": value, "step": int(step)}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(name, value, step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
