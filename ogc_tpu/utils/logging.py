"""Scalar logging: tensorboardX if available (torch-free), JSONL fallback.

NOTE: torch.utils.tensorboard must NOT be imported here — importing torch
into a JAX process deadlocks XLA's compile thread in this environment
(OpenMP/futex conflict).  tensorboardX has no torch dependency.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional


class JsonlWriter:
    """Minimal SummaryWriter-compatible scalar logger."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")

    def add_scalar(self, tag: str, value, global_step: Optional[int] = None):
        self._f.write(
            json.dumps(
                {"t": time.time(), "tag": tag, "value": float(value),
                 "step": global_step}
            )
            + "\n"
        )

    def flush(self):
        self._f.flush()

    def close(self):
        self._f.close()


def make_writer(log_dir: str):
    # OGC_WRITER=jsonl forces the parse-friendly JSONL writer (the
    # protocol runner reads per-epoch metric trajectories from it).
    if os.environ.get("OGC_WRITER", "") == "jsonl":
        return JsonlWriter(log_dir)
    try:
        from tensorboardX import SummaryWriter

        return SummaryWriter(log_dir)
    except Exception:
        return JsonlWriter(log_dir)
