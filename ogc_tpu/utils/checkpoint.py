"""Checkpointing: full training state (params + optimizer + step), msgpack
serialized, with the reference's current/best convention
(utils/pytorch_util.py:84-99) — but unlike the reference, optimizer state is
saved so training truly resumes.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import flax.serialization
import jax


def save_checkpoint(
    state: Any,
    is_best: bool,
    filename: str = "current",
    bestname: str = "best",
) -> None:
    """Serialize `state` (any pytree) to <filename>.ckpt; copy to
    <bestname>.ckpt when `is_best`."""
    path = filename + ".ckpt"
    state = jax.device_get(state)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(state))
    if is_best:
        shutil.copyfile(path, bestname + ".ckpt")


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by save_checkpoint into `target`'s structure.
    Accepts either the bare path or one missing the .ckpt suffix."""
    if not os.path.exists(path) and os.path.exists(path + ".ckpt"):
        path = path + ".ckpt"
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())
