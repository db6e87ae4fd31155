"""Checkpointing: full training state (model + optimizer + progress),
msgpack-serialized, with the reference's current/best convention
(utils/pytorch_util.py:84-99).

Unlike the reference (which stores {'model_state': state_dict} only and can
never resume mid-training, SURVEY §5), trainers here save
{'model_state', 'opt_state', 'epoch', ...} so training truly resumes;
evaluation entry points restore just the model_state.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import flax.serialization
import jax


def _resolve(path: str) -> str:
    if not os.path.exists(path) and os.path.exists(path + ".ckpt"):
        return path + ".ckpt"
    return path


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

    Tolerates both bare-state checkpoints and full-train-state ones: if the
    stored dict carries a 'model_state' entry and `target` doesn't, only the
    model_state is restored."""
    raw = flax.serialization.msgpack_restore(
        open(_resolve(path), "rb").read()
    )
    if (
        isinstance(raw, dict)
        and "model_state" in raw
        and not (isinstance(target, dict) and "model_state" in target)
    ):
        raw = raw["model_state"]
    return flax.serialization.from_state_dict(target, raw)


def load_train_state(path: str, target: dict) -> dict:
    """Restore a full {'model_state', 'opt_state', 'epoch', ...} dict."""
    raw = flax.serialization.msgpack_restore(
        open(_resolve(path), "rb").read()
    )
    return flax.serialization.from_state_dict(target, raw)
