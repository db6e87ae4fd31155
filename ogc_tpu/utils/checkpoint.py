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
import threading
from typing import Any, Optional

import flax.serialization
import jax

# Single-slot async writer: at most one background save in flight; a new
# save (or a load) first joins the previous one, so files are never written
# concurrently and a crash loses at most the newest state (the previous
# .ckpt stays intact thanks to the tmp+rename atomic write).
_pending_save: Optional[threading.Thread] = None
_pending_error: Optional[BaseException] = None
_pending_lock = threading.Lock()


def wait_pending_saves() -> None:
    """Block until the last async save_checkpoint has hit disk.

    Re-raises any exception the background writer hit (e.g. ENOSPC) — a
    failed save must not be silent: training would otherwise continue and a
    later resume would load a stale checkpoint with no error signal."""
    global _pending_save, _pending_error
    with _pending_lock:
        t, _pending_save = _pending_save, None
    if t is not None:
        t.join()
    with _pending_lock:
        err, _pending_error = _pending_error, None
    if err is not None:
        raise RuntimeError("async checkpoint write failed") from err


def _resolve(path: str) -> str:
    if not os.path.exists(path) and os.path.exists(path + ".ckpt"):
        return path + ".ckpt"
    return path


def _write_atomic(path: str, data: bytes) -> None:
    # Per-process tmp name: on a shared filesystem, several hosts writing
    # the same path must not interleave bytes in one tmp file.
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    except BaseException:
        # Don't leave orphan tmp files behind on a failed write (ENOSPC...).
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def save_checkpoint(
    state: Any,
    is_best: bool,
    filename: str = "current",
    bestname: str = "best",
    async_save: bool = False,
) -> None:
    """Serialize `state` (any pytree) to <filename>.ckpt; copy to
    <bestname>.ckpt when `is_best`.

    With ``async_save`` the device->host fetch happens synchronously (so the
    caller may keep mutating its live state) but serialization + disk IO run
    on a background thread — training continues while the checkpoint is
    written (orbax-style async checkpointing for large-scale runs; the
    msgpack single-file format is kept for interop with the eval loaders).
    Failures surface on the next save/load via wait_pending_saves.

    Multi-host: parameters are replicated, so only process 0 writes (every
    host racing on one shared path would corrupt it); the call is a no-op
    on other processes.
    """
    if jax.process_index() != 0:
        return
    state = jax.device_get(state)

    def _do_save():
        path = filename + ".ckpt"
        _write_atomic(path, flax.serialization.to_bytes(state))
        if is_best:
            shutil.copyfile(path, bestname + ".ckpt")

    def _guarded_save():
        global _pending_error
        try:
            _do_save()
        except BaseException as e:  # surfaced by wait_pending_saves
            with _pending_lock:
                _pending_error = e

    if not async_save:
        wait_pending_saves()
        _do_save()
        return
    global _pending_save
    wait_pending_saves()
    t = threading.Thread(target=_guarded_save, name="ckpt-writer", daemon=False)
    with _pending_lock:
        _pending_save = t
    t.start()


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a pytree saved by save_checkpoint into `target`'s structure.

    Tolerates both bare-state checkpoints and full-train-state ones: if the
    stored dict carries a 'model_state' entry and `target` doesn't, only the
    model_state is restored."""
    wait_pending_saves()
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
    wait_pending_saves()
    raw = flax.serialization.msgpack_restore(
        open(_resolve(path), "rb").read()
    )
    return flax.serialization.from_state_dict(target, raw)
