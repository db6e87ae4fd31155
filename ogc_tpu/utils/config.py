"""YAML config loading with the reference's flat-merge-into-args behavior
(train_seg.py:250-258 and identically in all entry scripts)."""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict

import yaml


def _apply_compute_dtype(configs: Dict[str, Any]) -> None:
    """Activate the bf16 perf mode from YAML (`compute_dtype: bf16`) or the
    OGC_COMPUTE_DTYPE env var — one hook wires all entry scripts.

    bf16 halves the HBM traffic of the grouped MLP stacks and enables the
    raw-gather split Dense path (nn/flowstep3d.py); params, norm statistics,
    positions/flows, and neighbor-search distances all stay f32.  Default
    (unset) is full f32 — the reference-parity mode.
    """
    from ogc_tpu.nn.layers import set_compute_dtype

    dt = os.environ.get("OGC_COMPUTE_DTYPE") or configs.get("compute_dtype")
    if not dt:
        # Absent key = the documented f32 default.  Reset explicitly: a
        # previously-loaded bf16 config must not leak into the next config
        # load in the same process (and compute_dtype() is read inside
        # traced module bodies — the jit-cache-pinning footgun class).
        set_compute_dtype(None)
        return
    import jax.numpy as jnp

    dt = str(dt).lower()
    if dt in ("bf16", "bfloat16"):
        set_compute_dtype(jnp.bfloat16)
    elif dt in ("f32", "float32", "none"):
        set_compute_dtype(None)
    else:
        raise ValueError(f"compute_dtype must be bf16 or f32, got {dt!r}")


def load_config_into_args(args: argparse.Namespace) -> argparse.Namespace:
    """Merge the YAML at `args.config` into the namespace (flat)."""
    with open(args.config) as f:
        configs = yaml.load(f, Loader=yaml.FullLoader)
    for k, v in configs.items():
        args.__dict__[k] = v
    _apply_compute_dtype(configs)
    return args


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.load(f, Loader=yaml.FullLoader)
