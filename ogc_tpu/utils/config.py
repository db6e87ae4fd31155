"""YAML config loading with the reference's flat-merge-into-args behavior
(train_seg.py:250-258 and identically in all entry scripts)."""

from __future__ import annotations

import argparse
from typing import Any, Dict

import yaml


def load_config_into_args(args: argparse.Namespace) -> argparse.Namespace:
    """Merge the YAML at `args.config` into the namespace (flat)."""
    with open(args.config) as f:
        configs = yaml.load(f, Loader=yaml.FullLoader)
    for k, v in configs.items():
        args.__dict__[k] = v
    return args


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.load(f, Loader=yaml.FullLoader)
