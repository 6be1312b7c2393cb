"""Unified config system: dataclasses + YAML + dot-list overrides.

Replaces the reference's two regimes (bash-case argparse blobs,
`TPT/params.py:13-98`, and LAVIS OmegaConf trees,
`retrieval/lavis/common/config.py:16-167`) with one mechanism: a nested dict
loaded from YAML, overridden by ``key.sub=value`` CLI options, materialized
into typed dataclasses by the task entry points. Run hyperparameters are
always dumped next to the outputs (`TPT/params.py:101-107`).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional

import yaml


def load_config(path: Optional[str] = None, overrides: Optional[List[str]] = None) -> Dict[str, Any]:
    cfg: Dict[str, Any] = {}
    if path:
        with open(path) as fh:
            cfg = yaml.safe_load(fh) or {}
    for item in overrides or []:
        if "=" not in item:
            raise ValueError(f"override {item!r} must be key=value")
        key, value = item.split("=", 1)
        node = cfg
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = yaml.safe_load(value)
    return cfg


def materialize(dc_type, cfg: Dict[str, Any]):
    """Build a dataclass from a dict, ignoring unknown keys."""
    fields = {f.name for f in dataclasses.fields(dc_type)}
    return dc_type(**{k: v for k, v in cfg.items() if k in fields})


def save_hparams(output_dir: str, payload: Any, name: str = "hparams_train.json"):
    os.makedirs(output_dir, exist_ok=True)
    if dataclasses.is_dataclass(payload) and not isinstance(payload, type):
        payload = dataclasses.asdict(payload)
    with open(os.path.join(output_dir, name), "w") as fh:
        json.dump(payload, fh, indent=2, default=str)
