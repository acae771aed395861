"""YAML config overlay system.

Compat contract with the reference (`utils/config.py:4-34`): a base YAML file
is recursively overlaid with a model-specific YAML (specific wins on leaf
conflicts, dicts merge key-by-key), and the fully-resolved config is persisted
as ``config.yaml`` inside each run directory.  The schema sections are
``meta`` / ``dataset`` / ``model`` / ``trainer`` / ``logging``
(see ``configs/*.yaml``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml


def merge_dicts(base: Dict[str, Any], specific: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge ``specific`` into ``base`` (mutates and returns base).

    Nested dicts merge key-by-key; any non-dict value in ``specific`` replaces
    the corresponding value in ``base``.  Matches reference
    `utils/config.py:20-27` semantics exactly (in-place, specific wins).
    """
    for key, value in specific.items():
        if key in base and isinstance(base[key], dict) and isinstance(value, dict):
            merge_dicts(base[key], value)
        else:
            base[key] = value
    return base


def load_config(base_path: str, specific_path: Optional[str] = None) -> Dict[str, Any]:
    """Load ``base_path`` and optionally overlay ``specific_path`` on top.

    An empty/non-dict specific file (e.g. ``configs/logistic_regression.yaml``,
    which is empty in the reference) leaves the base config untouched —
    reference `utils/config.py:11-15`.
    """
    with open(base_path) as f:
        config = yaml.safe_load(f)

    if specific_path:  # truthiness like the reference: '' is ignored, not opened
        with open(specific_path) as f:
            specific = yaml.safe_load(f)
        if isinstance(specific, dict) and specific:
            config = merge_dicts(config, specific)
    return config


def save_config(config: Dict[str, Any], log_dir: str) -> str:
    """Write the resolved config as ``{log_dir}/config.yaml`` (safe_dump).

    Reference `utils/config.py:30-34`.  Returns the written path.
    """
    os.makedirs(log_dir, exist_ok=True)
    config_path = os.path.join(log_dir, "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    return config_path
