"""Checkpointing: params + batch_stats (+ optionally optimizer state).

Mirrors the reference policy (``completion/train_utils.py:29-34``): a
``network.pkl`` with key ``net_state_dict`` saved every
``epoch_interval_to_save`` epochs plus ``best_<metric>_network.pkl`` on val
improvement. Unlike the reference we can also save optimizer state for true
resume (the reference loses it — SURVEY.md §5).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_model(path: str, variables: Dict[str, Any],
               opt_state: Optional[Any] = None) -> None:
    payload = {"net_state_dict": _to_numpy(variables)}
    if opt_state is not None:
        payload["opt_state"] = _to_numpy(opt_state)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_model(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)
