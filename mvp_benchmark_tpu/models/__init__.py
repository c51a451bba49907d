"""Model registry — mirrors the reference's importlib lookup
(``completion/train.py:48-49``): every model module exposes ``Model``."""

from __future__ import annotations

import importlib

COMPLETION_MODELS = ("pcn", "ecg", "vrcnet")
REGISTRATION_MODELS = ("dcp", "deepgmr", "idam")


def get_model_module(name: str):
    if name not in COMPLETION_MODELS + REGISTRATION_MODELS:
        raise ValueError(f"unknown model {name!r}")
    return importlib.import_module(f"mvp_benchmark_tpu.models.{name}")


def get_model(name: str, args=None):
    """Instantiate a model's flax Module from a config."""
    module = get_model_module(name)
    return module.build(args)
