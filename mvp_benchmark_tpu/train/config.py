"""YAML config system — attribute-access dict compatible with the reference's
munch-based configs (``completion/train.py:196-200``): the YAML *is* the flag
system; keys double as hyperparameters and runtime switches. The shipped
``cfgs/*.yaml`` files use the same keys as the reference so configs port 1:1.
"""

from __future__ import annotations

from typing import Any, Mapping

import yaml


class Config(dict):
    """dict with attribute access (drop-in for munch.munchify output).

    Missing keys read as None via attribute access — several reference configs
    omit optional keys and the reference code relies on falsy lookups.
    """

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            return None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @classmethod
    def from_mapping(cls, m: Mapping[str, Any]) -> "Config":
        out = cls()
        for k, v in m.items():
            out[k] = cls.from_mapping(v) if isinstance(v, Mapping) else v
        return out


def load_config(path: str, **overrides: Any) -> Config:
    with open(path) as f:
        raw = yaml.safe_load(f)
    cfg = Config.from_mapping(raw or {})
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


def parse_int_list(value, sep=",") -> list:
    """Parse reference-style comma-separated config strings ('1, 1, 1, 1')."""
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return [int(v) for v in value]
    if isinstance(value, int):
        return [value]
    return [int(v.strip()) for v in str(value).split(sep) if str(v).strip()]


def parse_float_list(value, sep=",") -> list:
    if value is None:
        return []
    if isinstance(value, (list, tuple)):
        return [float(v) for v in value]
    if isinstance(value, (int, float)):
        return [float(value)]
    return [float(v.strip()) for v in str(value).split(sep) if str(v).strip()]
