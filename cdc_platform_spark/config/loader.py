"""YAML config loading: ${VAR} / ${VAR:-default} interpolation + deep-merge.

Mirrors the reference loader semantics (reference config/loader.py:21-49
env interpolation, config/defaults.py:25-39 deep-merge with built-in
defaults).
"""

from __future__ import annotations

import os
import re
from typing import Any

import yaml

from cdc_platform_spark.config.models import PipelineConfig, PlatformConfig

_ENV_RE = re.compile(r"\$\{(?P<name>[A-Za-z_][A-Za-z0-9_]*)(?::-(?P<default>[^}]*))?\}")

PIPELINE_DEFAULTS: dict[str, Any] = {
    "topic_prefix": "cdc",
}

PLATFORM_DEFAULTS: dict[str, Any] = {
    "checkpoint_root": "/tmp/cdc-platform-spark/checkpoints",
    "shuffle_partitions": 32,
}


def interpolate_env(value: Any) -> Any:
    """Recursively substitute ${VAR} / ${VAR:-default}; unset without default
    raises (same strictness as the reference loader)."""
    if isinstance(value, str):

        def repl(m: re.Match[str]) -> str:
            name, default = m.group("name"), m.group("default")
            if name in os.environ:
                return os.environ[name]
            if default is not None:
                return default
            raise KeyError(f"environment variable {name!r} is not set and has no default")

        return _ENV_RE.sub(repl, value)
    if isinstance(value, dict):
        return {k: interpolate_env(v) for k, v in value.items()}
    if isinstance(value, list):
        return [interpolate_env(v) for v in value]
    return value


def deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def _load_yaml(path: str) -> dict:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    if not isinstance(raw, dict):
        raise ValueError(f"{path}: top level must be a mapping")
    return interpolate_env(raw)


def load_pipeline_config(path: str) -> PipelineConfig:
    return PipelineConfig.model_validate(deep_merge(PIPELINE_DEFAULTS, _load_yaml(path)))


def load_platform_config(path: str | None = None) -> PlatformConfig:
    data = _load_yaml(path) if path else {}
    return PlatformConfig.model_validate(deep_merge(PLATFORM_DEFAULTS, data))
