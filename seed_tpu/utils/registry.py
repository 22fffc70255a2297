"""Unified config/instantiation system.

The reference stack has three coexisting config systems (hydra ``_target_``
instantiation, HfArgumentParser dataclasses, and the LAVIS registry — see
SURVEY.md §5). This module replaces all three with one small mechanism:

- ``register(name)`` — decorator adding a class/function to a global registry.
- ``instantiate(cfg, **overrides)`` — builds an object from a dict with a
  ``_target_`` key. ``_target_`` may be a registry name or a dotted import
  path (``pkg.mod.Class``), matching the composability of the reference's
  hydra configs (e.g. configs/tokenizer/seed_llama_tokenizer_hf.yaml).
  ``_recursive_: false`` defers instantiation of nested dicts, mirroring
  hydra's semantics used by MultiModalLLM/configs/data/*.yaml.
"""
from __future__ import annotations

import importlib
import json
from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Any] = {}


def register(name: str) -> Callable:
    def deco(obj):
        if name in _REGISTRY and _REGISTRY[name] is not obj:
            raise KeyError(f"registry name {name!r} already taken")
        _REGISTRY[name] = obj
        return obj

    return deco


def lookup(name: str) -> Any:
    if name in _REGISTRY:
        return _REGISTRY[name]
    if "." in name:  # dotted import path
        mod, _, attr = name.rpartition(".")
        return getattr(importlib.import_module(mod), attr)
    raise KeyError(f"unknown registry name {name!r}")


def instantiate(cfg: Any, **overrides) -> Any:
    """Build the object described by ``cfg`` (hydra-style ``_target_`` dicts)."""
    if not isinstance(cfg, dict) or "_target_" not in cfg:
        return cfg
    cfg = dict(cfg)
    target = lookup(cfg.pop("_target_"))
    recursive = cfg.pop("_recursive_", True)
    kwargs = {}
    for k, v in cfg.items():
        if recursive and isinstance(v, dict) and "_target_" in v:
            kwargs[k] = instantiate(v)
        else:
            kwargs[k] = v
    kwargs.update(overrides)
    return target(**kwargs)


def load_config(path: str) -> dict:
    """Load a JSON or YAML config file into a plain dict."""
    text = open(path).read()
    if path.endswith(".json"):
        return json.loads(text)
    try:
        import yaml  # pyyaml ships with transformers' deps

        return yaml.safe_load(text)
    except ImportError:  # minimal fallback: JSON superset only
        return json.loads(text)
