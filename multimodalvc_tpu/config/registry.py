"""Plugin registries for tasks, models, criterions, optimizers and schedulers.

Equivalent in role to the reference's fairseq registry/plugin system
(reference: fairseq/fairseq/registry.py, fairseq/fairseq/models/__init__.py)
but reduced to a small decorator API over dataclass configs.  A registered
entry pairs a class with its config dataclass so the CLI can build anything
from ``kind.name`` + YAML/CLI overrides.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple, Type

_REGISTRIES: Dict[str, Dict[str, Tuple[type, Optional[type]]]] = {}


def _registry(kind: str) -> Dict[str, Tuple[type, Optional[type]]]:
    return _REGISTRIES.setdefault(kind, {})


def register(kind: str, name: str, config: Optional[type] = None) -> Callable[[type], type]:
    """Decorator: register ``cls`` under ``kind``/``name`` with a config dataclass."""

    def wrapper(cls: type) -> type:
        reg = _registry(kind)
        if name in reg and reg[name][0] is not cls:
            raise ValueError(f"{kind} '{name}' already registered to {reg[name][0]}")
        if config is not None and not dataclasses.is_dataclass(config):
            raise TypeError(f"config for {kind} '{name}' must be a dataclass")
        reg[name] = (cls, config)
        cls.registry_name = name
        return cls

    return wrapper


def register_model(name: str, config: Optional[type] = None):
    return register("model", name, config)


def register_task(name: str, config: Optional[type] = None):
    return register("task", name, config)


def register_criterion(name: str, config: Optional[type] = None):
    return register("criterion", name, config)


def lookup(kind: str, name: str) -> Tuple[type, Optional[type]]:
    reg = _registry(kind)
    if name not in reg:
        avail = ", ".join(sorted(reg)) or "<none>"
        raise KeyError(f"unknown {kind} '{name}' (available: {avail})")
    return reg[name]


def get_class(kind: str, name: str) -> type:
    return lookup(kind, name)[0]


def get_config_class(kind: str, name: str) -> Optional[type]:
    return lookup(kind, name)[1]


def available(kind: str):
    return sorted(_registry(kind))


def build(kind: str, name: str, cfg: Any = None, **kwargs):
    """Instantiate a registered class, building its config from ``cfg`` if needed."""
    cls, cfg_cls = lookup(kind, name)
    if cfg_cls is not None and not isinstance(cfg, cfg_cls):
        from .structured import from_dict

        cfg = from_dict(cfg_cls, cfg or {})
    if hasattr(cls, "from_config"):
        return cls.from_config(cfg, **kwargs)
    return cls(cfg, **kwargs) if cfg is not None else cls(**kwargs)
