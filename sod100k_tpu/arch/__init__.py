"""Architecture registry.

The reference resolves MODEL.ARCH dynamically
(importlib.import_module("model." + cfg.MODEL.ARCH), train.py:70); here the
same string selects an entry exposing the functional model surface. Custom
architectures register with :func:`register_arch`.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

from .layer_config import LayerConfig, init_layers


@dataclasses.dataclass(frozen=True)
class ArchEntry:
    init: Callable        # (key, lc, ...) -> params
    apply: Callable       # (params, x, lc, ctx) -> logits
    name: str


_REGISTRY: dict[str, ArchEntry] = {}


def register_arch(name: str, init: Callable, apply: Callable) -> None:
    _REGISTRY[name] = ArchEntry(init=init, apply=apply, name=name)


def get_arch(name: str) -> ArchEntry:
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown MODEL.ARCH {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def _register_builtin() -> None:
    from .csnet import csnet_apply, csnet_init

    register_arch("csnet", csnet_init, csnet_apply)


_register_builtin()

__all__ = ["ArchEntry", "LayerConfig", "get_arch", "init_layers",
           "register_arch"]
