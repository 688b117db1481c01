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
    from .csf_res2net import csf_apply, csf_init
    from .csnet import csnet_apply, csnet_init

    register_arch("csnet", csnet_init, csnet_apply)
    # CSF models ignore the layer_config argument (fixed backbone widths)
    for backbone in ("res2net50", "res2net101"):
        register_arch(
            f"csf_{backbone}",
            lambda key, lc=None, _b=backbone: csf_init(key, backbone=_b),
            lambda params, x, lc=None, ctx=None, _b=backbone: csf_apply(
                params, x, backbone=_b, ctx=ctx),
        )


_register_builtin()

__all__ = ["ArchEntry", "LayerConfig", "get_arch", "init_layers",
           "register_arch"]
