"""Operator registry — the processor/component plane.

The reference registers every component in a bundle registry keyed by
name and instantiates it from config (``⟨upstream: internal/bundle/⟩``).
Here an *op* is a named builder ``build(**config) → (Dataset → Dataset)``;
:mod:`rayflow.pipeline` chains them from a declarative dict, and user
extensions register the same way (``⟨upstream: public/service/⟩``
analogue)::

    from rayflow.ops import register_op

    @register_op("my_step")
    def build_my_step(*, factor: float = 1.0):
        def apply(ds):
            return ds.map_batches(..., batch_format="pyarrow")
        return apply
"""

from __future__ import annotations

from typing import Callable

OPS: dict[str, Callable] = {}


def register_op(name: str):
    def deco(builder: Callable):
        OPS[name] = builder
        return builder

    return deco


def build_op(conf: dict):
    """``{"op": name, **kwargs}`` → a ``Dataset → Dataset`` callable."""
    conf = dict(conf)
    name = conf.pop("op")
    if name not in OPS:
        raise KeyError(f"unknown op {name!r}; known: {sorted(OPS)}")
    return OPS[name](**conf)


def ops() -> list[str]:
    return sorted(OPS)


# populate the registry
from rayflow.ops import advanced as _advanced  # noqa: E402,F401
from rayflow.ops import ann as _ann  # noqa: E402,F401
from rayflow.ops import core as _core  # noqa: E402,F401
from rayflow.ops import dedup as _dedup  # noqa: E402,F401
from rayflow.ops import joins as _joins  # noqa: E402,F401
from rayflow.ops import multimodal as _multimodal  # noqa: E402,F401
from rayflow.ops import textops as _textops  # noqa: E402,F401
from rayflow.ops import windows as _windows  # noqa: E402,F401
