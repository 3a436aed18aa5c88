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


def prefer_push_shuffle() -> None:
    """Switch this session to the push-based sort shuffle before a
    shuffle-heavy op runs.  Measured on the bench queries: the default
    pull-based path serializes its map side (groupby_agg_q1 2.4s -> 1.4s
    at sf0.1); shuffle-op builders call this in their ``apply``."""
    try:
        from ray.data import DataContext
        from ray.data.context import ShuffleStrategy

        DataContext.get_current().shuffle_strategy = (
            ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        )
    except Exception:
        pass


# populate the registry
from rayflow.ops import advanced as _advanced  # noqa: E402,F401
from rayflow.ops import ann as _ann  # noqa: E402,F401
from rayflow.ops import awk as _awk  # noqa: E402,F401
from rayflow.ops import bpe as _bpe  # noqa: E402,F401
from rayflow.ops import dsir as _dsir  # noqa: E402,F401
from rayflow.ops import core as _core  # noqa: E402,F401
from rayflow.ops import curation as _curation  # noqa: E402,F401
from rayflow.ops import dedup as _dedup  # noqa: E402,F401
from rayflow.ops import http as _http  # noqa: E402,F401
from rayflow.ops import joins as _joins  # noqa: E402,F401
from rayflow.ops import multimodal as _multimodal  # noqa: E402,F401
from rayflow.ops import net as _net  # noqa: E402,F401
from rayflow.ops import serde as _serde  # noqa: E402,F401
from rayflow.ops import graph as _graph  # noqa: E402,F401
from rayflow.ops import sketch as _sketch  # noqa: E402,F401
from rayflow.ops import textops as _textops  # noqa: E402,F401
from rayflow.ops import windows as _windows  # noqa: E402,F401

# sources/sinks register on pipeline import; pull them in so the registry
# is complete regardless of import order (pipeline imports only the
# registry symbols from this module, which exist by this point)
from rayflow import pipeline as _pipeline  # noqa: E402,F401
