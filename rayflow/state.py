"""Named state resources — the manager-held cache plane.

The reference's components share named cache resources through a
manager (``⟨upstream: internal/manager/⟩``; caches ``memory``, ``lru``,
``ttlru`` in ``internal/impl/pure/cache_*.go``).  Ray-native equivalent:
a **named detached-less actor** holding the keyed state, reached from
any stage.  Three usage tiers, fastest first:

1. read-only lookup → don't use an actor at all; ``ray.put`` + per-
   process cache (:mod:`rayflow.ops.joins`);
2. keyed mutable state partitioned by the pipeline key → per-partition
   actor state (the CDC merge pool) — no cross-actor races by
   construction;
3. genuinely global mutable state (this module) — one actor per named
   cache; batch ops (``mget``/``mset``/``madd``) amortize the RPC.

``add`` is set-if-absent — the reference's idempotence guard.
"""

from __future__ import annotations

import time
from typing import Any


class _CacheImpl:
    """In-actor keyed store with optional TTL and LRU cap."""

    def __init__(self, max_items: int | None = None, ttl_s: float | None = None):
        self.data: dict[str, tuple[float, Any]] = {}
        self.max_items = max_items
        self.ttl_s = ttl_s
        self.clock = 0.0  # logical clock when ttl unused (determinism)

    def _now(self) -> float:
        return time.monotonic() if self.ttl_s is not None else (self.clock)

    def _evict(self):
        if self.ttl_s is not None:
            cutoff = time.monotonic() - self.ttl_s
            self.data = {k: v for k, v in self.data.items() if v[0] >= cutoff}
        if self.max_items is not None and len(self.data) > self.max_items:
            # drop oldest (insertion-ordered dict = cheap LRU-ish)
            drop = len(self.data) - self.max_items
            for k in list(self.data)[:drop]:
                del self.data[k]

    def mset(self, items: dict[str, Any]) -> int:
        for k, v in items.items():
            self.data[k] = (self._now(), v)
        self._evict()
        return len(items)

    def madd(self, items: dict[str, Any]) -> list[bool]:
        """Set-if-absent per key; returns which keys were NEW."""
        out = []
        for k, v in items.items():
            if k in self.data:
                out.append(False)
            else:
                self.data[k] = (self._now(), v)
                out.append(True)
        self._evict()
        return out

    def mget(self, keys: list[str]) -> list[Any]:
        self._evict()
        return [self.data.get(k, (None, None))[1] for k in keys]

    def mdelete(self, keys: list[str]) -> int:
        n = 0
        for k in keys:
            if self.data.pop(k, None) is not None:
                n += 1
        return n

    def size(self) -> int:
        self._evict()
        return len(self.data)


_LOCAL_REGISTRY: dict[str, Any] = {}


def get_cache(name: str, max_items: int | None = None, ttl_s: float | None = None):
    """Get or create the named cache actor (idempotent by name)."""
    import ray

    if name in _LOCAL_REGISTRY:
        return _LOCAL_REGISTRY[name]
    actor_cls = ray.remote(num_cpus=0)(_CacheImpl)
    try:
        handle = ray.get_actor(f"rayflow-cache-{name}")
    except ValueError:
        handle = actor_cls.options(
            name=f"rayflow-cache-{name}", get_if_exists=True
        ).remote(max_items=max_items, ttl_s=ttl_s)
    _LOCAL_REGISTRY[name] = handle
    return handle


def drop_cache(name: str) -> None:
    import ray

    handle = _LOCAL_REGISTRY.pop(name, None)
    if handle is None:
        try:
            handle = ray.get_actor(f"rayflow-cache-{name}")
        except ValueError:
            return
    ray.kill(handle)


class MetricsSink:
    """Per-stage counters (the ``metric`` processor / metrics resource).

    Stages report ``{metric_name: increment}`` dicts; the named actor
    accumulates.  Reads are eventually consistent (fine for counters)."""

    def __init__(self):
        self.counters: dict[str, float] = {}

    def incr(self, updates: dict[str, float]) -> None:
        for k, v in updates.items():
            self.counters[k] = self.counters.get(k, 0.0) + v

    def snapshot(self) -> dict[str, float]:
        return dict(self.counters)


def get_metrics(name: str = "default"):
    import ray

    key = f"rayflow-metrics-{name}"
    if key in _LOCAL_REGISTRY:
        return _LOCAL_REGISTRY[key]
    actor_cls = ray.remote(num_cpus=0)(MetricsSink)
    handle = actor_cls.options(name=key, get_if_exists=True).remote()
    _LOCAL_REGISTRY[key] = handle
    return handle


class RateLimiterImpl:
    """Reservation token bucket (the reference's ``rate_limit``
    resource, ``local`` impl: count per interval).

    ``acquire(n)`` never sleeps in the actor — it debits the bucket and
    returns the seconds the CALLER must wait before proceeding, so the
    actor round-trip stays microseconds and one limiter serves hundreds
    of concurrent tasks without becoming the bottleneck.  Debt-style
    accounting (tokens may go negative = reservations queued into the
    future) guarantees the long-run admitted rate never exceeds
    ``rate`` while ``burst`` bounds the instantaneous overshoot."""

    def __init__(self, rate: float, burst: float | None = None):
        self.rate = float(rate)
        self.burst = float(burst) if burst is not None else float(rate)
        self.tokens = self.burst
        self.last = time.monotonic()

    def acquire(self, n: float = 1.0) -> float:
        now = time.monotonic()
        self.tokens = min(self.burst, self.tokens + (now - self.last) * self.rate)
        self.last = now
        self.tokens -= float(n)
        return max(0.0, -self.tokens / self.rate)

    def snapshot(self) -> dict[str, float]:
        return {"rate": self.rate, "burst": self.burst, "tokens": self.tokens}


def get_rate_limiter(name: str, rate: float | None = None,
                     burst: float | None = None):
    """Get or create the named rate-limit actor (idempotent by name;
    first creator's parameters win, like the reference's resource
    config)."""
    import ray

    key = f"rayflow-ratelimit-{name}"
    if key in _LOCAL_REGISTRY:
        return _LOCAL_REGISTRY[key]
    if rate is None:
        handle = ray.get_actor(key)  # must already exist
    else:
        actor_cls = ray.remote(num_cpus=0)(RateLimiterImpl)
        handle = actor_cls.options(name=key, get_if_exists=True).remote(
            rate=rate, burst=burst)
    _LOCAL_REGISTRY[key] = handle
    return handle
