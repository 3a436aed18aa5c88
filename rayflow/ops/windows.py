"""Event-time windows — the ``system_window`` buffer analogue.

The reference's only streaming-window primitive is the ``system_window``
buffer (tumbling/sliding event-time windows with ``timestamp_mapping``
and ``allowed_lateness``, ``⟨upstream:
internal/impl/pure/buffer_system_window.go⟩``).  Ray Data has no
watermarks; for a *bounded* replay the exact equivalent is event-time
bucketing + a keyed aggregate (SURVEY.md §2.4):

- tumbling(size): ``bucket = floor(epoch / size)`` → groupby(bucket,…)
- sliding(size, slide): each row belongs to ``size/slide`` buckets →
  vectorized row replication (repeat + take), then the same groupby
- allowed_lateness on replay: rows with ``ts < max_seen_ts - lateness``
  per key are *late*; with bounded data this reduces to a filter against
  the per-key max timestamp (two-pass: tiny max-aggregate broadcast,
  then filter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayflow.ops import register_op
from rayflow.ops.core import _agg

_PA_KW = dict(batch_format="pyarrow", zero_copy_batch=True)


def _epoch_us(col) -> pc.Expression | pa.ChunkedArray:
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def add_tumbling_bucket(t: pa.Table, ts_col: str, size_s: float,
                        out: str = "window_start") -> pa.Table:
    """Append the window start (as timestamp[us]) for a tumbling window."""
    us = _epoch_us(t.column(ts_col))
    size_us = int(size_s * 1e6)
    start = pc.multiply(
        pc.cast(
            pc.floor(pc.divide(pc.cast(us, pa.float64()), size_us)), pa.int64()
        ),
        size_us,
    )
    return t.append_column(out, pc.cast(start, pa.timestamp("us")))


@register_op("window_tumbling")
def build_window_tumbling(*, ts_col: str, size_s: float,
                          keys: list[str] | None = None,
                          aggs: list[tuple[str, str | None, str]] | None = None,
                          out: str = "window_start"):
    keys = keys or []

    def apply(ds):
        ds = ds.map_batches(
            lambda t: add_tumbling_bucket(t, ts_col, size_s, out), **_PA_KW
        )
        if not aggs:
            return ds
        built = [_agg(f, c, alias) for f, c, alias in aggs]
        return ds.groupby([out] + keys).aggregate(*built)

    return apply


def explode_sliding(t: pa.Table, ts_col: str, size_s: float, slide_s: float,
                    out: str = "window_start") -> pa.Table:
    """Replicate each row into every sliding window containing it.

    Vectorized: per-row window count is constant (= size/slide for
    aligned windows); rows are repeated via a take on repeated parent
    indices.  A row with time t is in windows starting at
    ``slide*k ∈ (t - size, t]``."""
    us = _epoch_us(t.column(ts_col)).to_numpy()
    size_us, slide_us = int(size_s * 1e6), int(slide_s * 1e6)
    first = ((us - size_us) // slide_us + 1) * slide_us  # first window start > t-size
    last = (us // slide_us) * slide_us                   # last window start <= t
    counts = ((last - first) // slide_us + 1).astype(np.int64)
    parents = np.repeat(np.arange(len(us), dtype=np.int64), counts)
    # per-replica window index, fully vectorized (no per-row Python)
    ends = np.cumsum(counts)
    offsets = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
        ends - counts, counts
    )
    starts = first[parents] + offsets * slide_us
    rep = t.take(pa.array(parents))
    return rep.append_column(out, pa.array(starts).cast(pa.timestamp("us")))


@register_op("window_sliding")
def build_window_sliding(*, ts_col: str, size_s: float, slide_s: float,
                         keys: list[str] | None = None,
                         aggs: list[tuple[str, str | None, str]] | None = None,
                         out: str = "window_start"):
    keys = keys or []

    def apply(ds):
        ds = ds.map_batches(
            lambda t: explode_sliding(t, ts_col, size_s, slide_s, out), **_PA_KW
        )
        if not aggs:
            return ds
        built = [_agg(f, c, alias) for f, c, alias in aggs]
        return ds.groupby([out] + keys).aggregate(*built)

    return apply
