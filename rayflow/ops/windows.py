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
        from rayflow.ops.core import build_group_agg

        return build_group_agg(keys=[out] + keys, aggs=aggs)(ds)

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
                         out: str = "window_start",
                         mode: str = "auto", partial_limit: int = 2_000_000):
    """Sliding event-time windows.

    With aggregates and ``size % slide == 0`` (aligned windows), the
    default plan NEVER replicates rows: each block is pre-aggregated to
    (slide-bucket, keys) partials first, and only those tiny partial
    rows are replicated ``size/slide`` times before the final combine —
    peak block memory is flat in the size/slide ratio (a 24h window
    sliding by 1m replicates 1440x; partials make that ~buckets x keys
    rows instead of the corpus).  Falls back to row replication
    (``mode="explode"``, or automatically for non-decomposable aggs /
    unaligned windows / no aggs)."""
    keys = keys or []

    size_us, slide_us = int(size_s * 1e6), int(slide_s * 1e6)

    def apply_explode(ds):
        ds = ds.map_batches(
            lambda t: explode_sliding(t, ts_col, size_s, slide_s, out), **_PA_KW
        )
        if not aggs:
            return ds
        from rayflow.ops.core import build_group_agg

        return build_group_agg(keys=[out] + keys, aggs=aggs)(ds)

    from rayflow.ops.core import _DECOMPOSABLE

    aligned = slide_us > 0 and size_us % slide_us == 0
    decomposable = bool(aggs) and all(f in _DECOMPOSABLE for f, _, _ in aggs)
    if mode == "explode" or not (aligned and decomposable):
        return apply_explode

    from rayflow.ops.core import agg_need, partial_table, reduce_partials

    need, need_count_all = agg_need(aggs)
    ratio = size_us // slide_us
    bucket = "__slide_bucket"

    def partial_per_bucket(t: pa.Table) -> pa.Table:
        us = _epoch_us(t.column(ts_col))
        b = pc.multiply(
            pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()), slide_us)),
                    pa.int64()), slide_us)
        t = t.append_column(bucket, b)
        return partial_table(t, [bucket] + keys, need, need_count_all)

    def explode_partials(t: pa.Table) -> pa.Table:
        # a window [w, w+size) with w aligned to slide contains the
        # whole bucket [b, b+slide) iff w in {b - j*slide : 0 <= j < ratio}
        n = t.num_rows
        parents = np.repeat(np.arange(n, dtype=np.int64), ratio)
        offs = np.tile(np.arange(ratio, dtype=np.int64), n)
        b = t.column(bucket).to_numpy(zero_copy_only=False)
        starts = b[parents] - offs * slide_us
        rep = t.take(pa.array(parents)).drop_columns([bucket])
        return rep.append_column(out, pa.array(starts, pa.int64()))

    def apply(ds):
        parts = (ds.map_batches(partial_per_bucket, **_PA_KW)
                   .map_batches(explode_partials, **_PA_KW))
        final = reduce_partials(parts, [out] + keys, aggs, need,
                                need_count_all, partial_limit)

        def ts_out(t: pa.Table) -> pa.Table:
            return t.set_column(
                t.schema.get_field_index(out), out,
                pc.cast(t[out], pa.timestamp("us")))

        return final.map_batches(ts_out, **_PA_KW)

    return apply


@register_op("late_filter")
def build_late_filter(*, ts_col: str, keys: list[str] | None = None,
                      allowed_lateness_s: float = 0.0):
    """Allowed-lateness rule on bounded replay (``system_window``'s
    ``allowed_lateness``): drop rows older than the per-key max event
    time minus the lateness budget.  Two passes: a tiny max aggregate
    (broadcast to every task), then a vectorized filter — the watermark
    is global per key, matching the reference's behaviour at
    end-of-stream."""
    keys = keys or []

    def apply(ds):
        import ray

        if keys:
            from ray.data.aggregate import Max

            # per-key watermark: tiny aggregate, broadcast as an Arrow
            # table; the filter is a vectorized index_in + take + one
            # comparison — no per-row Python
            maxes = ds.groupby(keys).aggregate(Max(ts_col, alias_name="__maxts"))
            wm_tbl = pa.concat_tables(
                maxes.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
            )
            wm_ref = ray.put(wm_tbl)
            late_us = int(allowed_lateness_s * 1e6)

            def fn(t: pa.Table) -> pa.Table:
                from rayflow.ops.joins import _fetch

                def derive(tbl):
                    cut = pc.subtract(
                        pc.cast(pc.cast(tbl["__maxts"], pa.timestamp("us")),
                                pa.int64()),
                        late_us,
                    )
                    if len(keys) == 1:
                        return (tbl.column(keys[0]).combine_chunks(), cut)
                    # composite key → single dictionary-joined string key
                    combo = pc.binary_join_element_wise(
                        *[pc.cast(tbl[k], pa.string()) for k in keys], "\x1f"
                    )
                    return (combo.combine_chunks(), cut)

                wm_keys, cutoffs = _fetch(wm_ref, derive)
                if len(keys) == 1:
                    bk = t.column(keys[0])
                else:
                    bk = pc.binary_join_element_wise(
                        *[pc.cast(t[k], pa.string()) for k in keys], "\x1f"
                    )
                idx = pc.index_in(bk, value_set=wm_keys)
                cut = pc.take(cutoffs, idx)
                ts_us = pc.cast(pc.cast(t.column(ts_col), pa.timestamp("us")),
                                pa.int64())
                mask = pc.greater_equal(ts_us, cut)
                return t.filter(mask)

            return ds.map_batches(fn, **_PA_KW)

        # global watermark
        global_max = ds.max(ts_col)
        cutoff = np.datetime64(global_max, "us") - np.timedelta64(
            int(allowed_lateness_s * 1e6), "us"
        )

        def gfn(t: pa.Table) -> pa.Table:
            mask = pc.greater_equal(
                pc.cast(t.column(ts_col), pa.timestamp("us")),
                pa.scalar(cutoff.astype("datetime64[us]").item(), pa.timestamp("us")),
            )
            return t.filter(mask)

        return ds.map_batches(gfn, **_PA_KW)

    return apply


@register_op("window_session")
def build_window_session(*, keys: list[str], ts_col: str, gap_s: float,
                         aggs: list[tuple[str, str | None, str]] | None = None,
                         out: str = "session_start"):
    """Gap-based session windows: per key, sort by event time and start a
    new session whenever the gap to the previous event exceeds ``gap_s``.
    ``groupby(keys).map_groups`` — each key's events must fit one worker
    (the session-window partitioning assumption; salt long-lived keys by
    coarse time range if not)."""

    def apply(ds):
        import pandas as pd

        def sessionize(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(ts_col).reset_index(drop=True)
            ts = pd.to_datetime(g[ts_col])
            gaps = ts.diff().dt.total_seconds()
            # first row: diff is NaN, and NaN > gap_s coerces to False —
            # test isna() explicitly or the first session start is lost
            new = gaps.isna() | (gaps > gap_s)
            g[out] = ts.where(new).ffill()
            return g

        sessioned = ds.groupby(keys).map_groups(sessionize, batch_format="pandas")
        if not aggs:
            return sessioned
        from rayflow.ops.core import build_group_agg

        return build_group_agg(keys=keys + [out], aggs=aggs)(sessioned)

    return apply
