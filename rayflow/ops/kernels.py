"""Shared vectorized Arrow kernels used by several ops."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def argextreme_reduce(
    tbl: pa.Table, keys: list[str], order_col: str, keep: str = "max"
) -> pa.Table:
    """Keep the row with the min/max ``order_col`` per key group.

    Pure vectorized Arrow (grouped extreme + hash-set membership filter).
    REQUIRES ``order_col`` values to be globally unique in ``tbl`` (LSNs,
    primary keys) — otherwise a row from another group sharing the winning
    value would survive.  This is the whole-row argmax trick the CDC merge
    uses (:func:`rayflow.cdc.merge.lww_reduce` is the ``max``/lsn case).
    """
    if tbl.num_rows == 0:
        return tbl
    agg = tbl.group_by(keys, use_threads=False).aggregate([(order_col, keep)])
    winners = agg.column(f"{order_col}_{keep}")
    if len(winners) == tbl.num_rows:
        return tbl
    mask = pc.is_in(tbl.column(order_col), value_set=winners.combine_chunks())
    return tbl.filter(mask)


def explode_list(tbl: pa.Table, list_col: str, out_col: str | None = None) -> pa.Table:
    """One output row per list element (``unarchive``/``flat_map``
    analogue).  Vectorized: list flatten + parent-index take."""
    out_col = out_col or list_col
    arr = tbl.column(list_col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = pc.list_flatten(arr)
    parents = pc.list_parent_indices(arr)
    rest = tbl.drop_columns([list_col]).take(parents)
    return rest.append_column(out_col, flat)


def collect_table(ds) -> pa.Table:
    """Materialize a SMALL Dataset to one Arrow table, surviving the
    empty case (``iter_batches`` yields nothing for an empty dataset,
    and ``pa.concat_tables`` of zero tables raises).  Falls back to the
    dataset's schema for a typed empty table, or a zero-column table
    when even the schema is unknown."""
    batches = list(ds.iter_batches(batch_size=1 << 20,
                                   batch_format="pyarrow"))
    if batches:
        return pa.concat_tables(batches)
    sch = ds.schema()
    if sch is None:
        return pa.table({})
    names = list(sch.names)
    types = list(sch.types)
    return pa.Table.from_arrays(
        [pa.array([], t) for t in types], names=names)


def sum_count_topk(partials, *, key_col: str, count_col: str, k: int):
    """Shared finish for count-based top-k ops (ngram_topk,
    heavy_hitters): sum partial counts per key, rank descending with
    the key as deterministic tiebreak, keep k."""
    from rayflow.ops import build_op

    combined = build_op({
        "op": "group_agg", "keys": [key_col],
        "aggs": [("sum", count_col, count_col)],
    })(partials)
    ranked = build_op({
        "op": "sort", "keys": [count_col, key_col],
        "descending": [True, False],
    })(combined)
    return ranked.limit(k)
