"""Last-writer-wins merge: the stateful heart of the CDC engine.

Semantics rebuilt from the reference's delivery/ordering model (``⟨upstream:
internal/checkpoint/capped.go⟩`` tolerates out-of-order acks; ``⟨upstream:
internal/impl/pure/processor_dedupe.go⟩`` keyed seen-state): correctness
never depends on arrival order — only on LSN comparison.  For each merge
key ``(conv_id, turn_idx)`` the row with the maximum ``lsn`` wins
(``src_ts`` is the documented tiebreak; LSNs are unique by construction);
a winning ``delete`` removes the key.

Execution shape (all Ray-Data-native):

1. **Partial reduce** inside ``map_batches`` *before* the shuffle
   (:func:`lww_reduce` per block) — collapses repeated updates to the
   same key so hot conversations don't inflate the exchange (the
   combiner trick; this is the main skew defuser alongside salting).
2. ``groupby(_part_id).map_groups(MergeWorker, concurrency=N)`` — an
   actor pool; each group is one lake partition's delta for the current
   band.  The worker hydrates the partition's base state (hash-indexed
   latest-version rows in the lake Parquet file — the durable form of the
   per-partition latest-version map), applies the LWW reduce over
   ``base ∪ delta`` with Arrow-schema unification (column add / int
   widen), and writes the new partition state file idempotently.

Partition state files are pure functions of ``(part_id, band_hi)`` so a
retried task overwrites the same path with identical content; commit is
the driver's atomic manifest publish (:mod:`rayflow.cdc.sink`).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rayflow.cdc.partitioner import PART_COL, compute_part_ids
from rayflow.schema import KEY_COLUMNS, META_LSN, conform, unify

#: op value given to hydrated base rows — never equal to 'delete', so a
#: base row that wins (no newer change for its key) survives the merge.
_BASE_OP = "base"


def lww_reduce(tbl: pa.Table, key_cols: list[str] = KEY_COLUMNS,
               lsn_col: str = "lsn") -> pa.Table:
    """Keep only the max-``lsn`` row per key.  Pure vectorized Arrow:
    grouped max over unique LSNs, then a hash-set membership filter —
    no Python loop over rows."""
    if tbl.num_rows == 0:
        return tbl
    winners = tbl.group_by(key_cols, use_threads=False).aggregate([(lsn_col, "max")])
    win_lsns = winners.column(f"{lsn_col}_max")
    if len(win_lsns) == tbl.num_rows:  # all keys already unique
        return tbl
    mask = pc.is_in(tbl.column(lsn_col), value_set=win_lsns.combine_chunks())
    return tbl.filter(mask)


class NormalizeChanges:
    """Stateless pre-shuffle stage (``map_batches`` over zero-copy Arrow).

    Casts every batch to the band's unified change schema (schema
    evolution happens here for the in-flight stream), validates the
    envelope (known op, non-null keys/lsn — invalid rows are dropped and
    counted in ``_invalid`` metadata, the dead-letter hook), runs the
    per-block partial LWW reduce, and attaches the salted partition id.
    """

    def __init__(self, schema: pa.Schema, num_partitions: int,
                 salts: dict[str, int] | None = None):
        self.schema = schema
        self.num_partitions = num_partitions
        self.salts = salts or {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        tbl = conform(batch, self.schema)
        valid = pc.and_(
            pc.is_in(tbl["op"], value_set=pa.array(["insert", "update", "delete"])),
            pc.and_(
                pc.is_valid(tbl["lsn"]),
                pc.and_(*[pc.is_valid(tbl[k]) for k in KEY_COLUMNS]),
            ),
        )
        if not pc.all(valid).as_py():
            tbl = tbl.filter(valid)
        tbl = lww_reduce(tbl)
        part = compute_part_ids(
            tbl["conv_id"], tbl["turn_idx"], self.num_partitions, self.salts
        )
        return tbl.append_column(PART_COL, pa.array(part, type=pa.int32()))


def lake_schema_for(change_schema: pa.Schema) -> pa.Schema:
    """Lake partition-file schema for a change schema: payload columns
    plus the ``_lsn`` metadata column (enables LWW on later bands)."""
    fields = [f for f in change_schema if f.name not in ("lsn", "op", "src_ts", PART_COL)]
    return pa.schema(fields + [pa.field(META_LSN, pa.int64())])


def drop_duplicate_lsns(tbl: pa.Table, lsn_col: str = "lsn") -> pa.Table:
    """Remove exact event replays (same globally-unique lsn appearing
    twice — possible when a retried routing task re-applies a batch to a
    streaming merge actor).  Vectorized: sort by lsn, keep first of each
    run."""
    lsns = tbl.column(lsn_col)
    if pc.count_distinct(lsns).as_py() == tbl.num_rows:
        return tbl
    order = pc.sort_indices(tbl, sort_keys=[(lsn_col, "ascending")])
    tbl = tbl.take(order)
    arr = tbl.column(lsn_col).to_numpy()
    keep = np.ones(len(arr), dtype=bool)
    keep[1:] = arr[1:] != arr[:-1]
    return tbl.filter(pa.array(keep))


def merge_partition_delta(
    delta: pa.Table,
    base: pa.Table | None,
    *,
    lake_dir: str,
    part_id: int,
    band_hi: int,
) -> dict:
    """LWW-merge one partition's delta with its base state and write the
    new state file idempotently.  Shared by the shuffle-mode MergeWorker
    and the streaming MergeActor pool."""
    delta = drop_duplicate_lsns(delta)
    if base is not None and base.num_rows > 0:
        # dress base rows as pseudo-changes: lsn = stored _lsn, op = 'base'
        base = base.rename_columns(
            ["lsn" if c == META_LSN else c for c in base.column_names]
        )
        base = base.append_column(
            "op", pa.array(np.full(base.num_rows, _BASE_OP), type=pa.string())
        )
        uni = unify(delta.schema, base.schema)
        combined = pa.concat_tables([conform(delta, uni), conform(base, uni)])
    else:
        combined = delta

    winners = lww_reduce(combined)
    survivors = winners.filter(pc.not_equal(winners["op"], "delete"))
    out_fields = [
        f for f in combined.schema if f.name not in ("lsn", "op", "src_ts")
    ]
    out_schema = pa.schema(out_fields + [pa.field(META_LSN, pa.int64())])
    out = conform(
        survivors.rename_columns(
            [META_LSN if c == "lsn" else c for c in survivors.column_names]
        ),
        out_schema,
    )

    part_dir = os.path.join(lake_dir, f"part-{part_id:05d}")
    os.makedirs(part_dir, exist_ok=True)
    final = os.path.join(part_dir, f"state-{band_hi:012d}.parquet")
    tmp = final + f".tmp.{os.getpid()}"
    pq.write_table(out, tmp)
    os.replace(tmp, final)  # atomic; retries converge on identical bytes
    return {
        "part_id": part_id,
        "file": final,
        "rows": out.num_rows,
        "n_events": delta.num_rows,
        "lsn_hi": band_hi,
    }


def hydrate_base(base_files: dict[int, str], part_id: int) -> pa.Table | None:
    path = base_files.get(part_id)
    if path is None or not os.path.exists(path):
        return None
    return pq.read_table(path)


class MergeWorker:
    """Shuffle-mode group merge: one call = one lake partition's delta
    (fed by ``groupby(_part_id).map_groups``, an actor pool).

    Stateful per the reference's cache/dedupe resources (SURVEY.md §2.6):
    constructed once per actor; per-call state (the partition's latest-
    version rows) is hydrated from the lake — durable Parquet is the
    source of truth, actor memory only a working set, so failed/retried
    tasks are always safe (SURVEY.md §7.4 read-back hydration rule).
    """

    def __init__(self, lake_dir: str, base_files: dict[int, str],
                 change_schema: pa.Schema, band_hi: int):
        self.lake_dir = lake_dir
        self.base_files = base_files
        self.change_schema = change_schema
        self.lake_schema = lake_schema_for(change_schema)
        self.band_hi = band_hi

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _stats_table([])
        part_id = int(group[PART_COL][0].as_py())
        delta = group.drop_columns([PART_COL])
        stats = merge_partition_delta(
            delta,
            hydrate_base(self.base_files, part_id),
            lake_dir=self.lake_dir,
            part_id=part_id,
            band_hi=self.band_hi,
        )
        return _stats_table([stats])


_STATS_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("n_events", pa.int64()),
        ("lsn_hi", pa.int64()),
    ]
)


def _stats_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return _STATS_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=_STATS_SCHEMA)
