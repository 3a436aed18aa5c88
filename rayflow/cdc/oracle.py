"""Reference-semantics oracle for CDC replay (tests only).

The golden rule (FIXTURES.md §2): for each ``(conv_id, turn_idx)`` take
the row with max ``lsn``; drop it if that row's ``op = 'delete'``; sort
by ``(conv_id, turn_idx)``.  Computed with pandas on the driver — this is
the *specification*, deliberately simple and non-distributed, against
which the engine's distributed result is compared.
"""

from __future__ import annotations

import glob

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def read_changelog_pandas(log_dir: str, max_lsn: int | None = None) -> pd.DataFrame:
    files = sorted(glob.glob(f"{log_dir}/band-*/part-*.parquet"))
    tables = [pq.read_table(f) for f in files]
    schema = pa.unify_schemas([t.schema for t in tables], promote_options="permissive")
    df = pa.concat_tables(
        [t.cast(pa.schema([(f.name, f.type) for f in schema
                           if f.name in t.column_names])) for t in tables],
        promote_options="permissive",
    ).to_pandas()
    if max_lsn is not None:
        df = df[df["lsn"] <= max_lsn]
    return df


def audit_lake(log_dir: str, lake_dir: str) -> dict:
    """DuckDB LWW audit of a lake's final state against the raw change
    log (the ``verify-lake`` CLI body, factored out so tests can drive
    it inside an existing Ray session).  ``union_by_name`` unifies
    mixed-schema bands (v1 files lack evolved columns and may carry
    narrower types — exactly what ``evolve_at_lsn`` produces)."""
    import os

    import duckdb
    import pyarrow.compute as pc

    from rayflow.cdc.replay import CdcEngine

    engine = CdcEngine(lake_dir)
    ds = engine.final_dataset(include_meta=True)
    n_rows, lsn_sum = 0, 0
    for b in ds.iter_batches(batch_size=262144, batch_format="pyarrow"):
        n_rows += b.num_rows
        lsn_sum += pc.sum(b["_lsn"]).as_py() or 0
    files = sorted(glob.glob(os.path.join(log_dir, "band-*", "part-*.parquet")))
    watermark = engine.manifest.committed_lsn
    con = duckdb.connect()
    n_ora, lsn_ora = con.sql(f"""
        WITH ranked AS (
          SELECT lsn, op, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY lsn DESC) rn
          FROM read_parquet({files!r}, union_by_name=true)
          WHERE lsn <= {watermark}
        )
        SELECT count(*), CAST(sum(lsn) AS BIGINT)
        FROM ranked WHERE rn = 1 AND op <> 'delete'
    """).fetchall()[0]
    ok = (n_rows == n_ora) and (lsn_sum == (lsn_ora or 0))
    return {
        "lake_rows": n_rows, "oracle_rows": n_ora,
        "lake_lsn_sum": lsn_sum, "oracle_lsn_sum": lsn_ora,
        "watermark": watermark, "match": ok,
    }


def lww_oracle(changes: pd.DataFrame) -> pd.DataFrame:
    """Expected final lake table for a change-event DataFrame."""
    winners = (
        changes.sort_values("lsn")
        .groupby(["conv_id", "turn_idx"], as_index=False)
        .tail(1)
    )
    final = winners[winners["op"] != "delete"].drop(columns=["op", "src_ts"])
    final = final.rename(columns={"lsn": "_lsn"})
    payload = [c for c in final.columns if c != "_lsn"]
    return (
        final[payload + ["_lsn"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
