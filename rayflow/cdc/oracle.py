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
