"""Segmented scale-tier change-log generation (scale_tier_replay.py).

The scale-tier evidence run builds an S× change log as S independently
synthesized sf0.1-shaped segments with conv-id / LSN / version offsets.
These tests pin the two properties replay correctness rests on —
globally unique, band-ordered LSNs and disjoint per-segment key spaces —
and prove end-to-end that replaying the stitched log reproduces the
exact LWW ground truth an independent DuckDB oracle computes over the
raw events.
"""

from __future__ import annotations

import glob
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gen(tmp_path, scale: int, convs: int = 500):
    os.environ["RAYFLOW_SCALETIER_CONVS"] = str(convs)
    try:
        from scale_tier_replay import generate_scaled_log

        log_dir = str(tmp_path / f"log{scale}x")
        return log_dir, generate_scaled_log(log_dir, scale)
    finally:
        del os.environ["RAYFLOW_SCALETIER_CONVS"]


def test_segments_stitch_into_one_ordered_log(tmp_path):
    log_dir, info = _gen(tmp_path, scale=3)
    assert info["n_bands"] == 24
    # bands are LSN-disjoint and ordered; LSNs are globally unique
    prev_hi = -1
    seen = 0
    for band in sorted(glob.glob(os.path.join(log_dir, "band-*"))):
        los, his = [], []
        for f in glob.glob(os.path.join(band, "*.parquet")):
            t = pq.read_table(f, columns=["lsn"])
            los.append(t["lsn"][0].as_py())
            his.append(t["lsn"][-1].as_py())
            seen += t.num_rows
        assert min(los) > prev_hi
        prev_hi = max(his)
    assert seen == info["n_events"]
    assert prev_hi == info["max_lsn"]


def test_replayed_lake_matches_duckdb_lww_oracle(tmp_path):
    import duckdb

    from rayflow.cdc.replay import CdcEngine

    log_dir, info = _gen(tmp_path, scale=2)
    lake = str(tmp_path / "lake")
    engine = CdcEngine(lake, num_partitions=4, auto_salt=False)
    stats = engine.replay(log_dir, bands_per_commit=4)
    assert stats.n_events == info["n_events"]
    assert engine.manifest.committed_lsn == info["max_lsn"]

    con = duckdb.connect()
    exp_rows, exp_sum = con.execute(f"""
        WITH w AS (
          SELECT conv_id, turn_idx, arg_max(op, lsn) AS last_op,
                 max(lsn) AS lsn
          FROM read_parquet('{log_dir}/band-*/*.parquet')
          GROUP BY conv_id, turn_idx
        )
        SELECT count(*), sum(lsn) FROM w WHERE last_op <> 'delete'
    """).fetchone()
    got_rows, got_sum = con.execute(
        "SELECT count(*), sum(_lsn) FROM read_parquet(?)",
        [engine.manifest.live_files()],
    ).fetchone()
    con.close()
    assert (got_rows, int(got_sum)) == (exp_rows, int(exp_sum))


def _gen_evolved(tmp_path, scale: int, evolve_seg: int, convs: int = 500):
    os.environ["RAYFLOW_SCALETIER_CONVS"] = str(convs)
    try:
        from scale_tier_replay import generate_scaled_log

        log_dir = str(tmp_path / f"log{scale}x-ev{evolve_seg}")
        return log_dir, generate_scaled_log(log_dir, scale,
                                            evolve_seg=evolve_seg)
    finally:
        del os.environ["RAYFLOW_SCALETIER_CONVS"]


def test_evolved_scale_tier_oracle(tmp_path):
    """Schema evolution at the scale tier: segments >= evolve_seg carry
    the V2 column; after replay, exactly the keys whose WINNING event
    is at/past the switch LSN carry it in the lake (the harness's own
    duckdb_ground_truth enforces this via evolution_match)."""
    from scale_tier_replay import duckdb_ground_truth

    from rayflow.cdc.replay import CdcEngine

    log_dir, info = _gen_evolved(tmp_path, scale=3, evolve_seg=2)
    assert info["evolve_at_lsn"] is not None
    # pre-switch bands are V1, post-switch bands are V2
    first = sorted(glob.glob(os.path.join(log_dir, "band-00000",
                                          "*.parquet")))[0]
    last = sorted(glob.glob(os.path.join(log_dir, "band-*",
                                         "*.parquet")))[-1]
    assert "meta_model" not in pq.read_schema(first).names
    assert "meta_model" in pq.read_schema(last).names

    lake = str(tmp_path / "lake-ev")
    engine = CdcEngine(lake, num_partitions=4, auto_salt=False)
    engine.replay(log_dir, bands_per_commit=4)
    oracle = duckdb_ground_truth(log_dir, engine.manifest.live_files(),
                                 info["evolve_at_lsn"])
    assert oracle["match"] and oracle["evolution_match"]
    assert 0 < oracle["lake_v2_rows"] < oracle["lake_rows"]
