"""Distributed change-log writer (rayflow.cdc.changelog
.write_changelog_dataset): blocks land as band part files with no
driver-side concat, and a replay over the written log equals the LWW
oracle over the same rows."""

from __future__ import annotations

import glob

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayflow.cdc import CdcEngine
from rayflow.cdc.changelog import write_changelog_dataset
from rayflow.cdc.oracle import lww_oracle, read_changelog_pandas
from rayflow.cdc.source import list_bands
from rayflow.schema import CHANGE_SCHEMA


def _changes_table(n=500, seed=3) -> pa.Table:
    rng = np.random.default_rng(seed)
    lsn = np.arange(n, dtype=np.int64)
    conv = rng.integers(0, 40, n)
    turn = rng.integers(0, 6, n).astype(np.int32)
    op = np.where(rng.random(n) < 0.1, "delete",
                  np.where(rng.random(n) < 0.5, "update", "insert"))
    return pa.table({
        "lsn": lsn,
        "op": op,
        "src_ts": pa.array(1_700_000_000_000_000 + lsn,
                           type=pa.timestamp("us")),
        "conv_id": np.char.add("c", conv.astype(str)),
        "turn_idx": turn,
        "role": np.where(turn % 2 == 0, "user", "assistant"),
        "text": np.char.add("t", lsn.astype(str)),
        "tool": np.full(n, ""),
        "ts": pa.array(1_700_000_000_000_000 + lsn * 7,
                       type=pa.timestamp("us")),
    }).cast(CHANGE_SCHEMA)


@pytest.mark.parametrize("n_bands", [1, 3])
def test_write_changelog_dataset_replays_to_oracle(ray_session, tmp_path,
                                                   n_bands):
    import ray.data as rd

    tbl = _changes_table()
    ds = rd.from_arrow(tbl).repartition(5)
    log_dir = str(tmp_path / f"log{n_bands}")
    info = write_changelog_dataset(ds, log_dir, n_bands=n_bands)
    assert info["n_events"] == tbl.num_rows
    files = glob.glob(log_dir + "/band-*/part-*.parquet")
    assert len(files) == info["n_files"] >= n_bands

    bands = list_bands(log_dir, after_lsn=-1)
    assert len(bands) == n_bands
    # bands are disjoint, ordered LSN ranges
    for a, b in zip(bands, bands[1:]):
        assert a.lsn_hi < b.lsn_lo

    eng = CdcEngine(str(tmp_path / f"lake{n_bands}"), num_partitions=4)
    eng.replay(log_dir)
    got = eng.final_dataset().to_pandas() \
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    exp = lww_oracle(read_changelog_pandas(log_dir)) \
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(got.columns)],
        check_dtype=False)


def test_write_changelog_empty_blocks(ray_session, tmp_path):
    import ray.data as rd

    tbl = _changes_table(n=3)
    ds = rd.from_arrow(tbl).repartition(8)  # some blocks will be empty
    log_dir = str(tmp_path / "log")
    info = write_changelog_dataset(ds, log_dir)
    assert info["n_events"] == 3
    assert len(list_bands(log_dir, after_lsn=-1)) == 1


def test_compact_changelog_replay_equivalence(ray_session, tmp_path):
    """Fresh replay of (compacted prefix + tail) must equal fresh
    replay of the full log — deletes survive as tombstones, LSNs are
    preserved, schema evolution crosses the compaction point."""
    from rayflow.cdc.changelog import (ChangeLogSpec, compact_changelog,
                                       generate_changelog)
    from rayflow.cdc.oracle import lww_oracle, read_changelog_pandas
    from rayflow.cdc.replay import CdcEngine

    log = str(tmp_path / "log")
    spec = ChangeLogSpec(n_convs=60, turns_per_conv=6.0, update_ratio=4.0,
                         delete_ratio=0.4, n_bands=4, seed=11,
                         evolve_at_lsn=600)
    info = generate_changelog(log, spec)

    # watermark mid-log: band boundary independence is the point
    cut = info["n_events"] // 2
    out = str(tmp_path / "log_compacted")
    stats = compact_changelog(log, out, up_to_lsn=cut)
    assert stats["events_after"] < stats["events_before"]
    assert stats["tail_bands"] >= 1

    e_full = CdcEngine(str(tmp_path / "lake_full"), num_partitions=4)
    e_full.replay(log)
    e_comp = CdcEngine(str(tmp_path / "lake_comp"), num_partitions=4)
    e_comp.replay(out)

    cols = ["conv_id", "turn_idx"]
    a = e_full.final_table().to_pandas().sort_values(cols,
                                                     ignore_index=True)
    b = e_comp.final_table().to_pandas().sort_values(cols,
                                                     ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    # and both equal the single-process LWW oracle over the FULL log
    want = lww_oracle(read_changelog_pandas(log)).sort_values(
        cols, ignore_index=True)
    shared = [c for c in want.columns if c in a.columns]
    pd.testing.assert_frame_equal(a[shared], want[shared],
                                  check_dtype=False)


def test_compact_changelog_full_log_collapses_to_keys(ray_session,
                                                      tmp_path):
    """Compacting the WHOLE log (default watermark) leaves exactly one
    event per surviving key + one tombstone per deleted key."""
    from rayflow.cdc.changelog import (ChangeLogSpec, compact_changelog,
                                       generate_changelog)
    from rayflow.cdc.oracle import read_changelog_pandas

    log = str(tmp_path / "log")
    generate_changelog(log, ChangeLogSpec(
        n_convs=40, turns_per_conv=5.0, update_ratio=6.0,
        delete_ratio=0.3, n_bands=3, seed=3))
    out = str(tmp_path / "out")
    stats = compact_changelog(log, out)
    assert stats["tail_bands"] == 0
    full = read_changelog_pandas(log)
    n_keys = full.groupby(["conv_id", "turn_idx"]).ngroups
    assert stats["events_after"] == n_keys
    comp = read_changelog_pandas(out)
    # per key: exactly the max-lsn event, op preserved (tombstones too)
    last = full.sort_values("lsn").groupby(
        ["conv_id", "turn_idx"], as_index=False).last()
    got = comp.sort_values(["conv_id", "turn_idx"],
                           ignore_index=True)
    want = last.sort_values(["conv_id", "turn_idx"],
                            ignore_index=True)
    pd.testing.assert_frame_equal(got[["conv_id", "turn_idx", "lsn", "op"]],
                                  want[["conv_id", "turn_idx", "lsn", "op"]])
