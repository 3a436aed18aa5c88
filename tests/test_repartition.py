"""Partition evolution (`CdcEngine.repartition`) golden tests.

The placement law says key→partition must be stable BETWEEN commits;
repartition() moves every key atomically in one commit, so the lake
must stay byte-equal to the LWW oracle across an evolution — including
when replay CONTINUES afterwards under the new law (the critical case:
new deltas must merge against the re-bucketed base state, never the
old placement).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from rayflow.cdc import ChangeLogSpec, CdcEngine, generate_changelog
from rayflow.cdc.oracle import lww_oracle, read_changelog_pandas

SPEC = ChangeLogSpec(
    n_convs=70,
    turns_per_conv=5.0,
    update_ratio=0.6,
    delete_ratio=0.1,
    zipf_s=1.5,
    n_source_partitions=3,
    n_bands=4,
    seed=77,
)


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    log_dir = str(tmp_path_factory.mktemp("repart-log"))
    info = generate_changelog(log_dir, SPEC)
    return log_dir, info


def _result(engine: CdcEngine) -> pd.DataFrame:
    df = engine.final_table(include_meta=True).to_pandas()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn"]
    return df[cols].reset_index(drop=True)


def _oracle(log_dir: str, max_lsn: int | None = None) -> pd.DataFrame:
    return lww_oracle(read_changelog_pandas(log_dir, max_lsn))


def _assert_equal(eng: pd.DataFrame, ora: pd.DataFrame):
    assert len(eng) == len(ora)
    eng = eng.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ora = ora.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ora = ora[eng.columns]
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    assert (eng["text"].values == ora["text"].values).all()


def test_repartition_preserves_state(changelog, tmp_path):
    """Full replay at P=8 → repartition to P=3 → identical final table,
    manifest law flipped, every live file under the new pid namespace."""
    log_dir, _ = changelog
    e = CdcEngine(str(tmp_path / "lake"), num_partitions=8)
    e.replay(log_dir)
    before = _result(e)

    n = e.repartition(3)
    assert 1 <= n <= 3
    assert e.num_partitions == 3
    assert int(e.manifest.state["num_partitions"]) == 3
    # every live file is a repart file in a pid<3 directory
    for pid, path in e.manifest.partition_files().items():
        assert pid < 3
        assert "repart-" in os.path.basename(path)
    _assert_equal(_result(e), before)
    _assert_equal(_result(e), _oracle(log_dir))


def test_replay_continues_after_evolution(changelog, tmp_path):
    """THE placement-law case: replay 2 bands at P=8, evolve to P=5
    (resalted), replay the remaining bands under the new law — final
    state equals the full-log LWW oracle exactly."""
    log_dir, _ = changelog
    lake = str(tmp_path / "lake")
    e1 = CdcEngine(lake, num_partitions=8)
    e1.replay(log_dir, max_bands=2)
    e1.repartition(5)

    # fresh engine = fresh process; adopts P=5 from the manifest
    with pytest.warns(UserWarning, match="num_partitions"):
        e2 = CdcEngine(lake, num_partitions=8)
    assert e2.num_partitions == 5
    s = e2.replay(log_dir)
    assert s.bands_applied == SPEC.n_bands - 2
    _assert_equal(_result(e2), _oracle(log_dir))


def test_repartition_grow(changelog, tmp_path):
    """Growing the partition count (the 10^10-scale direction)."""
    log_dir, _ = changelog
    e = CdcEngine(str(tmp_path / "lake"), num_partitions=4)
    e.replay(log_dir, max_bands=3)
    e.repartition(16)
    assert e.num_partitions == 16
    e.replay(log_dir)
    _assert_equal(_result(e), _oracle(log_dir))


def test_snapshot_across_evolution(changelog, tmp_path):
    """Time travel: a pre-evolution watermark still reads the OLD files;
    a snapshot at the evolution watermark (after further commits) uses
    the repartition record as a full reset — no pid-collision dupes."""
    log_dir, _ = changelog
    lake = str(tmp_path / "lake")
    e = CdcEngine(lake, num_partitions=8)
    e.replay(log_dir, max_bands=2)
    pre_lsn = e.manifest.committed_lsn
    pre_rows = len(_oracle(log_dir, pre_lsn))
    e.repartition(3)
    e.replay(log_dir)  # further commits beyond the evolution

    snap = e.snapshot_dataset(pre_lsn, include_meta=True)
    df = snap.to_pandas()
    assert len(df) == pre_rows
    _assert_equal(
        df[["conv_id", "turn_idx", "role", "text", "tool", "ts", "_lsn"]]
        .reset_index(drop=True),
        _oracle(log_dir, pre_lsn))
    # final state is the full oracle (no dupes from mixed pid namespaces)
    _assert_equal(_result(e), _oracle(log_dir))


def test_vacuum_after_evolution(changelog, tmp_path):
    """vacuum() prunes the superseded pre-evolution files; the live
    table is untouched."""
    log_dir, _ = changelog
    e = CdcEngine(str(tmp_path / "lake"), num_partitions=8)
    e.replay(log_dir)
    e.repartition(3)
    removed = e.vacuum()
    assert removed > 0  # the old P=8 state files
    _assert_equal(_result(e), _oracle(log_dir))
    # point lookup works under the new law
    from rayflow.cdc.replay import read_conversation

    conv = _oracle(log_dir)["conv_id"].iloc[0]
    t = read_conversation(e, conv)
    want = _oracle(log_dir).query("conv_id == @conv")
    assert t.num_rows == len(want)


def test_repartition_empty_lake(tmp_path):
    e = CdcEngine(str(tmp_path / "lake"), num_partitions=8)
    assert e.repartition(4) == 0
    assert e.num_partitions == 4
