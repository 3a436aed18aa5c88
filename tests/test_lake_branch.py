"""Lake branching: zero-copy clones, copy-on-write divergence, vacuum
pins, historical branch points, copy mode."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from rayflow.cdc import (CdcEngine, ChangeLogSpec, branch_lake,
                         generate_changelog, rebase_branch_to_copy,
                         remove_branch_pin)
from rayflow.cdc.oracle import lww_oracle, read_changelog_pandas

KEYS = ["conv_id", "turn_idx"]


def _final(engine: CdcEngine) -> pd.DataFrame:
    return engine.final_table().to_pandas().sort_values(
        KEYS, ignore_index=True)


def _mk_log(tmp_path, n_bands=4, seed=5, **kw):
    log = str(tmp_path / "log")
    info = generate_changelog(log, ChangeLogSpec(
        n_convs=50, turns_per_conv=5.0, update_ratio=3.0,
        delete_ratio=0.3, n_bands=n_bands, seed=seed, **kw))
    return log, info


def test_branch_reads_equal_source_then_diverge(ray_session, tmp_path):
    """A reference branch reads identically to its source, advances
    independently (copy-on-write), and leaves the source unchanged."""
    log, info = _mk_log(tmp_path)
    src_dir, br_dir = str(tmp_path / "src"), str(tmp_path / "br")
    src = CdcEngine(src_dir, num_partitions=4)
    src.replay(log, max_bands=2)            # half the log

    stats = branch_lake(src_dir, br_dir)
    assert stats["mode"] == "reference"
    br = CdcEngine(br_dir, num_partitions=4)
    pd.testing.assert_frame_equal(_final(br), _final(src))
    # zero-copy: the branch holds no parquet of its own yet
    assert not any(f.endswith(".parquet") for _, _, fs in
                   os.walk(br_dir) for f in fs)

    # branch advances through the rest of the log; source must not move
    before_src = _final(src)
    br.replay(log)
    want = lww_oracle(read_changelog_pandas(log)).sort_values(
        KEYS, ignore_index=True)
    got = _final(br)
    shared = [c for c in want.columns if c in got.columns]
    pd.testing.assert_frame_equal(got[shared], want[shared],
                                  check_dtype=False)
    pd.testing.assert_frame_equal(_final(CdcEngine(src_dir)), before_src)


def test_source_vacuum_honors_branch_pin(ray_session, tmp_path):
    """compact() + vacuum() on the source must not break a reference
    branch; releasing the pin lets vacuum reclaim the files."""
    log, _ = _mk_log(tmp_path)
    src_dir, br_dir = str(tmp_path / "src"), str(tmp_path / "br")
    src = CdcEngine(src_dir, num_partitions=4)
    src.replay(log, max_bands=2)
    branch_lake(src_dir, br_dir)
    br_read_before = _final(CdcEngine(br_dir))

    src = CdcEngine(src_dir)                 # reload (branch bumped version)
    src.replay(log)                          # supersede the branched files
    src.compact()
    removed_pinned = src.vacuum()
    # branch still reads its snapshot
    pd.testing.assert_frame_equal(_final(CdcEngine(br_dir)), br_read_before)

    assert remove_branch_pin(src_dir, br_dir) is True
    assert remove_branch_pin(src_dir, br_dir) is False
    removed_after = CdcEngine(src_dir).vacuum()
    assert removed_after > 0                 # the pinned files went now
    with pytest.raises(Exception):
        _final(CdcEngine(br_dir))            # branch is dangling, loudly
    del removed_pinned


def test_branch_copy_mode_survives_source_deletion(ray_session, tmp_path):
    import shutil

    log, _ = _mk_log(tmp_path, n_bands=2)
    src_dir, br_dir = str(tmp_path / "src"), str(tmp_path / "br")
    CdcEngine(src_dir, num_partitions=4).replay(log)
    want = _final(CdcEngine(src_dir))
    branch_lake(src_dir, br_dir, mode="copy")
    shutil.rmtree(src_dir)
    pd.testing.assert_frame_equal(_final(CdcEngine(br_dir)), want)


def test_branch_as_of_matches_snapshot(ray_session, tmp_path):
    """A historical branch equals the source's time-travel read at the
    same watermark."""
    log, _ = _mk_log(tmp_path)
    src_dir, br_dir = str(tmp_path / "src"), str(tmp_path / "br")
    src = CdcEngine(src_dir, num_partitions=4)
    src.replay(log, bands_per_commit=1)
    lsns = src.snapshot_lsns()
    assert len(lsns) >= 3
    cut = lsns[1]
    snap = src.snapshot_dataset(cut).to_pandas().sort_values(
        KEYS, ignore_index=True)
    branch_lake(src_dir, br_dir, as_of_lsn=cut)
    br = CdcEngine(br_dir)
    assert br.manifest.committed_lsn == cut
    got = _final(br)[snap.columns.tolist()]
    pd.testing.assert_frame_equal(got, snap, check_dtype=False)


def test_rebase_branch_to_copy_detaches(ray_session, tmp_path):
    import shutil

    log, _ = _mk_log(tmp_path, n_bands=2)
    src_dir, br_dir = str(tmp_path / "src"), str(tmp_path / "br")
    CdcEngine(src_dir, num_partitions=4).replay(log)
    want = _final(CdcEngine(src_dir))
    branch_lake(src_dir, br_dir)
    n = rebase_branch_to_copy(br_dir)
    assert n > 0
    remove_branch_pin(src_dir, br_dir)
    shutil.rmtree(src_dir)
    pd.testing.assert_frame_equal(_final(CdcEngine(br_dir)), want)


def test_branch_guards(ray_session, tmp_path):
    log, _ = _mk_log(tmp_path, n_bands=2)
    src_dir, br_dir = str(tmp_path / "src"), str(tmp_path / "br")
    with pytest.raises(ValueError, match="no committed state"):
        branch_lake(str(tmp_path / "empty"), br_dir)
    CdcEngine(src_dir, num_partitions=4).replay(log)
    branch_lake(src_dir, br_dir)
    with pytest.raises(FileExistsError):
        branch_lake(src_dir, br_dir)
    with pytest.raises(ValueError, match="mode"):
        branch_lake(src_dir, str(tmp_path / "x"), mode="hardlink")
