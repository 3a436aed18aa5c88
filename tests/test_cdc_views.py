"""Incrementally-maintained windowed views over the CDC tail
(SURVEY.md §2.4 `system_window` composed with §2.6 state).

The invariant: after each band-group commit, ``TumblingWindowView``'s
delta/retraction fold must equal a from-scratch windowed aggregate over
the lake's live rows at the same watermark — through inserts, updates
(retract old / insert new) and deletes (retract only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rayflow.cdc import (CdcEngine, ChangeLogSpec, TumblingWindowView,
                         generate_changelog)

SPEC = ChangeLogSpec(
    n_convs=50,
    turns_per_conv=6.0,
    update_ratio=0.7,
    delete_ratio=0.15,
    zipf_s=1.4,
    n_source_partitions=3,
    n_bands=4,
    seed=7,
)

AGGS = [("count", None, "n"), ("sum", "turn_idx", "s"),
        ("mean", "turn_idx", "m"), ("std", "turn_idx", "sd")]
SIZE_S = 4.0


def _recompute(engine: CdcEngine) -> pd.DataFrame:
    """From-scratch reference: the same windowed aggregate over the
    lake's live rows (pandas, ddof=1 std like stddev_samp)."""
    df = engine.final_dataset().to_pandas()
    df = df[df["ts"].notna()].copy()
    us = df["ts"].astype("int64")
    size_us = int(SIZE_S * 1e6)
    df["window_start"] = (us // size_us) * size_us
    g = df.groupby(["window_start", "role"], dropna=False)["turn_idx"]
    out = g.agg(n="count", s="sum", m="mean", sd="std").reset_index()
    out["window_start"] = pd.to_datetime(
        out["window_start"], unit="us").astype("datetime64[us]")
    return out.sort_values(["window_start", "role"]).reset_index(drop=True)


def _assert_view_equal(view: TumblingWindowView, ref: pd.DataFrame):
    got = view.result().to_pandas().reset_index(drop=True)
    assert list(got.columns) == ["window_start", "role", "n", "s", "m", "sd"]
    assert len(got) == len(ref), (len(got), len(ref))
    pd.testing.assert_frame_equal(
        got[["window_start", "role"]], ref[["window_start", "role"]])
    np.testing.assert_array_equal(got["n"].to_numpy(), ref["n"].to_numpy())
    for c in ("s", "m", "sd"):
        a, b = got[c].to_numpy(float), ref[c].to_numpy(float)
        assert np.allclose(a, b, equal_nan=True, atol=1e-9), c


def test_view_tracks_band_commits(ray_session, tmp_path):
    log_dir, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    generate_changelog(log_dir, SPEC)
    eng = CdcEngine(lake, num_partitions=4)
    view = TumblingWindowView(eng, log_dir, ts_col="ts", size_s=SIZE_S,
                              keys=["role"], aggs=AGGS)
    applied = 0
    while True:
        stats = eng.replay(log_dir, max_bands=1)
        if stats.bands_applied == 0:
            break
        applied += stats.bands_applied
        view.refresh()
        assert view.applied_lsn == eng.manifest.committed_lsn
        _assert_view_equal(view, _recompute(eng))
    assert applied == SPEC.n_bands
    # idempotent: refreshing at the same watermark is a no-op
    state_before = view._state
    view.refresh()
    assert view._state is state_before


def test_view_single_shot_equals_incremental(ray_session, tmp_path):
    """One refresh over the whole log == band-by-band maintenance."""
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, SPEC)

    lake_a = str(tmp_path / "lake_a")
    eng_a = CdcEngine(lake_a, num_partitions=4)
    va = TumblingWindowView(eng_a, log_dir, ts_col="ts", size_s=SIZE_S,
                            keys=["role"], aggs=AGGS)
    while eng_a.replay(log_dir, max_bands=1).bands_applied:
        va.refresh()

    lake_b = str(tmp_path / "lake_b")
    eng_b = CdcEngine(lake_b, num_partitions=4)
    eng_b.replay(log_dir)
    vb = TumblingWindowView(eng_b, log_dir, ts_col="ts", size_s=SIZE_S,
                            keys=["role"], aggs=AGGS)
    vb.refresh()

    ta, tb = va.result().to_pandas(), vb.result().to_pandas()
    pd.testing.assert_frame_equal(
        ta[["window_start", "role", "n"]], tb[["window_start", "role", "n"]])
    for c in ("s", "m", "sd"):
        assert np.allclose(ta[c].to_numpy(float), tb[c].to_numpy(float),
                           equal_nan=True, atol=1e-9)


def test_view_rejects_non_retractable_and_bad_watermark(ray_session,
                                                        tmp_path):
    log_dir, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    generate_changelog(log_dir, ChangeLogSpec(n_convs=10, n_bands=2, seed=3))
    eng = CdcEngine(lake, num_partitions=2)
    with pytest.raises(ValueError, match="cannot be maintained"):
        TumblingWindowView(eng, log_dir, ts_col="ts", size_s=1.0,
                           aggs=[("max", "turn_idx", "x")])
    eng.replay(log_dir)
    view = TumblingWindowView(eng, log_dir, ts_col="ts", size_s=1.0,
                              aggs=[("count", None, "n")])
    with pytest.raises(ValueError, match="not a committed"):
        view.refresh(to_lsn=eng.manifest.committed_lsn + 17)
    view.refresh()
    assert view.result().num_rows > 0


def test_view_over_tail_daemon(ray_session, tmp_path):
    """The composition VERDICT asked for: a maintained windowed
    aggregate over bands applied by the tail daemon."""
    import threading
    import time

    log_dir, lake = str(tmp_path / "log"), str(tmp_path / "lake")
    spec = ChangeLogSpec(n_convs=30, turns_per_conv=5.0, update_ratio=0.5,
                         delete_ratio=0.1, n_source_partitions=2,
                         n_bands=3, seed=11)
    # band 0 exists before the daemon starts; the rest "arrive" later
    import glob
    import shutil

    staged = str(tmp_path / "staged")
    generate_changelog(staged, spec)
    bands = sorted(glob.glob(staged + "/band-*"))
    import os

    os.makedirs(log_dir)
    shutil.move(bands[0], log_dir)

    eng = CdcEngine(lake, num_partitions=2)
    view = TumblingWindowView(eng, log_dir, ts_col="ts", size_s=SIZE_S,
                              keys=["role"], aggs=AGGS)
    stop = threading.Event()

    def feed():
        for b in bands[1:]:
            time.sleep(0.4)
            shutil.move(b, log_dir)
        time.sleep(0.4)
        stop.set()

    t = threading.Thread(target=feed)
    t.start()
    seen = set()

    def on_round(stats):
        view.refresh()
        seen.add(eng.manifest.committed_lsn)
        _assert_view_equal(view, _recompute(eng))

    eng.tail(log_dir, poll_interval=0.15, idle_rounds=10,
             on_round=on_round)
    t.join()
    stop.wait(0)
    assert len(seen) >= 2  # maintained through multiple arrivals


def test_view_durable_resume(ray_session, tmp_path):
    """A view with state_dir checkpoints every refresh; a FRESH view
    object over the same state_dir resumes at applied_lsn and folds
    only the remaining bands — final result equals a from-scratch
    recompute AND a never-persisted single-shot view."""
    log = str(tmp_path / "log")
    generate_changelog(log, SPEC)
    eng = CdcEngine(str(tmp_path / "lake"), num_partitions=4)
    sdir = str(tmp_path / "view_state")

    eng.replay(log, max_bands=2)
    v1 = TumblingWindowView(eng, log, ts_col="ts", size_s=SIZE_S,
                            keys=["role"], aggs=AGGS, state_dir=sdir)
    v1.refresh()
    mid_lsn = v1.applied_lsn
    del v1                                     # process restart stand-in

    eng.replay(log)
    v2 = TumblingWindowView(eng, log, ts_col="ts", size_s=SIZE_S,
                            keys=["role"], aggs=AGGS, state_dir=sdir)
    assert v2.applied_lsn == mid_lsn           # resumed, not from scratch
    v2.refresh()
    _assert_view_equal(v2, _recompute(eng))


def test_view_state_dir_definition_mismatch(ray_session, tmp_path):
    log = str(tmp_path / "log")
    generate_changelog(log, SPEC)
    eng = CdcEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(log)
    sdir = str(tmp_path / "view_state")
    TumblingWindowView(eng, log, ts_col="ts", size_s=SIZE_S, keys=["role"],
                       aggs=AGGS, state_dir=sdir).refresh()
    with pytest.raises(ValueError, match="different definition"):
        TumblingWindowView(eng, log, ts_col="ts", size_s=SIZE_S * 2,
                           keys=["role"], aggs=AGGS, state_dir=sdir)


def test_group_only_view_matches_recompute(ray_session, tmp_path):
    """ts_col=None: a maintained grouped aggregate (no windows) —
    equal to the from-scratch group-by at every commit point, through
    updates and deletes."""
    log = str(tmp_path / "log")
    generate_changelog(log, SPEC)
    eng = CdcEngine(str(tmp_path / "lake"), num_partitions=4)
    view = TumblingWindowView(eng, log, keys=["role"], aggs=AGGS)
    for _ in range(2):
        eng.replay(log, max_bands=2)
        view.refresh()
        got = view.result().to_pandas().reset_index(drop=True)
        assert list(got.columns) == ["role", "n", "s", "m", "sd"]
        df = eng.final_dataset().to_pandas()
        ref = df.groupby("role", dropna=False)["turn_idx"].agg(
            n="count", s="sum", m="mean", sd="std").reset_index() \
            .sort_values("role").reset_index(drop=True)
        assert got["role"].tolist() == ref["role"].tolist()
        np.testing.assert_array_equal(got["n"].to_numpy(),
                                      ref["n"].to_numpy())
        for c in ("s", "m", "sd"):
            assert np.allclose(got[c].to_numpy(float),
                               ref[c].to_numpy(float),
                               equal_nan=True, atol=1e-9), c


def test_group_only_view_validation(ray_session, tmp_path):
    log = str(tmp_path / "log")
    generate_changelog(log, ChangeLogSpec(n_convs=5, turns_per_conv=3.0,
                                          n_bands=1, seed=1))
    eng = CdcEngine(str(tmp_path / "lake"), num_partitions=2)
    with pytest.raises(ValueError, match="needs keys"):
        TumblingWindowView(eng, log, aggs=AGGS)
    with pytest.raises(ValueError, match="ts_col AND size_s"):
        TumblingWindowView(eng, log, ts_col="ts", keys=["role"], aggs=AGGS)
