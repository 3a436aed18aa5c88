"""Schema-evolution and hot-key-skew replay tests (SURVEY.md §5, §7.5)."""

from __future__ import annotations

import numpy as np
import pytest
import pandas as pd
import pyarrow as pa

from rayflow.cdc import ChangeLogSpec, CdcEngine, generate_changelog
from rayflow.cdc.oracle import lww_oracle, read_changelog_pandas
from rayflow.cdc.partitioner import compute_part_ids, plan_salts


def _run(log_dir, lake_dir, **kw):
    engine = CdcEngine(lake_dir, **kw)
    stats = engine.replay(log_dir)
    return engine, stats


def _compare(engine, log_dir):
    eng = (
        engine.final_table(include_meta=True)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    ora = lww_oracle(read_changelog_pandas(log_dir))
    ora = ora[eng.columns]
    for c in eng.columns:
        if eng[c].dtype != ora[c].dtype:
            ora = ora.assign(**{c: ora[c].astype(eng[c].dtype)})
    pd.testing.assert_frame_equal(eng, ora, check_dtype=False)
    return eng


def test_schema_evolution_mid_log(tmp_path):
    """changes_v2 (FIXTURES.md): mid-log column add (meta_model) + type
    widen (turn_idx int32→int64).  Final lake: unified schema, pre-switch
    rows null meta_model, turn_idx reads back int64."""
    spec = ChangeLogSpec(
        n_convs=40, turns_per_conv=5.0, update_ratio=0.5, delete_ratio=0.05,
        n_bands=4, seed=7, evolve_at_lsn=260,
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    engine, _ = _run(log_dir, str(tmp_path / "lake"), num_partitions=6)

    tbl = engine.final_table(include_meta=True)
    assert tbl.schema.field("turn_idx").type == pa.int64()
    assert "meta_model" in tbl.column_names
    df = _compare(engine, log_dir)
    # rows whose winning writer predates the switch have null meta_model
    pre = df[df["_lsn"] < 260]
    post = df[df["_lsn"] >= 260]
    assert pre["meta_model"].isna().all()
    assert (post["meta_model"] == "model-v2").all()
    assert len(post) > 0 and len(pre) > 0


def test_evolution_before_resume(tmp_path):
    """Evolution lands *after* a checkpoint: bands 1-2 committed pre-switch
    (v1 lake files), resume applies v2 bands — read-back unifies."""
    spec = ChangeLogSpec(
        n_convs=40, turns_per_conv=5.0, update_ratio=0.5, delete_ratio=0.05,
        n_bands=4, seed=7, evolve_at_lsn=260,
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    lake = str(tmp_path / "lake")
    e1 = CdcEngine(lake, num_partitions=6)
    e1.replay(log_dir, max_bands=2)
    e2 = CdcEngine(lake, num_partitions=6)
    e2.replay(log_dir)
    _compare(e2, log_dir)


def test_zipf_skew_with_salting(tmp_path):
    """Heavy Zipf skew: hottest conversation dominates.  Salting must be
    planned, persisted, and the result still exact."""
    spec = ChangeLogSpec(
        n_convs=30, turns_per_conv=12.0, update_ratio=3.0, delete_ratio=0.1,
        zipf_s=1.1, n_bands=3, seed=11,
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    engine, _ = _run(
        log_dir, str(tmp_path / "lake"), num_partitions=8,
        salt_sample_fraction=1.0,
    )
    salts = engine.manifest.state["salts"]
    assert salts, "hot conversations should have been detected and salted"
    assert all(int(s) > 1 for s in salts.values())
    _compare(engine, log_dir)

    # salted conversations actually spread across partitions
    hot_conv = next(iter(salts))
    s = {hot_conv: int(salts[hot_conv])}
    turns = np.arange(64)
    parts = compute_part_ids(
        np.array([hot_conv] * 64, dtype=object), turns, 8, s
    )
    assert len(set(parts.tolist())) > 1


def test_part_ids_deterministic_and_stable():
    convs = np.array([f"conv{i:08d}" for i in range(1000)], dtype=object)
    turns = np.arange(1000) % 17
    a = compute_part_ids(convs, turns, 32)
    b = compute_part_ids(convs, turns, 32)
    assert (a == b).all()
    assert set(np.unique(a)) <= set(range(32))
    # reasonably balanced without salts
    counts = np.bincount(a, minlength=32)
    assert counts.max() < 4 * counts.mean()


def test_plan_salts_detects_hot_key(ray_session, tmp_path):
    import ray.data as rd

    n = 5000
    conv = np.where(np.arange(n) % 2 == 0, "hotconv", "c" + pd.Series(np.arange(n) % 500).astype(str))
    ds = rd.from_arrow(pa.table({"conv_id": pa.array(conv.astype(object))}))
    salts = plan_salts(ds, num_partitions=8, sample_fraction=1.0)
    assert "hotconv" in salts and salts["hotconv"] > 1


def test_resume_with_mismatched_partition_count(tmp_path):
    """Placement is a lake property: resuming with a different
    num_partitions must adopt the manifest's value (found by runtime
    probing — a silent mismatch duplicated keys across partitions)."""
    spec = ChangeLogSpec(n_convs=30, turns_per_conv=4.0, n_bands=3, seed=3)
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)
    lake = str(tmp_path / "lake")
    e1 = CdcEngine(lake, num_partitions=4)
    e1.replay(log_dir, max_bands=1)
    with pytest.warns(UserWarning, match="num_partitions=4"):
        e2 = CdcEngine(lake, num_partitions=16)
    assert e2.num_partitions == 4
    e2.replay(log_dir)
    _compare(e2, log_dir)


def test_salting_flattens_partition_load(tmp_path):
    """Quantified skew evidence: with a severely Zipf-skewed change log,
    hot-conversation salting must reduce the max/mean per-partition
    event load (read from the per-partition lineage) versus unsalted
    placement, while both stay oracle-exact."""
    spec = ChangeLogSpec(
        n_convs=60, turns_per_conv=10.0, update_ratio=1.0, delete_ratio=0.05,
        zipf_s=1.3, n_bands=1, seed=21,
        whale_turns=3000,  # one long-running agent conversation dominates
    )
    log_dir = str(tmp_path / "log")
    generate_changelog(log_dir, spec)

    def run(salt: bool, name: str):
        e = CdcEngine(str(tmp_path / name), num_partitions=12,
                      auto_salt=salt, salt_sample_fraction=1.0)
        e.replay(log_dir)
        parts = e.manifest.state["lineage"][0]["partitions"]
        loads = np.array([p["n_events"] for p in parts])
        _compare(e, log_dir)
        return loads.max() / loads.mean(), e

    skew_salted, es = run(True, "lake_s")
    skew_plain, _ = run(False, "lake_p")
    assert es.manifest.state["salts"], "expected hot conversations salted"
    assert skew_salted < skew_plain, (skew_salted, skew_plain)
