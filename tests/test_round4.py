"""Round-4 regression tests: advisor findings + vectorized shingles."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from rayflow.ops import build_op


def test_rate_limit_rejects_bad_cost():
    with pytest.raises(ValueError, match="cost must be"):
        build_op({"op": "rate_limit", "resource": "r4", "rate": 10,
                  "cost": "row"})


def test_span_hashes_are_64_bit():
    """dup_span_pairs keys pairs on UNVERIFIED window hashes, so they
    must be 64-bit (32-bit crc32 collides past ~80k distinct windows —
    fabricated pairs at corpus scale)."""
    from rayflow.ops.dedup import _span_hashes

    hs = set()
    for d in range(200):
        hs |= _span_hashes(" ".join(f"w{d}_{i}" for i in range(30)), 20)
    # 32-bit hashes can never exceed 2^32; 64-bit values populate the
    # full signed-int64 range (negatives appear with prob ~1-2^-2200)
    assert any(h < 0 or h >= (1 << 32) for h in hs)


def test_dup_span_pairs_kernel_matches_reference(ray_session):
    import ray.data as rd

    from rayflow.ops.dedup import _span_hashes

    shared = " ".join(f"s{i}" for i in range(25))
    docs = {
        1: shared + " tail one",
        2: "head two " + shared,
        3: " ".join(f"u3_{i}" for i in range(40)),
        4: shared + " " + shared,       # same span twice in one doc
        5: "short doc",
    }
    t = pa.table({"doc_id": pa.array(list(docs), pa.int64()),
                  "text": pa.array(list(docs.values()))})
    out = build_op({"op": "dup_span_pairs", "k_tokens": 20})(
        rd.from_arrow(t)).to_pandas().sort_values(
        ["doc_a", "doc_b"]).reset_index(drop=True)
    # brute-force expectation from the scalar reference
    exp = []
    ids = list(docs)
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            n = len(_span_hashes(docs[a], 20) & _span_hashes(docs[b], 20))
            if n:
                exp.append((a, b, n))
    exp = pd.DataFrame(exp, columns=["doc_a", "doc_b", "n_shared"])
    pd.testing.assert_frame_equal(
        out.astype(np.int64), exp.astype(np.int64))


def test_lm_score_survives_fully_pruned_model(ray_session):
    """min_count pruning that empties the bigram (and unigram) tables
    must yield all-miss scores, not IndexError (np.where evaluates both
    branches)."""
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["every token appears exactly once here",
                          "so any min count above one prunes all"]),
    })
    out = build_op({"op": "ngram_lm_score", "min_count": 5})(
        rd.from_arrow(t)).to_pandas()
    assert len(out) == 2
    assert np.isfinite(out.iloc[:, 1]).all()


def test_media_resizer_passes_through_extra_columns(ray_session):
    import ray.data as rd

    from rayflow.ops.multimodal import decode_png, synth_png_pixels, synth_wav

    rng = np.random.default_rng(11)
    src = rng.integers(0, 256, (8, 6, 3), dtype=np.uint8)
    t = pa.table({
        "asset_key": pa.array(["a-17", "a-18"]),   # non-'media_id' id col
        "shard": pa.array([3, 4], pa.int32()),     # extra metadata
        "payload": pa.array([synth_png_pixels(src), synth_wav()],
                            pa.binary()),
    })
    out = build_op({"op": "media_resize", "width": 3, "height": 4})(
        rd.from_arrow(t)).to_pandas()
    assert list(out["asset_key"]) == ["a-17"]      # WAV row dropped
    assert list(out["shard"]) == [3]
    assert list(out["media_type"]) == ["image/png"]
    assert decode_png(out["payload"][0]).shape == (4, 3, 3)


def test_window_session_zipf_hot_key_bounded(ray_session):
    """One key holding ~half the rows, active for months: the bucketed
    sessionizer must split it across many (key, bucket) groups and
    still stitch cross-bucket sessions to the exact per-key answer."""
    import datetime

    import ray.data as rd

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # hot user: 400 events 30 min apart (ONE long session spanning many
    # 1h buckets), then a 3h break, then 50 more (second session)
    for i in range(400):
        rows.append(("hot", base + datetime.timedelta(minutes=30 * i)))
    brk = base + datetime.timedelta(minutes=30 * 399 + 180 + 60)
    for i in range(50):
        rows.append(("hot", brk + datetime.timedelta(minutes=30 * i)))
    # background users
    for u in range(40):
        for i in range(10):
            rows.append((f"u{u}", base + datetime.timedelta(hours=7 * i)))
    ds = rd.from_arrow(pa.table({
        "k": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    }))
    gap = 3600.0      # 1h gap; bucket_s left at default 1024*gap -> use
    # a SMALL bucket so the hot key genuinely splits across buckets
    out = build_op({
        "op": "window_session", "keys": ["k"], "ts_col": "ts",
        "gap_s": gap, "bucket_s": 4 * 3600.0,
        "aggs": [("count", None, "n")],
    })(ds).to_pandas().sort_values(["k", "session_start"],
                                   ignore_index=True)

    # exact pandas reference (single-process sessionization)
    ref = pd.DataFrame(rows, columns=["k", "ts"]).sort_values(
        ["k", "ts"], ignore_index=True)
    new = (ref.groupby("k")["ts"].diff().dt.total_seconds().isna()
           | (ref.groupby("k")["ts"].diff().dt.total_seconds() > gap))
    ref["session_start"] = ref["ts"].where(new).ffill()
    exp = ref.groupby(["k", "session_start"], as_index=False).size() \
        .rename(columns={"size": "n"}).sort_values(
        ["k", "session_start"], ignore_index=True)
    # hot user: exactly 2 sessions despite spanning ~50 buckets
    assert (out[out["k"] == "hot"]["n"].tolist()
            == exp[exp["k"] == "hot"]["n"].tolist() == [400, 50])
    out["session_start"] = pd.to_datetime(out["session_start"]) \
        .astype("datetime64[us]")
    exp["session_start"] = pd.to_datetime(exp["session_start"]) \
        .astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        out.astype({"n": np.int64}), exp.astype({"n": np.int64}))


def _write_embeddings_parquet(tmp_path, n=400, d=16, seed=5):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, d))
    t = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(m), pa.list_(pa.float64())),
    })
    p = str(tmp_path / "emb.parquet")
    pq.write_table(t, p)
    return p, m


def test_ann_lsh_auto_routes_to_disk_index(ray_session, tmp_path):
    """Above the size threshold the generic op must go through the
    bucket-partitioned on-disk index — identical results to the
    streaming path, and the probe reads a strict subset of the bytes."""
    import ray.data as rd

    from rayflow.ops.ann import LshIndex

    p, m = _write_embeddings_parquet(tmp_path)
    q, qids = m[:3], np.arange(3)
    kw = dict(queries=q, query_ids=qids, k=5, dim=16, n_planes=4)
    stream = build_op({"op": "ann_lsh", **kw, "index_above_bytes": None})(
        rd.read_parquet(p)).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    ipath = str(tmp_path / "lsh_idx")
    routed = build_op({"op": "ann_lsh", **kw, "index_above_bytes": 1,
                       "index_path": ipath})(
        rd.read_parquet(p)).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(stream, routed)
    idx = LshIndex(ipath)          # the index really was built + used
    probed = idx.bytes_for(idx.bucket_of(q / np.linalg.norm(
        q, axis=1, keepdims=True)))
    assert 0 < probed < idx.total_bytes()    # bytes-pruning via the op


def test_ann_ivf_auto_routes_to_disk_index(ray_session, tmp_path):
    import ray.data as rd

    from rayflow.ops.ann import IvfIndex

    p, m = _write_embeddings_parquet(tmp_path, seed=6)
    q, qids = m[:3], np.arange(3)
    kw = dict(queries=q, query_ids=qids, k=5, n_clusters=8, nprobe=2)
    stream = build_op({"op": "ann_ivf", **kw, "index_above_bytes": None})(
        rd.read_parquet(p)).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    ipath = str(tmp_path / "ivf_idx")
    routed = build_op({"op": "ann_ivf", **kw, "index_above_bytes": 1,
                       "index_path": ipath})(
        rd.read_parquet(p)).to_pandas().sort_values(
        ["query_id", "rank"], ignore_index=True)
    pd.testing.assert_frame_equal(stream, routed)
    idx = IvfIndex(ipath)
    assert idx.total_bytes() > 0


def test_ngram_jaccard_df_order_same_output_fewer_candidates(ray_session):
    """prefix_order='df' must emit the identical verified pairs while
    generating no more candidate pairs than hash order (df-ascending
    prefixes lead with the rarest shingles — Bayardo WWW'07)."""
    import ray.data as rd

    # boilerplate-heavy corpus: a common preamble shared by all docs
    # (high-df shingles that hash order may put in prefixes) + unique
    # bodies; docs 0/1 and 2/3 are true near-dups
    pre = "terms of service apply to all users of this site"
    docs = [
        pre + " alpha beta gamma delta epsilon zeta eta",
        pre + " alpha beta gamma delta epsilon zeta theta",
        pre + " one two three four five six seven eight",
        pre + " one two three four five six seven nine",
    ] + [pre + f" unique{i} body{i} text{i} words{i} here{i}"
         for i in range(30)]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})

    def run(order):
        stats = {}
        out = build_op({
            "op": "ngram_jaccard_dedup", "threshold": 0.5, "shingle_k": 3,
            "prefix_order": order, "stats_out": stats,
        })(rd.from_arrow(t)).to_pandas().sort_values(
            ["doc_a", "doc_b"], ignore_index=True)
        return out, stats["candidate_pairs"]

    hash_out, hash_cand = run("hash")
    df_out, df_cand = run("df")
    pd.testing.assert_frame_equal(hash_out, df_out)
    assert len(hash_out) >= 2           # the planted near-dup pairs
    assert df_cand <= hash_cand
    with pytest.raises(ValueError, match="prefix_order"):
        build_op({"op": "ngram_jaccard_dedup", "prefix_order": "zipf"})


def test_jpeg_progressive_bit_exact_vs_baseline():
    """SOF2 decode (spectral selection + successive approximation +
    EOB-run refinement) produces BIT-IDENTICAL pixels to the baseline
    encoding of the same input — the quantized coefficients are the
    same, so any deviation is an entropy-coding bug."""
    from rayflow.ops.jpeg import (decode_jpeg, synth_jpeg,
                                  synth_jpeg_progressive)

    rng = np.random.default_rng(21)
    cases = [
        np.full((64, 48, 3), 130, np.uint8),          # max EOB runs
        rng.integers(0, 256, (41, 29, 3), np.uint8),  # odd dims
        np.repeat(((np.indices((40, 40)).sum(0) % 2) * 255)
                  .astype(np.uint8)[:, :, None], 3, 2),   # high freq
        np.full((17, 23), 7, np.uint8),               # grayscale
    ]
    n = 0
    for px in cases:
        for q in (30, 85, 95):
            for sub in ((False, True) if px.ndim == 3 else (False,)):
                b = decode_jpeg(synth_jpeg(px, q, subsample=sub))
                p = decode_jpeg(synth_jpeg_progressive(px, q,
                                                       subsample=sub))
                assert np.array_equal(b, p), (px.shape, q, sub)
                n += 1
    assert n == 21


def test_jpeg_progressive_through_media_decode(ray_session):
    """media_decode fake=False featurizes progressive JPEG payloads
    from real pixels — no fallback needed."""
    import ray.data as rd

    from rayflow.ops.jpeg import synth_jpeg_progressive

    rng = np.random.default_rng(22)
    px = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    t = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "media_type": pa.array(["image/jpeg"]),
        "payload": pa.array([synth_jpeg_progressive(px, 90)], pa.binary()),
    })
    out = build_op({"op": "media_decode", "fake": False})(
        rd.from_arrow(t)).to_pandas()
    assert len(out) == 1


def test_repetition_signals_hand_case(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "aa\nbb\naa\ncc",          # 4 lines, 1 dup ("aa" twice)
            "x\n\nx\n\ny",             # 3 paras, 1 dup
            "unique",                   # single segment, no dups
        ]),
    })
    out = build_op({"op": "repetition_signals"})(
        rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    r1, r2, r3 = out.iloc[0], out.iloc[1], out.iloc[2]
    assert r1.dup_line_frac == pytest.approx(1 / 4)
    assert r1.dup_line_char_frac == pytest.approx(2 / 8)  # one extra "aa"
    assert r1.dup_para_frac == 0.0
    assert r2.dup_para_frac == pytest.approx(1 / 3)
    assert r2.dup_para_char_frac == pytest.approx(1 / 3)
    # "x\n\nx\n\ny" split on "\n" → lines x, '', x, '', y → 2 dups of 5
    assert r2.dup_line_frac == pytest.approx(2 / 5)
    assert r3.dup_line_frac == 0.0 and r3.dup_para_char_frac == 0.0


def test_paragraph_dedup_first_occurrence_wins(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([10, 20, 30], pa.int64()),
        "text": pa.array([
            "alpha\n\nbeta",
            "beta\n\ngamma\n\nalpha",   # loses beta+alpha, keeps gamma
            "alpha\n\nbeta",            # loses everything → dropped
        ]),
    })
    out = build_op({"op": "paragraph_dedup"})(
        rd.from_arrow(t)).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert out.doc_id.tolist() == [10, 20]
    assert out.text.tolist() == ["alpha\n\nbeta", "gamma"]


def test_paragraph_dedup_within_doc_repeat(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([5], pa.int64()),
        "text": pa.array(["same\n\nsame\n\nother"]),
    })
    out = build_op({"op": "paragraph_dedup"})(
        rd.from_arrow(t)).to_pandas()
    assert out.text.tolist() == ["same\n\nother"]


def test_paragraph_dedup_guards_pathological_doc(ray_session):
    import ray.data as rd

    t = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array(["p\n\n" * 9]),
    })
    with pytest.raises(Exception, match="max_paras_per_doc"):
        build_op({"op": "paragraph_dedup", "max_paras_per_doc": 8})(
            rd.from_arrow(t)).to_pandas()


@pytest.mark.parametrize("name", [
    "nation_profit_q9_shape", "waiting_supplier_q21_shape",
    "repetition_signals_docs", "paragraph_dedup_docs",
])
def test_round4_queries_match_oracle(ray_session, name):
    import duckdb

    from rayflow.queries import ORACLE_SQL, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for tname in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split():
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM "
                    f"read_parquet('{sf}/{tname}.parquet')")
    res = QUERIES[name](sf)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    ora = con.execute(ORACLE_SQL[name]).df()
    cols = sorted(df.columns)
    assert cols == sorted(ora.columns)
    a = df[cols].sort_values(cols).reset_index(drop=True)
    b = ora[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


# -- group_cap (per-domain document quota) ----------------------------------


def _mk_ds(rows: dict, parallelism: int = 8):
    import ray.data as rd

    return rd.from_arrow(pa.table(rows)).repartition(parallelism)


def test_group_cap_matches_pandas(ray_session):
    rng = np.random.default_rng(7)
    n = 5000
    key = np.array([f"dom{k}" for k in rng.integers(0, 40, n)])
    order = rng.permutation(n).astype(np.int64)
    ds = _mk_ds({"k": key, "o": order, "v": np.arange(n)})
    out = build_op({"op": "group_cap", "key_col": "k", "order_col": "o",
                    "n": 7})(ds).to_pandas()
    exp = (pd.DataFrame({"k": key, "o": order, "v": np.arange(n)})
           .sort_values("o").groupby("k").head(7))
    assert len(out) == len(exp)
    assert (out.sort_values(["k", "o"]).reset_index(drop=True)[["k", "o"]]
            .equals(exp.sort_values(["k", "o"]).reset_index(drop=True)
                    [["k", "o"]]))


def test_group_cap_descending_and_zipf_skew(ray_session):
    """One key holds ~60% of rows (hot domain); cap must hold and the
    descending order must keep the LARGEST order values."""
    rng = np.random.default_rng(3)
    n = 8000
    key = np.where(rng.random(n) < 0.6, "hot", "cold" +
                   pd.Series(rng.integers(0, 20, n)).astype(str))
    order = rng.permutation(n).astype(np.int64)
    ds = _mk_ds({"k": key, "o": order}, parallelism=16)
    out = build_op({"op": "group_cap", "key_col": "k", "order_col": "o",
                    "n": 5, "descending": True})(ds).to_pandas()
    exp = (pd.DataFrame({"k": key, "o": order})
           .sort_values("o", ascending=False).groupby("k").head(5))
    assert sorted(map(tuple, out[["k", "o"]].values.tolist())) == \
        sorted(map(tuple, exp[["k", "o"]].values.tolist()))


def test_group_cap_descending_string_order_raises(ray_session):
    ds = _mk_ds({"k": ["a", "a"], "o": ["x", "y"]}, parallelism=1)
    with pytest.raises(Exception, match="numeric"):
        build_op({"op": "group_cap", "key_col": "k", "order_col": "o",
                  "n": 1, "descending": True})(ds).to_pandas()


# -- dedup_against (cross-snapshot incremental dedup) ------------------------


def _dedup_against_case(method: str):
    texts = [f"doc body {i}" for i in range(60)]
    ref_rows = {"text": [texts[i] for i in range(0, 60, 3)]}
    new_rows = {"doc_id": np.arange(60, dtype=np.int64), "text": texts}
    return ref_rows, new_rows


@pytest.mark.parametrize("method", ["broadcast", "sharded"])
def test_dedup_against_drops_known_content(ray_session, method):
    ref_rows, new_rows = _dedup_against_case(method)
    ref = _mk_ds(ref_rows, parallelism=4)
    ds = _mk_ds(new_rows, parallelism=6)
    out = build_op({"op": "dedup_against", "ref": ref, "method": method,
                    "num_partitions": 4})(ds).to_pandas()
    assert sorted(out["doc_id"]) == [i for i in range(60) if i % 3 != 0]
    assert list(out.columns) == ["doc_id", "text"]


def test_dedup_against_null_text_passes_through(ray_session):
    ref = _mk_ds({"text": ["a"]}, parallelism=1)
    ds = _mk_ds({"doc_id": np.array([1, 2, 3], np.int64),
                 "text": pd.array(["a", None, "b"], dtype=object)},
                parallelism=1)
    out = build_op({"op": "dedup_against", "ref": ref,
                    "method": "broadcast"})(ds).to_pandas()
    # NULL text never matches (SQL NOT EXISTS semantics) — rows 2, 3 stay
    assert sorted(out["doc_id"]) == [2, 3]


def test_dedup_against_broadcast_limit_is_loud(ray_session):
    ref = _mk_ds({"text": [f"t{i}" for i in range(50)]}, parallelism=2)
    ds = _mk_ds({"text": ["t1"]}, parallelism=1)
    with pytest.raises(Exception, match="broadcast_limit"):
        build_op({"op": "dedup_against", "ref": ref, "method": "broadcast",
                  "broadcast_limit": 10})(ds).to_pandas()


def test_sharded_semi_same_key_name_both_sides(ray_session):
    """Regression: when right_on == on, the rename of the right key was
    a late-binding closure over the reassigned ``rk`` — the rename
    never fired and the join died with a missing-field KeyError."""
    left = _mk_ds({"k": ["a", "b", "c", "d"]}, parallelism=2)
    right = _mk_ds({"k": ["b", "d"]}, parallelism=2)
    semi = build_op({"op": "sharded_semi", "right": right, "on": "k",
                     "num_partitions": 2})(left).to_pandas()
    assert sorted(semi["k"]) == ["b", "d"]
    anti = build_op({"op": "sharded_semi", "right": right, "on": "k",
                     "anti": True, "num_partitions": 2})(left).to_pandas()
    assert sorted(anti["k"]) == ["a", "c"]


# -- weighted_mix / global_shuffle (training-order plane) --------------------


def test_weighted_mix_rate_one_and_rate_error(ray_session):
    ds = _mk_ds({"doc_id": np.arange(100, dtype=np.int64)}, parallelism=4)
    out = build_op({"op": "weighted_mix",
                    "sources": [{"ds": ds, "rate": 1.0}]})(ds).to_pandas()
    assert len(out) == 100
    with pytest.raises(ValueError, match="rate"):
        build_op({"op": "weighted_mix",
                  "sources": [{"ds": ds, "rate": 1.5}]})(ds)


def test_weighted_mix_deterministic_and_rate_proportional(ray_session):
    ds = _mk_ds({"doc_id": np.arange(4000, dtype=np.int64)}, parallelism=8)
    cfg = {"op": "weighted_mix", "id_col": "doc_id",
           "sources": [{"ds": ds, "rate": 0.5, "salt": "s1"}]}
    a = sorted(build_op(cfg)(ds).to_pandas()["doc_id"])
    b = sorted(build_op(cfg)(ds).to_pandas()["doc_id"])
    assert a == b
    # md5 threshold sampling is within a few % of the nominal rate
    assert 0.45 < len(a) / 4000 < 0.55


def test_global_shuffle_exact_permutation(ray_session):
    import hashlib

    n = 3000
    ds = _mk_ds({"doc_id": np.arange(n, dtype=np.int64)}, parallelism=12)
    out = build_op({"op": "global_shuffle", "id_col": "doc_id",
                    "salt": "e7", "n_buckets": 32})(ds).to_pandas()
    assert sorted(out["shuffle_pos"]) == list(range(n))
    # matches the serial reference ordering exactly
    ref = sorted(range(n),
                 key=lambda i: (hashlib.md5(f"e7{i}".encode()).hexdigest(), i))
    got = out.sort_values("shuffle_pos")["doc_id"].tolist()
    assert got == ref


def test_global_shuffle_salt_changes_order(ray_session):
    n = 500
    ds = _mk_ds({"doc_id": np.arange(n, dtype=np.int64)}, parallelism=4)
    o1 = build_op({"op": "global_shuffle", "salt": "ep0",
                   "n_buckets": 16})(ds).to_pandas()
    o2 = build_op({"op": "global_shuffle", "salt": "ep1",
                   "n_buckets": 16})(ds).to_pandas()
    m1 = dict(zip(o1["doc_id"], o1["shuffle_pos"]))
    m2 = dict(zip(o2["doc_id"], o2["shuffle_pos"]))
    assert m1 != m2


def test_global_shuffle_rejects_bad_buckets(ray_session):
    with pytest.raises(ValueError, match="power of 2"):
        build_op({"op": "global_shuffle", "n_buckets": 100})


# -- simhash_near_dup ---------------------------------------------------------


def test_popcount64_kernel():
    from rayflow.ops.dedup import _popcount64

    rng = np.random.default_rng(5)
    xs = rng.integers(0, 1 << 63, 1000, dtype=np.int64).astype(np.uint64)
    got = _popcount64(xs)
    exp = [bin(int(x)).count("1") for x in xs]
    assert got.tolist() == exp


def test_simhash_near_dup_full_recall(ray_session):
    """Pigeonhole banding must find EVERY pair within hd_max bits —
    compare against the brute-force O(n^2) popcount reference."""
    from rayflow.ops.dedup import simhash_batch

    rng = np.random.default_rng(11)
    words = [f"w{i}" for i in range(200)]
    texts = []
    for d in range(120):
        base = list(rng.choice(words, 30))
        texts.append(" ".join(base))
        if d % 4 == 0:  # planted near-dup: one token swapped
            mut = base.copy()
            mut[0] = "zz" + mut[0]
            texts.append(" ".join(mut))
    n = len(texts)
    ds = _mk_ds({"doc_id": np.arange(n, dtype=np.int64), "text": texts},
                parallelism=6)
    out = build_op({"op": "simhash_near_dup", "hd_max": 4})(ds).to_pandas()
    sh = simhash_batch(pa.array(texts)).astype(np.uint64)
    exp = set()
    for i in range(n):
        for j in range(i + 1, n):
            if bin(int(sh[i] ^ sh[j])).count("1") <= 4:
                exp.add((i, j))
    got = set(map(tuple, out[["doc_a", "doc_b"]].values))
    assert got == exp
    assert len(out) == len(out.drop_duplicates(["doc_a", "doc_b"]))


# -- Bloom prefilter ----------------------------------------------------------


def test_bloom_filter_kernel():
    from rayflow.ops.kernels import BloomFilter

    bf = BloomFilter.sized(500, 10)
    keys = pa.array([f"k{i}" for i in range(500)])
    bf.add(keys)
    assert bf.contains(keys).all()          # no false negatives, ever
    fp = bf.contains(pa.array([f"miss{i}" for i in range(10000)])).mean()
    assert fp < 0.03                        # ~1% nominal at 10 bits/key


@pytest.mark.parametrize("anti", [False, True])
def test_sharded_semi_bloom_prefilter_exact(ray_session, anti):
    rng = np.random.default_rng(9)
    left_keys = rng.integers(0, 1000, 4000).astype(np.int64)
    right_keys = np.unique(rng.integers(0, 1000, 300)).astype(np.int64)
    left = _mk_ds({"k": left_keys, "v": np.arange(4000)}, parallelism=8)
    right = _mk_ds({"k": right_keys}, parallelism=4)
    plain = build_op({"op": "sharded_semi", "right": right, "on": "k",
                      "anti": anti, "num_partitions": 4})(left).to_pandas()
    bloom = build_op({"op": "sharded_semi", "right": right, "on": "k",
                      "anti": anti, "num_partitions": 4,
                      "bloom_bits_per_key": 10})(left).to_pandas()
    assert sorted(map(tuple, plain[["k", "v"]].values)) == \
        sorted(map(tuple, bloom[["k", "v"]].values))


def test_sharded_join_bloom_prefilter_exact(ray_session):
    rng = np.random.default_rng(13)
    left = _mk_ds({"k": rng.integers(0, 500, 3000).astype(np.int64),
                   "v": np.arange(3000)}, parallelism=6)
    rk = np.unique(rng.integers(0, 500, 60)).astype(np.int64)
    right = _mk_ds({"k2": rk, "w": rk * 10}, parallelism=2)
    plain = build_op({"op": "sharded_join", "right": right, "on": ["k"],
                      "right_on": ["k2"], "how": "inner",
                      "num_partitions": 4})(left).to_pandas()
    bloom = build_op({"op": "sharded_join", "right": right, "on": ["k"],
                      "right_on": ["k2"], "how": "inner",
                      "num_partitions": 4,
                      "bloom_bits_per_key": 10})(left).to_pandas()
    cols = ["k", "v", "w"]
    assert sorted(map(tuple, plain[cols].values)) == \
        sorted(map(tuple, bloom[cols].values))


def test_sharded_join_bloom_rejects_outer(ray_session):
    ds = _mk_ds({"k": np.array([1], np.int64)}, parallelism=1)
    with pytest.raises(ValueError, match="inner single-key"):
        build_op({"op": "sharded_join", "right": ds, "on": ["k"],
                  "how": "left", "bloom_bits_per_key": 8})


def test_sharded_semi_bloom_null_keys(ray_session):
    left = _mk_ds({"k": pa.array([1, None, 2, None], pa.int64()),
                   "v": np.arange(4)}, parallelism=1)
    right = _mk_ds({"k": np.array([1], np.int64)}, parallelism=1)
    semi = build_op({"op": "sharded_semi", "right": right, "on": "k",
                     "bloom_bits_per_key": 8,
                     "num_partitions": 2})(left).to_pandas()
    assert sorted(semi["v"]) == [0]         # null keys never match
    anti = build_op({"op": "sharded_semi", "right": right, "on": "k",
                     "anti": True, "bloom_bits_per_key": 8,
                     "num_partitions": 2})(left).to_pandas()
    assert sorted(anti["v"]) == [1, 2, 3]   # null keys pass NOT EXISTS


def test_dedup_against_sharded_with_bloom(ray_session):
    ref_rows, new_rows = _dedup_against_case("sharded")
    ref = _mk_ds(ref_rows, parallelism=4)
    ds = _mk_ds(new_rows, parallelism=6)
    out = build_op({"op": "dedup_against", "ref": ref, "method": "sharded",
                    "num_partitions": 4,
                    "bloom_bits_per_key": 10})(ds).to_pandas()
    assert sorted(out["doc_id"]) == [i for i in range(60) if i % 3 != 0]


# -- group_rank / group_cumsum (per-key window functions) --------------------


def test_group_rank_matches_pandas(ray_session):
    rng = np.random.default_rng(21)
    n = 3000
    key = rng.integers(0, 50, n).astype(np.int64)
    order = rng.permutation(n).astype(np.int64)
    ds = _mk_ds({"k": key, "o": order}, parallelism=8)
    out = build_op({"op": "group_rank", "key_col": "k",
                    "order_col": "o"})(ds).to_pandas()
    df = pd.DataFrame({"k": key, "o": order})
    df["rn"] = df.sort_values("o").groupby("k").cumcount() + 1
    got = out.sort_values(["k", "o"]).reset_index(drop=True)
    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    assert got["rn"].tolist() == exp["rn"].tolist()


def test_group_cumsum_range_frame_ties(ray_session):
    """SQL RANGE frame: rows tied on (key, order) share the tie group's
    TOTAL — pin against DuckDB's window semantics."""
    import duckdb

    key = np.array([1, 1, 1, 1, 2, 2], np.int64)
    order = np.array([10, 10, 20, 30, 5, 5], np.int64)
    val = np.array([1.0, 2.0, 4.0, 8.0, -3.0, 7.0])
    ds = _mk_ds({"k": key, "o": order, "v": val}, parallelism=2)
    out = build_op({"op": "group_cumsum", "key_col": "k", "order_col": "o",
                    "value_col": "v", "out": "r"})(ds).to_pandas()
    exp = duckdb.sql(
        "SELECT k, o, v, sum(v) OVER (PARTITION BY k ORDER BY o) AS r "
        "FROM (SELECT unnest($k) k, unnest($o) o, unnest($v) v)",
        params={"k": key.tolist(), "o": order.tolist(), "v": val.tolist()},
    ).df()
    got = out.sort_values(["k", "o", "v"]).reset_index(drop=True)
    exp = exp.sort_values(["k", "o", "v"]).reset_index(drop=True)
    assert np.allclose(got["r"], exp["r"])


def test_group_lag_and_lead_match_pandas(ray_session):
    rng = np.random.default_rng(31)
    n = 2000
    key = rng.integers(0, 40, n).astype(np.int64)
    order = rng.permutation(n).astype(np.int64)
    val = rng.normal(size=n)
    ds = _mk_ds({"k": key, "o": order, "v": val}, parallelism=8)
    df = pd.DataFrame({"k": key, "o": order, "v": val}).sort_values("o")
    for off in (1, 2, -1):
        out = build_op({"op": "group_lag", "key_col": "k", "order_col": "o",
                        "value_col": "v", "offset": off})(ds).to_pandas()
        exp = df.copy()
        exp["lag"] = exp.groupby("k")["v"].shift(off)
        got = out.sort_values("o").reset_index(drop=True)
        e = exp.sort_values("o").reset_index(drop=True)
        assert np.allclose(got["lag"].fillna(1e18), e["lag"].fillna(1e18))
    with pytest.raises(ValueError, match="nonzero"):
        build_op({"op": "group_lag", "key_col": "k", "order_col": "o",
                  "value_col": "v", "offset": 0})


def test_group_rank_null_keys_form_one_partition(ray_session):
    """SQL PARTITION BY treats NULL as one partition — pin it."""
    key = pa.array(["a", None, "a", None, None], pa.string())
    order = np.array([3, 1, 1, 2, 3], np.int64)
    ds = _mk_ds({"k": key, "o": order}, parallelism=2)
    out = build_op({"op": "group_rank", "key_col": "k",
                    "order_col": "o"})(ds).to_pandas()
    nulls = out[out["k"].isna()].sort_values("o")
    assert nulls["rn"].tolist() == [1, 2, 3]
    a = out[out["k"] == "a"].sort_values("o")
    assert a["rn"].tolist() == [1, 2]


def test_audio_features_over_synth_wavs(ray_session):
    from rayflow.ops.multimodal import decode_wav, synth_wav

    rng = np.random.default_rng(17)
    rows = []
    for i, (rate, secs) in enumerate([(8000, 0.5), (16000, 0.25),
                                      (16000, 1.0)]):
        samp = (rng.normal(0, 0.1, int(rate * secs)) * 32767) \
            .clip(-32768, 32767).astype(np.int16)
        rows.append({"media_id": i,
                     "payload": synth_wav(rate=rate, samples=samp)})
    rows.append({"media_id": 99, "payload": b"not audio at all"})
    import ray.data as rd

    ds = rd.from_items(rows)
    out = build_op({"op": "audio_features"})(ds).to_pandas()
    assert sorted(out["media_id"]) == [0, 1, 2]   # non-audio dropped
    r0 = out[out.media_id == 0].iloc[0]
    assert abs(r0["duration_s"] - 0.5) < 1e-6 and r0["sample_rate"] == 8000
    # features agree with a direct decode
    pcm, rate = decode_wav(rows[2]["payload"])
    x = pcm.astype(np.float64) / 32768.0
    r2 = out[out.media_id == 2].iloc[0]
    assert abs(r2["rms"] - np.sqrt((x * x).mean())) < 1e-12
    with pytest.raises(Exception):
        build_op({"op": "audio_features", "on_non_audio": "explode"})


def test_window_fns_random_duckdb_crosscheck(ray_session):
    """Randomized cross-check of all three per-key window functions
    against DuckDB on data WITH order ties and negative values."""
    import duckdb

    rng = np.random.default_rng(47)
    n = 1500
    key = rng.integers(0, 25, n).astype(np.int64)
    order = rng.integers(0, 80, n).astype(np.int64)      # ties guaranteed
    val = np.round(rng.normal(0, 5, n), 3)
    uniq = np.arange(n, dtype=np.int64)                  # tiebreak id
    ds = _mk_ds({"k": key, "o": order, "u": uniq, "v": val}, parallelism=8)
    base = "SELECT unnest($k) k, unnest($o) o, unnest($u) u, unnest($v) v"
    params = {"k": key.tolist(), "o": order.tolist(),
              "u": uniq.tolist(), "v": val.tolist()}

    # rank with a unique (o, u) packed order — deterministic
    packed = order * (1 << 32) + uniq
    ds_p = _mk_ds({"k": key, "p": packed, "u": uniq}, parallelism=8)
    out = build_op({"op": "group_rank", "key_col": "k", "order_col": "p",
                    "out": "rn"})(ds_p).to_pandas().sort_values("u")
    exp = duckdb.sql(
        f"SELECT u, row_number() OVER (PARTITION BY k ORDER BY o, u) rn "
        f"FROM ({base})", params=params).df().sort_values("u")
    assert out["rn"].tolist() == exp["rn"].tolist()

    # cumsum with RANGE-frame ties on the raw (non-unique) order
    out = build_op({"op": "group_cumsum", "key_col": "k", "order_col": "o",
                    "value_col": "v", "out": "r"})(ds).to_pandas() \
        .sort_values("u")
    exp = duckdb.sql(
        f"SELECT u, sum(v) OVER (PARTITION BY k ORDER BY o) r "
        f"FROM ({base})", params=params).df().sort_values("u")
    assert np.allclose(out["r"], exp["r"], atol=1e-9)

    # lag over the packed unique order
    ds_pv = _mk_ds({"k": key, "p": packed, "u": uniq, "v": val},
                   parallelism=8)
    out = build_op({"op": "group_lag", "key_col": "k", "order_col": "p",
                    "value_col": "v", "out": "lg"})(ds_pv).to_pandas() \
        .sort_values("u")
    exp = duckdb.sql(
        f"SELECT u, lag(v) OVER (PARTITION BY k ORDER BY o, u) lg "
        f"FROM ({base})", params=params).df().sort_values("u")
    assert np.allclose(out["lg"].fillna(1e18), exp["lg"].fillna(1e18))


def test_group_rank_percent_and_ntile_vs_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(53)
    n = 1200
    key = rng.integers(0, 30, n).astype(np.int64)   # varied key sizes
    order = rng.permutation(n).astype(np.int64)     # unique order
    ds = _mk_ds({"k": key, "o": order}, parallelism=8)
    out = build_op({"op": "group_rank", "key_col": "k", "order_col": "o",
                    "out": "rn", "out_percent": "pr", "out_ntile": "nt",
                    "ntile": 5})(ds).to_pandas().sort_values("o")
    exp = duckdb.sql(
        "SELECT o, percent_rank() OVER (PARTITION BY k ORDER BY o) pr, "
        "ntile(5) OVER (PARTITION BY k ORDER BY o) nt "
        "FROM (SELECT unnest($k) k, unnest($o) o)",
        params={"k": key.tolist(), "o": order.tolist()}).df() \
        .sort_values("o")
    assert np.allclose(out["pr"], exp["pr"])
    assert out["nt"].tolist() == exp["nt"].tolist()
    # tiny keys (fewer rows than tiles): each row its own tile
    ds2 = _mk_ds({"k": np.array([9, 9], np.int64),
                  "o": np.array([2, 1], np.int64)}, parallelism=1)
    o2 = build_op({"op": "group_rank", "key_col": "k", "order_col": "o",
                   "out_ntile": "nt", "ntile": 7})(ds2).to_pandas() \
        .sort_values("o")
    assert o2["nt"].tolist() == [1, 2]


def test_dedupe_sharded_fallback_path(ray_session):
    """Force partial_limit=0 so the high-cardinality sharded combine
    runs (coarse key shards + multi-key argextreme per shard)."""
    rng = np.random.default_rng(61)
    n = 2000
    key = rng.integers(0, 400, n).astype(np.int64)
    lsn = rng.permutation(n).astype(np.int64)
    ds = _mk_ds({"k": key, "lsn": lsn}, parallelism=8)
    out = build_op({"op": "dedupe", "keys": ["k"], "order_col": "lsn",
                    "keep": "max", "partial_limit": 0})(ds).to_pandas()
    exp = (pd.DataFrame({"k": key, "lsn": lsn})
           .sort_values("lsn").groupby("k").tail(1))
    assert sorted(map(tuple, out[["k", "lsn"]].values)) == \
        sorted(map(tuple, exp[["k", "lsn"]].values))


def test_group_topk_sharded_matches_pandas(ray_session):
    rng = np.random.default_rng(67)
    n = 3000
    key = rng.integers(0, 150, n).astype(np.int64)
    v = rng.permutation(n).astype(np.int64)
    ds = _mk_ds({"k": key, "v": v}, parallelism=8)
    out = build_op({"op": "group_topk", "keys": ["k"], "order_col": "v",
                    "k": 3, "descending": True})(ds).to_pandas()
    exp = (pd.DataFrame({"k": key, "v": v})
           .sort_values("v", ascending=False).groupby("k").head(3))
    assert sorted(map(tuple, out[["k", "v"]].values)) == \
        sorted(map(tuple, exp[["k", "v"]].values))


# -- session fixes: near-1.0 rates, empty-shard schemas, interval dtypes -----

def test_weighted_mix_rate_rounds_to_one_no_overflow(ray_session):
    import ray.data as rd

    # 1 - 2^-60 ROUNDS to 1.0 in float64: the uint64 threshold must
    # clamp, not OverflowError; semantically it's keep-everything
    docs = rd.from_arrow(pa.table({"doc_id": [str(i) for i in range(50)]}))
    out = build_op({"op": "weighted_mix",
                    "sources": [{"ds": docs, "rate": 1.0 - 2**-60,
                                 "salt": "s"}]})(docs)
    assert out.count() == 50


def test_interval_join_restores_arrow_types(ray_session):
    import ray.data as rd

    # union-align NaN-pads the missing side -> pandas promotes ints to
    # float64; the op must cast back (asof already did; interval now too)
    keys = [f"k{i}" for i in range(40)]
    left = rd.from_arrow(pa.table({
        "k": keys, "t": list(range(40)), "v": list(range(40))}))
    right = rd.from_arrow(pa.table({
        "k": keys, "lo": [0] + [1000] * 39, "hi": [50] + [2000] * 39,
        "rv": list(range(40))}))
    out = build_op({"op": "interval_join", "right": right, "on": "k",
                    "time_col": "t", "start_col": "lo",
                    "end_col": "hi"})(left)
    tb = out.to_pandas()
    # only k0 matches; 39 of 40 keys produce EMPTY per-group results,
    # so several of the 64 shards are all-empty (schema regression bait)
    assert len(tb) == 1
    for c in ("t", "v", "lo", "hi", "rv"):
        assert str(tb[c].dtype) == "int64", (c, tb[c].dtype)


def test_interval_join_all_empty_output_schema(ray_session):
    import ray.data as rd

    # zero matches anywhere: result must still be well-formed (0 rows)
    left = rd.from_arrow(pa.table({
        "k": ["a", "b"], "t": [1, 2], "v": [10, 20]}))
    right = rd.from_arrow(pa.table({
        "k": ["a", "b"], "lo": [100, 100], "hi": [200, 200],
        "rv": [1, 2]}))
    out = build_op({"op": "interval_join", "right": right, "on": "k",
                    "time_col": "t", "start_col": "lo",
                    "end_col": "hi"})(left)
    assert out.count() == 0


def test_window_session_bucket_smaller_than_gap(ray_session):
    """bucket_s < gap_s: a session can span NON-adjacent buckets (the
    intermediate bucket is empty) — the summary fold must stitch on
    actual timestamps over the buckets PRESENT, not on adjacency."""
    import datetime

    import ray.data as rd

    base = datetime.datetime(2024, 1, 1)
    ts = [0.0, 5000.0,           # one session: buckets 0 and 2 (b1 empty)
          20000.0, 21000.0]      # second session after a >gap break
    ds = rd.from_arrow(pa.table({
        "k": pa.array(["x"] * 4),
        "ts": pa.array([base + datetime.timedelta(seconds=s) for s in ts],
                       pa.timestamp("us")),
    }))
    out = build_op({
        "op": "window_session", "keys": ["k"], "ts_col": "ts",
        "gap_s": 6000.0, "bucket_s": 1800.0,
        "aggs": [("count", None, "n")],
    })(ds).to_pandas().sort_values("session_start", ignore_index=True)
    assert out["n"].tolist() == [2, 2]
    starts = pd.to_datetime(out["session_start"]).tolist()
    assert starts == [base, base + datetime.timedelta(seconds=20000)]


def test_group_concat_vs_duckdb_string_agg(ray_session):
    """group_concat ≡ string_agg(v, sep ORDER BY o) GROUP BY k — with
    nulls (skipped), empty strings (kept), ties broken by a unique
    order, and multi-char separators."""
    import duckdb

    rng = np.random.default_rng(91)
    n = 4000
    key = rng.integers(0, 150, n).astype(np.int64)
    order = rng.permutation(n).astype(np.int64)        # unique
    vals = np.array(["t%d" % i for i in range(n)], dtype=object)
    vals[rng.choice(n, 200, replace=False)] = None     # string_agg skips
    vals[rng.choice(n, 50, replace=False)] = ""        # but keeps empties
    ds = _mk_ds({"k": key, "o": order,
                 "v": pa.array(vals.tolist(), pa.string())})
    out = build_op({"op": "group_concat", "key_col": "k", "order_col": "o",
                    "value_col": "v", "out": "doc", "sep": "<|>"})(ds) \
        .to_pandas().sort_values("k", ignore_index=True)
    exp = duckdb.sql(
        "SELECT k, string_agg(v, '<|>' ORDER BY o) doc "
        "FROM (SELECT unnest($k) k, unnest($o) o, unnest($v) v) "
        "GROUP BY k ORDER BY k",
        params={"k": key.tolist(), "o": order.tolist(),
                "v": vals.tolist()}).df()
    assert out["k"].tolist() == exp["k"].tolist()
    assert out["doc"].tolist() == exp["doc"].tolist()


def test_group_concat_all_null_key_matches_sql(ray_session):
    """A key whose every value is null: SQL string_agg returns NULL for
    it (the key still appears via GROUP BY) — group_concat drops the
    null rows BEFORE grouping, so the key vanishes.  Assert the
    documented semantics: only keys with ≥1 non-null value emit."""
    ds = _mk_ds({"k": pa.array(["a", "a", "b"]),
                 "o": pa.array([1, 2, 3], pa.int64()),
                 "v": pa.array([None, None, "x"], pa.string())},
                parallelism=2)
    out = build_op({"op": "group_concat", "key_col": "k", "order_col": "o",
                    "value_col": "v"})(ds).to_pandas()
    assert out["k"].tolist() == ["b"]
    assert out["concat"].tolist() == ["x"]


def test_group_lag_per_column_offsets_vs_duckdb(ray_session):
    """offsets=[1,2,-1]: the same column lagged twice and led once in
    ONE exchange matches three DuckDB windows."""
    import duckdb

    rng = np.random.default_rng(17)
    n = 3000
    key = rng.integers(0, 40, n).astype(np.int64)
    order = rng.permutation(n).astype(np.int64)
    val = np.round(rng.normal(0, 3, n), 3)
    ds = _mk_ds({"k": key, "o": order, "v": val})
    out = build_op({"op": "group_lag", "key_col": "k", "order_col": "o",
                    "value_cols": ["v", "v", "v"],
                    "outs": ["l1", "l2", "ld"],
                    "offsets": [1, 2, -1]})(ds).to_pandas().sort_values("o")
    exp = duckdb.sql(
        "SELECT o, lag(v,1) OVER w l1, lag(v,2) OVER w l2, "
        "lead(v,1) OVER w ld "
        "FROM (SELECT unnest($k) k, unnest($o) o, unnest($v) v) "
        "WINDOW w AS (PARTITION BY k ORDER BY o) ORDER BY o",
        params={"k": key.tolist(), "o": order.tolist(),
                "v": val.tolist()}).df()
    for c in ("l1", "l2", "ld"):
        assert np.allclose(out[c].fillna(1e18), exp[c].fillna(1e18))


def test_group_lag_offsets_validation(ray_session):
    with pytest.raises(ValueError, match="offsets must pair"):
        build_op({"op": "group_lag", "key_col": "k", "order_col": "o",
                  "value_col": "v", "offsets": [1, 2]})
    with pytest.raises(ValueError, match="nonzero"):
        build_op({"op": "group_lag", "key_col": "k", "order_col": "o",
                  "value_cols": ["v"], "outs": ["x"], "offsets": [0]})


def test_group_concat_zipf_hot_key(ray_session):
    """One key holding ~50% of all rows must not blow up a single
    group task: the shard pass concatenates ALL its keys in one
    vectorized kernel, so the hot key costs its text bytes, not a
    per-key task.  Output equality vs pandas on 30k rows."""
    rng = np.random.default_rng(3)
    n = 30_000
    hot = rng.random(n) < 0.5
    key = np.where(hot, 0, rng.integers(1, 500, n)).astype(np.int64)
    order = rng.permutation(n).astype(np.int64)
    val = np.array([f"w{i % 97}" for i in range(n)], dtype=object)
    ds = _mk_ds({"k": key, "o": order,
                 "v": pa.array(val.tolist(), pa.string())}, parallelism=16)
    out = build_op({"op": "group_concat", "key_col": "k", "order_col": "o",
                    "value_col": "v", "out": "doc", "sep": " "})(ds) \
        .to_pandas().set_index("k")["doc"]
    df = pd.DataFrame({"k": key, "o": order, "v": val}).sort_values("o")
    want = df.groupby("k")["v"].agg(" ".join)
    assert len(out) == len(want)
    assert out.loc[0] == want.loc[0]            # the hot key, byte-exact
    for k in (1, 17, 499):
        if k in want.index:
            assert out.loc[k] == want.loc[k]


# ---------------------------------------------------------------- reshape ops


def _ds_from_pandas(df):
    import ray.data as rd

    return rd.from_pandas(df)


def test_pivot_matches_duckdb_case_when(ray_session):
    import duckdb

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "k": rng.integers(0, 5, 300),
        "p": rng.choice(["a", "b", "c"], 300),
        "v": rng.normal(size=300).round(3),
    })
    out = build_op({
        "op": "pivot", "keys": ["k"], "pivot_col": "p", "value_col": "v",
        "values": ["a", "b", "c"], "agg": "sum",
    })(_ds_from_pandas(df)).to_pandas().sort_values("k").reset_index(drop=True)
    ora = duckdb.connect().execute("""
        SELECT k,
               sum(CASE WHEN p='a' THEN v ELSE 0 END) AS a,
               sum(CASE WHEN p='b' THEN v ELSE 0 END) AS b,
               sum(CASE WHEN p='c' THEN v ELSE 0 END) AS c
        FROM df GROUP BY k ORDER BY k
    """).fetchdf()
    pd.testing.assert_frame_equal(out[["k", "a", "b", "c"]], ora,
                                  check_dtype=False, atol=1e-9)


def test_pivot_min_ignores_nonmatching(ray_session):
    df = pd.DataFrame({"k": [1, 1, 2], "p": ["a", "b", "a"],
                       "v": [5.0, 1.0, 7.0]})
    out = build_op({
        "op": "pivot", "keys": ["k"], "pivot_col": "p", "value_col": "v",
        "values": ["a", "b"], "agg": "min",
    })(_ds_from_pandas(df)).to_pandas().sort_values("k").reset_index(drop=True)
    # min over the non-matching flag must be null, never 0
    assert out.loc[out.k == 2, "b"].isna().all()
    assert out.loc[out.k == 1, "a"].iloc[0] == 5.0


def test_pivot_rejects_bad_agg():
    with pytest.raises(ValueError, match="agg must be"):
        build_op({"op": "pivot", "keys": ["k"], "pivot_col": "p",
                  "value_col": "v", "values": ["a"], "agg": "median"})


def test_unpivot_roundtrip(ray_session):
    df = pd.DataFrame({"id": [1, 2, 3], "x": [1.5, 2.5, 3.5],
                       "y": [10, 20, 30]})
    out = build_op({
        "op": "unpivot", "keys": ["id"], "value_cols": ["x", "y"],
    })(_ds_from_pandas(df)).to_pandas()
    assert len(out) == 6
    assert set(out.variable) == {"x", "y"}
    wide = out.pivot(index="id", columns="variable", values="value")
    assert (wide["x"].values == df.set_index("id")["x"].values).all()
    assert (wide["y"].values == df.set_index("id")["y"].astype(float).values).all()


def test_group_rollup_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y"], 200),
        "b": rng.choice(["p", "q", "r"], 200),
        "v": rng.normal(size=200).round(3),
    })
    out = build_op({
        "op": "group_rollup", "keys": ["a", "b"],
        "aggs": [("count", None, "n"), ("sum", "v", "s")],
    })(_ds_from_pandas(df)).to_pandas()
    ora = duckdb.connect().execute("""
        SELECT a, b, CAST(count(*) AS BIGINT) AS n, sum(v) AS s
        FROM df GROUP BY ROLLUP(a, b)
    """).fetchdf()
    key = ["a", "b"]
    out_s = out.sort_values(key, na_position="last").reset_index(drop=True)
    ora_s = ora.sort_values(key, na_position="last").reset_index(drop=True)
    assert len(out_s) == len(ora_s)
    assert (out_s["n"].values == ora_s["n"].values).all()
    np.testing.assert_allclose(out_s["s"].values, ora_s["s"].values,
                               atol=1e-9)


def test_group_rollup_rejects_mean():
    with pytest.raises(ValueError, match="not re-aggregable"):
        build_op({"op": "group_rollup", "keys": ["a"],
                  "aggs": [("mean", "v", "m")]})


def test_c4_line_filter_basics(ray_session):
    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "Good line with punctuation.\nshort.\nno terminal punct here",
            "contains javascript somewhere.\nAnother fine line here.",
            "this doc mentions lorem ipsum badly.\nGood line here though.",
            "every line fails",
        ],
    })
    out = build_op({"op": "c4_line_filter", "column": "text",
                    "min_words": 3})(_ds_from_pandas(df)) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 1: only line 1 survives (line 2 <3 words, line 3 no punct)
    # doc 2: javascript line dropped, second line kept
    # doc 3: whole doc banned (lorem ipsum)
    # doc 4: no surviving lines -> dropped
    assert list(out.doc_id) == [1, 2]
    assert out.loc[0, "text"] == "Good line with punctuation."
    assert out.loc[1, "text"] == "Another fine line here."
    assert out.loc[0, "n_lines_kept"] == 1
    assert out.loc[0, "n_lines_dropped"] == 2


def test_c4_line_filter_empty_and_null(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "text": [None, ""]})
    out = build_op({"op": "c4_line_filter", "column": "text"})(
        _ds_from_pandas(df)).to_pandas()
    assert len(out) == 0


def test_levenshtein_pairs_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(5)
    words = ["ray", "rays", "raze", "data", "date", "gate", "gaze",
             "flow", "flaw", "float", "table", "fable", "cable",
             "stream", "streams", "dream", "x", "", "abcdefgh"]
    df = pd.DataFrame({"s": rng.choice(words, 300)})
    out = build_op({"op": "levenshtein_pairs", "col": "s", "k": 2})(
        _ds_from_pandas(df)).to_pandas()
    ora = duckdb.connect().execute("""
        WITH names AS (SELECT DISTINCT s FROM df)
        SELECT a.s AS s_a, b.s AS s_b,
               CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        FROM names a JOIN names b ON a.s < b.s
        WHERE levenshtein(a.s, b.s) <= 2
    """).fetchdf()
    key = ["s_a", "s_b"]
    out_s = out.sort_values(key).reset_index(drop=True)
    ora_s = ora.sort_values(key).reset_index(drop=True)
    assert len(out_s) == len(ora_s), (len(out_s), len(ora_s))
    pd.testing.assert_frame_equal(out_s[["s_a", "s_b", "dist"]],
                                  ora_s[["s_a", "s_b", "dist"]],
                                  check_dtype=False)


def test_levenshtein_pairs_no_duplicate_emission(ray_session):
    # strings whose length buckets straddle a band boundary (k=1 ->
    # band width 2): lengths 3 and 4 land in bands 1 and 2 — the
    # replica rule must emit the pair exactly once
    df = pd.DataFrame({"s": ["abc", "abcd", "abce", "ab"]})
    out = build_op({"op": "levenshtein_pairs", "col": "s", "k": 1})(
        _ds_from_pandas(df)).to_pandas()
    assert not out.duplicated(["s_a", "s_b"]).any()
    got = set(map(tuple, out[["s_a", "s_b"]].values))
    assert ("abc", "abcd") in got and ("abcd", "abce") in got
    assert ("ab", "abc") in got


def test_levenshtein_pairs_max_len_guard(ray_session):
    df = pd.DataFrame({"s": ["x" * 100]})
    ds = _ds_from_pandas(df)
    with pytest.raises(Exception, match="max_len"):
        build_op({"op": "levenshtein_pairs", "col": "s", "k": 1,
                  "max_len": 64})(ds).to_pandas()


def test_scd2_history_intervals(ray_session):
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b", "b", "c"],
        "lsn": [1, 5, 9, 2, 7, 3],
        "op": ["update", "update", "delete", "update", "update",
               "delete"],
        "payload": ["v1", "v2", "-", "w1", "w2", "-"],
    })
    out = build_op({"op": "scd2_history", "keys": ["k"]})(
        _ds_from_pandas(df)).to_pandas() \
        .sort_values(["k", "valid_from"]).reset_index(drop=True)
    # key a: v1 [1,5), v2 [5,9) closed by the delete -> NO current row
    # key b: w1 [2,7), w2 [7,open) current
    # key c: delete only -> no rows at all
    assert list(out.k) == ["a", "a", "b", "b"]
    assert list(out.valid_from) == [1, 5, 2, 7]
    assert list(out.valid_to.fillna(-1).astype(int)) == [5, 9, 7, -1]
    assert list(out.is_current) == [0, 0, 0, 1]
    assert "op" not in out.columns and "_scd2_key" not in out.columns


def test_scd2_history_multi_key(ray_session):
    df = pd.DataFrame({
        "k1": [1, 1, 1], "k2": ["x", "x", "y"],
        "lsn": [10, 20, 15], "op": ["update"] * 3,
        "payload": ["a", "b", "c"],
    })
    out = build_op({"op": "scd2_history", "keys": ["k1", "k2"]})(
        _ds_from_pandas(df)).to_pandas() \
        .sort_values(["k2", "valid_from"]).reset_index(drop=True)
    assert list(out.valid_to.fillna(-1).astype(int)) == [20, -1, -1]
    assert list(out.is_current) == [0, 1, 1]


def test_group_approx_percentile_error_bound(ray_session):
    rng = np.random.default_rng(19)
    df = pd.DataFrame({"k": rng.integers(0, 4, 5000),
                       "v": rng.uniform(0, 100, 5000)})
    n_bins = 200  # bin width 0.5
    out = build_op({
        "op": "group_approx_percentile", "keys": ["k"], "value_col": "v",
        "quantiles": [0.5, 0.9], "lo": 0.0, "hi": 100.0,
        "n_bins": n_bins,
    })(_ds_from_pandas(df)).to_pandas().sort_values("k")
    width = 100.0 / n_bins
    for k, g in df.groupby("k"):
        vs = np.sort(g["v"].to_numpy())
        for q, col in [(0.5, "p50"), (0.9, "p90")]:
            exact = vs[max(1, int(np.ceil(q * len(vs)))) - 1]
            approx = out.loc[out.k == k, col].iloc[0]
            assert abs(approx - exact) <= width, (k, col, approx, exact)


def test_group_approx_percentile_exact_on_unit_bins(ray_session):
    rng = np.random.default_rng(23)
    df = pd.DataFrame({"k": rng.integers(0, 3, 2000),
                       "v": rng.integers(0, 50, 2000)})
    out = build_op({
        "op": "group_approx_percentile", "keys": ["k"], "value_col": "v",
        "quantiles": [0.25, 0.75], "lo": 0.0, "hi": 50.0, "n_bins": 50,
    })(_ds_from_pandas(df)).to_pandas().sort_values("k")
    for k, g in df.groupby("k"):
        vs = np.sort(g["v"].to_numpy())
        for q, col in [(0.25, "p25"), (0.75, "p75")]:
            exact = vs[max(1, int(np.ceil(q * len(vs)))) - 1]
            assert out.loc[out.k == k, col].iloc[0] == float(exact)


def test_group_approx_percentile_validation():
    with pytest.raises(ValueError, match="hi > lo"):
        build_op({"op": "group_approx_percentile", "keys": ["k"],
                  "value_col": "v", "quantiles": [0.5], "lo": 5.0,
                  "hi": 5.0})


def test_explain_classifies_all_ops():
    from rayflow.ops import OPS
    from rayflow.pipeline import EXCHANGE_CLASS

    missing = set(OPS) - set(EXCHANGE_CLASS)
    assert not missing, f"ops without an exchange class: {sorted(missing)}"


def test_explain_plan_annotation():
    from rayflow.pipeline import explain

    r = explain("""
steps:
  - {op: filter, predicate: "(> (col v) 1)"}
  - {op: group_agg, keys: [k], aggs: [[sum, v, s]]}
  - {op: sort, keys: [s]}
""")
    assert r["ok"]
    assert [s["exchange"] for s in r["stages"]] == [
        "row-local", "keyed", "global"]
    assert r["summary"] == {"row-local": 1, "keyed": 1, "global": 1}


def test_explain_reports_bad_config():
    from rayflow.pipeline import explain

    r = explain("steps:\n  - {op: not_an_op}\n")
    assert not r["ok"] and r["errors"]


# ------------------------------------------------------------- examples dir


def test_examples_lint_and_explain():
    import glob

    from rayflow.pipeline import explain, lint

    paths = sorted(glob.glob("examples/*.yaml"))
    assert len(paths) >= 3
    for p in paths:
        assert lint(p)["ok"], p
        r = explain(p)
        assert r["ok"] and r["stages"], p
        assert all(s["exchange"] != "unclassified" for s in r["stages"]), p


def test_example_pipeline_runs(ray_session, tmp_path):
    import yaml

    from rayflow.pipeline import from_yaml

    conf = yaml.safe_load(open("examples/reshape_orders.yaml"))
    conf["output"]["path"] = str(tmp_path / "out")
    import ray.data  # noqa: F401

    from rayflow.pipeline import Pipeline

    Pipeline.from_dict(conf).run()
    import pyarrow.dataset as pds

    t = pds.dataset(str(tmp_path / "out")).to_table()
    assert t.num_rows >= 3  # one row per priority
    assert {"total_F", "total_O", "total_P"} <= set(t.column_names)


def test_group_mode_matches_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(31)
    df = pd.DataFrame({"k": rng.integers(0, 6, 500),
                       "v": rng.choice(list("abcd"), 500)})
    out = build_op({"op": "group_mode", "keys": ["k"], "value_col": "v",
                    "count_out": "n"})(_ds_from_pandas(df)).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    ora = duckdb.connect().execute("""
        WITH c AS (SELECT k, v, count(*) AS n FROM df GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY k
                        ORDER BY n DESC, v) AS rn FROM c)
        SELECT k, v AS mode, CAST(n AS BIGINT) AS n FROM r WHERE rn = 1
        ORDER BY k
    """).fetchdf()
    pd.testing.assert_frame_equal(out[["k", "mode", "n"]], ora,
                                  check_dtype=False)


def test_funnel_greedy_earliest_and_within(ray_session):
    df = pd.DataFrame({
        "u": [1, 1, 1, 1,  2, 2,  3, 3, 3],
        "s": ["a", "b", "c", "b",  "a", "c",  "a", "b", "c"],
        "t": [1.0, 3.0, 5.0, 4.0,  1.0, 2.0,  1.0, 10.0, 11.0],
    })
    out = build_op({"op": "funnel", "key_col": "u", "step_col": "s",
                    "order_col": "t", "steps": ["a", "b", "c"]})(
        _ds_from_pandas(df)).to_pandas().set_index("u").sort_index()
    # u1: a@1 -> earliest b@3 -> c@5 (greedy takes b@3 not b@4)
    assert out.loc[1, "reached"] == 3
    assert out.loc[1, "step2_order"] == 3.0
    # u2: a@1, no b -> c unreachable even though c@2 exists
    assert out.loc[2, "reached"] == 1
    assert np.isnan(out.loc[2, "step2_order"])
    # u3 completes without a bound
    assert out.loc[3, "reached"] == 3

    out_w = build_op({"op": "funnel", "key_col": "u", "step_col": "s",
                      "order_col": "t", "steps": ["a", "b", "c"],
                      "within": 5.0})(
        _ds_from_pandas(df)).to_pandas().set_index("u").sort_index()
    # u3's b@10 is outside a@1 + 5 -> funnel stops at step 1
    assert out_w.loc[3, "reached"] == 1
    assert out_w.loc[1, "reached"] == 3


def test_funnel_never_started_key_absent(ray_session):
    df = pd.DataFrame({"u": [9, 9], "s": ["b", "c"], "t": [1.0, 2.0]})
    out = build_op({"op": "funnel", "key_col": "u", "step_col": "s",
                    "order_col": "t", "steps": ["a", "b"]})(
        _ds_from_pandas(df)).to_pandas()
    assert len(out) == 0


def test_dup_span_remove_keeps_first_occurrence(ray_session):
    shared = " ".join(f"s{i}" for i in range(12))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "alpha one " + shared + " endone lastone",
            "beta two " + shared + " endtwo lasttwo",
            "clean doc with no duplication at all here",
        ],
    })
    out = build_op({"op": "dup_span_remove", "k_tokens": 12})(
        _ds_from_pandas(df)).to_pandas().set_index("doc_id").sort_index()
    # doc 1 (first occurrence) untouched, verbatim
    assert out.loc[1, "text"] == df.set_index("doc_id").loc[1, "text"]
    assert out.loc[1, "n_tokens_removed"] == 0
    # doc 2 loses the shared span, keeps its own tokens
    assert shared not in out.loc[2, "text"]
    assert "beta" in out.loc[2, "text"] and "lasttwo" in out.loc[2, "text"]
    assert out.loc[2, "n_tokens_removed"] >= 12
    # untouched doc passes through verbatim
    assert out.loc[3, "text"] == df.set_index("doc_id").loc[3, "text"]


def test_dup_span_remove_same_doc_repeat(ray_session):
    span = " ".join(f"r{i}" for i in range(10))
    df = pd.DataFrame({
        "doc_id": [7],
        "text": [span + " middle filler words " + span],
    })
    out = build_op({"op": "dup_span_remove", "k_tokens": 10})(
        _ds_from_pandas(df)).to_pandas()
    txt = out.loc[0, "text"]
    # first occurrence survives, second removed
    assert txt.count("r0") == 1 and txt.count("r9") == 1
    assert "middle filler words" in txt
    assert out.loc[0, "n_tokens_removed"] == 10


def test_dup_span_remove_then_detect_is_empty(ray_session):
    shared = " ".join(f"q{i}" for i in range(15))
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            f"u{j} v{j} " + shared + f" w{j} x{j}" for j in (1, 2, 3)
        ],
    })
    cleaned = build_op({"op": "dup_span_remove", "k_tokens": 15})(
        _ds_from_pandas(df)).to_pandas()
    pairs = build_op({"op": "dup_span_pairs", "k_tokens": 15})(
        _ds_from_pandas(cleaned[["doc_id", "text"]])).to_pandas()
    assert len(pairs) == 0


def test_group_zscore_modes(ray_session):
    rng = np.random.default_rng(41)
    v = np.concatenate([rng.normal(10, 2, 200), [1000.0]])  # one outlier
    df = pd.DataFrame({"k": ["a"] * 201, "v": v})
    trim = build_op({"op": "group_zscore", "keys": ["k"],
                     "value_col": "v", "mode": "trim",
                     "threshold": 5.0})(_ds_from_pandas(df)).to_pandas()
    assert len(trim) == 200 and trim.v.max() < 1000
    flag = build_op({"op": "group_zscore", "keys": ["k"],
                     "value_col": "v", "mode": "flag",
                     "threshold": 5.0})(_ds_from_pandas(df)).to_pandas()
    assert flag.zscore_outlier.sum() == 1
    # constant / singleton keys: null z, never trimmed
    df2 = pd.DataFrame({"k": ["c", "c", "s"], "v": [5.0, 5.0, 7.0]})
    out2 = build_op({"op": "group_zscore", "keys": ["k"],
                     "value_col": "v", "mode": "trim"})(
        _ds_from_pandas(df2)).to_pandas()
    assert len(out2) == 3


def test_pivot_mean_null_semantics_vs_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(3)
    df = pd.DataFrame({"k": rng.integers(0, 4, 200),
                       "p": rng.choice(["a", "b"], 200),
                       "v": rng.normal(size=200)})
    out = build_op({"op": "pivot", "keys": ["k"], "pivot_col": "p",
                    "value_col": "v", "values": ["a", "b"],
                    "agg": "mean"})(_ds_from_pandas(df)).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    ora = duckdb.connect().execute("""
        SELECT k, avg(CASE WHEN p='a' THEN v END) a,
               avg(CASE WHEN p='b' THEN v END) b
        FROM df GROUP BY k ORDER BY k""").fetchdf()
    np.testing.assert_allclose(out[["a", "b"]].values,
                               ora[["a", "b"]].values, rtol=1e-9)


def test_pagerank_star_graph(ray_session):
    # star: hub connected to 5 leaves (undirected) -> hub rank highest,
    # leaves equal; ranks sum to 1
    df = pd.DataFrame({"src": ["h"] * 5,
                       "dst": [f"l{i}" for i in range(5)]})
    out = build_op({"op": "pagerank", "n_iter": 10})(
        _ds_from_pandas(df)).to_pandas().set_index("node")
    assert abs(out["rank"].sum() - 1.0) < 1e-9
    hub = out.loc["h", "rank"]
    leaves = out.drop(index="h")["rank"]
    assert (hub > leaves).all()
    assert np.allclose(leaves, leaves.iloc[0], rtol=1e-12)


def test_pagerank_multi_edge_weighting(ray_session):
    # duplicate edge doubles the walk weight toward that neighbor
    df1 = pd.DataFrame({"src": ["a", "a"], "dst": ["b", "c"]})
    df2 = pd.DataFrame({"src": ["a", "a", "a"], "dst": ["b", "b", "c"]})
    r1 = build_op({"op": "pagerank", "n_iter": 5})(
        _ds_from_pandas(df1)).to_pandas().set_index("node")["rank"]
    r2 = build_op({"op": "pagerank", "n_iter": 5})(
        _ds_from_pandas(df2)).to_pandas().set_index("node")["rank"]
    assert abs(r1["b"] - r1["c"]) < 1e-12        # symmetric
    assert r2["b"] > r2["c"]                     # multiplicity counts


def test_interval_coalesce_islands(ray_session):
    df = pd.DataFrame({
        "k": ["a", "a", "a", "a", "b"],
        "s": [1.0, 2.0, 10.0, 11.5, 0.0],
        "e": [3.0, 5.0, 11.0, 12.0, 100.0],
    })
    out = build_op({"op": "interval_coalesce", "key_col": "k",
                    "start_col": "s", "end_col": "e"})(
        _ds_from_pandas(df)).to_pandas() \
        .sort_values(["k", "s"]).reset_index(drop=True)
    # a: [1,5] (two merged), [10,12] (two merged: 11.5 <= 11 running max? no —
    # 11.5 > 11 would break; touching rule: start <= running max merges)
    a = out[out.k == "a"]
    assert len(a) == 3  # [1,5], [10,11], [11.5,12]
    assert list(a.n_merged) == [2, 1, 1]
    b = out[out.k == "b"]
    assert len(b) == 1 and b.iloc[0].n_merged == 1


def test_interval_coalesce_contained_intervals(ray_session):
    # an interval fully containing later ones keeps the island open
    df = pd.DataFrame({"k": [1, 1, 1], "s": [0.0, 2.0, 8.0],
                       "e": [10.0, 3.0, 12.0]})
    out = build_op({"op": "interval_coalesce", "key_col": "k",
                    "start_col": "s", "end_col": "e"})(
        _ds_from_pandas(df)).to_pandas()
    assert len(out) == 1
    assert out.iloc[0].s == 0.0 and out.iloc[0].e == 12.0
    assert out.iloc[0].n_merged == 3


def test_set_op_vs_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(47)
    a = pd.DataFrame({"x": rng.integers(0, 20, 100),
                      "y": rng.choice(["p", "q", None], 100)})
    b = pd.DataFrame({"x": rng.integers(10, 30, 100),
                      "y": rng.choice(["p", "q", None], 100)})
    con = duckdb.connect()
    for how, sql in [("intersect", "SELECT * FROM a INTERSECT SELECT * FROM b"),
                     ("except", "SELECT * FROM a EXCEPT SELECT * FROM b"),
                     ("union_distinct", "SELECT * FROM a UNION SELECT * FROM b")]:
        out = build_op({"op": "set_op", "other": _ds_from_pandas(b),
                        "how": how})(_ds_from_pandas(a)).to_pandas()
        ora = con.execute(sql).fetchdf()
        key = ["x", "y"]
        o1 = out.sort_values(key, na_position="last").reset_index(drop=True)
        o2 = ora.sort_values(key, na_position="last").reset_index(drop=True)
        assert len(o1) == len(o2), (how, len(o1), len(o2))
        assert (o1.fillna("~") == o2.fillna("~")).all().all(), how


def test_set_op_rejects_mismatched_columns(ray_session):
    a = _ds_from_pandas(pd.DataFrame({"x": [1]}))
    b = _ds_from_pandas(pd.DataFrame({"z": [1]}))
    with pytest.raises(ValueError, match="column sets differ"):
        build_op({"op": "set_op", "other": b})(a)


def test_grouping_sets_explicit_vs_duckdb(ray_session):
    import duckdb

    rng = np.random.default_rng(53)
    df = pd.DataFrame({"a": rng.choice(["x", "y"], 150),
                       "b": rng.choice(["p", "q"], 150),
                       "v": rng.normal(size=150).round(2)})
    out = build_op({
        "op": "group_grouping_sets", "keys": ["a", "b"],
        "sets": [["a"], ["b"]],
        "aggs": [("sum", "v", "s"), ("count", None, "n")],
    })(_ds_from_pandas(df)).to_pandas()
    ora = duckdb.connect().execute("""
        SELECT a, b, sum(v) AS s, CAST(count(*) AS BIGINT) AS n
        FROM df GROUP BY GROUPING SETS ((a), (b))""").fetchdf()
    key = ["a", "b"]
    o1 = out.sort_values(key, na_position="last").reset_index(drop=True)
    o2 = ora.sort_values(key, na_position="last").reset_index(drop=True)
    assert len(o1) == len(o2)
    assert (o1.n.values == o2.n.values).all()
    np.testing.assert_allclose(o1.s.values, o2.s.values, atol=1e-9)


def test_grouping_sets_rejects_bad_set():
    with pytest.raises(ValueError, match="not a subset"):
        build_op({"op": "group_grouping_sets", "keys": ["a"],
                  "sets": [["z"]], "aggs": [("sum", "v", "s")]})


def test_levenshtein_pairs_cross_table(ray_session):
    import duckdb

    lt = pd.DataFrame({"name": ["ray", "data", "flow", "gate", "x"]})
    rt = pd.DataFrame({"s": ["rays", "date", "float", "gaze",
                             "gate", "zzz"]})
    out = build_op({"op": "levenshtein_pairs", "col": "name", "k": 2,
                    "right": _ds_from_pandas(rt),
                    "right_col": "s"})(
        _ds_from_pandas(lt)).to_pandas()
    ora = duckdb.connect().execute("""
        SELECT l.name AS s_a, r.s AS s_b,
               CAST(levenshtein(l.name, r.s) AS BIGINT) AS dist
        FROM lt l JOIN rt r ON levenshtein(l.name, r.s) <= 2
    """).fetchdf()
    key = ["s_a", "s_b"]
    o1 = out.sort_values(key).reset_index(drop=True)
    o2 = ora.sort_values(key).reset_index(drop=True)
    assert len(o1) == len(o2), (sorted(map(tuple, o1[key].values)),
                                sorted(map(tuple, o2[key].values)))
    pd.testing.assert_frame_equal(o1[["s_a", "s_b", "dist"]],
                                  o2[["s_a", "s_b", "dist"]],
                                  check_dtype=False)
    # exact cross hits (dist 0) are included
    assert ((o1.s_a == "gate") & (o1.s_b == "gate")).any()


def test_group_moving_agg_vs_pandas_rolling(ray_session):
    rng = np.random.default_rng(61)
    df = pd.DataFrame({"k": rng.integers(0, 5, 400),
                       "o": np.arange(400),
                       "v": rng.normal(size=400)})
    df.loc[df.sample(40, random_state=1).index, "v"] = np.nan
    out = build_op({
        "op": "group_moving_agg", "key_col": "k", "order_col": "o",
        "value_col": "v", "window": 3, "fns": ["sum", "mean", "count"],
    })(_ds_from_pandas(df)).to_pandas().sort_values("o") \
        .reset_index(drop=True)
    exp = df.sort_values(["k", "o"]).reset_index(drop=True)
    roll = exp.groupby("k")["v"].rolling(3, min_periods=1)
    exp["sum"] = roll.sum().reset_index(level=0, drop=True)
    exp["mean"] = roll.mean().reset_index(level=0, drop=True)
    exp["count"] = roll.count().reset_index(level=0, drop=True)
    exp = exp.sort_values("o").reset_index(drop=True)
    np.testing.assert_allclose(out["v_mov_sum"], exp["sum"],
                               atol=1e-9, equal_nan=True)
    np.testing.assert_allclose(out["v_mov_mean"], exp["mean"],
                               atol=1e-9, equal_nan=True)
    assert (out["v_mov_count"].values == exp["count"].values).all()


def test_group_moving_agg_validation():
    with pytest.raises(ValueError, match="window must be"):
        build_op({"op": "group_moving_agg", "key_col": "k",
                  "order_col": "o", "value_col": "v", "window": 0})
    with pytest.raises(ValueError, match="sum/mean/count"):
        build_op({"op": "group_moving_agg", "key_col": "k",
                  "order_col": "o", "value_col": "v", "window": 2,
                  "fns": ["max"]})


def test_resample_ffill_gap_filling(ray_session):
    df = pd.DataFrame({
        "k": ["a", "a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-01 00:30", "2024-01-01 03:10",
                              "2024-01-01 05:00", "2024-01-01 01:00"]),
        "v": [1.0, 2.0, 3.0, 9.0],
    })
    out = build_op({"op": "resample_ffill", "key_col": "k",
                    "ts_col": "ts", "value_col": "v",
                    "interval_s": 3600.0})(
        _ds_from_pandas(df)).to_pandas().sort_values(["k", "tick"]) \
        .reset_index(drop=True)
    a = out[out.k == "a"]
    # grid: 01:00..05:00 inclusive -> 5 ticks; ffill across the gap
    assert len(a) == 5
    assert list(a.v) == [1.0, 1.0, 1.0, 2.0, 3.0]
    b = out[out.k == "b"]
    assert len(b) == 1 and b.iloc[0].v == 9.0  # span == one tick


def test_resample_ffill_tick_guard(ray_session):
    df = pd.DataFrame({
        "k": ["x", "x"],
        "ts": pd.to_datetime(["2024-01-01", "2034-01-01"]),
        "v": [1.0, 2.0],
    })
    ds = _ds_from_pandas(df)
    with pytest.raises(Exception, match="max_ticks_per_key"):
        build_op({"op": "resample_ffill", "key_col": "k",
                  "ts_col": "ts", "value_col": "v", "interval_s": 1.0,
                  "max_ticks_per_key": 1000})(ds).to_pandas()


def test_tfidf_values_vs_sklearn_style_reference(ray_session):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["cat dog cat", "dog fish", "cat fish fish fish"],
    })
    out = build_op({"op": "tfidf"})(_ds_from_pandas(docs)).to_pandas()
    # cat: df=2, dog: df=2, fish: df=2 -> idf = ln(3/2) for all
    idf = np.log(3 / 2)
    got = {(r.doc_id, r.term): (r.tf, r.df, r.tfidf)
           for r in out.itertuples()}
    assert got[(1, "cat")] == (2, 2, 2 * idf)
    assert got[(2, "fish")] == (1, 2, 1 * idf)
    assert got[(3, "fish")] == (3, 2, 3 * idf)
    assert len(out) == 6  # distinct (doc, term) pairs


def test_tfidf_top_k_deterministic_ties(ray_session):
    docs = pd.DataFrame({"doc_id": [1], "text": ["b a c"]})
    out = build_op({"op": "tfidf", "top_k": 2})(
        _ds_from_pandas(docs)).to_pandas()
    # all tf-idf equal (each term once, df=1) -> tie broken term asc
    assert list(out.sort_values("term").term) == ["a", "b"]


def test_group_corr_vs_duckdb_with_nulls(ray_session):
    import duckdb

    rng = np.random.default_rng(67)
    df = pd.DataFrame({"k": rng.integers(0, 4, 500),
                       "x": rng.normal(size=500),
                       "y": rng.normal(size=500)})
    df["y"] += 0.5 * df["x"]  # real correlation
    df.loc[df.sample(50, random_state=2).index, "x"] = np.nan
    out = build_op({"op": "group_corr", "keys": ["k"], "x_col": "x",
                    "y_col": "y"})(_ds_from_pandas(df)).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    ora = duckdb.connect().execute(
        "SELECT k, corr(x, y) AS corr FROM df GROUP BY k ORDER BY k"
    ).fetchdf()
    np.testing.assert_allclose(out["corr"], ora["corr"], atol=1e-9)


def test_group_corr_degenerate_keys(ray_session):
    df = pd.DataFrame({"k": ["const", "const", "single"],
                       "x": [1.0, 1.0, 3.0], "y": [2.0, 5.0, 4.0]})
    out = build_op({"op": "group_corr", "keys": ["k"], "x_col": "x",
                    "y_col": "y"})(_ds_from_pandas(df)).to_pandas() \
        .set_index("k")
    assert np.isnan(out.loc["const", "corr"])   # zero x-variance
    assert np.isnan(out.loc["single", "corr"])  # n < 2


def test_group_moments_vs_scipy_style_reference(ray_session):
    rng = np.random.default_rng(71)
    df = pd.DataFrame({"k": rng.integers(0, 3, 600),
                       "v": rng.gamma(2.0, 3.0, 600)})  # skewed
    out = build_op({"op": "group_moments", "keys": ["k"],
                    "value_col": "v", "prefix": ""})(
        _ds_from_pandas(df)).to_pandas().set_index("k").sort_index()
    for k, g in df.groupby("k"):
        v = g["v"].to_numpy()
        mu = v.mean()
        m2 = ((v - mu) ** 2).mean()
        m3 = ((v - mu) ** 3).mean()
        m4 = ((v - mu) ** 4).mean()
        assert abs(out.loc[k, "mean"] - mu) < 1e-9
        assert abs(out.loc[k, "var"] - v.var(ddof=1)) < 1e-8
        assert abs(out.loc[k, "skew"] - m3 / m2 ** 1.5) < 1e-8
        assert abs(out.loc[k, "kurt"] - (m4 / m2 ** 2 - 3)) < 1e-8


def test_group_moments_degenerate(ray_session):
    df = pd.DataFrame({"k": ["c", "c", "s"], "v": [5.0, 5.0, 1.0]})
    out = build_op({"op": "group_moments", "keys": ["k"],
                    "value_col": "v", "prefix": ""})(
        _ds_from_pandas(df)).to_pandas().set_index("k")
    assert np.isnan(out.loc["c", "skew"])   # zero variance
    assert np.isnan(out.loc["s", "var"])    # n == 1
