"""Tests for the corpus-curation operators (rayflow/ops/curation.py)
and the distributed k-means op (rayflow/ops/ann.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayflow.ops import build_op


def _docs(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


# -- pii_redact ------------------------------------------------------------


def test_pii_redact_patterns(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs([
        "mail me at jane.doe+x@sub.example.org today",
        "server 192.168.0.1 and backup 10.0.0.255 are up",
        "call +4915112345678 now",
        "clean text with no pii at all",
        "combo a@b.co 1.2.3.4 +1234567",
    ]))
    out = build_op({"op": "pii_redact"})(ds).to_pandas().sort_values("doc_id")
    t = list(out["text"])
    assert t[0] == "mail me at <EMAIL> today"
    assert t[1] == "server <IP> and backup <IP> are up"
    assert t[2] == "call <PHONE> now"
    assert t[3] == "clean text with no pii at all"
    assert t[4] == "combo <EMAIL> <IP> <PHONE>"


def test_pii_redact_out_column_preserves_original(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs(["x a@b.co y"]))
    out = build_op({"op": "pii_redact", "out": "redacted"})(ds).to_pandas()
    assert out["text"][0] == "x a@b.co y"
    assert out["redacted"][0] == "x <EMAIL> y"


# -- gopher_quality --------------------------------------------------------


def test_gopher_quality_metrics(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs([
        "the cat the cat the cat",         # heavy repetition
        "all words here are fully unique", # no repetition
    ]))
    out = build_op({"op": "gopher_quality"})(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 0: 6 words, 2 unique, top word 3/6, bigram "the cat" 3/5
    assert out["n_words"][0] == 6
    assert out["n_unique_words"][0] == 2
    assert out["dup_word_frac"][0] == 1.0 - 2.0 / 6.0
    assert out["top_word_frac"][0] == 0.5
    assert out["stopword_frac"][0] == 0.5          # "the" ×3 of 6
    assert out["top_bigram_frac"][0] == 3.0 / 5.0
    # doc 1: all 6 words unique
    assert out["n_words"][1] == 6
    assert out["dup_word_frac"][1] == 0.0
    assert out["top_word_frac"][1] == 1.0 / 6.0
    assert out["top_bigram_frac"][1] == 1.0 / 5.0


def test_gopher_quality_empty_and_spaces(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs(["", "   ", "one"]))
    out = build_op({"op": "gopher_quality"})(ds).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["n_words"]) == [0, 0, 1]
    assert out["top_word_frac"][2] == 1.0


# -- decontaminate ---------------------------------------------------------


def test_decontaminate_substring(ray_session):
    import ray.data as rd

    bench = ["what is the capital of france and of italy too?" * 2]
    snip = bench[0][:40]
    ds = rd.from_arrow(_docs([
        f"some scraped page ... {snip} ... more junk",
        "a perfectly clean training document",
    ]))
    out = build_op({
        "op": "decontaminate", "bench": bench, "mode": "substring",
        "snip_len": 40,
    })(ds).to_pandas().sort_values("doc_id")
    assert list(out["contaminated"]) == [True, False]


def test_decontaminate_substring_hashed_path(ray_session):
    """Past hash_threshold snippets the op switches to the rolling-hash
    prefilter + exact confirm — answers must be identical."""
    import ray.data as rd

    bench = [f"benchmark question number {i:04d} asks about topic {i * 3}"
             for i in range(50)]
    docs = [f"scraped page embedding: {bench[7]} plus chatter",
            f"another page with {bench[33]} inside",
            "clean doc mentioning benchmark question but not verbatim no",
            "benchmark question number 9999 asks about nothing planted"]
    ds = rd.from_arrow(_docs(docs))
    lo = build_op({"op": "decontaminate", "bench": bench, "mode": "substring",
                   "snip_len": 40, "hash_threshold": 10_000})(ds).to_pandas() \
        .sort_values("doc_id")
    hi = build_op({"op": "decontaminate", "bench": bench, "mode": "substring",
                   "snip_len": 40, "hash_threshold": 1})(ds).to_pandas() \
        .sort_values("doc_id")
    assert list(lo["contaminated"]) == list(hi["contaminated"])
    assert list(hi["contaminated"]) == [True, True, False, False]


def test_decontaminate_ngram(ray_session):
    import ray.data as rd

    bench_sent = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
                 "lambda mu nu xi omicron"
    ds = rd.from_arrow(_docs([
        f"leading words then {bench_sent} trailing words",   # contains 13-gram
        "alpha beta gamma delta but then it diverges entirely from the eval "
        "set and keeps its own words going on",              # shares only 4-gram
        "totally unrelated corpus document about trains",
    ]))
    out = build_op({
        "op": "decontaminate", "bench": [bench_sent], "mode": "ngram",
        "n": 13,
    })(ds).to_pandas().sort_values("doc_id")
    assert list(out["contaminated"]) == [True, False, False]


# -- ngram_topk ------------------------------------------------------------


def test_ngram_topk_counts(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs([
        "big data big data big data",
        "data big data",
        "big data",
    ]))
    out = build_op({"op": "ngram_topk", "n": 2, "k": 3})(ds).to_pandas()
    counts = dict(zip(out["ngram"], out["n_occurrences"]))
    # "big data": 3 + 1 + 1; "data big": 2 + 1; bigrams never cross docs
    assert counts["big data"] == 5
    assert counts["data big"] == 3


def test_ngram_topk_trigram_and_order(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs(["a b c a b c a b c", "x y z"]))
    out = build_op({"op": "ngram_topk", "n": 3, "k": 2})(ds).to_pandas()
    assert list(out["ngram"])[0] == "a b c"
    assert list(out["n_occurrences"])[0] == 3


# -- kmeans ----------------------------------------------------------------


def _blob_table(n_per=40, k=3, d=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, d)) * 5
    vecs, labels = [], []
    for c in range(k):
        pts = centers[c] + rng.normal(size=(n_per, d)) * 0.05
        vecs.extend(pts.astype(np.float32).tolist())
        labels.extend([c] * n_per)
    return pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int64()),
    })


def test_kmeans_recovers_planted_blobs(ray_session):
    import ray.data as rd

    tbl = _blob_table()
    ds = rd.from_arrow(tbl)
    out = build_op({
        "op": "kmeans", "n_clusters": 3, "n_iter": 5, "seed": 3,
    })(ds).to_pandas()
    # every planted blob must map to exactly one cluster id (purity 1.0)
    purity = out.groupby("label")["cluster"].nunique()
    assert (purity == 1).all()
    assert out.groupby("cluster")["label"].nunique().eq(1).all()


def test_kmeans_zero_iter_pinned_centroids(ray_session):
    import ray.data as rd

    tbl = _blob_table(n_per=10, k=2, d=8)
    ds = rd.from_arrow(tbl)
    out = build_op({
        "op": "kmeans", "n_clusters": 2, "n_iter": 0, "init_ids": [0, 10],
    })(ds).to_pandas()
    # centroid 0 = first blob's point, centroid 1 = second blob's point:
    # assignment equals the planted label
    assert (out["cluster"] == out["label"]).all()


# -- stratified_sample -----------------------------------------------------


def test_stratified_sample_deterministic_quota(ray_session):
    import hashlib

    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(range(100), pa.int64()),
        "source": pa.array([f"s{i % 3}" for i in range(100)]),
    })
    ds = rd.from_arrow(tbl)
    conf = {"op": "stratified_sample", "keys": ["source"], "n": 4,
            "id_col": "doc_id"}
    a = build_op(conf)(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    b = build_op(conf)(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id", ignore_index=True)
    assert a.equals(b)                       # deterministic
    assert (a.groupby("source").size() == 4).all()
    # agrees with the definition: smallest md5(doc_id) per source
    for src in ("s0", "s1", "s2"):
        ids = [i for i in range(100) if f"s{i % 3}" == src]
        want = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode())
                                          .hexdigest(), i))[:4]
        got = sorted(a[a["source"] == src]["doc_id"])
        assert got == sorted(want)


# -- pack_chunks -----------------------------------------------------------


def test_pack_chunks_matches_serial_cumsum(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    sizes = rng.integers(50, 400, size=500).astype(np.int64)
    tbl = pa.table({
        "doc_id": pa.array(range(500), pa.int64()),
        "nsz": pa.array(sizes, pa.int64()),
    })
    # force many buckets AND many blocks so bucket offsets matter
    ds = rd.from_arrow(tbl).repartition(7)
    out = build_op({
        "op": "pack_chunks", "size_col": "nsz", "capacity": 1000,
        "order_col": "doc_id", "bucket_rows": 32,
    })(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    before = np.concatenate(([0], np.cumsum(sizes)))[:-1]
    assert list(out["chunk_id"]) == list(before // 1000)


def test_pack_chunks_chunk_budget(ray_session):
    """Rows assigned to one chunk start within one capacity window."""
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "nsz": pa.array([100] * 60, pa.int64()),
    })
    out = build_op({
        "op": "pack_chunks", "size_col": "nsz", "capacity": 500,
        "order_col": "doc_id", "bucket_rows": 16,
    })(rd.from_arrow(tbl)).to_pandas()
    # 100-unit docs, 500 capacity -> exactly 5 docs per chunk
    assert (out.groupby("chunk_id").size() == 5).all()


# -- group_percentile ------------------------------------------------------


def test_group_percentile_exact(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1000, size=900).astype(np.int64)
    grp = np.array(["a", "b", "c"])[rng.integers(0, 3, size=900)]
    tbl = pa.table({"g": pa.array(grp), "v": pa.array(vals, pa.int64())})
    out = build_op({
        "op": "group_percentile", "keys": ["g"], "value_col": "v",
        "quantiles": [0.5, 0.9],
    })(rd.from_arrow(tbl).repartition(5)).to_pandas().set_index("g")
    for g in ("a", "b", "c"):
        s = np.sort(vals[grp == g])
        n = len(s)
        assert out.loc[g, "p50"] == s[int(np.ceil(0.5 * n)) - 1]
        assert out.loc[g, "p90"] == s[int(np.ceil(0.9 * n)) - 1]


def test_group_percentile_single_row_groups(ray_session):
    import ray.data as rd

    tbl = pa.table({"g": pa.array(["x", "y"]), "v": pa.array([7, 3], pa.int64())})
    out = build_op({
        "op": "group_percentile", "keys": ["g"], "value_col": "v",
        "quantiles": [0.5],
    })(rd.from_arrow(tbl)).to_pandas().set_index("g")
    assert out.loc["x", "p50"] == 7
    assert out.loc["y", "p50"] == 3


# -- asof_join -------------------------------------------------------------


def test_asof_join_backward_forward(ray_session):
    import ray.data as rd

    l = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "t": pa.array([5, 9, 3], pa.int64()),
                  "v": pa.array([10, 20, 30], pa.int64())})
    r = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "t": pa.array([4, 8, 10], pa.int64()),
                  "price": pa.array([100, 200, 300], pa.int64())})
    back = build_op({"op": "asof_join", "right": rd.from_arrow(r),
                     "on": "k", "time_col": "t"})(rd.from_arrow(l)) \
        .to_pandas().sort_values(["k", "t"], ignore_index=True)
    assert list(back["price"]) == [100, 200, None] or \
        back["price"].tolist()[:2] == [100, 200] and \
        back["price"].isna().tolist() == [False, False, True]
    assert back["v"].dtype.kind in "i"       # int dtype restored
    fwd = build_op({"op": "asof_join", "right": rd.from_arrow(r),
                    "on": "k", "time_col": "t",
                    "direction": "forward"})(rd.from_arrow(l)) \
        .to_pandas().sort_values(["k", "t"], ignore_index=True)
    assert fwd["price"].tolist() == [200, None, 300] or (
        fwd["price"].iloc[0] == 200 and fwd["price"].iloc[2] == 300
        and np.isnan(fwd["price"].iloc[1]))


def test_asof_join_column_collision_suffix(ray_session):
    import ray.data as rd

    l = pa.table({"k": pa.array([1], pa.int64()),
                  "t": pa.array([5], pa.int64()),
                  "v": pa.array([10], pa.int64())})
    r = pa.table({"k": pa.array([1], pa.int64()),
                  "t": pa.array([4], pa.int64()),
                  "v": pa.array([99], pa.int64())})
    out = build_op({"op": "asof_join", "right": rd.from_arrow(r),
                    "on": "k", "time_col": "t"})(rd.from_arrow(l)).to_pandas()
    assert out["v"].iloc[0] == 10
    assert out["v_r"].iloc[0] == 99


def test_asof_join_key_without_right_rows(ray_session):
    import ray.data as rd

    l = pa.table({"k": pa.array([7, 8], pa.int64()),
                  "t": pa.array([1, 2], pa.int64())})
    r = pa.table({"k": pa.array([7], pa.int64()),
                  "t": pa.array([0], pa.int64()),
                  "x": pa.array([5], pa.int64())})
    out = build_op({"op": "asof_join", "right": rd.from_arrow(r),
                    "on": "k", "time_col": "t"})(rd.from_arrow(l)) \
        .to_pandas().sort_values("k", ignore_index=True)
    assert out["x"].iloc[0] == 5
    assert out["x"].isna().iloc[1]


def test_interval_join_pairs(ray_session):
    import ray.data as rd

    l = pa.table({"k": pa.array([1, 1, 1, 2], pa.int64()),
                  "t": pa.array([5, 15, 25, 5], pa.int64())})
    r = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                  "s": pa.array([0, 10, 100], pa.int64()),
                  "e": pa.array([20, 30, 200], pa.int64()),
                  "tag": pa.array(["a", "b", "c"])})
    out = build_op({"op": "interval_join", "right": rd.from_arrow(r),
                    "on": "k", "time_col": "t", "start_col": "s",
                    "end_col": "e"})(rd.from_arrow(l)).to_pandas()
    pairs = sorted(zip(out["t"], out["tag"]))
    # t=5 in [0,20]; t=15 in [0,20] and [10,30]; t=25 in [10,30];
    # key 2's t=5 matches nothing
    assert pairs == [(5, "a"), (15, "a"), (15, "b"), (25, "b")]


# -- approx_distinct (HyperLogLog) -----------------------------------------


def test_hll_register_math():
    from rayflow.ops.dedup import hll_estimate, hll_registers

    vals = pa.array([f"v{i}" for i in range(50_000)])
    est = hll_estimate(hll_registers(vals, p=12))
    assert abs(est - 50_000) / 50_000 < 0.05


def test_hll_mergeable():
    from rayflow.ops.dedup import hll_estimate, hll_registers

    a = hll_registers(pa.array([f"a{i}" for i in range(20_000)]), p=12)
    b = hll_registers(pa.array([f"b{i}" for i in range(20_000)]), p=12)
    dup = hll_registers(pa.array([f"a{i}" for i in range(20_000)]), p=12)
    merged = np.maximum(a, b)
    assert abs(hll_estimate(merged) - 40_000) / 40_000 < 0.05
    # merging a duplicate set must not change the estimate at all
    assert hll_estimate(np.maximum(a, dup)) == hll_estimate(a)


def test_approx_distinct_op(ray_session):
    import ray.data as rd

    n = 30_000
    tbl = pa.table({"u": pa.array([f"user{i % 7000}" for i in range(n)])})
    out = build_op({"op": "approx_distinct", "column": "u"})(
        rd.from_arrow(tbl).repartition(6)).to_pandas()
    est = int(out["approx_distinct"].iloc[0])
    assert abs(est - 7000) / 7000 < 0.05


def test_ngram_topk_string_fallback_matches_int_path(ray_session):
    """vocab × n big enough to overflow the combined int key must flip
    to the string-key path and still count exactly."""
    import ray.data as rd

    # vocab ~1000 uniques, n=7: 1001^7 ≈ 1e21 > 2^62 → fallback path
    filler = " ".join(f"w{i:03d}" for i in range(1000))
    phrase = "alpha beta gamma delta epsilon zeta eta"
    ds1 = rd.from_arrow(_docs([f"{phrase} {filler} {phrase}"]))
    out = build_op({"op": "ngram_topk", "n": 7, "k": 1})(ds1).to_pandas()
    assert out["ngram"].iloc[0] == phrase
    assert out["n_occurrences"].iloc[0] == 2


# -- connected_components --------------------------------------------------


def test_union_find_components():
    from rayflow.ops.dedup import union_find_components

    roots = union_find_components([(5, 3), (3, 9), (20, 21), (9, 1)])
    g = lambda n: roots.get(n, n)  # roots themselves carry no entry
    assert g(5) == g(3) == g(9) == g(1) == 1
    assert g(20) == g(21) == 20


def test_connected_components_op(ray_session):
    import ray.data as rd

    docs = pa.table({"doc_id": pa.array(range(10), pa.int64())})
    edges = pa.table({"doc_a": pa.array([2, 3, 7], pa.int64()),
                      "doc_b": pa.array([3, 8, 9], pa.int64())})
    out = build_op({
        "op": "connected_components", "edges": rd.from_arrow(edges),
    })(rd.from_arrow(docs)).to_pandas().sort_values("doc_id",
                                                    ignore_index=True)
    keep = dict(zip(out["doc_id"], out["keep_id"]))
    assert keep[2] == keep[3] == keep[8] == 2      # chain 2-3-8
    assert keep[7] == keep[9] == 7
    for i in (0, 1, 4, 5, 6):
        assert keep[i] == i                        # singletons keep self


def test_curation_ops_from_yaml_config(ray_session):
    """The curation plane is reachable from the declarative config
    surface (a user can run a quality-filter pipeline from YAML)."""
    from rayflow.pipeline import from_yaml

    p = from_yaml("""
input:
  op: read_parquet
  paths: /root/testdata/sf0.001/documents.parquet
  columns: [doc_id, text]
steps:
  - op: gopher_quality
  - op: filter
    predicate: [ge, [col, n_words], [lit, 10]]
  - op: pii_redact
  - op: token_count
""")
    out = p.run().to_pandas()
    assert len(out) > 100
    assert {"doc_id", "n_words", "dup_word_frac", "n_tokens"} <= set(out.columns)


def test_asof_join_shuffle_and_broadcast_agree(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(13)
    l = pa.table({
        "k": pa.array(rng.integers(0, 5, 200), pa.int64()),
        "t": pa.array(rng.integers(0, 1000, 200), pa.int64()),
        "v": pa.array(np.arange(200), pa.int64()),
    })
    rr = pa.table({
        "k": pa.array(rng.integers(0, 5, 50), pa.int64()),
        "t": pa.array(np.sort(rng.choice(1000, 50, replace=False)), pa.int64()),
        "price": pa.array(np.arange(50) * 10, pa.int64()),
    })
    kw = {"op": "asof_join", "on": "k", "time_col": "t"}
    a = build_op({**kw, "right": rd.from_arrow(rr), "strategy": "auto"})(
        rd.from_arrow(l)).to_pandas().sort_values(["k", "t", "v"],
                                                  ignore_index=True)
    b = build_op({**kw, "right": rd.from_arrow(rr), "strategy": "shuffle"})(
        rd.from_arrow(l)).to_pandas().sort_values(["k", "t", "v"],
                                                  ignore_index=True)
    assert a["price"].fillna(-1).tolist() == b["price"].fillna(-1).tolist()


def test_connected_components_propagate_matches_broadcast(ray_session):
    """The distributed min-label-propagation path must agree with the
    broadcast union-find on a random multi-component graph."""
    import ray.data as rd

    rng = np.random.default_rng(17)
    n = 60
    docs = pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ea = rng.integers(0, n, 40)
    eb = rng.integers(0, n, 40)
    edges = pa.table({"doc_a": pa.array(ea, pa.int64()),
                      "doc_b": pa.array(eb, pa.int64())})
    a = build_op({"op": "connected_components",
                  "edges": rd.from_arrow(edges)})(rd.from_arrow(docs)) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    b = build_op({"op": "connected_components", "mode": "propagate",
                  "edges": rd.from_arrow(edges)})(rd.from_arrow(docs)) \
        .to_pandas().sort_values("doc_id", ignore_index=True)
    assert a["keep_id"].tolist() == b["keep_id"].tolist()


def test_group_hll_per_key_error_bound(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(23)
    n = 40_000
    grp = np.array(["a", "b"])[rng.integers(0, 2, n)]
    # group a: ~5000 distinct, group b: ~500 distinct
    vals = np.where(grp == "a", rng.integers(0, 5000, n),
                    rng.integers(0, 500, n))
    tbl = pa.table({"g": pa.array(grp), "u": pa.array(vals, pa.int64())})
    out = build_op({"op": "group_hll", "keys": ["g"], "column": "u"})(
        rd.from_arrow(tbl).repartition(5)).to_pandas().set_index("g")
    import pandas as pd
    exact = pd.DataFrame({"g": grp, "u": vals}).groupby("g")["u"].nunique()
    for g in ("a", "b"):
        rel = abs(out.loc[g, "approx_distinct"] - exact[g]) / exact[g]
        assert rel < 0.06, (g, out.loc[g, "approx_distinct"], exact[g])


def test_connected_components_empty_edges(ray_session):
    """Regression: a clean corpus (zero near-dup pairs) must assign
    every doc its own id, not crash on the empty edge collection."""
    import ray.data as rd

    docs = pa.table({"doc_id": pa.array(range(5), pa.int64())})
    empty = pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64())})
    out = build_op({"op": "connected_components",
                    "edges": rd.from_arrow(empty)})(rd.from_arrow(docs)) \
        .to_pandas()
    assert (out["keep_id"] == out["doc_id"]).all()


def test_decontaminate_null_bench_texts(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_docs(["clean doc"]))
    out = build_op({
        "op": "decontaminate",
        "bench": [None, "short", "x" * 50], "mode": "substring",
        "snip_len": 40,
    })(ds).to_pandas()
    assert list(out["contaminated"]) == [False]


def test_stratified_sample_null_stratum_kept(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "source": pa.array(["s"] * 5 + [None] * 5),
    })
    out = build_op({"op": "stratified_sample", "keys": ["source"], "n": 2,
                    "id_col": "doc_id"})(rd.from_arrow(tbl)).to_pandas()
    assert len(out[out["source"].isna()]) == 2   # null stratum sampled too
    assert len(out[out["source"] == "s"]) == 2


def test_asof_join_empty_right_dataset(ray_session):
    import ray.data as rd

    l = pa.table({"k": pa.array([1], pa.int64()),
                  "t": pa.array([5], pa.int64())})
    r = pa.table({"k": pa.array([9], pa.int64()),
                  "t": pa.array([1], pa.int64()),
                  "p": pa.array([2], pa.int64())})
    # 0-row right WITH schema (0-row Arrow block): left join, null p
    out = build_op({"op": "asof_join", "right": rd.from_arrow(r.slice(0, 0)),
                    "on": "k", "time_col": "t"})(rd.from_arrow(l)).to_pandas()
    assert len(out) == 1 and out["p"].isna().all()
    # Ray drops the schema entirely on filter-to-empty datasets; with no
    # way to know the right columns, the join degrades to identity
    schemaless = rd.from_arrow(r).filter(lambda row: False)
    out2 = build_op({"op": "asof_join", "right": schemaless, "on": "k",
                     "time_col": "t"})(rd.from_arrow(l)).to_pandas()
    assert len(out2) == 1 and "p" not in out2.columns


def test_group_hll_null_keys(ray_session):
    import ray.data as rd

    tbl = pa.table({
        "g": pa.array(["a", None, "a", None], pa.string()),
        "u": pa.array([1, 2, 3, 2], pa.int64()),
    })
    out = build_op({"op": "group_hll", "keys": ["g"], "column": "u"})(
        rd.from_arrow(tbl)).to_pandas()
    assert len(out) == 2
    null_row = out[out["g"].isna()]
    assert len(null_row) == 1 and null_row["approx_distinct"].iloc[0] == 1
    # int-typed null keys keep their Arrow type
    tbl2 = pa.table({
        "g": pa.array([7, None, 7], pa.int64()),
        "u": pa.array([1, 2, 3], pa.int64()),
    })
    out2 = build_op({"op": "group_hll", "keys": ["g"], "column": "u"})(
        rd.from_arrow(tbl2)).to_pandas()
    assert len(out2) == 2


def test_curate_pack_export_end_to_end(ray_session, tmp_path):
    """The full training-data story in one flow: curate the corpus,
    pack the survivors into sequences, export resumably partitioned by
    chunk — and read it back."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from rayflow import expr as E

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text", "n_chars"])
    ds = build_op({"op": "gopher_quality"})(ds)
    ds = build_op({"op": "filter",
                   "predicate": (E.col("n_words") >= 10)
                   & (E.col("dup_word_frac") <= 0.6)})(ds)
    ds = build_op({"op": "pii_redact"})(ds)
    ds = build_op({"op": "select", "columns": ["doc_id", "text", "n_chars"]})(ds)
    ds = build_op({"op": "pack_chunks", "size_col": "n_chars",
                   "capacity": 5_000, "order_col": "doc_id",
                   "bucket_rows": 64})(ds)
    out = str(tmp_path / "corpus")
    stats = build_op({"op": "export_partitioned", "path": out,
                      "partition_col": "chunk_id"})(ds).to_pandas()
    assert len(stats) >= 2                      # multiple sequence chunks
    assert all(os.path.exists(os.path.join(out, f"chunk_id={p}", "_SUCCESS"))
               for p in stats["partition"])
    back = pq.read_table(out)
    assert back.num_rows == int(stats["rows"].sum())
    assert "text" in back.column_names


def test_heavy_hitters_zipf(ray_session):
    """On zipf-skewed data the approximate top-k equals the exact
    top-k (heavy values are far above the partial cutoff)."""
    import collections

    import ray.data as rd

    rng = np.random.default_rng(44)
    vals = [f"v{z}" for z in rng.zipf(1.5, size=30_000) if z < 10_000]
    tbl = pa.table({"x": pa.array(vals)})
    out = build_op({"op": "heavy_hitters", "column": "x", "k": 5})(
        rd.from_arrow(tbl).repartition(6)).to_pandas()
    exact = collections.Counter(vals).most_common(5)
    assert list(out["value"]) == [v for v, _ in exact]
    assert list(out["approx_count"]) == [c for _, c in exact]
