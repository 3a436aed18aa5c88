"""SemDeDup (semantic dedup over embeddings) — clustered-mode property
tests.  The k=1 exact mode is oracle-checked against DuckDB by
test_queries_oracle.py (``semdedup_keep_docs``); these tests pin the
clustered (100 TB) path against a brute-force reference and prove the
margin-split bound is lossless."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from rayflow.ops import build_op
from rayflow.ops.ann import _normalize_rows, build_kmeans


def _synth(n=240, d=16, n_dup_groups=12, group=4, seed=7):
    """Random unit vectors plus planted duplicate groups: each group is
    one base vector repeated ``group`` times with tiny jitter (cosine
    with the base > 0.999)."""
    rng = np.random.default_rng(seed)
    base = _normalize_rows(rng.standard_normal((n, d)))
    vecs = [base]
    ids = [np.arange(n, dtype=np.int64)]
    nxt = 10_000
    for g in range(n_dup_groups):
        b = base[g]
        jit = b + 1e-4 * rng.standard_normal((group, d))
        vecs.append(_normalize_rows(jit))
        ids.append(np.arange(nxt, nxt + group, dtype=np.int64))
        nxt += 100
    m = np.vstack(vecs)
    i = np.concatenate(ids)
    return i, m


def _table(ids, m):
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(list(m.astype(np.float64))),
    })


def _reference_survivors(ids, m, clusters, threshold):
    """Brute-force SemDeDup: per cluster, drop i iff exists j<i (by id)
    in the same cluster with cos >= threshold."""
    m = _normalize_rows(m)
    keep = []
    for c in np.unique(clusters):
        sel = clusters == c
        cid, cm = ids[sel], m[sel]
        order = np.argsort(cid)
        cid, cm = cid[order], cm[order]
        sims = cm @ cm.T
        for i in range(len(cid)):
            if not any(sims[i, j] >= threshold for j in range(i)):
                keep.append(int(cid[i]))
    return sorted(keep)


def _run(ids, m, **kw):
    ds = rd.from_arrow(_table(ids, m))
    out = build_op({"op": "semdedup", **kw})(ds).take_all()
    return sorted(int(r["vec_id"]) for r in out)


def test_semdedup_clustered_matches_bruteforce_reference():
    ids, m = _synth()
    k = 4
    # the op's own assignment (same seeded kmeans) defines the clusters;
    # the reference applies the drop rule independently on them
    assigned = build_kmeans(n_clusters=k, n_iter=6, seed=42,
                            out="c")(rd.from_arrow(_table(ids, m))).take_all()
    amap = {int(r["vec_id"]): int(r["c"]) for r in assigned}
    clusters = np.array([amap[int(i)] for i in ids])
    want = _reference_survivors(ids, m, clusters, 0.995)
    got = _run(ids, m, threshold=0.995, n_clusters=k, n_iter=6, seed=42)
    assert got == want
    # every planted group lost all but one member (exact copies always
    # share an argmax cluster), every pure-random base vector survives
    # unless it seeded a duplicate group twin with a lower id
    assert len(got) < len(ids)


def test_semdedup_margin_split_is_lossless():
    ids, m = _synth(n=300, n_dup_groups=20, group=5, seed=11)
    full = _run(ids, m, threshold=0.99, n_clusters=1, max_cluster=1 << 30)
    split = _run(ids, m, threshold=0.99, n_clusters=1, max_cluster=16)
    assert full == split


def test_semdedup_planted_copies_keep_lowest_id():
    rng = np.random.default_rng(3)
    base = _normalize_rows(rng.standard_normal((50, 8)))
    ids = np.concatenate([np.arange(50, dtype=np.int64),
                          np.arange(1000, 1050, dtype=np.int64)])
    m = np.vstack([base, base])  # exact copies, higher ids
    got = _run(ids, m, threshold=0.98, n_clusters=3, n_iter=4)
    assert got == list(range(50))


def test_semdedup_singleton_and_empty_clusters():
    rng = np.random.default_rng(5)
    m = _normalize_rows(rng.standard_normal((3, 8)))
    # orthogonal-ish randoms: nothing above threshold, all survive
    got = _run(np.array([7, 3, 9], dtype=np.int64), m,
               threshold=0.999, n_clusters=1)
    assert got == [3, 7, 9]
