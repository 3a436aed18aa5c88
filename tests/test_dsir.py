"""DSIR (arXiv:2302.03169) — weights exact vs an independent scalar
reference; Gumbel top-k determinism and weight-proportional behavior."""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from rayflow.ops import build_op

DIM, ALPHA = 512, 0.01


def _ref_buckets(text: str, dim: int, ngrams=(1, 2)) -> list[int]:
    """Scalar reference: crc32 token hashes, Horner n-gram combine in
    Z_2^64 with the FNV prime, bucket = hash % dim — written
    independently of rayflow.ops.dsir's vectorized path."""
    toks = text.lower().split()
    hs = [zlib.crc32(t.encode("utf-8", "surrogatepass")) for t in toks]
    out = []
    for g in ngrams:
        for i in range(len(hs) - g + 1):
            h = 0
            for x in hs[i:i + g]:
                h = (h * 1099511628211 + x) % (1 << 64)
            out.append(h % dim)
    return out


def _ref_logw(doc: str, target: list[str], raw: list[str]) -> float:
    tc = np.zeros(DIM)
    for t in target:
        for b in _ref_buckets(t, DIM):
            tc[b] += 1
    rc = np.zeros(DIM)
    for t in raw:
        for b in _ref_buckets(t, DIM):
            rc[b] += 1
    lpt = np.log((tc + ALPHA) / (tc.sum() + ALPHA * DIM))
    lpr = np.log((rc + ALPHA) / (rc.sum() + ALPHA * DIM))
    return float(sum((lpt - lpr)[b] for b in _ref_buckets(doc, DIM)))


TARGET = ["the quick brown fox jumps", "a quick brown dog runs",
          "quick foxes and quick dogs"]
RAW = ["stock market crashed again today", "the quick brown fox returns",
       "market prices fell sharply", "dogs and foxes are quick animals",
       "quarterly earnings report released"]


def test_dsir_weights_match_scalar_reference():
    ds = rd.from_arrow(pa.table({
        "doc_id": np.arange(len(RAW), dtype=np.int64), "text": RAW,
    })).repartition(3)
    tgt = pa.table({"text": TARGET})
    out = build_op({"op": "dsir_weights", "target": tgt, "dim": DIM,
                    "alpha": ALPHA})(ds).take_all()
    got = {r["doc_id"]: r["dsir_logw"] for r in out}
    for i, doc in enumerate(RAW):
        assert abs(got[i] - _ref_logw(doc, TARGET, RAW)) < 1e-9, (i, doc)


def test_dsir_targetlike_docs_score_higher():
    ds = rd.from_arrow(pa.table({
        "doc_id": np.arange(len(RAW), dtype=np.int64), "text": RAW}))
    out = build_op({"op": "dsir_weights", "target": pa.table(
        {"text": TARGET}), "dim": DIM})(ds).take_all()
    w = {r["doc_id"]: r["dsir_logw"] for r in out}
    # the near-target sentence dominates everything; the animal doc
    # beats the same-length finance doc (logw is a log-likelihood
    # RATIO sum — longer docs accumulate more terms, so cross-length
    # comparisons are not ordered by topicality alone)
    assert w[1] > max(w[0], w[2], w[3], w[4])
    assert w[3] > w[0]


def test_dsir_target_size_guard():
    import pytest

    big = pa.table({"text": ["x" * 1024] * 10})
    with pytest.raises(ValueError, match="dsir_weights"):
        build_op({"op": "dsir_weights", "target": big,
                  "target_bytes_limit": 1024})


def test_gumbel_topk_deterministic_and_sized():
    n = 500
    ds = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64),
        "logw": np.zeros(n),
    })).repartition(4)
    sel = lambda seed: sorted(r["id"] for r in build_op({
        "op": "gumbel_topk_sample", "k": 50, "weight_col": "logw",
        "id_col": "id", "seed": seed})(ds).take_all())
    a, b, c = sel(1), sel(1), sel(2)
    assert len(a) == 50 and a == b and a != c


def test_gumbel_topk_respects_heavy_weights():
    n = 200
    logw = np.full(n, -60.0)
    logw[:10] = 60.0  # overwhelming mass on ids 0..9
    ds = rd.from_arrow(pa.table({
        "id": np.arange(n, dtype=np.int64), "logw": logw}))
    got = sorted(r["id"] for r in build_op({
        "op": "gumbel_topk_sample", "k": 10, "weight_col": "logw",
        "id_col": "id", "seed": 7})(ds).take_all())
    assert got == list(range(10))


def test_gumbel_topk_k_limit_guard():
    import pytest

    with pytest.raises(ValueError, match="k_limit"):
        build_op({"op": "gumbel_topk_sample", "k": 100, "weight_col": "w",
                  "id_col": "id", "k_limit": 10})
