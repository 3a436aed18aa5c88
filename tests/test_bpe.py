"""BPE tokenizer training/encoding — exactness against the textbook
algorithm (Sennrich et al. 2016) and distributed == reference."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from rayflow.ops import build_op
from rayflow.ops.bpe import WORD_END, encode_word, learn_merges


def _reference_merges(freq: dict[str, int], n: int) -> list:
    """Naive O(V·len) textbook learner: full pair recount per merge."""
    words = {w: tuple(w) + (WORD_END,) for w in freq}
    merges = []
    for _ in range(n):
        counts: dict = {}
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + freq[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    return merges


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_learn_merges_matches_textbook_reference():
    assert learn_merges(SENNRICH, 10) == _reference_merges(SENNRICH, 10)
    # the famous first merge of the paper's example: ('e','s') freq 9
    assert learn_merges(SENNRICH, 1) == [("e", "s")]


def test_encode_word_reproduces_training_segmentation():
    merges = learn_merges(SENNRICH, 8)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in SENNRICH:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + WORD_END  # lossless decode


def test_bpe_train_op_distributed_matches_reference():
    docs = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    # scatter words across documents and blocks
    text = [" ".join(docs[i::4]) for i in range(4)]
    ds = rd.from_arrow(pa.table({"text": text})).repartition(3)
    out = build_op({"op": "bpe_train", "n_merges": 6})(ds).take_all()
    got = [(r["left"], r["right"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert got == _reference_merges(SENNRICH, 6)


def test_bpe_encode_op_counts_and_tokens():
    train = rd.from_arrow(pa.table({
        "text": ["low lower newest", "widest newest low low"]}))
    merges_ds = build_op({"op": "bpe_train", "n_merges": 8})(train)
    merges = pa.Table.from_pylist(
        sorted(merges_ds.take_all(), key=lambda r: r["rank"]))
    ranks = {(l, r): k for k, l, r in zip(
        merges["rank"].to_pylist(), merges["left"].to_pylist(),
        merges["right"].to_pylist())}

    enc = build_op({"op": "bpe_encode", "merges": merges,
                    "emit_tokens": True})(
        rd.from_arrow(pa.table({"text": ["low widest", "", "newest"]})))
    rows = {r["text"]: r for r in enc.take_all()}
    for text, r in rows.items():
        want = []
        for w in text.split():
            want.extend(encode_word(w, ranks))
        assert r["n_bpe_tokens"] == len(want)
        assert list(r["n_bpe_tokens_list"]) == want
    assert rows[""]["n_bpe_tokens"] == 0


def test_bpe_train_max_words_guard():
    import pytest

    ds = rd.from_arrow(pa.table({"text": ["a b c d e f g h"]}))
    with pytest.raises(ValueError, match="max_words"):
        build_op({"op": "bpe_train", "max_words": 3})(ds)
