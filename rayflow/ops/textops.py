"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's operator set (which ends at generic string
processors), these are the document-pipeline stages a 100 TB corpus run
needs: token counting, quality scoring, language ID, fingerprinting.
All per-batch bodies are vectorized Arrow/numpy; the language-ID stage
is the canonical stateful actor-pool pattern (tables/regexes built once
per actor in ``__init__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayflow.ops import register_op

_PA_KW = dict(batch_format="pyarrow", zero_copy_batch=True)


@register_op("token_count")
def build_token_count(*, column: str = "text", out: str = "n_tokens",
                      pattern: str = r"\S+"):
    """Whitespace-token count per document (vectorized regex count)."""

    def apply(ds):
        def fn(t: pa.Table) -> pa.Table:
            n = pc.count_substring_regex(t.column(column), pattern)
            return t.append_column(out, pc.cast(n, pa.int64()))

        return ds.map_batches(fn, **_PA_KW)

    return apply


@register_op("quality_score")
def build_quality_score(*, column: str = "text"):
    """Heuristic quality metrics per document: char/token counts, mean
    token length, punctuation & digit counts, and a composite score.
    Pure ``pyarrow.compute`` — no Python row loop."""

    def apply(ds):
        def fn(t: pa.Table) -> pa.Table:
            text = t.column(column)
            n_chars = pc.cast(pc.utf8_length(text), pa.int64())
            n_tok = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64())
            n_punct = pc.cast(pc.count_substring_regex(text, r"[.,;:!?]"), pa.int64())
            n_digit = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.int64())
            tok_safe = pc.max_element_wise(n_tok, 1)
            mean_tok_len = pc.divide(
                pc.cast(pc.subtract(pc.add(n_chars, 1), n_tok), pa.float64()),
                pc.cast(tok_safe, pa.float64()),
            )
            # composite: long-enough docs with word-like tokens score high
            score = pc.multiply(
                pc.min_element_wise(
                    pc.divide(pc.cast(n_tok, pa.float64()), 20.0), 1.0
                ),
                pc.if_else(
                    pc.and_(
                        pc.greater_equal(mean_tok_len, 2.0),
                        pc.less_equal(mean_tok_len, 12.0),
                    ),
                    1.0,
                    0.5,
                ),
            )
            for name, col in [
                ("n_chars_q", n_chars), ("n_tokens", n_tok),
                ("n_punct", n_punct), ("n_digits", n_digit),
                ("mean_token_len", mean_tok_len), ("quality", score),
            ]:
                t = t.append_column(name, col)
            return t

        return ds.map_batches(fn, **_PA_KW)

    return apply


#: seed stopword lists per language (public common-word lists, truncated).
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"},
    "fr": {"le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"},
    "es": {"el", "la", "de", "que", "y", "los", "en", "un", "una", "es"},
}


class LangIdScorer:
    """Language-ID actor: n-gram/stopword heuristic.

    The stateful-stage archetype (SURVEY.md §2.6): the token regex and
    per-language tables are compiled ONCE per actor in ``__init__``;
    ``__call__`` only does per-batch work.  Deterministic: pure function
    of the text."""

    def __init__(self):
        import re

        self.word = re.compile(r"[a-zA-Zäöüéèàç]+")
        self.cjk = re.compile(r"[一-鿿]")
        self.tables = {k: frozenset(v) for k, v in _LANG_STOPWORDS.items()}

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_numpy(zero_copy_only=False)
        preds, confs = [], []
        for s in texts:
            if s is None:
                preds.append(None)
                confs.append(None)
                continue
            if self.cjk.search(s):
                preds.append("zh")
                confs.append(1.0)
                continue
            toks = [w.lower() for w in self.word.findall(s)]
            if not toks:
                preds.append("unknown")
                confs.append(0.0)
                continue
            scores = {
                lang: sum(tok in table for tok in toks) / len(toks)
                for lang, table in self.tables.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            preds.append(best if scores[best] > 0 else "unknown")
            # raw double (hits/len): bit-identical to a SQL oracle's
            # CAST(k AS DOUBLE)/n — rounding here would reintroduce
            # half-even vs half-away divergence at e.g. 1/128
            confs.append(scores[best])
        return t.append_column("lang_pred", pa.array(preds, pa.string())) \
                .append_column("lang_conf", pa.array(confs, pa.float64()))


@register_op("lang_id")
def build_lang_id(*, concurrency: int = 2, batch_size: int = 2048):
    def apply(ds):
        return ds.map_batches(
            LangIdScorer, concurrency=concurrency, batch_size=batch_size,
            batch_format="pyarrow", zero_copy_batch=True, num_cpus=1,
        )

    return apply


def rolling_hashes(s: str, k: int = 8, base: int = 257) -> np.ndarray:
    """Karp-Rabin rolling hashes of all byte k-grams of ``s`` in
    Z_2^64 (natural uint64 wraparound — fully vectorizable, unlike a
    Mersenne modulus whose intermediate products overflow 64 bits).
    Deterministic: hash(i) = Σ_j byte[i+j] · base^(k-1-j) mod 2^64."""
    if len(s) < k:
        return np.array([hash_bytes(s)], dtype=np.uint64)
    vals = np.frombuffer(
        s.encode("utf-8", "surrogatepass"), dtype=np.uint8
    ).astype(np.uint64)
    n = len(vals) - k + 1
    out = np.zeros(n, dtype=np.uint64)
    b = np.uint64(base)
    # k shifted multiply-adds over the byte vector — O(k·n) vector ops,
    # no per-character Python
    for j in range(k):
        out += vals[j : j + n] * (b ** np.uint64(k - 1 - j))
    return out


def rolling_min_batch(texts, k: int = 8, base: int = 257) -> list[int | None]:
    """Per-doc minimum rolling hash for a whole batch (the 1-perm
    minhash): one flat uint64 pass over the concatenated byte stream,
    windows crossing document boundaries masked to max, segment-min via
    ``np.minimum.reduceat``.  Nulls stay null; docs shorter than ``k``
    fall back to crc32 of the whole doc (same as the scalar path)."""
    enc = [None if s is None else s.encode("utf-8", "surrogatepass")
           for s in texts]
    out: list[int | None] = [None] * len(texts)
    long_idx = [i for i, e in enumerate(enc) if e is not None and len(e) >= k]
    for i, e in enumerate(enc):
        if e is not None and len(e) < k:
            out[i] = int(hash_bytes(texts[i]))
    if not long_idx:
        return out
    blobs = [enc[i] for i in long_idx]
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    flat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    n = len(flat) - k + 1
    h = np.zeros(n, dtype=np.uint64)
    tmp = np.empty(n, dtype=np.uint64)
    b64 = np.uint64(base)
    for j in range(k):
        # uint8 slice × uint64 scalar promotes to uint64 (wrapping);
        # out= reuses one temp instead of allocating per pass
        np.multiply(flat[j : j + n], b64 ** np.uint64(k - 1 - j),
                    out=tmp, dtype=np.uint64, casting="unsafe")
        h += tmp
    # mask windows that straddle a doc boundary (the last k-1 start
    # positions of every doc except windows past the flat end)
    valid_counts = lens - k + 1  # ≥1 by construction (len ≥ k)
    mask_max = np.uint64(0xFFFFFFFFFFFFFFFF)
    for d in range(len(blobs) - 1):
        lo = starts[d] + valid_counts[d]
        hi = min(starts[d + 1], n)
        if lo < hi:
            h[lo:hi] = mask_max
    mins = np.minimum.reduceat(h, np.minimum(starts, n - 1))
    for pos, i in enumerate(long_idx):
        out[i] = int(mins[pos])
    return out


def hash_bytes(s: str) -> int:
    import zlib

    return zlib.crc32(s.encode("utf-8", "surrogatepass"))


@register_op("fingerprint")
def build_fingerprint(*, column: str = "text", k: int = 8):
    """Document fingerprint: the MINIMUM of the doc's k-gram rolling
    hashes (a 1-perm minhash — robust to small edits) plus an exact
    content md5.  Deterministic."""

    def apply(ds):
        import hashlib

        def fn(t: pa.Table) -> pa.Table:
            texts = t.column(column).to_numpy(zero_copy_only=False)
            mins = [None if m is None else np.uint64(m).astype(np.int64).item()
                    for m in rolling_min_batch(list(texts), k=k)]
            md5s = [None if s is None else hashlib.md5(s.encode()).hexdigest()
                    for s in texts]
            return t.append_column("fp_rolling_min", pa.array(mins, pa.int64())) \
                    .append_column("fp_md5", pa.array(md5s, pa.string()))

        return ds.map_batches(fn, **_PA_KW)

    return apply
