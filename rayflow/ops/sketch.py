"""Mergeable quantile sketches: the t-digest.

``group_approx_percentile`` (core.py) needs a DECLARED [lo, hi) domain —
fine when the caller knows the range, wrong for open-ended heavy-tailed
columns (latencies, doc lengths at web scale).  The t-digest (Dunning &
Ertl, "Computing extremely accurate quantiles using t-digests" — public
algorithm) is domain-free and MERGEABLE: per-block partial digests are
a few hundred (mean, weight) centroids regardless of row count, so the
keyed exchange is bounded by ``keys × delta`` like the histogram op,
while relative rank error stays ~``q(1−q)·4/delta`` — tightest at the
tails, exactly where fixed bins are worst.

Plan shape (same as every sketch op here): per-block vectorized partial
(sort + O(centroids) greedy merge under the k1 scale function) → ONE
keyed combine of centroid lists → per-key re-compress + quantile
interpolation.  Raw values never cross the exchange.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from rayflow.ops import register_op

_PA_KW = dict(batch_format="pyarrow", zero_copy_batch=True)


# --------------------------------------------------------------- t-digest

def _k(q: np.ndarray | float, delta: float):
    """k1 scale function: k(q) = δ/2π · asin(2q−1)."""
    return delta / (2.0 * np.pi) * np.arcsin(np.clip(2.0 * q - 1.0, -1, 1))


def _k_inv(k: np.ndarray | float, delta: float):
    return (np.sin(np.clip(k * 2.0 * np.pi / delta,
                           -np.pi / 2, np.pi / 2)) + 1.0) / 2.0


def td_compress(means: np.ndarray, weights: np.ndarray,
                delta: float) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted (mean, weight) centroids down to the k1 size budget.

    The greedy merging-digest pass: each output centroid consumes input
    centroids while its cumulative-q span stays within one k-unit.
    O(n) total work, loop iterations = OUTPUT centroids (≤ ~2δ)."""
    n = len(means)
    if n == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="stable")
    m, w = means[order].astype(np.float64), weights[order].astype(np.float64)
    total = w.sum()
    cw = np.cumsum(w)
    # weighted prefix sums of means for O(1) per-centroid weighted mean
    cmw = np.cumsum(m * w)
    out_m, out_w = [], []
    i, q0 = 0, 0.0
    while i < n:
        wlim = _k_inv(_k(q0, delta) + 1.0, delta) * total
        j = int(np.searchsorted(cw, wlim, side="right")) - 1
        if j < i:
            j = i
        lo_w = cw[i - 1] if i else 0.0
        lo_mw = cmw[i - 1] if i else 0.0
        cl_w = cw[j] - lo_w
        out_m.append((cmw[j] - lo_mw) / cl_w)
        out_w.append(cl_w)
        q0 = cw[j] / total
        i = j + 1
    return np.asarray(out_m), np.asarray(out_w)


def td_quantile(means: np.ndarray, weights: np.ndarray,
                qs: np.ndarray) -> np.ndarray:
    """Standard t-digest quantile interpolation between centroid
    midpoints (clamped to the first/last centroid mean at the ends)."""
    if len(means) == 0:
        return np.full(len(qs), np.nan)
    if len(means) == 1:
        return np.full(len(qs), means[0])
    total = weights.sum()
    mid = np.cumsum(weights) - weights / 2.0
    targets = np.asarray(qs, dtype=np.float64) * total
    return np.interp(targets, mid, means)


# --------------------------------------------------------------- the op

@register_op("group_tdigest")
def build_group_tdigest(*, keys: list[str], value_col: str,
                        quantiles: list[float], delta: float = 200.0,
                        prefix: str | None = None,
                        weight_col: str | None = None):
    """Per-group approximate quantiles via mergeable t-digests — no
    declared domain needed (contrast ``group_approx_percentile``).

    Per block: one lexsort by (key, value), then the O(centroids)
    greedy compress per key RUN (loop over runs, vectorized inside);
    the partial row per (block, key) is two ``list<double>`` columns of
    ≤ ~2δ centroids.  Combine: ONE keyed exchange of those partials,
    per-key concat → re-compress → interpolate.  Estimates are
    deterministic for a fixed block split; across different splits the
    rank error bound (~4·q(1−q)/δ) holds either way — asserted by the
    property tests, not assumed.

    NaN/null values are dropped (SQL aggregate semantics); a key with
    no finite values yields NaN estimates.  ``weight_col`` makes it a
    WEIGHTED quantile (row importance, e.g. DSIR weights or event
    multiplicities) — rows with non-finite or non-positive weight are
    dropped."""
    if not quantiles:
        raise ValueError("group_tdigest: quantiles must be non-empty")
    qs = np.asarray(sorted(quantiles), dtype=np.float64)
    if (qs < 0).any() or (qs > 1).any():
        raise ValueError("group_tdigest: quantiles must be in [0, 1]")
    names = [f"{prefix or 'p'}{int(round(q * 100))}" for q in qs]

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from rayflow.ops.kernels import group_codes

        key_arr = t.column(keys[0]) if len(keys) == 1 else \
            pc.binary_join_element_wise(
                *[pc.cast(t.column(k), pa.string()) for k in keys], "\x1f")
        kidx = group_codes(key_arr)
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        if weight_col is not None:
            wt = t.column(weight_col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ok = np.isfinite(v) & np.isfinite(wt) & (wt > 0)
        else:
            wt = None
            ok = np.isfinite(v)
        kidx, v = kidx[ok], v[ok]
        if wt is not None:
            wt = wt[ok]
        key_cols = {k: [] for k in keys}
        ms, ws = [], []
        if len(v):
            order = np.lexsort((v, kidx))
            ks, vs = kidx[order], v[order]
            wts = wt[order] if wt is not None else None
            starts = np.nonzero(
                np.concatenate(([True], ks[1:] != ks[:-1])))[0]
            ends = np.append(starts[1:], len(ks))
            first_row = np.nonzero(ok)[0][order[starts]]
            for s_i, e_i, r0 in zip(starts, ends, first_row):
                m, w = td_compress(vs[s_i:e_i],
                                   wts[s_i:e_i] if wts is not None
                                   else np.ones(e_i - s_i), delta)
                ms.append(m)
                ws.append(w)
                for k in keys:
                    key_cols[k].append(t.column(k)[int(r0)].as_py())
        arrays = {k: pa.array(key_cols[k],
                              t.schema.field(k).type) for k in keys}
        arrays["_td_means"] = pa.array(
            [list(map(float, x)) for x in ms], pa.list_(pa.float64()))
        arrays["_td_weights"] = pa.array(
            [list(map(float, x)) for x in ws], pa.list_(pa.float64()))
        return pa.table(arrays)

    def finish(g):
        import pandas as pd

        m = np.concatenate([np.asarray(x, dtype=np.float64)
                            for x in g["_td_means"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64)
                            for x in g["_td_weights"]])
        cm, cw = td_compress(m, w, delta)
        est = td_quantile(cm, cw, qs)
        row = {k: [g[k].iloc[0]] for k in keys}
        for name, val in zip(names, est):
            row[name] = [float(val)]
        return pd.DataFrame(row)

    def apply(ds):
        from rayflow.ops import prefer_push_shuffle

        partials = ds.map_batches(partial, **_PA_KW)
        prefer_push_shuffle()
        return partials.groupby(keys).map_groups(
            finish, batch_format="pandas")

    return apply


@register_op("bucketize")
def build_bucketize(*, value_col: str, edges: list[float],
                    out: str = "bucket", right: bool = False):
    """Assign each row the bucket index of ``value_col`` under DECLARED
    ascending ``edges`` — SQL ``width_bucket`` semantics: bucket 0 is
    (−∞, edges[0]), bucket i is [edges[i−1], edges[i]), bucket
    len(edges) is [edges[−1], ∞).  ``right=True`` flips the closed side
    (``(lo, hi]`` buckets).  Zero exchange — one vectorized
    ``searchsorted`` per block.

    The feature-engineering finisher for the quantile sketches: compute
    edges once with ``group_tdigest`` / ``group_approx_percentile``
    (or declare domain-knowledge cut points), broadcast them here as
    plain config.  Nulls/NaNs get bucket −1 (SQL NULL analogue kept
    typed int64 so the column stays join/group-able)."""
    e = np.asarray(edges, dtype=np.float64)
    if len(e) == 0:
        raise ValueError("bucketize: edges must be non-empty")
    if (np.diff(e) <= 0).any():
        raise ValueError("bucketize: edges must be strictly ascending")
    # left-closed buckets (width_bucket): x == edges[i] belongs to the
    # HIGHER bucket ⇒ searchsorted side="right"; right=True flips it
    side = "left" if right else "right"

    def fn(t: pa.Table) -> pa.Table:
        v = t.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        b = np.searchsorted(e, v, side=side).astype(np.int64)
        b[~np.isfinite(v)] = -1
        return t.append_column(out, pa.array(b, pa.int64()))

    def apply(ds):
        return ds.map_batches(fn, **_PA_KW)

    return apply
