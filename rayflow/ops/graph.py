"""Graph analytics beyond the iterative family (pagerank /
connected_components live in dedup.py): exact triangle counting.

The plan is the public degree-ordered wedge-join ("node-iterator++" /
Cohen's MapReduce scheme, also Suri & Vassilvitskii WWW'11): orient
every edge from the lower-(degree, id)-ranked endpoint to the higher,
generate wedges only at each node's FORWARD neighbors (bounding wedge
fan-out by forward-degree² — O(m^{3/2}) total work on any graph), and
close wedges against the canonical edge set with one keyed join.  Each
triangle is generated exactly once, at its lowest-ranked vertex.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayflow.ops import register_op

_PA_KW = dict(batch_format="pyarrow", zero_copy_batch=True)


@register_op("triangle_count")
def build_triangle_count(*, src_col: str = "src", dst_col: str = "dst",
                         node_out: str = "node", out: str = "triangles",
                         broadcast_limit: int = 50_000_000,
                         num_partitions: int = 16,
                         broadcast_bytes_limit: int = 64 << 20):
    """Per-node exact triangle counts over an undirected simple graph
    (edge list; self-loops dropped, multi-edges collapse via DISTINCT).
    Output: one row per node that closes ≥ 1 triangle (zero-triangle
    nodes are absent — mirror of the SQL oracle's inner-join shape);
    the global triangle count is ``sum(triangles) / 3``.

    Exchanges: canonical-edge DISTINCT (collapsed per block first), a
    bounded degree aggregate, ONE keyed wedge group, ONE keyed closing
    join, and a final bounded count — raw wedges are the only
    data-sized exchange and degree ordering caps them at O(m^{3/2}).
    The (deg, node) rank vector broadcasts once via ``ray.put``
    (node-sized — loud ``broadcast_limit``, same contract as
    pagerank's broadcast mode)."""
    import ray

    from rayflow.ops import build_op

    def _cc(col) -> pa.Array:
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col

    def apply(ds):
        def canon(t: pa.Table) -> pa.Table:
            s = pc.cast(t.column(src_col), pa.string())
            d = pc.cast(t.column(dst_col), pa.string())
            lo = pc.min_element_wise(s, d)
            hi = pc.max_element_wise(s, d)
            return pa.table({"_ta": lo, "_tb": hi}) \
                .filter(pc.not_equal(lo, hi))

        edges = build_op({"op": "distinct"})(
            ds.map_batches(canon, **_PA_KW)).materialize()

        # degree + deterministic (deg, node) rank, broadcast once
        from rayflow.ops.kernels import collect_table

        def ends(t: pa.Table) -> pa.Table:
            return pa.table({"_tn": pa.concat_arrays(
                [_cc(t.column("_ta")), _cc(t.column("_tb"))])})

        deg_tbl = collect_table(build_op({
            "op": "group_agg", "keys": ["_tn"],
            "aggs": [("count", None, "_deg")],
        })(edges.map_batches(ends, **_PA_KW)))
        if deg_tbl.num_rows == 0:
            import ray.data as rd

            return rd.from_arrow(pa.table({
                node_out: pa.array([], pa.string()),
                out: pa.array([], pa.int64())}))
        if deg_tbl.num_rows > broadcast_limit:
            raise ValueError(
                f"triangle_count: {deg_tbl.num_rows} nodes exceed "
                f"broadcast_limit={broadcast_limit} — raise it (the rank "
                "vector is 2 arrays of that length) or pre-partition the "
                "graph")
        nodes = deg_tbl.column("_tn").to_numpy(zero_copy_only=False)
        degs = deg_tbl.column("_deg").to_numpy(zero_copy_only=False)
        o = np.argsort(nodes, kind="stable")          # node-sorted layout
        nodes, degs = nodes[o], degs[o]
        rank = np.empty(len(nodes), dtype=np.int64)
        rank[np.lexsort((nodes, degs))] = np.arange(len(nodes))
        rank_ref = ray.put((pa.array(nodes, pa.string()), rank))

        def orient(t: pa.Table) -> pa.Table:
            ns, rk = ray.get(rank_ref)
            ra = rk[pc.index_in(t.column("_ta"), value_set=ns)
                    .to_numpy(zero_copy_only=False).astype(np.int64)]
            rb = rk[pc.index_in(t.column("_tb"), value_set=ns)
                    .to_numpy(zero_copy_only=False).astype(np.int64)]
            a = t.column("_ta").to_numpy(zero_copy_only=False)
            b = t.column("_tb").to_numpy(zero_copy_only=False)
            fwd = np.where(ra < rb, a, b)              # lower rank → source
            to = np.where(ra < rb, b, a)
            return pa.table({"_lo": pa.array(fwd, pa.string()),
                             "_hi": pa.array(to, pa.string())})

        fwd = edges.map_batches(orient, **_PA_KW)

        def wedges(g):
            import pandas as pd

            nb = np.sort(g["_hi"].to_numpy())
            n = len(nb)
            if n < 2:
                return pd.DataFrame({"_wc": [], "_wa": [], "_wb": []})
            iu, ju = np.triu_indices(n, k=1)
            # nb sorted ⇒ (nb[iu], nb[ju]) already string-canonical
            return pd.DataFrame({"_wc": np.repeat(g["_lo"].iloc[0],
                                                  len(iu)),
                                 "_wa": nb[iu], "_wb": nb[ju]})

        from rayflow.ops import prefer_push_shuffle

        prefer_push_shuffle()
        w = fwd.groupby("_lo").map_groups(wedges, batch_format="pandas")

        # close wedges against the edge set.  The edge list is tiny
        # relative to the wedge stream (|E| vs O(m^{3/2})), so below
        # broadcast_bytes_limit it ships ONCE as a joined-key set and
        # wedges filter per batch with a C-hash is_in — no second keyed
        # exchange.  Above the limit, the sharded join path remains.
        if edges.size_bytes() <= broadcast_bytes_limit:
            ekeys = collect_table(edges)
            eset = ray.put(pc.binary_join_element_wise(
                ekeys.column("_ta").combine_chunks(),
                ekeys.column("_tb").combine_chunks(), "\x1f"))

            def close(t: pa.Table) -> pa.Table:
                keys = pc.binary_join_element_wise(
                    _cc(t.column("_wa")), _cc(t.column("_wb")), "\x1f")
                return t.filter(pc.is_in(keys, value_set=ray.get(eset)))

            closed = w.map_batches(close, **_PA_KW)
        else:
            closed = build_op({
                "op": "sharded_join", "right": edges,
                "on": ["_wa", "_wb"], "right_on": ["_ta", "_tb"],
                "how": "inner", "num_partitions": num_partitions,
            })(w)

        def tri_nodes(t: pa.Table) -> pa.Table:
            return pa.table({node_out: pa.concat_arrays(
                [_cc(t.column(c)).cast(pa.string())
                 for c in ("_wc", "_wa", "_wb")])})

        return build_op({
            "op": "group_agg", "keys": [node_out],
            "aggs": [("count", None, out)],
        })(closed.map_batches(tri_nodes, **_PA_KW))

    return apply
