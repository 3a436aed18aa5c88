"""CLI entry — the ``benthos -c config.yaml`` analogue.

    python -m rayflow run pipeline.yaml          # run a declarative pipeline
    python -m rayflow replay LOG_DIR LAKE_DIR    # CDC replay (resumable)
    python -m rayflow ops                        # list registered operators
    python -m rayflow functions                  # list scalar functions

Owns its Ray session (library code never does).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="rayflow")
    sub = ap.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run a YAML pipeline")
    runp.add_argument("config")
    runp.add_argument("--num-cpus", type=int, default=None)
    rep = sub.add_parser("replay", help="replay a CDC change log into a lake")
    rep.add_argument("log_dir")
    rep.add_argument("lake_dir")
    rep.add_argument("--num-partitions", type=int, default=32)
    rep.add_argument("--bands-per-commit", type=int, default=1)
    rep.add_argument("--num-cpus", type=int, default=None)
    tl = sub.add_parser("tail", help="continuously apply new change-log "
                                     "bands as they land (daemon mode)")
    tl.add_argument("log_dir")
    tl.add_argument("lake_dir")
    tl.add_argument("--num-partitions", type=int, default=32)
    tl.add_argument("--bands-per-commit", type=int, default=1)
    tl.add_argument("--poll-interval", type=float, default=1.0)
    tl.add_argument("--idle-rounds", type=int, default=1_000_000_000,
                    help="stop after N consecutive empty polls "
                         "(default: effectively forever)")
    tl.add_argument("--num-cpus", type=int, default=None)
    rp = sub.add_parser("repartition", help="partition evolution: rewrite "
                        "a lake under a new partition count + fresh salt "
                        "plan (one atomic manifest flip; old files stay "
                        "for time travel until vacuum)")
    rp.add_argument("lake_dir")
    rp.add_argument("--num-partitions", type=int, required=True)
    rp.add_argument("--keep-salts", action="store_true",
                    help="keep the existing salt plan instead of "
                         "re-measuring hot keys from the live rows")
    rp.add_argument("--num-cpus", type=int, default=None)
    snap = sub.add_parser("snapshot", help="time-travel read: lake state "
                                           "as of a committed watermark")
    snap.add_argument("lake_dir")
    snap.add_argument("--as-of", type=int, default=None,
                      help="target LSN (default: list available watermarks)")
    snap.add_argument("--num-cpus", type=int, default=None)
    ver = sub.add_parser("verify-lake",
                         help="check a lake's final state against a DuckDB "
                              "LWW oracle over the raw change log")
    ver.add_argument("log_dir")
    ver.add_argument("lake_dir")
    ver.add_argument("--num-cpus", type=int, default=None)
    lint_p = sub.add_parser("lint", help="validate a YAML pipeline config "
                                         "without running it")
    lint_p.add_argument("config")
    exp_p = sub.add_parser("explain", help="static plan annotation: "
                           "per-stage exchange class (keyed / broadcast "
                           "/ row-local / global / actor)")
    exp_p.add_argument("config")
    sub.add_parser("ops", help="list registered operators")
    sub.add_parser("functions", help="list scalar functions")
    st = sub.add_parser("stats", help="lake observability: commit lineage "
                                      "and per-partition state as JSON "
                                      "(manifest-only, no Ray session)")
    st.add_argument("lake_dir")
    st.add_argument("--partitions", action="store_true",
                    help="also print the per-partition table")
    br = sub.add_parser("branch", help="branch a lake: zero-copy clone of "
                                       "its committed state (manifest-only, "
                                       "no Ray session)")
    br.add_argument("src_lake")
    br.add_argument("dst_lake")
    br.add_argument("--as-of", type=int, default=None,
                    help="branch at an earlier committed watermark")
    br.add_argument("--mode", choices=("reference", "copy"),
                    default="reference")
    ub = sub.add_parser("unbranch", help="release a reference branch's "
                                         "vacuum pin on its source lake")
    ub.add_argument("src_lake")
    ub.add_argument("branch")
    tp = sub.add_parser(
        "test",
        help="run YAML pipeline unit tests (the `benthos test` "
             "analogue): cases of literal input rows -> expected "
             "output against the config's steps")
    tp.add_argument("test_file", help="YAML with pipeline: + cases:")
    tp.add_argument("--num-cpus", type=int, default=None)
    bi = sub.add_parser(
        "build-index",
        help="materialize a search index artifact from a parquet corpus: "
             "kind=bm25 (hash-partitioned inverted postings) or kind=ivf "
             "(k-means list-partitioned vectors)")
    bi.add_argument("--kind", choices=["bm25", "ivf", "ivfpq"],
                    required=True)
    bi.add_argument("--input", required=True, help="corpus parquet path")
    bi.add_argument("--path", required=True, help="index output directory")
    bi.add_argument("--id-col", default=None)
    bi.add_argument("--column", default="text",
                    help="bm25: text column")
    bi.add_argument("--vec-col", default="embedding",
                    help="ivf: embedding column")
    bi.add_argument("--n-parts", type=int, default=64,
                    help="bm25: term hash partitions")
    bi.add_argument("--n-clusters", type=int, default=32,
                    help="ivf: inverted lists")
    bi.add_argument("--train-sample", type=int, default=2048,
                    help="ivf: corpus rows sampled for the quantizer")
    bi.add_argument("--num-cpus", type=int, default=None)
    sv = sub.add_parser(
        "search-vec",
        help="probe an ivf / ivfpq index: top-k neighbors for query "
             "vectors from a parquet file (kind auto-detected from the "
             "index artifacts)")
    sv.add_argument("--index", required=True)
    sv.add_argument("--queries", required=True,
                    help="parquet with (id, vector) query rows")
    sv.add_argument("--id-col", default="vec_id")
    sv.add_argument("--vec-col", default="embedding")
    sv.add_argument("--k", type=int, default=10)
    sv.add_argument("--nprobe", type=int, default=4)
    sv.add_argument("--rerank", type=int, default=4,
                    help="ivfpq only: exact re-rank factor (0 = ADC only)")
    sv.add_argument("--num-cpus", type=int, default=None)
    se = sub.add_parser(
        "search-text",
        help="probe a bm25 index: top-k documents for the query terms "
             "(reads ONLY the terms' hash partitions)")
    se.add_argument("--index", required=True)
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--num-cpus", type=int, default=None)
    se.add_argument("terms", nargs="+")
    bl = sub.add_parser(
        "blobl",
        help="one-shot Bloblang evaluator (the `benthos blobl` analogue): "
             "apply a mapping program to JSON lines from stdin, print JSON "
             "lines; pure Arrow, no Ray session")
    bl.add_argument("program", help="mapping program or single expression")
    args = ap.parse_args(argv)

    if args.cmd == "blobl":
        import pyarrow as pa

        from rayflow.bloblang import DELETED, parse_expr, parse_program

        rows = [json.loads(line) for line in sys.stdin if line.strip()]
        if not rows:
            return 0
        t = pa.Table.from_pylist(rows)
        if "=" in args.program and "root." in args.program:
            prog = parse_program(args.program)
            for name, node in prog.items():
                if node is DELETED:
                    if name in t.column_names:
                        t = t.drop_columns([name])
                    continue
                val = node.eval(t)
                if isinstance(val, pa.Scalar):
                    val = pa.nulls(t.num_rows, val.type).fill_null(val)
                if isinstance(val, pa.ChunkedArray):
                    val = val.combine_chunks()
                if name in t.column_names:
                    t = t.set_column(t.column_names.index(name), name, val)
                else:
                    t = t.append_column(name, val)
            for row in t.to_pylist():
                print(json.dumps(row, default=str))
        else:
            val = parse_expr(args.program).eval(t)
            vals = (val.to_pylist() if hasattr(val, "to_pylist")
                    else [val.as_py()] * t.num_rows)
            for v in vals:
                print(json.dumps(v, default=str))
        return 0

    if args.cmd == "lint":
        from rayflow.pipeline import lint

        report = lint(args.config)
        print(json.dumps(report))
        return 0 if report["ok"] else 1

    if args.cmd == "explain":
        from rayflow.pipeline import explain

        report = explain(args.config)
        print(json.dumps(report))
        return 0 if report["ok"] else 1

    if args.cmd == "branch":
        from rayflow.cdc import branch_lake

        print(json.dumps(branch_lake(args.src_lake, args.dst_lake,
                                     as_of_lsn=args.as_of, mode=args.mode)))
        return 0

    if args.cmd == "unbranch":
        from rayflow.cdc import remove_branch_pin

        existed = remove_branch_pin(args.src_lake, args.branch)
        print(json.dumps({"pin_removed": existed}))
        return 0

    if args.cmd == "stats":
        from rayflow.cdc import CdcEngine

        engine = CdcEngine(args.lake_dir)
        out = {
            "committed_lsn": engine.manifest.committed_lsn,
            "lineage": engine.lineage_table().to_pylist(),
        }
        if args.partitions:
            out["partitions"] = engine.partition_stats().to_pylist()
        print(json.dumps(out))
        return 0

    if args.cmd == "ops":
        from rayflow.ops import ops

        print("\n".join(ops()))
        return 0
    if args.cmd == "functions":
        from rayflow import expr

        print("\n".join(expr.functions()))
        return 0

    import ray

    init_kw = dict(address="local", include_dashboard=False,
                   ignore_reinit_error=True, logging_level="ERROR")
    if args.num_cpus:
        init_kw["num_cpus"] = args.num_cpus
    ray.init(**init_kw)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        if args.cmd == "run":
            from rayflow.pipeline import from_yaml

            result = from_yaml(args.config).run()
            if result is not None:
                n = result.count()
                print(json.dumps({"rows": n, "schema": result.schema().names}))
            else:
                print(json.dumps({"ok": True, "note": "sink consumed result"}))
        elif args.cmd == "verify-lake":
            from rayflow.cdc.oracle import audit_lake

            report = audit_lake(args.log_dir, args.lake_dir)
            print(json.dumps(report))
            return 0 if report["match"] else 1
        elif args.cmd == "snapshot":
            from rayflow.cdc import CdcEngine

            engine = CdcEngine(args.lake_dir)
            if args.as_of is None:
                print(json.dumps({"watermarks": engine.snapshot_lsns()}))
            else:
                snap_ds = engine.snapshot_dataset(args.as_of)
                print(json.dumps({
                    "as_of": args.as_of,
                    "rows": snap_ds.count(),
                    "schema": snap_ds.schema().names,
                }))
        elif args.cmd == "tail":
            from rayflow.cdc import CdcEngine

            engine = CdcEngine(args.lake_dir, num_partitions=args.num_partitions)
            stats = engine.tail(
                args.log_dir, bands_per_commit=args.bands_per_commit,
                poll_interval=args.poll_interval,
                idle_rounds=args.idle_rounds,
                on_round=lambda s: print(json.dumps({
                    "bands_applied": s.bands_applied,
                    "n_events": s.n_events,
                    "wall_s": round(s.wall_s, 3)}), flush=True))
            print(json.dumps({
                "bands_applied": stats.bands_applied,
                "n_events": stats.n_events,
                "wall_s": round(stats.wall_s, 3),
                "committed_lsn": engine.manifest.committed_lsn,
            }))
        elif args.cmd == "repartition":
            from rayflow.cdc import CdcEngine

            engine = CdcEngine(args.lake_dir)
            old_p = engine.num_partitions
            n = engine.repartition(args.num_partitions,
                                   resalt=not args.keep_salts)
            print(json.dumps({
                "from_partitions": old_p,
                "to_partitions": engine.num_partitions,
                "partitions_written": n,
                "n_salted_keys": len(engine.manifest.state.get("salts", {})),
                "committed_lsn": engine.manifest.committed_lsn,
            }))
        elif args.cmd == "test":
            from rayflow.testkit import run_config_tests

            results = run_config_tests(args.test_file)
            for r in results:
                print(json.dumps(r))
            n_fail = sum(1 for r in results if not r["ok"])
            print(json.dumps({"cases": len(results), "failed": n_fail}))
            if n_fail:
                return 1
        elif args.cmd == "build-index":
            import ray.data as rd

            if args.kind == "bm25":
                from rayflow.ops.textops import Bm25Index

                idx = Bm25Index.build(
                    rd.read_parquet(args.input,
                                    columns=[args.id_col or "doc_id",
                                             args.column]),
                    args.path, n_parts=args.n_parts, column=args.column,
                    id_col=args.id_col or "doc_id")
                print(json.dumps({"kind": "bm25", "path": args.path,
                                  **idx.meta}))
            else:
                import numpy as np
                import pyarrow.parquet as pq

                from rayflow.ops.ann import IvfIndex

                id_col = args.id_col or "vec_id"
                emb = pq.read_table(args.input,
                                    columns=[id_col, args.vec_col])
                step = max(1, emb.num_rows // args.train_sample)
                import pyarrow as pa

                sample = np.asarray(
                    emb.take(pa.array(range(0, emb.num_rows, step)))
                    [args.vec_col].to_pylist(), dtype=np.float64)
                corpus = rd.read_parquet(args.input,
                                         columns=[id_col, args.vec_col])
                if args.kind == "ivfpq":
                    from rayflow.ops.ann import IvfPqIndex

                    idx = IvfPqIndex.build(
                        corpus, args.path, train_sample=sample,
                        n_clusters=args.n_clusters,
                        vec_col=args.vec_col, id_col=id_col)
                else:
                    idx = IvfIndex.build(
                        corpus, args.path, train_sample=sample,
                        n_clusters=args.n_clusters,
                        vec_col=args.vec_col, id_col=id_col)
                print(json.dumps({"kind": args.kind, "path": args.path,
                                  **idx.meta}))
        elif args.cmd == "search-vec":
            import os

            import numpy as np
            import pyarrow.parquet as pq

            qt = pq.read_table(args.queries,
                               columns=[args.id_col, args.vec_col])
            queries = np.asarray(qt[args.vec_col].to_pylist(),
                                 dtype=np.float64)
            qids = qt[args.id_col].to_numpy()
            if os.path.exists(os.path.join(args.index, "codebooks.npy")):
                from rayflow.ops.ann import IvfPqIndex

                out = IvfPqIndex(args.index).probe(
                    queries, qids, k=args.k, nprobe=args.nprobe,
                    rerank=args.rerank)
            else:
                from rayflow.ops.ann import IvfIndex

                out = IvfIndex(args.index).probe(
                    queries, qids, k=args.k, nprobe=args.nprobe)
            for row in out.to_pandas().to_dict("records"):
                print(json.dumps(row, default=str))
        elif args.cmd == "search-text":
            from rayflow.ops.textops import Bm25Index

            out = Bm25Index(args.index).probe(args.terms, k=args.k)
            for row in out.to_pandas().to_dict("records"):
                print(json.dumps(row, default=str))
        elif args.cmd == "replay":
            from rayflow.cdc import CdcEngine

            engine = CdcEngine(args.lake_dir, num_partitions=args.num_partitions)
            stats = engine.replay(args.log_dir,
                                  bands_per_commit=args.bands_per_commit)
            print(json.dumps({
                "bands_applied": stats.bands_applied,
                "n_events": stats.n_events,
                "wall_s": round(stats.wall_s, 3),
                "events_per_s": round(stats.events_per_s, 1),
                "committed_lsn": engine.manifest.committed_lsn,
            }))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
