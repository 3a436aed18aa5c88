"""Deterministic synthetic CDC change-log generator (test/bench fixture).

Plays the role of the reference's ``generate`` input (``⟨upstream:
internal/impl/pure/input_generate.go⟩``): seeded, pure-function synthesis
of a binlog/WAL-style change stream over multi-turn conversation
transcripts (FIXTURES.md §2).  No wall-clock, no unseeded randomness —
Ray task retries may re-execute code, so determinism is a hard rule.

On-disk layout (consumed by :mod:`rayflow.cdc.source`)::

    {log_dir}/band-{b:05d}/part-{sp:04d}-lsn-{lo:012d}-{hi:012d}.parquet

A *band* is a contiguous global LSN range — the replay micro-batch unit
(the analogue of one committed Kafka offset range per partition in the
reference).  Within a band there is one file per source partition,
internally sorted by ``lsn``.

Event stream shape:

- phase 1: one ``insert`` per (conv_id, turn_idx), interleaved across
  conversations in turn order (like concurrent conversations appending);
- phase 2: ``update`` / ``delete`` events over Zipf-skewed conversations
  (hot conversations — the skew the merge must defuse), in a seeded
  shuffled order.  LSNs are globally unique and monotone; ``src_ts``
  is derived from lsn so ties are impossible by construction.

Schema evolution (FIXTURES.md "changes_v2"): events with
``lsn >= evolve_at_lsn`` carry an added ``meta_model: string`` column and
a widened ``turn_idx: int64``.  Bands overlapping the switch are written
with the v2 schema (pre-switch rows have null ``meta_model``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from rayflow.schema import CHANGE_SCHEMA

TS_BASE_US = 1_700_000_000_000_000  # fixed epoch base (microseconds)

#: v2 (evolved) change schema: turn_idx widened, meta_model added.
CHANGE_SCHEMA_V2 = pa.schema(
    [
        (f.name, pa.int64() if f.name == "turn_idx" else f.type)
        for f in CHANGE_SCHEMA
    ]
    + [("meta_model", pa.string())]
)


@dataclass(frozen=True)
class ChangeLogSpec:
    n_convs: int = 100
    turns_per_conv: float = 8.0       # mean turns per conversation (>=1)
    update_ratio: float = 0.5         # updates as a fraction of inserts
    delete_ratio: float = 0.05        # deletes as a fraction of inserts
    zipf_s: float = 1.5               # Zipf exponent for hot-conversation skew
    n_source_partitions: int = 4
    n_bands: int = 4                  # replay micro-batches
    seed: int = 42
    evolve_at_lsn: int | None = None  # schema-evolution switch point
    whale_turns: int = 0              # conv 0 gets this many turns (skew fixture:
                                      # a long-running agent conversation)


def _synth_events(spec: ChangeLogSpec) -> dict[str, np.ndarray]:
    """Vectorized event synthesis → parallel numpy arrays, lsn-ordered."""
    rng = np.random.default_rng(spec.seed)
    n_convs = spec.n_convs

    # turns per conversation (>=1, Poisson around the mean)
    turns = rng.poisson(max(spec.turns_per_conv - 1.0, 0.0), n_convs) + 1
    if spec.whale_turns:
        turns[0] = spec.whale_turns
    n_ins = int(turns.sum())

    conv_i = np.repeat(np.arange(n_convs), turns)
    # turn_idx = 0..T_i-1 per conversation, vectorized
    offs = np.concatenate(([0], np.cumsum(turns)[:-1]))
    turn_i = np.arange(n_ins) - np.repeat(offs, turns)

    # interleave inserts across conversations in turn order
    order = np.lexsort((conv_i, turn_i))
    conv_ins, turn_ins = conv_i[order], turn_i[order]
    ver_ins = np.zeros(n_ins, dtype=np.int64)
    op_ins = np.zeros(n_ins, dtype=np.int8)  # 0=insert

    # phase 2: updates + deletes over Zipf-skewed conversations
    n_upd = int(round(spec.update_ratio * n_ins))
    n_del = int(round(spec.delete_ratio * n_ins))
    n_mut = n_upd + n_del
    z = rng.zipf(spec.zipf_s, n_mut)
    conv_mut = (z - 1) % n_convs                       # rank 0 = hottest conv
    turn_mut = (rng.random(n_mut) * turns[conv_mut]).astype(np.int64)
    op_mut = np.concatenate(
        [np.ones(n_upd, dtype=np.int8), np.full(n_del, 2, dtype=np.int8)]
    )
    perm = rng.permutation(n_mut)
    conv_mut, turn_mut, op_mut = conv_mut[perm], turn_mut[perm], op_mut[perm]

    conv = np.concatenate([conv_ins, conv_mut])
    turn = np.concatenate([turn_ins, turn_mut]).astype(np.int64)
    op = np.concatenate([op_ins, op_mut])
    n = n_ins + n_mut
    lsn = np.arange(n, dtype=np.int64)
    # updates carry the lsn as version so per-turn text is unique per writer
    ver = np.concatenate([ver_ins, lsn[n_ins:]])
    return {"conv": conv, "turn": turn, "op": op, "lsn": lsn, "ver": ver}


_OP_NAMES = np.array(["insert", "update", "delete"])
_ROLES = np.array(["user", "assistant", "system", "tool"])


def _events_to_table(ev: dict[str, np.ndarray], lo: int, hi: int,
                     evolve_at: int | None) -> pa.Table:
    """Materialize events with lsn in [lo, hi) as an Arrow change table."""
    sl = slice(lo, hi)
    conv, turn, op, lsn, ver = (
        ev["conv"][sl], ev["turn"][sl], ev["op"][sl], ev["lsn"][sl], ev["ver"][sl]
    )
    is_del = op == 2
    role = _ROLES[np.where(turn % 2 == 0, 0, np.where(turn % 9 == 5, 3, 1))]
    tool = np.where((turn % 7 == 3) & (turn % 2 == 1), "search", "")
    # conv_id / per-turn text: deterministic functions of (conv, turn,
    # version).  Built with polars (parallel C string kernels) — numpy's
    # np.char was the generation bottleneck at 10^7+ events.
    import polars as pl

    sdf = pl.DataFrame({"conv": conv, "turn": turn, "ver": ver})
    built = sdf.select(
        conv_id=pl.lit("conv") + pl.col("conv").cast(pl.Utf8).str.zfill(8),
        text=pl.lit("turn text conv=") + pl.col("conv").cast(pl.Utf8)
        + pl.lit(" idx=") + pl.col("turn").cast(pl.Utf8)
        + pl.lit(" v=") + pl.col("ver").cast(pl.Utf8),
    )
    conv_id = built["conv_id"].to_arrow()
    text = built["text"].to_arrow()
    ts = TS_BASE_US + turn * 1_000_000 + conv  # payload event time
    src_ts = TS_BASE_US + lsn                  # unique, monotone

    mask = pa.array(is_del)
    cols = {
        "lsn": pa.array(lsn),
        "op": pa.array(_OP_NAMES[op]),
        "src_ts": pa.array(src_ts, type=pa.timestamp("us")),
        "conv_id": conv_id.cast(pa.string()),
        "turn_idx": pa.array(turn, type=pa.int32()),
        "role": pa.array(role),
        "text": text.cast(pa.string()),
        "tool": pa.array(tool),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    }
    # null-out payload columns on deletes (envelope stays)
    if is_del.any():
        import pyarrow.compute as pc
        for name in ("role", "text", "tool", "ts"):
            cols[name] = pc.if_else(mask, pa.scalar(None, cols[name].type), cols[name])

    tbl = pa.table(cols).cast(CHANGE_SCHEMA)
    # evolve when the slice contains any row at/past the switch LSN;
    # lsn is monotone, so the last element is the slice max (works for
    # both position-equal lsns and the scale-tier generator's globally
    # shifted lsns).
    if evolve_at is not None and len(lsn) and int(lsn[-1]) >= evolve_at:
        import pyarrow.compute as pc
        meta = pc.if_else(
            pa.array(lsn >= evolve_at),
            pa.scalar("model-v2", pa.string()),
            pa.scalar(None, pa.string()),
        )
        tbl = tbl.append_column("meta_model", meta).cast(CHANGE_SCHEMA_V2)
    return tbl


def write_changelog_dataset(changes, log_dir: str, *, band_id: int = 0,
                            n_bands: int = 1) -> dict:
    """Distributed change-log writer: a Dataset of change rows (any
    superset of :data:`CHANGE_SCHEMA`) lands as banded part files with
    no driver-side materialization — each Ray block is lsn-sorted in
    its task and written as one ``part-{lo}-lsn-{lo}-{hi}.parquet``
    (block lo-lsns are unique because lsns are globally unique, so the
    names never collide; a retried task overwrites its own file).

    ``n_bands > 1`` range-partitions rows into contiguous LSN bands by
    ``lsn % 1`` quantile-free striping: band = ``lsn * n_bands //
    (max_lsn + 1)`` — cheap, contiguous, and replay-order-correct
    because bands only need to be *disjoint and ordered*, not equal
    sized.  Returns ``{"n_events", "n_files", "max_lsn"}``."""
    import pyarrow.compute as _pc

    os.makedirs(log_dir, exist_ok=True)
    max_lsn = None
    if n_bands > 1:
        max_lsn = changes.max("lsn")
    for b in range(n_bands):
        os.makedirs(os.path.join(log_dir, f"band-{band_id + b:05d}"),
                    exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        t = t.sort_by("lsn")
        files, rows = [], []
        if n_bands > 1:
            band = _pc.cast(
                _pc.floor(_pc.divide(
                    _pc.multiply(_pc.cast(t["lsn"], pa.float64()),
                                 float(n_bands)),
                    float(max_lsn + 1))), pa.int64())
        else:
            band = pa.array(np.zeros(t.num_rows, np.int64))
        for bv in _pc.unique(band):
            sub = t.filter(_pc.equal(band, bv))
            lo = int(sub["lsn"][0].as_py())
            hi = int(sub["lsn"][-1].as_py())
            path = os.path.join(
                log_dir, f"band-{band_id + bv.as_py():05d}",
                f"part-{lo:012d}-lsn-{lo:012d}-{hi:012d}.parquet")
            pq.write_table(sub, path)
            files.append(path)
            rows.append(sub.num_rows)
        return pa.table({"file": pa.array(files, pa.string()),
                         "rows": pa.array(rows, pa.int64())})

    written = changes.map_batches(write_block, batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
    n_files = written.count()
    n_events = int(written.sum("rows")) if n_files else 0
    return {"n_events": n_events, "n_files": n_files,
            "max_lsn": max_lsn}


def generate_changelog(log_dir: str, spec: ChangeLogSpec) -> dict:
    """Write the change log to ``log_dir``; returns summary stats."""
    ev = _synth_events(spec)
    n = len(ev["lsn"])
    nsp = spec.n_source_partitions
    src_part = (ev["conv"].astype(np.uint64) * np.uint64(2654435761)) % np.uint64(nsp)

    bounds = np.linspace(0, n, spec.n_bands + 1).astype(np.int64)
    n_files = 0
    for b in range(spec.n_bands):
        lo, hi = int(bounds[b]), int(bounds[b + 1])
        if hi <= lo:
            continue
        band_dir = os.path.join(log_dir, f"band-{b:05d}")
        os.makedirs(band_dir, exist_ok=True)
        tbl = _events_to_table(ev, lo, hi, spec.evolve_at_lsn)
        parts = src_part[lo:hi]
        for sp in range(nsp):
            idx = np.nonzero(parts == sp)[0]
            if len(idx) == 0:
                continue
            sub = tbl.take(pa.array(idx))  # already lsn-sorted
            flo, fhi = int(sub["lsn"][0].as_py()), int(sub["lsn"][-1].as_py())
            path = os.path.join(
                band_dir, f"part-{sp:04d}-lsn-{flo:012d}-{fhi:012d}.parquet"
            )
            pq.write_table(sub, path)
            n_files += 1
    return {
        "n_events": n,
        "n_bands": spec.n_bands,
        "n_files": n_files,
        "max_lsn": n - 1,
    }


def compact_changelog(log_dir: str, out_dir: str,
                      up_to_lsn: int | None = None) -> dict:
    """Kafka-style LOG compaction of a change log: rewrite the band
    prefix whose ``lsn_hi <= up_to_lsn`` keeping only the LATEST event
    per (conv_id, turn_idx) — deletes survive as tombstones — and
    carry the tail bands over untouched.  At 10^10 events with heavy
    update churn, a fresh replay of the compacted log costs O(live
    keys), not O(events), with an IDENTICAL final table: per key the
    max-lsn event of (compacted prefix ∪ tail) is the max-lsn event of
    the original log, and LSN values are preserved verbatim so
    last-writer-wins, ``changes_between`` pruning and band watermarks
    all hold.

    Fully distributed: the prefix streams through the two-phase
    ``dedupe`` combine (one keyed exchange of the surviving rows);
    nothing materializes on the driver.

    Consumers: a lake whose ``committed_lsn >= up_to_lsn`` can keep
    replaying from the compacted log (its next bands are the untouched
    tail — band watermarks are all-or-nothing); a consumer mid-prefix
    must re-replay from scratch, same as after Kafka compaction.

    Returns ``{"events_before", "events_after", "up_to_lsn",
    "prefix_bands", "tail_bands"}``."""
    import shutil

    from rayflow.cdc.source import list_bands

    bands = list_bands(log_dir)
    if not bands:
        raise ValueError(f"compact_changelog: no bands in {log_dir}")
    if up_to_lsn is None:
        up_to_lsn = max(b.lsn_hi for b in bands)
    prefix = [b for b in bands if b.lsn_hi <= up_to_lsn]
    tail = [b for b in bands if b.lsn_hi > up_to_lsn]
    if not prefix:
        raise ValueError("compact_changelog: up_to_lsn below every "
                         "band — nothing to compact")

    import ray.data as rd

    from rayflow.ops import build_op

    ds = rd.read_parquet([f for b in prefix for f in b.files])
    events_before = ds.count()
    compacted = build_op({
        "op": "dedupe", "keys": ["conv_id", "turn_idx"],
        "order_col": "lsn", "keep": "max",
    })(ds)
    os.makedirs(out_dir, exist_ok=True)
    info = write_changelog_dataset(compacted, out_dir, band_id=0,
                                   n_bands=1)
    # tail bands carry over verbatim, renumbered after the compacted
    # band (band ids only need to be ordered, names carry the lsns)
    for i, b in enumerate(tail, start=1):
        bdir = os.path.join(out_dir, f"band-{i:05d}")
        os.makedirs(bdir, exist_ok=True)
        for f in b.files:
            shutil.copy2(f, os.path.join(bdir, os.path.basename(f)))
    return {"events_before": int(events_before),
            "events_after": int(info["n_events"]),
            "up_to_lsn": int(up_to_lsn),
            "prefix_bands": len(prefix), "tail_bands": len(tail)}
