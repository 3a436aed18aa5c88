"""Change-log source: enumerate lsn-banded Parquet file groups.

The analogue of the reference's ordered-input tail (``⟨upstream:
internal/impl/kafka/`` partition claims + offset fetch⟩): list the bands
of the on-disk change log, skip everything at or below the committed
watermark, and hand each remaining band to the replay loop as one
micro-batch.  File names encode the contained LSN range, so resume
prunes *without opening any file* — only Parquet footers of live bands
are ever touched.
"""

from __future__ import annotations

import glob
import os
import re
from dataclasses import dataclass, field

import pyarrow.parquet as pq

_FILE_RE = re.compile(r"part-(\d+)-lsn-(\d+)-(\d+)\.parquet$")


@dataclass(frozen=True)
class Band:
    """One replay micro-batch: a contiguous global LSN range of files."""

    band_id: int
    files: list[str] = field(default_factory=list)
    lsn_lo: int = 0
    lsn_hi: int = 0


def list_bands(log_dir: str, after_lsn: int = -1) -> list[Band]:
    """Bands whose LSN range lies strictly above ``after_lsn``, in order.

    A band is all-or-nothing: replay commits whole bands, so a band with
    ``lsn_hi <= after_lsn`` is already applied and skipped (contiguous
    watermark semantics, like the reference's capped checkpointer).
    """
    bands: list[Band] = []
    for band_dir in sorted(glob.glob(os.path.join(log_dir, "band-*"))):
        band_id = int(os.path.basename(band_dir).split("-")[1])
        files, lo, hi = [], None, None
        for f in sorted(glob.glob(os.path.join(band_dir, "part-*.parquet"))):
            m = _FILE_RE.search(f)
            if not m:
                continue
            flo, fhi = int(m.group(2)), int(m.group(3))
            files.append(f)
            lo = flo if lo is None else min(lo, flo)
            hi = fhi if hi is None else max(hi, fhi)
        if files and hi is not None and hi > after_lsn:
            bands.append(Band(band_id, files, lo, hi))
    return bands


def band_schema(band: Band):
    """Unified Arrow schema of a band's files (footer reads only)."""
    import pyarrow as pa

    schemas = [pq.read_schema(f) for f in band.files]
    return pa.unify_schemas(schemas, promote_options="permissive")


def changes_between(log_dir: str, lo_lsn: int, hi_lsn: int):
    """Change-data-feed read: the change events with
    ``lo_lsn < lsn <= hi_lsn`` as a streaming Dataset — "what happened
    between two watermarks", the consumer-side complement of
    :meth:`CdcEngine.snapshot_dataset`.  Band enumeration prunes whole
    files by their LSN-range filenames (no data read); only the two
    boundary bands need a row filter."""
    import pyarrow.compute as pc
    import ray.data as rd

    bands = [b for b in list_bands(log_dir, after_lsn=-1)
             if b.lsn_hi > lo_lsn and b.lsn_lo <= hi_lsn]
    files = [f for b in bands for f in b.files]
    if not files:
        import pyarrow as pa

        return rd.from_arrow(pa.table({"lsn": pa.array([], pa.int64())}))
    import pyarrow as pa

    from rayflow.schema import conform

    # schema-evolved logs: later bands may add columns — unify from the
    # footers (no data read) and conform every batch, as replay does
    target = pa.unify_schemas([pq.read_schema(f) for f in files],
                              promote_options="permissive")
    ds = rd.read_parquet(files)

    def clip(t):
        t = conform(t, target)
        keep = pc.and_(pc.greater(t["lsn"], lo_lsn),
                       pc.less_equal(t["lsn"], hi_lsn))
        return t.filter(keep)

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True)
