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
