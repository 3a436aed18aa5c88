"""Exactly-once lake sink: atomic manifest with per-partition checkpoints.

The reference guarantees at-least-once via transaction acks and commits
source offsets only over a contiguous acked prefix (``⟨upstream:
internal/message/transaction.go⟩``, ``⟨upstream:
internal/checkpoint/capped.go⟩``).  Ray Data has no per-record acks, so
we strengthen to *exactly-once* the lakehouse way (SURVEY.md §7.4):

- partition state files are **idempotent**: their path is a pure function
  of ``(part_id, band_hi)`` and their content is deterministic, so
  retried or duplicated tasks converge;
- a file not referenced by the manifest does not exist.  The **manifest**
  is a single JSON document, written by exactly one writer (the replay
  driver) via write-temp + ``os.replace`` (atomic on POSIX) — the commit
  point of a band;
- the manifest stores the global committed LSN watermark, the
  per-partition ``(file, lsn, rows)`` checkpoint map, the unified lake
  schema, the salt plan, and a **lineage** record per committed band
  (input files, lsn range, event/row counts, wall time, events/s) — the
  resumability + metrics contract of the north rule.

Crash anywhere before the manifest replace → the next run re-lists bands
above the old watermark and regenerates identical state files.  Crash
after → the band is committed and skipped.  Double-apply of a band is a
no-op by LWW idempotence.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any

import pyarrow as pa

from rayflow.schema import schema_from_str, schema_to_str

MANIFEST_NAME = "manifest.json"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed to this lake after we loaded the
    manifest.  The commit was NOT applied; reload the manifest (and
    recompute from the new watermark) before retrying."""


class LakeManifest:
    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        self.path = os.path.join(lake_dir, MANIFEST_NAME)
        self.state: dict[str, Any] = {
            "version": 0,
            "committed_lsn": -1,
            "schema": None,           # unified *change* schema (b64 Arrow IPC)
            "num_partitions": None,   # fixed at lake creation; placement law
            "partitions": {},         # part_id(str) -> {file, lsn, rows}
            "salts": {},
            "lineage": [],
        }
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)
        # optimistic-concurrency watermark: the manifest version we
        # loaded from disk.  commit_band() re-checks it under the lake
        # lock — a second writer that committed since we loaded makes
        # our commit raise instead of silently clobbering its band.
        self._disk_version = int(self.state["version"])

    # -- read side ---------------------------------------------------------

    @property
    def committed_lsn(self) -> int:
        return int(self.state["committed_lsn"])

    @property
    def schema(self) -> pa.Schema | None:
        s = self.state.get("schema")
        return schema_from_str(s) if s else None

    def partition_files(self) -> dict[int, str]:
        return {
            int(pid): os.path.join(self.lake_dir, rec["file"])
            for pid, rec in self.state["partitions"].items()
        }

    def live_files(self) -> list[str]:
        return sorted(self.partition_files().values())

    # -- commit ------------------------------------------------------------

    def commit_band(
        self,
        *,
        band_hi: int,
        schema: pa.Schema,
        part_stats: list[dict],
        salts: dict[str, int],
        lineage: dict,
        num_partitions: int | None = None,
    ) -> None:
        """Atomically publish one band's result.  ``part_stats`` rows come
        from the merge workers; untouched partitions keep their entries."""
        for rec in part_stats:
            self.state["partitions"][str(int(rec["part_id"]))] = {
                "file": os.path.relpath(rec["file"], self.lake_dir),
                "lsn": int(rec["lsn_hi"]),
                "rows": int(rec["rows"]),
            }
        self.state["committed_lsn"] = int(band_hi)
        if num_partitions is not None and self.state.get("num_partitions") is None:
            self.state["num_partitions"] = int(num_partitions)
        self.state["schema"] = schema_to_str(schema)
        self.state["salts"] = {str(k): int(v) for k, v in salts.items()}
        self.state["lineage"].append(lineage)
        self.state["version"] = int(self.state["version"]) + 1
        self._write()

    def _write(self) -> None:
        """Publish under the lake lock with an optimistic version check.

        The single-writer contract (one replay driver per lake) is the
        design point; this guard turns an accidental second writer —
        two `tail` daemons pointed at one lake, a human rerunning a
        backfill while the daemon is live — from silent lost-update
        corruption into a loud :class:`ConcurrentCommitError`.  The
        ``flock`` makes read-check-replace atomic against other
        checkers; the version check detects commits that landed between
        our load and now.  Single-writer commits are unaffected."""
        import fcntl

        os.makedirs(self.lake_dir, exist_ok=True)
        lock_path = os.path.join(self.lake_dir, ".manifest.lock")
        with open(lock_path, "w") as lock_f:
            fcntl.flock(lock_f, fcntl.LOCK_EX)
            if os.path.exists(self.path):
                with open(self.path) as f:
                    disk_version = int(json.load(f)["version"])
                if disk_version != self._disk_version:
                    raise ConcurrentCommitError(
                        f"lake {self.lake_dir}: manifest version moved "
                        f"{self._disk_version} -> {disk_version} since this "
                        f"writer loaded it; reload and retry")
            fd, tmp = tempfile.mkstemp(dir=self.lake_dir, prefix=".manifest.")
            try:
                with os.fdopen(fd, "w") as f:
                    json.dump(self.state, f, indent=1)
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, self.path)
                self._disk_version = int(self.state["version"])
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
