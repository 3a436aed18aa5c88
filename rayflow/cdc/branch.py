"""Lake branching: zero-copy clones of a CDC lake's committed state.

The lakehouse analogue of the reference's ``broker`` fan-out at the
TABLE level (``⟨upstream: internal/impl/pure/output_broker.go⟩`` routes
one stream to many sinks; a branch routes one committed STATE to many
independent futures): a branch is a new lake directory whose manifest
references the source's immutable partition-state files.  Because
state files are pure functions of ``(part_id, band_hi)`` and every
engine writes new state under its OWN lake dir, a branch gets
copy-on-write for free — its first post-branch commit rewrites only
the touched partitions locally and the manifests diverge from there.
Nothing in the source is ever mutated by branch activity.

Two modes:

- ``reference`` (default, zero-copy): the branch manifest points at the
  source's files via relative paths.  The source manifest records a
  **pin** for those files so ``CdcEngine.vacuum()`` on the source will
  not delete them while the branch exists (`remove_branch_pin` releases
  it).  ``compact()`` on the source is always safe — it writes NEW
  files and supersedes, never mutates.
- ``copy``: state files are copied into the branch; fully independent
  (survives deleting the source), costs one read+write of the live
  state.

Time travel on a branch starts at the branch point: the branch's
lineage begins with a single origin record (no ``lsn_hi``), so
``snapshot_lsns()`` only ever advertises post-branch commits.  To
branch further back, pass ``as_of_lsn`` — the selection rule is the
same manifest-driven one as ``snapshot_dataset`` (per-partition latest
state file across source commits at or below the watermark), with the
same loud failure if vacuum already pruned that history.
"""

from __future__ import annotations

import json
import os
import shutil

from rayflow.cdc.sink import MANIFEST_NAME, LakeManifest


def _select_files(src: LakeManifest, as_of_lsn: int | None
                  ) -> tuple[dict[int, str], int]:
    """Per-partition ABSOLUTE state-file paths at the watermark."""
    if as_of_lsn is None or as_of_lsn >= src.committed_lsn:
        return src.partition_files(), src.committed_lsn
    latest: dict[int, str] = {}
    for rec in src.state.get("lineage", []):
        if int(rec.get("lsn_hi", -1)) <= as_of_lsn:
            for p in rec.get("partitions", []):
                latest[int(p["part_id"])] = p["file"]
    files, missing = {}, []
    for pid, base in latest.items():
        f = os.path.join(src.lake_dir, f"part-{pid:05d}", base)
        if os.path.exists(f):
            files[pid] = f
        else:
            missing.append(f)
    if missing:
        raise FileNotFoundError(
            f"branch as of lsn {as_of_lsn}: {len(missing)} state file(s) "
            f"no longer exist (e.g. {missing[0]}) — vacuum() prunes "
            "superseded files, so historical branching reaches only "
            "un-vacuumed history")
    return files, int(as_of_lsn)


def branch_lake(src_lake: str, dst_lake: str, *,
                as_of_lsn: int | None = None,
                mode: str = "reference") -> dict:
    """Create ``dst_lake`` as a branch of ``src_lake``'s committed state
    (optionally at an earlier watermark).  Returns ``{"branch",
    "as_of_lsn", "mode", "n_partitions", "n_files"}``.

    The branch is a full lake: ``CdcEngine(dst_lake)`` replays new
    bands onto it, reads it, compacts it — all independently of the
    source.  ``num_partitions`` and the salt plan are inherited (they
    are placement LAW for the state being referenced)."""
    if mode not in ("reference", "copy"):
        raise ValueError(f"branch_lake: mode must be 'reference' or "
                         f"'copy', got {mode!r}")
    src = LakeManifest(src_lake)
    if src.schema is None:
        raise ValueError(f"branch_lake: {src_lake} has no committed state")
    if os.path.exists(os.path.join(dst_lake, MANIFEST_NAME)):
        raise FileExistsError(f"branch_lake: {dst_lake} is already a lake")
    files, at_lsn = _select_files(src, as_of_lsn)

    os.makedirs(dst_lake, exist_ok=True)
    partitions: dict[str, dict] = {}
    for pid, abs_path in sorted(files.items()):
        if mode == "copy":
            part_dir = os.path.join(dst_lake, f"part-{pid:05d}")
            os.makedirs(part_dir, exist_ok=True)
            local = os.path.join(part_dir, os.path.basename(abs_path))
            shutil.copy2(abs_path, local)
            rel = os.path.relpath(local, dst_lake)
        else:
            rel = os.path.relpath(abs_path, dst_lake)
        # lsn/rows in the source record describe the file at the CURRENT
        # watermark; at a historical branch point re-stating lsn as the
        # branch watermark keeps the invariant lsn <= committed_lsn
        src_rec = src.state["partitions"].get(str(pid), {})
        partitions[str(pid)] = {
            "file": rel,
            "lsn": min(int(src_rec.get("lsn", at_lsn)), at_lsn),
            "rows": int(src_rec.get("rows", -1)),
        }

    dst = LakeManifest(dst_lake)
    dst.state.update({
        "committed_lsn": at_lsn,
        "schema": src.state["schema"],
        "num_partitions": src.state.get("num_partitions"),
        "partitions": partitions,
        "salts": dict(src.state.get("salts", {})),
        # origin record carries NO lsn_hi on purpose: branch time travel
        # starts at the branch point (see module docstring)
        "lineage": [{
            "branched_from": os.path.abspath(src_lake),
            "branch_as_of_lsn": at_lsn,
            "branch_mode": mode,
        }],
        "version": 1,
    })
    dst._write()

    if mode == "reference":
        _update_pins(src_lake, os.path.abspath(dst_lake),
                     sorted(files.values()))
    return {"branch": dst_lake, "as_of_lsn": at_lsn, "mode": mode,
            "n_partitions": len(partitions), "n_files": len(files)}


def remove_branch_pin(src_lake: str, branch: str) -> bool:
    """Release the vacuum pin a reference branch holds on ``src_lake``
    (call when the branch is deleted or after converting it with
    ``rebase_branch_to_copy``).  Returns whether a pin existed."""
    return _update_pins(src_lake, os.path.abspath(branch), None)


def _update_pins(src_lake: str, branch_key: str,
                 files: list[str] | None) -> bool:
    """Set (or clear, when ``files`` is None) one branch's pin in the
    source manifest — atomically, under the lake lock, re-reading the
    manifest so concurrent engine commits are never clobbered."""
    import fcntl
    import tempfile

    path = os.path.join(src_lake, MANIFEST_NAME)
    lock_path = os.path.join(src_lake, ".manifest.lock")
    with open(lock_path, "w") as lock_f:
        fcntl.flock(lock_f, fcntl.LOCK_EX)
        with open(path) as f:
            state = json.load(f)
        pins = state.setdefault("pins", {})
        existed = branch_key in pins
        if files is None:
            if not existed:
                return False
            del pins[branch_key]
        else:
            pins[branch_key] = [os.path.relpath(f, src_lake) for f in files]
        state["version"] = int(state["version"]) + 1
        fd, tmp = tempfile.mkstemp(dir=src_lake, prefix=".manifest.")
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(state, f, indent=1)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return existed


def rebase_branch_to_copy(branch: str) -> int:
    """Convert a reference branch into a self-contained copy: copy every
    still-external state file into the branch and repoint its manifest.
    Returns files copied.  Call ``remove_branch_pin`` on the source
    afterwards.  Useful before archiving/moving a branch, or to let the
    source vacuum freely."""
    m = LakeManifest(branch)
    copied = 0
    for pid_s, rec in m.state["partitions"].items():
        abs_path = os.path.join(branch, rec["file"])
        if os.path.commonpath([os.path.abspath(abs_path),
                               os.path.abspath(branch)]) \
                == os.path.abspath(branch):
            continue                      # already local
        pid = int(pid_s)
        part_dir = os.path.join(branch, f"part-{pid:05d}")
        os.makedirs(part_dir, exist_ok=True)
        local = os.path.join(part_dir, os.path.basename(abs_path))
        tmp = local + f".tmp.{os.getpid()}"
        shutil.copy2(abs_path, tmp)
        os.replace(tmp, local)
        rec["file"] = os.path.relpath(local, branch)
        copied += 1
    m.state["version"] = int(m.state["version"]) + 1
    m._write()
    return copied
