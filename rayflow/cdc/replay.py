"""Resumable CDC replay driver: change log → Parquet lake, band by band.

The Ray-Data-native rebuild of the reference's stream lifecycle
(``⟨upstream: internal/stream/type.go⟩`` input → pipeline → output with
ack-gated offset commit): each *band* (contiguous LSN range) is one
micro-batch —

    read_parquet(band files)                  # lazy, streaming blocks
      → map_batches(NormalizeChanges)         # zero-copy Arrow: cast to the
                                              #   band's unified schema, validate,
                                              #   partial LWW reduce, salted part_id
      → groupby(_part_id)                     # the one shuffle, keyed and salted
      → map_groups(MergeWorker, concurrency)  # actor pool: hydrate + LWW + write
      → take_all()                            # only tiny per-partition stats rows
    manifest.commit_band(...)                 # atomic exactly-once commit

Only statistics rows ever reach the driver; transcript data streams
from the change log to the lake through the object store.  Partition
count and the salt plan are fixed at lake creation and persisted in the
manifest — key→partition placement must be stable for the lifetime of
the lake (a moved key would LWW against the wrong base state).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import pyarrow as pa

from rayflow.cdc.merge import MergeWorker, NormalizeChanges, lake_schema_for
from rayflow.cdc.partitioner import PART_COL, plan_salts
from rayflow.cdc.sink import LakeManifest
from rayflow.cdc.source import band_schema, list_bands
from rayflow.schema import META_LSN, unify


@dataclass
class ReplayStats:
    bands_applied: int = 0
    n_events: int = 0
    wall_s: float = 0.0
    lineage: list[dict] = field(default_factory=list)

    @property
    def events_per_s(self) -> float:
        return self.n_events / self.wall_s if self.wall_s > 0 else 0.0


class CdcEngine:
    """One engine instance per lake directory.

    ``num_partitions`` bounds per-partition merge state (size it so one
    partition's latest-version rows fit a worker's heap at target scale:
    P ≈ total_keys × row_bytes / partition_budget).  ``merge_concurrency``
    sizes the merge actor pool; leave headroom for the read/normalize
    stages so the streaming executor can pipeline (SURVEY.md §4).
    """

    def __init__(
        self,
        lake_dir: str,
        num_partitions: int = 32,
        merge_concurrency: int | None = None,
        auto_salt: bool = True,
        salt_sample_fraction: float = 0.05,
        seed: int = 42,
    ):
        self.lake_dir = lake_dir
        self.num_partitions = num_partitions
        self.merge_concurrency = merge_concurrency
        self.auto_salt = auto_salt
        self.salt_sample_fraction = salt_sample_fraction
        self.seed = seed
        self.manifest = LakeManifest(lake_dir)
        # key→partition placement is a property of the LAKE, fixed at its
        # creation: resuming with a different partition count would LWW new
        # deltas against the wrong base state.  Adopt the manifest's value.
        existing_p = self.manifest.state.get("num_partitions")
        if existing_p is not None and int(existing_p) != num_partitions:
            import warnings

            warnings.warn(
                f"lake {lake_dir} was created with num_partitions={existing_p}; "
                f"ignoring requested {num_partitions}",
                stacklevel=2,
            )
            self.num_partitions = int(existing_p)

    # -- replay ------------------------------------------------------------

    def replay(self, log_dir: str, max_bands: int | None = None) -> ReplayStats:
        """Apply all un-committed bands of ``log_dir`` (resume-safe)."""
        import ray
        import ray.data as rd

        # actor-pool size: leave headroom for read/normalize stages so the
        # streaming executor can pipeline instead of serializing stages
        merge_conc = self.merge_concurrency or max(
            1, min(self.num_partitions, int(ray.cluster_resources().get("CPU", 8)) - 2)
        )

        stats = ReplayStats()
        t0 = time.perf_counter()
        bands = list_bands(log_dir, after_lsn=self.manifest.committed_lsn)
        if max_bands is not None:
            bands = bands[:max_bands]

        salts = {k: int(v) for k, v in self.manifest.state.get("salts", {}).items()}
        if (
            self.auto_salt and not salts and self.manifest.committed_lsn < 0 and bands
        ):
            # Plan the salt map ONCE at lake creation from a sample of the
            # whole visible log (key column only — pruned at the read), then
            # persist it: key→partition placement must stay stable forever.
            all_files = [f for b in bands for f in b.files]
            key_ds = rd.read_parquet(all_files, columns=["conv_id"])
            salts = plan_salts(
                key_ds,
                self.num_partitions,
                sample_fraction=self.salt_sample_fraction,
                seed=self.seed,
            )
        for band in bands:
            tb0 = time.perf_counter()
            step_schema = band_schema(band)
            prior = self.manifest.schema
            if prior is not None:
                step_schema = unify(prior, step_schema)

            ds = rd.read_parquet(band.files)
            n_raw = ds.count()  # Parquet footer metadata — no data read

            normalized = ds.map_batches(
                NormalizeChanges(step_schema, self.num_partitions, salts),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            merged = normalized.groupby(PART_COL).map_groups(
                MergeWorker,
                fn_constructor_kwargs=dict(
                    lake_dir=self.lake_dir,
                    base_files=self.manifest.partition_files(),
                    change_schema=step_schema,
                    band_hi=band.lsn_hi,
                ),
                batch_format="pyarrow",
                concurrency=merge_conc,
                num_cpus=1,
            )
            part_stats = merged.take_all()  # P tiny rows
            wall = time.perf_counter() - tb0

            lineage = {
                "band_id": band.band_id,
                "lsn_lo": band.lsn_lo,
                "lsn_hi": band.lsn_hi,
                "input_files": [f.split("/")[-2] + "/" + f.split("/")[-1] for f in band.files],
                "n_events": n_raw,
                "n_partitions_touched": len(part_stats),
                "rows_after": int(sum(r["rows"] for r in part_stats)),
                "wall_s": round(wall, 4),
                "events_per_s": round(n_raw / wall, 1) if wall > 0 else None,
            }
            self.manifest.commit_band(
                band_hi=band.lsn_hi,
                schema=step_schema,
                part_stats=part_stats,
                salts=salts,
                lineage=lineage,
                num_partitions=self.num_partitions,
            )
            stats.bands_applied += 1
            stats.n_events += n_raw
            stats.lineage.append(lineage)

        stats.wall_s = time.perf_counter() - t0
        return stats

    # -- read side ---------------------------------------------------------

    def final_dataset(self, include_meta: bool = False):
        """The lake as a streaming ``ray.data.Dataset`` (no full
        materialization).  Mixed-schema partition files are unified on
        read (the lake may hold pre-evolution files until rewritten)."""
        import ray.data as rd

        files = self.manifest.live_files()
        if not files:
            sch = self.manifest.schema
            empty = (lake_schema_for(sch) if sch else pa.schema([])).empty_table()
            return rd.from_arrow(empty)
        target = lake_schema_for(self.manifest.schema)
        ds = rd.read_parquet(files)

        from rayflow.schema import conform  # local import: small closure

        ds = ds.map_batches(
            lambda t: conform(t, target), batch_format="pyarrow", zero_copy_batch=True
        )
        if not include_meta:
            ds = ds.drop_columns([META_LSN])
        return ds

    def final_table(self, include_meta: bool = True) -> pa.Table:
        """Driver-side materialization for tests/verification only —
        sorted by ``(conv_id, turn_idx)`` per the correctness gate."""
        import ray

        ds = self.final_dataset(include_meta=include_meta)
        if ds.count() == 0:
            sch = self.manifest.schema
            return (lake_schema_for(sch) if sch else pa.schema([])).empty_table()
        refs = ds.sort(["conv_id", "turn_idx"]).to_arrow_refs()
        tables = [t for t in ray.get(refs) if t.num_rows > 0]
        return pa.concat_tables(tables, promote_options="permissive")
