"""CDC / incremental-ingest core.

Rebuilds the reference's delivery-guarantee semantics (``⟨upstream:
internal/checkpoint/capped.go⟩`` contiguous-ack offset checkpointing,
``⟨upstream: internal/message/transaction.go⟩`` ack-on-persist) as:

- a binlog/WAL-style change log on disk: lsn-banded Parquet file groups,
  split by source partition (:mod:`rayflow.cdc.changelog`,
  :mod:`rayflow.cdc.source`);
- key-partitioned last-writer-wins upsert with hot-key salting
  (:mod:`rayflow.cdc.partitioner`, :mod:`rayflow.cdc.merge`);
- an exactly-once Parquet lake sink: idempotent partition-state files +
  an atomically-committed manifest holding per-partition committed LSNs,
  lineage and metrics (:mod:`rayflow.cdc.sink`);
- resumable replay (:mod:`rayflow.cdc.replay`).
"""

from rayflow.cdc.branch import (branch_lake, rebase_branch_to_copy,
                                remove_branch_pin)
from rayflow.cdc.changelog import ChangeLogSpec, generate_changelog
from rayflow.cdc.replay import CdcEngine, ReplayStats
from rayflow.cdc.views import TumblingWindowView

__all__ = ["ChangeLogSpec", "generate_changelog", "CdcEngine", "ReplayStats",
           "TumblingWindowView", "branch_lake", "remove_branch_pin",
           "rebase_branch_to_copy"]
