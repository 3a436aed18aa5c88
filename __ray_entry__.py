"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC pipeline; ``queries()`` /
``oracle_sql()`` expose the operator surface with DuckDB oracles
(see :mod:`rayflow.queries`).  Ray is initialised by the driver BEFORE
this module is imported — nothing here calls ``ray.init()``.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: deterministic transcript change log (seed=42, sized from
    the sf0.001 tier) → full CDC replay (normalize → salted partition →
    LWW merge actor pool → exactly-once Parquet lake) → final lake table
    as a ``ray.data.Dataset`` sorted by (conv_id, turn_idx) semantics."""
    from rayflow.cdc import ChangeLogSpec, CdcEngine, generate_changelog

    work = tempfile.mkdtemp(prefix="rayflow-entry-")
    log_dir = os.path.join(work, "log")
    spec = ChangeLogSpec(
        n_convs=300,
        turns_per_conv=8.0,
        update_ratio=0.8,
        delete_ratio=0.08,
        zipf_s=1.3,
        n_source_partitions=4,
        n_bands=4,
        seed=42,
        evolve_at_lsn=2500,
    )
    generate_changelog(log_dir, spec)
    engine = CdcEngine(os.path.join(work, "lake"), num_partitions=16)
    engine.replay(log_dir)
    ds = engine.final_dataset(include_meta=True)
    shutil.rmtree(log_dir, ignore_errors=True)
    return ds


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from rayflow.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names)."""
    from rayflow.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
