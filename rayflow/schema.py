"""Schemas and schema-evolution helpers for the transcript lake.

The reference is schemaless (JSON message parts, ``⟨upstream:
internal/message/part.go⟩``); our Ray-Data rebuild is columnar, so the
open-ended payload becomes typed Arrow columns and schema evolution is
handled explicitly with ``pa.unify_schemas`` + safe casts (SURVEY.md §1.2).

The lake table schema comes verbatim from ``BASELINE.json.input_hint``:
``(conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[us])``.  Change events wrap that payload in
a CDC envelope ``(lsn: int64, op: string, src_ts: timestamp[us])``.
"""

from __future__ import annotations

import base64

import pyarrow as pa

# --- canonical schemas ----------------------------------------------------

#: Transcript lake table (the CDC target), from BASELINE.json input_hint.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

#: CDC envelope columns.  ``lsn`` is globally unique and monotone — the
#: last-writer-wins order.  ``src_ts`` is the documented tiebreak (ties are
#: impossible by construction in the synthetic log; see SURVEY.md §7.5).
ENVELOPE_FIELDS = [
    ("lsn", pa.int64()),
    ("op", pa.string()),  # insert | update | delete
    ("src_ts", pa.timestamp("us")),
]

#: Full change-event schema = envelope + nullable payload.
CHANGE_SCHEMA = pa.schema(ENVELOPE_FIELDS + list(TRANSCRIPT_SCHEMA))

#: Key columns of the lake table (the upsert key).
KEY_COLUMNS = ["conv_id", "turn_idx"]

#: Internal lake metadata columns (kept in the lake Parquet so later merge
#: steps can LWW against stored rows; stripped from user-facing reads).
META_LSN = "_lsn"

OPS = ("insert", "update", "delete")


# --- evolution helpers ----------------------------------------------------


def unify(*schemas: pa.Schema) -> pa.Schema:
    """Unified schema with permissive promotion (int32→int64 widen, new
    columns appended).  This is the merge-time evolution rule from the
    north star: column add / type widen on the transcript payload."""
    return pa.unify_schemas(list(schemas), promote_options="permissive")


def conform(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast ``table`` to ``schema``: missing columns become all-null,
    matching columns are (safely) cast, column order follows ``schema``.
    Extra columns not in ``schema`` are dropped."""
    n = table.num_rows
    cols = []
    for field in schema:
        if field.name in table.column_names:
            col = table.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def schema_to_str(schema: pa.Schema) -> str:
    """Serialize a schema for the JSON manifest (base64 Arrow IPC)."""
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_str(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.py_buffer(base64.b64decode(s)))
