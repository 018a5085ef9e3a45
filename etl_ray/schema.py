"""Canonical Arrow schemas and constants for the CDC engine.

The reference pins every boundary schema explicitly (CSV dtype map at
``etl/cleaning/clean_data.py:86-114``; the 28-column trajectory frame at
``etl/trajectory/builder.py:542-591``). We do the same: the change-event
envelope and the lake-state layout are declared here and enforced at the
validate stage.
"""

from __future__ import annotations

import pyarrow as pa

# --- change-event envelope (BASELINE.json input_hint + CDC columns) ---------

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
VALID_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)

#: Payload columns straight from BASELINE.json ``input_hint``.
PAYLOAD_COLUMNS = ["repo", "path", "commit", "lang", "content"]

#: Required columns of a change event. ``seq`` is the recorded-log order
#: (tailer order, NOT authoritative); ``commit_seq`` is the authoritative
#: commit ordering per key — the last-writer-wins key, ties broken by seq.
EVENT_SCHEMA = pa.schema(
    [
        ("seq", pa.int64()),
        ("op", pa.string()),
        ("commit_seq", pa.int64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

EVENT_COLUMNS = [f.name for f in EVENT_SCHEMA]

# --- lake partition state ----------------------------------------------------

#: Columns every partition-state file carries (evolved payload columns are
#: appended after these, in first-seen order). ``deleted`` rows are retained
#: tombstones: they keep the winning ``(commit_seq, seq)`` so a stale
#: out-of-order I/U replayed later can never resurrect the key (analog of
#: the reference's ensure + ``ON CONFLICT DO NOTHING`` idempotence,
#: ``etl/insert/bulk_inserter.py:59-113``).
STATE_COLUMNS = [
    "repo",
    "path",
    "commit",
    "commit_seq",
    "seq",
    "lang",
    "content",
    "content_sha256",
    "deleted",
    "part",
]

#: Internal columns added by the engine; everything else is payload.
ENGINE_COLUMNS = {"seq", "commit_seq", "op", "part", "content_sha256", "deleted", "_valid"}

#: Column added by the validate stage: target partition.
PART_COLUMN = "part"

#: Sentinel conventions mirrored from the reference (etl/constants.py:9-10).
UNKNOWN_STRING = "Unknown"
UNKNOWN_INT = -1


def state_schema(extra_payload: list[tuple[str, pa.DataType]] | None = None) -> pa.Schema:
    """Arrow schema of a partition-state file, with optional evolved columns."""
    fields = [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("commit_seq", pa.int64()),
        ("seq", pa.int64()),
        ("lang", pa.string()),
        ("content", pa.string()),
        ("content_sha256", pa.string()),
        ("deleted", pa.bool_()),
        ("part", pa.int32()),
    ]
    if extra_payload:
        fields.extend(extra_payload)
    return pa.schema(fields)
