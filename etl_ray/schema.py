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


def widen_type(old: pa.DataType, new: pa.DataType) -> pa.DataType:
    """Widening-only schema evolution for an evolved payload column that
    reappears with a DIFFERENT numeric type: pick the narrowest type
    both cast to losslessly (int8→…→int64 within a signedness, mixed
    sign → the signed type one width up, any int↔float mix or
    float32/float64 mix → float64). Everything else — string↔numeric,
    nested, shrinks the lattice can't express — raises: a loud refusal
    beats silently truncating committed lake data. Old partition files
    keep their narrow type on disk; reads cast UP via the state-schema
    alignment (stages/merge.py:_align_columns), so no rewrite happens.
    """
    if old.equals(new):
        return old
    ints = {pa.types.is_integer(t) for t in (old, new)}
    floats = {pa.types.is_floating(t) for t in (old, new)}
    if ints == {True}:
        signed = any(pa.types.is_signed_integer(t) for t in (old, new))
        unsigned = any(pa.types.is_unsigned_integer(t) for t in (old, new))
        bits = max(old.bit_width, new.bit_width)
        if signed and unsigned:
            bits *= 2  # an unsigned needs one extra bit in signed form
        if bits > 64:
            raise ValueError(f"cannot widen {old} + {new} losslessly")
        table = (
            {8: pa.int8(), 16: pa.int16(), 32: pa.int32(), 64: pa.int64()}
            if signed
            else {8: pa.uint8(), 16: pa.uint16(), 32: pa.uint32(),
                  64: pa.uint64()}
        )
        return table[bits]
    if floats == {True} or (True in ints and True in floats):
        return pa.float64()
    raise ValueError(
        f"incompatible payload evolution: {old} -> {new} (only numeric "
        "widening is supported; rewrite the column under a new name)"
    )
