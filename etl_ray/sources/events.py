"""Change-log source: file discovery, window planning, unified-schema reads.

Reference analog: the archive lister / ``ensure_file_for_date`` input
resolution (``etl/gatherer/file_downloader.py:44-139``) — discovery is a
cheap driver-side step; the heavy read is a column-pruned
``ray.data.read_parquet``.

Window planning is deterministic: given the sorted log-segment file list,
group files greedily into windows of ~``window_events`` rows using only
footer metadata (no data read).

Resume cursor: windows are whole-file granular, so the durable cursor is
FILE-based, not window-index-based — the manifest records how many log
files have been fully consumed (``log_files_done``) plus a chained
fingerprint of their (name, row-count) sequence. On resume the engine
verifies the consumed prefix is byte-identical (append-only discipline)
and plans fresh windows over only the remaining files. A committed
below-threshold tail window is therefore harmless: appended segments form
NEW windows and are never silently folded into an already-committed one.
"""

from __future__ import annotations

import glob
import hashlib
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


@dataclass
class Window:
    index: int
    files: list[str]
    rows: int
    #: per-file row counts, aligned with ``files`` — lets the replay
    #: loop chain the cursor fingerprint without re-reading footers
    #: plan_windows already read
    file_rows: list[int] = None


def list_segments(events_path: str) -> list[str]:
    """Sorted parquet segment files for a log directory or single file."""
    if os.path.isdir(events_path):
        return sorted(glob.glob(os.path.join(events_path, "*.parquet")))
    return [events_path]


def unified_schema(files: list[str]) -> pa.Schema:
    """Unify footer schemas across segments: additive evolution (new
    columns appear nullable) plus numeric TYPE WIDENING when a payload
    column reappears wider (schema.py:widen_type lattice — Arrow's
    ``unify_schemas`` refuses int32 vs int64, so conflicting fields are
    widened first and unification runs on the rewritten footers)."""
    from etl_ray.schema import widen_type

    schemas = [pq.read_schema(f) for f in files]
    types: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            prev = types.get(f.name)
            types[f.name] = f.type if prev is None else (
                prev if prev.equals(f.type) else widen_type(prev, f.type)
            )
    widened = [
        pa.schema([pa.field(f.name, types[f.name]) for f in s])
        for s in schemas
    ]
    return pa.unify_schemas(widened, promote_options="default")


def plan_windows(files: list[str], window_events: int) -> list[Window]:
    """Greedy grouping of whole segment files into ~window_events windows."""
    windows: list[Window] = []
    cur: list[str] = []
    cur_counts: list[int] = []
    cur_rows = 0
    for f in files:
        n = pq.read_metadata(f).num_rows
        cur.append(f)
        cur_counts.append(n)
        cur_rows += n
        if cur_rows >= window_events:
            windows.append(Window(len(windows), cur, cur_rows, cur_counts))
            cur, cur_counts, cur_rows = [], [], 0
    if cur:
        windows.append(Window(len(windows), cur, cur_rows, cur_counts))
    return windows


def chain_fingerprint(fp: str, file_path: str, rows: int) -> str:
    """Incrementally chain the log-prefix fingerprint with one segment.

    ``fp_{i+1} = sha256(fp_i | basename_i | rows_i)`` — O(1) per appended
    file during a run, and recomputable over ``files[:log_files_done]`` on
    resume to detect a mutated / reordered prefix (segments are immutable;
    the log is append-only).
    """
    h = hashlib.sha256()
    h.update(fp.encode())
    h.update(b"\x00")
    h.update(os.path.basename(file_path).encode())
    h.update(b"\x00")
    h.update(str(rows).encode())
    return h.hexdigest()


def prefix_fingerprint(files: list[str]) -> str:
    """Fingerprint of a fully-consumed log prefix (footer metadata only)."""
    fp = ""
    for f in files:
        fp = chain_fingerprint(fp, f, pq.read_metadata(f).num_rows)
    return fp


def read_window(
    window: Window,
    schema: pa.Schema,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
    num_cpus: float | None = None,
) -> rd.Dataset:
    """Read one window as a Dataset, null-filling columns a segment lacks.

    Passing the unified ``schema`` makes the pyarrow scanner backfill
    missing (evolved) columns with nulls — the additive-evolution path.
    ``override_num_blocks`` sizes read blocks (~2×effective-parallelism
    keeps per-block overhead low without starving the pipeline).
    ``num_cpus`` sizes read tasks so the read stage matches the engine's
    effective-parallelism cap (and fuses with the validate stage, which
    uses the same resource spec).
    """
    kwargs = {}
    if num_cpus is not None and num_cpus > 1:
        kwargs["ray_remote_args"] = {"num_cpus": num_cpus}
    return rd.read_parquet(
        window.files,
        schema=schema,
        columns=columns,
        override_num_blocks=override_num_blocks,
        **kwargs,
    )
