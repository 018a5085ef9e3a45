"""Change-log source: file discovery, window planning, unified-schema reads.

Reference analog: the archive lister / ``ensure_file_for_date`` input
resolution (``etl/gatherer/file_downloader.py:44-139``) — discovery is a
cheap driver-side step; the heavy read is a column-pruned
``ray.data.read_parquet``.

Window planning is deterministic: given the sorted log-segment file list,
group files greedily into windows of ~``window_events`` rows using only
footer metadata (no data read). Re-planning on resume over the same
(append-only) log yields an identical prefix, so the committed
``windows_done`` count in the manifest is a valid resume cursor.
"""

from __future__ import annotations

import glob
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


def list_segments(events_path: str) -> list[str]:
    """Sorted parquet segment files for a log directory or single file."""
    if os.path.isdir(events_path):
        return sorted(glob.glob(os.path.join(events_path, "*.parquet")))
    return [events_path]


def unified_schema(files: list[str]) -> pa.Schema:
    """Unify footer schemas across segments (additive schema evolution)."""
    schemas = [pq.read_schema(f) for f in files]
    return pa.unify_schemas(schemas, promote_options="default")


def plan_windows(files: list[str], window_events: int) -> list[Window]:
    """Greedy grouping of whole segment files into ~window_events windows."""
    windows: list[Window] = []
    cur: list[str] = []
    cur_rows = 0
    for f in files:
        n = pq.read_metadata(f).num_rows
        cur.append(f)
        cur_rows += n
        if cur_rows >= window_events:
            windows.append(Window(len(windows), cur, cur_rows))
            cur, cur_rows = [], 0
    if cur:
        windows.append(Window(len(windows), cur, cur_rows))
    return windows


def read_window(
    window: Window,
    schema: pa.Schema,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> rd.Dataset:
    """Read one window as a Dataset, null-filling columns a segment lacks.

    Passing the unified ``schema`` makes the pyarrow scanner backfill
    missing (evolved) columns with nulls — the additive-evolution path.
    ``override_num_blocks`` sizes read blocks (~2×CPUs keeps per-block
    overhead low without starving the pipeline).
    """
    return rd.read_parquet(
        window.files,
        schema=schema,
        columns=columns,
        override_num_blocks=override_num_blocks,
    )
