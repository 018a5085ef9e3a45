"""CSV change-log source — the reference's raw-input path.

Reference analog (SURVEY S6): the Dask ``read_csv`` with a 24-entry
explicit dtype map (``etl/cleaning/clean_data.py:79-120``). The engine's
canonical log format is Parquet (BASELINE.json input_hint), but a tailer
that drops raw CSV is supported by converting it — with the schema
declared up front, never inferred — into Parquet segments the replay
loop consumes. This mirrors the reference's clean-once-then-cache
discipline (csv → .pkl cache, ``main.py:105-118``).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.csv as pacsv
import ray.data as rd

from etl_ray.schema import EVENT_SCHEMA


def read_csv_events(path: str, schema: pa.Schema = EVENT_SCHEMA) -> rd.Dataset:
    """Read change events from CSV file(s) with an explicit schema.

    Column types are DECLARED (the reference's dtype-map discipline):
    inference on a code-content column would mangle quotes/newlines.
    """
    paths = sorted(glob.glob(os.path.join(path, "*.csv"))) if os.path.isdir(path) else [path]
    convert = pacsv.ConvertOptions(
        column_types={f.name: f.type for f in schema},
        strings_can_be_null=False,
    )
    return rd.read_csv(paths, convert_options=convert)


def ingest_csv_to_segments(
    csv_path: str, out_dir: str, rows_per_file: int = 250_000
) -> list[str]:
    """CSV drop → Parquet log segments (the replay loop's input format).

    Streaming Dataset pipeline: no driver-side materialization; output
    segment count follows the data size.
    """
    ds = read_csv_events(csv_path)
    ds.write_parquet(out_dir, min_rows_per_file=rows_per_file)
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))


def write_event_log_csv(table: pa.Table, out_dir: str, n_files: int = 2) -> list[str]:
    """Write a recorded log as CSV files (test/tailer-simulation helper)."""
    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    paths = []
    step = max(1, (n + n_files - 1) // n_files)
    for i in range(n_files):
        chunk = table.slice(i * step, step)
        if chunk.num_rows == 0:
            continue
        p = os.path.join(out_dir, f"events-{i:05d}.csv")
        pacsv.write_csv(chunk, p)
        paths.append(p)
    return paths
