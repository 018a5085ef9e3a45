"""Shared helpers for the test suite."""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq


def mklog(rows, lang="py"):
    """rows: list of (seq, op, commit_seq, repo, path, content)."""
    return pa.table(
        {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
            "repo": pa.array([r[3] for r in rows], pa.string()),
            "path": pa.array([r[4] for r in rows], pa.string()),
            "commit": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "lang": pa.array([lang] * len(rows), pa.string()),
            "content": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def write_files(tables, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, t in enumerate(tables):
        p = os.path.join(out_dir, f"events-{i:05d}.parquet")
        pq.write_table(t, p)
        paths.append(p)
    return paths


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def engine_state_map(engine):
    """(repo, path) -> row dict of the engine's live final state."""
    df = engine.final_state().to_pandas()
    return {(r["repo"], r["path"]): r for _, r in df.iterrows()}
