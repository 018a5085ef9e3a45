"""Single-threaded pure-Python reference reducer — the golden oracle.

Mirrors the reference's test strategy (SURVEY.md §5): tiny, obviously
correct sequential code that pins the semantics of the distributed
engine. Group events by (repo, path), order by (commit_seq, seq), fold
last-writer-wins with delete tombstones, null-backfill evolved columns.
Engine assertion: for every surviving key the engine row's
sha256(content) equals the oracle's, and deleted keys are absent.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import pyarrow as pa

from etl_ray.schema import OP_DELETE


@dataclass
class OracleResult:
    #: (repo, path) -> final row dict (surviving keys only)
    state: dict[tuple[str, str], dict]
    #: (repo, path) -> True if the key's last write was a delete
    tombstones: set[tuple[str, str]]
    #: repo -> max commit_seq of any event applied to that repo (watermark)
    repo_watermark: dict[str, int]


def reduce_events(table: pa.Table) -> OracleResult:
    """Fold a recorded log into final state. O(n log n), single thread."""
    cols = table.column_names
    extra = [c for c in cols if c not in ("seq", "op", "commit_seq", "repo", "path", "commit", "lang", "content")]
    rows = table.to_pylist()
    rows.sort(key=lambda r: (r["commit_seq"] is None, r["commit_seq"] or 0, r["seq"]))

    state: dict[tuple[str, str], dict] = {}
    tombs: set[tuple[str, str]] = set()
    wm: dict[str, int] = {}
    for r in rows:
        repo, path, op = r["repo"], r["path"], r["op"]
        if not repo or not path or op not in ("I", "U", "D") or r["commit_seq"] is None:
            continue  # malformed — engine drops + counts these too
        key = (repo, path)
        wm[repo] = max(wm.get(repo, -1), r["commit_seq"])
        if op == OP_DELETE:
            state.pop(key, None)
            tombs.add(key)
        else:
            row = {k: r.get(k) for k in ("repo", "path", "commit", "commit_seq", "seq", "lang", "content")}
            for c in extra:
                row[c] = r.get(c)
            row["content_sha256"] = hashlib.sha256((r["content"] or "").encode()).hexdigest()
            state[key] = row
            tombs.discard(key)
    return OracleResult(state=state, tombstones=tombs, repo_watermark=wm)


def final_state_table(res: OracleResult) -> pa.Table:
    """Oracle final state as an Arrow table sorted by (repo, path)."""
    rows = [res.state[k] for k in sorted(res.state)]
    if not rows:
        return pa.table({"repo": pa.array([], pa.string()), "path": pa.array([], pa.string())})
    keys = list(rows[0].keys())
    return pa.table({k: [r.get(k) for r in rows] for k in keys})


def summary_by_repo(res: OracleResult) -> dict[str, dict]:
    """repo -> {file_count, total_bytes, distinct_langs, last_commit_seq}.

    ``last_commit_seq`` has *watermark* semantics: the max commit_seq of any
    event applied to the repo (deletes included) — the per-partition lineage
    number the engine checkpoints (analog: audit_log statistics,
    reference ``etl/audit/logger.py:81-103``).
    """
    out: dict[str, dict] = {}
    for (repo, _path), row in res.state.items():
        s = out.setdefault(repo, {"file_count": 0, "total_bytes": 0, "langs": set()})
        s["file_count"] += 1
        s["total_bytes"] += len((row["content"] or "").encode())
        s["langs"].add(row["lang"])
    for repo, wm in res.repo_watermark.items():
        s = out.setdefault(repo, {"file_count": 0, "total_bytes": 0, "langs": set()})
        s["last_commit_seq"] = wm
    return {
        r: {
            "file_count": s["file_count"],
            "total_bytes": s["total_bytes"],
            "distinct_langs": len(s["langs"]),
            "last_commit_seq": s.get("last_commit_seq", -1),
        }
        for r, s in out.items()
    }


def summary_by_lang(res: OracleResult) -> dict[str, dict]:
    """lang -> {file_count, total_bytes} over surviving files."""
    out: dict[str, dict] = {}
    for row in res.state.values():
        s = out.setdefault(row["lang"], {"file_count": 0, "total_bytes": 0})
        s["file_count"] += 1
        s["total_bytes"] += len((row["content"] or "").encode())
    return out
