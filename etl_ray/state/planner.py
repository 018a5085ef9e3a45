"""Partition-plan advisor — the density-driven partitioning planner.

Reference analog: the offline KD-tree partition builder
(``etl/partition_builder/02_kd_tree_construction.sql:36-60``) splits
space by a measured density heatmap (``01_5k_heatmap.sql:11-15``) so
every partition carries a comparable point count. This engine's
partitions are hash buckets of (repo, path), so the planner's density
source is the lake itself, at two costs:

1. **Lineage scan (free)** — per-partition rows/tombstones from the
   committed manifest plus file bytes from the filesystem. This is the
   skew DETECTOR: nothing is read but JSON + stat(2).
2. **Exact candidate simulation (one pruned pass)** — one Ray task per
   partition reads ONLY the (repo, path) key columns (content never
   leaves storage), dedups keys (a merge-on-read chain may restate a
   key), hashes each key ONCE with the same ``stable_hash64`` the
   routing exchange uses, and bins it against every candidate P'. The
   driver folds the per-partition histograms — O(P × ΣP') ints — and
   picks the cheapest P' whose PREDICTED layout meets the balance
   tolerance. Prediction is exact, not assumed-uniform: executing
   ``ReplayEngine.repartition(recommended_p)`` lands exactly the
   simulated per-partition row counts.

The plan also surfaces a **hot-key list** (top repos by key count, from
the same pruned pass) — the salt list for ``stages/joins.py``'s
``salt_threshold`` machinery and the operator's first clue when skew is
key-born rather than layout-born (a hash layout spreads any one repo's
paths uniformly; a monorepo therefore shows up here long before it can
tilt the partition histogram).
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np
import pyarrow as pa
import ray

from etl_ray.state.manifest import Manifest, ManifestStore


def partition_stats(store: ManifestStore, m: Manifest | None = None) -> list[dict]:
    """Per-partition {part, rows, tombstones, bytes, chain_files} from
    manifest lineage + file sizes — no data reads."""
    m = m or store.current()
    if m is None:
        raise ValueError(f"no manifest in {store.lake_dir}")
    out = []
    for part, info in sorted(m.partitions.items(), key=lambda kv: int(kv[0])):
        files = [info["file"], *info.get("deltas", [])]
        nbytes = 0
        for rel in files:
            p = store.abs_path(rel)
            if os.path.exists(p):
                nbytes += os.path.getsize(p)
        out.append(
            {
                "part": int(part),
                "rows": int(info.get("rows", 0)),
                "tombstones": int(info.get("tombstones", 0)),
                "bytes": nbytes,
                "chain_files": len(files),
            }
        )
    return out


def _imbalance(values: list[int]) -> float:
    """max/mean over non-degenerate totals (0 when the lake is empty)."""
    if not values or sum(values) == 0:
        return 0.0
    mean = sum(values) / len(values)
    return max(values) / mean


@ray.remote
def _key_histogram(
    files: list[str], candidates: list[int], top_keys: int
) -> tuple[dict[int, np.ndarray], list[tuple[str, int]], int]:
    """One partition's exact candidate histograms from its key columns.

    Reads (repo, path) only; dedups (base + MOR chain may restate a
    key — state keys are unique after folding, so unique-of-union is
    the folded key set); hashes once; bins per candidate.
    Returns ({P': bincount}, top repos by key count, n_keys).
    """
    import pyarrow.parquet as _pq

    from etl_ray.hashing import key_strings, stable_hash64

    tabs = []
    for f in files:
        names = set(_pq.read_schema(f).names)
        cols = [c for c in ("repo", "path") if c in names]
        tabs.append(_pq.read_table(f, columns=cols))
    t = pa.concat_tables(tabs, promote_options="default")
    if t.num_rows == 0:
        return {p: np.zeros(p, dtype=np.int64) for p in candidates}, [], 0
    keys = key_strings(t.column("repo"), t.column("path"))
    h = stable_hash64(keys)
    # dedup on the hash itself: collisions are astronomically unlikely at
    # per-partition key counts, and the router bins by this hash anyway —
    # two colliding keys co-route forever, so counting them once is the
    # router's own view of the world
    h = np.unique(h)
    hists = {
        p: np.bincount((h % np.uint64(p)).astype(np.int64), minlength=p)
        for p in candidates
    }
    top: list[tuple[str, int]] = []
    if top_keys > 0:
        import pyarrow.compute as _pc

        vc = _pc.value_counts(t.column("repo").combine_chunks())
        pairs = sorted(
            ((str(s["values"]), int(s["counts"])) for s in vc.to_pylist()),
            key=lambda kv: -kv[1],
        )
        top = pairs[:top_keys]
    return hists, top, int(len(h))


def plan_partitions(
    lake_dir: str,
    target_rows_per_partition: int | None = None,
    tolerance: float = 2.0,
    candidates: list[int] | None = None,
    top_keys: int = 8,
) -> dict[str, Any]:
    """Analyze the lake's partition density and recommend a layout.

    Returns a plan dict:

    - ``current``: {num_partitions, total_rows, max_rows, imbalance
      (max/mean over rows+tombstones), bytes_imbalance}
    - ``skewed``: True when rows- or bytes-imbalance exceeds
      ``tolerance`` or the mean partition exceeds
      ``target_rows_per_partition``
    - ``candidates``: per candidate P' the EXACTLY simulated
      {max_rows, mean_rows, imbalance}
    - ``recommended_p``: the current P when the lake is healthy
      (never churn a balanced layout); else the LARGEST candidate
      meeting the tolerance and target — maximum parallelism subject
      to balance (falls back to the most balanced candidate when none
      fit) — feed it to ``ReplayEngine.repartition``
    - ``hot_keys``: top repos by key count (global fold of per-
      partition tops) — the salt list for ``shuffle_join``'s
      ``salt_threshold`` path when skew is key-born

    The decision signal is state KEY COUNT (rows + tombstones): that is
    what a merge group materializes and what the exchange ships.
    Bytes imbalance is reported for the operator but not simulated —
    simulating it would need per-key byte weights, i.e. a content-column
    read the advisor exists to avoid.
    """
    store = ManifestStore(lake_dir)
    m = store.current()
    if m is None:
        raise ValueError(f"no manifest in {lake_dir}")
    stats = partition_stats(store, m)
    P = m.num_partitions
    keyed = {s["part"]: s for s in stats}
    # partitions never touched by any window are absent from the
    # manifest; they are real, zero-row buckets of the layout
    key_counts = [
        keyed.get(p, {"rows": 0, "tombstones": 0})["rows"]
        + keyed.get(p, {"rows": 0, "tombstones": 0})["tombstones"]
        for p in range(P)
    ]
    byte_counts = [keyed.get(p, {"bytes": 0}).get("bytes", 0) for p in range(P)]
    total = sum(key_counts)
    cur = {
        "num_partitions": P,
        "total_rows": total,
        "max_rows": max(key_counts, default=0),
        "imbalance": round(_imbalance(key_counts), 3),
        "bytes_imbalance": round(_imbalance(byte_counts), 3),
    }
    over_target = bool(
        target_rows_per_partition and P and total / P > target_rows_per_partition
    )
    skewed = (
        cur["imbalance"] > tolerance
        or cur["bytes_imbalance"] > tolerance
        or over_target
    )

    if candidates is None:
        # full power-of-two ladder 1..4P: the exact simulation is one
        # pruned key pass binned against every candidate (O(|cands|)
        # ints per key), so a dozen candidates cost the same pass as
        # four — and a badly over-sharded lake (mean keys/partition
        # too small to smooth hash variance) needs the SMALL rungs to
        # find its balanced layout, not just P/2
        cands = {P}
        p2 = 1
        while p2 <= 4 * P:
            cands.add(p2)
            p2 *= 2
        if target_rows_per_partition and total:
            # smallest power of two giving mean ≤ target
            need = max(1, -(-total // target_rows_per_partition))
            cands.add(1 << (need - 1).bit_length())
        candidates = sorted(p for p in cands if p >= 1)

    refs = [
        _key_histogram.remote(
            [store.abs_path(info["file"])]
            + [store.abs_path(d) for d in info.get("deltas", [])],
            candidates,
            top_keys,
        )
        for _part, info in m.partitions.items()
    ]
    sums = {p: np.zeros(p, dtype=np.int64) for p in candidates}
    top_fold: dict[str, int] = {}
    n_keys = 0
    for hists, top, nk in ray.get(refs):
        for p, arr in hists.items():
            sums[p] += arr
        for repo, cnt in top:
            top_fold[repo] = top_fold.get(repo, 0) + cnt
        n_keys += nk

    cand_rows = []
    for p in candidates:
        arr = sums[p]
        mean = float(arr.mean()) if len(arr) else 0.0
        imb = float(arr.max() / mean) if mean > 0 else 0.0
        cand_rows.append(
            {
                "p": p,
                "max_rows": int(arr.max()) if len(arr) else 0,
                "mean_rows": round(mean, 1),
                "imbalance": round(imb, 3),
            }
        )

    def ok(c: dict) -> bool:
        if c["imbalance"] > tolerance and c["p"] > 1:
            return False
        if target_rows_per_partition and c["mean_rows"] > target_rows_per_partition:
            return False
        return True

    fitting = [c for c in cand_rows if ok(c)]
    if not skewed:
        recommended = P  # healthy lake: never churn the layout
    elif fitting:
        # the LARGEST balanced candidate: maximum parallelism subject
        # to the balance/target constraints (P'=1 trivially balances
        # everything — smallest-fitting would collapse every skewed
        # lake to one partition)
        recommended = max(fitting, key=lambda c: c["p"])["p"]
    else:
        recommended = min(cand_rows, key=lambda c: (c["imbalance"], c["p"]))["p"]

    hot = sorted(top_fold.items(), key=lambda kv: -kv[1])[:top_keys]
    return {
        "current": cur,
        "skewed": skewed,
        "tolerance": tolerance,
        "target_rows_per_partition": target_rows_per_partition,
        "n_keys": n_keys,
        "candidates": cand_rows,
        "recommended_p": recommended,
        "hot_keys": [{"repo": r, "keys": c} for r, c in hot],
    }
