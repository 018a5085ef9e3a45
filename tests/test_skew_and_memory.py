"""Skew and memory-discipline tests.

Skew: the reference density-balances with a KD-tree partitioner
(SURVEY §4); our analog is (repo, path) hashing — a hot monorepo spreads
across its paths — plus the per-batch LWW combiner that collapses
single-key update storms BEFORE the shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from etl_ray import oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine

from tests.util import engine_state_map, write_files


def _storm_log(n_events=4000, n_cold_keys=50):
    """90% of events hammer ONE (repo, path); the rest spread out."""
    rng = np.random.default_rng(7)
    rows = {k: [] for k in ("seq", "op", "commit_seq", "repo", "path", "commit", "lang", "content")}
    hot = int(n_events * 0.9)
    for i in range(n_events):
        if i < hot:
            repo, path, v = "mono/hot", "src/storm.py", i
        else:
            k = (i - hot) % n_cold_keys
            repo, path, v = f"org/r{k % 7}", f"src/f{k}.py", i
        rows["seq"].append(i)
        rows["op"].append("I" if v == 0 else "U")
        rows["commit_seq"].append(i)
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(f"c{i}")
        rows["lang"].append("py")
        rows["content"].append(f"{repo}:{path}:v{i}")
    return pa.table(
        {
            "seq": pa.array(rows["seq"], pa.int64()),
            "op": pa.array(rows["op"], pa.string()),
            "commit_seq": pa.array(rows["commit_seq"], pa.int64()),
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
        }
    )


def test_single_key_update_storm(ray_session, tmp_path):
    t = _storm_log()
    write_files([t], str(tmp_path / "log"))
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=10**9)

    res = oracle.reduce_events(t)
    state = engine_state_map(eng)
    assert set(state) == set(res.state)
    assert state[("mono/hot", "src/storm.py")]["content_sha256"] == res.state[
        ("mono/hot", "src/storm.py")
    ]["content_sha256"]

    # the combiner collapsed the storm before the shuffle: events_in
    # (post-combiner rows routed) is a small fraction of the raw window
    hist = eng.metrics_history()
    assert hist[-1]["window_rows"] == t.num_rows
    assert hist[-1]["events_in"] < t.num_rows * 0.25


def test_hot_repo_spreads_across_partitions(ray_session, tmp_path):
    """A monorepo's paths hash to many partitions (the built-in skew
    relief: path is part of the key)."""
    rows = []
    for i in range(200):
        rows.append((i, "I", i, "mono/huge", f"src/dir{i % 13}/f{i}.py", f"v{i}"))
    from tests.util import mklog

    t = mklog(rows)
    write_files([t], str(tmp_path / "log"))
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=10**9)
    lineage = eng.partition_lineage()
    touched = [p for p, info in lineage.items() if info["rows"] > 0]
    assert len(touched) >= 6  # one repo, many partitions
    assert max(info["rows"] for info in lineage.values()) < 200 * 0.5


def test_wide_content_with_small_batches(ray_session, tmp_path):
    """Memory discipline for wide payloads: small batch_size on the
    validate stage; correctness unaffected."""
    log = generate_events(n_keys=60, seed=59, scenario="mixed", content_len=4096)
    write_event_log(log, str(tmp_path / "log"), n_files=2)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4, batch_size=32)
    eng.replay(str(tmp_path / "log"), window_events=10**9)
    res = oracle.reduce_events(log.table)
    state = engine_state_map(eng)
    assert set(state) == set(res.state)
    for k, row in res.state.items():
        assert state[k]["content_sha256"] == row["content_sha256"], k
