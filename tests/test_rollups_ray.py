"""Distributed rollup path == driver-side path, and the replay engine
produces identical results with the Ray path forced on."""

from __future__ import annotations

import pyarrow as pa
import pytest

from etl_ray import oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines import rollups
from etl_ray.pipelines.replay import ReplayEngine

from tests.util import engine_state_map


def test_update_base_ray_matches_driver_path(ray_session, tmp_path):
    d1 = pa.table(
        {
            "repo": ["r1", "r1", "r2"],
            "lang": ["py", "go", "py"],
            "d_files": pa.array([2, 1, 5], pa.int64()),
            "d_bytes": pa.array([100, 50, 500], pa.int64()),
            "w_cs": pa.array([5, 3, 9], pa.int64()),
        }
    )
    base1 = rollups.update_base(None, d1)
    p1 = str(tmp_path / "base1.parquet")
    rollups.update_base_ray(None, d1, p1)
    import pyarrow.parquet as pq

    ray_base1 = pq.read_table(p1)
    assert ray_base1.sort_by([("repo", "ascending"), ("lang", "ascending")]).equals(
        base1.sort_by([("repo", "ascending"), ("lang", "ascending")])
    )

    d2 = pa.table(
        {
            "repo": ["r1", "r3"],
            "lang": ["py", "md"],
            "d_files": pa.array([-1, 2], pa.int64()),
            "d_bytes": pa.array([-40, 20], pa.int64()),
            "w_cs": pa.array([12, 1], pa.int64()),
        }
    )
    base2 = rollups.update_base(base1, d2)
    p2 = str(tmp_path / "base2.parquet")
    rollups.update_base_ray(p1, d2, p2)
    ray_base2 = pq.read_table(p2)
    assert ray_base2.sort_by([("repo", "ascending"), ("lang", "ascending")]).equals(
        base2.sort_by([("repo", "ascending"), ("lang", "ascending")])
    )


def test_replay_with_forced_ray_rollups(ray_session, tmp_path, monkeypatch):
    monkeypatch.setattr(rollups, "RAY_THRESHOLD", 0)
    log = generate_events(n_keys=150, seed=53, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=3)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=150)

    res = oracle.reduce_events(log.table)
    state = engine_state_map(eng)
    assert set(state) == set(res.state)
    br = {r["repo"]: r for r in eng.summary("summary_by_repo").to_pylist()}
    obr = oracle.summary_by_repo(res)
    assert set(br) == set(obr)
    for repo, s in obr.items():
        e = br[repo]
        assert (e["file_count"], e["total_bytes"], e["distinct_langs"], e["last_commit_seq"]) == (
            s["file_count"], s["total_bytes"], s["distinct_langs"], s["last_commit_seq"]
        ), repo
