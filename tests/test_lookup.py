"""Point-lookup serving path: hash-route to ONE partition file, no scan."""

from __future__ import annotations

import os

import pytest

from tests.util import mklog, write_files, sha

from etl_ray.pipelines.replay import ReplayEngine


@pytest.fixture()
def lake(ray_session, tmp_path):
    tmp = str(tmp_path)
    s0 = mklog(
        [
            (1, "I", 1, "r1", "a", "a0"),
            (2, "I", 2, "r1", "b", "b0"),
            (3, "I", 3, "r2", "c", "c0"),
        ]
    )
    s1 = mklog(
        [
            (4, "U", 4, "r1", "a", "a1"),
            (5, "D", 5, "r1", "b", ""),
        ]
    )
    files = write_files([s0, s1], os.path.join(tmp, "log"))
    eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=8)
    eng.replay(files, window_events=3)  # two checkpoints
    return eng


def test_lookup_live_updated_deleted_absent(lake):
    row = lake.lookup("r1", "a")
    assert row.num_rows == 1
    assert row.column("content")[0].as_py() == "a1"
    assert row.column("content_sha256")[0].as_py() == sha("a1")
    assert lake.lookup("r1", "b").num_rows == 0  # tombstoned
    assert lake.lookup("rX", "nope").num_rows == 0  # never existed
    got = lake.lookup("r2", "c", columns=["repo", "path", "content"])
    assert got.column_names == ["repo", "path", "content"]


def test_lookup_time_travel(lake):
    old = lake.lookup("r1", "a", as_of=0)
    assert old.column("content")[0].as_py() == "a0"
    assert lake.lookup("r1", "b", as_of=0).num_rows == 1  # pre-delete


def test_lookup_matches_final_state(lake):
    fs = lake.final_state(columns=["repo", "path", "content_sha256"]).to_pandas()
    for _, r in fs.iterrows():
        got = lake.lookup(r["repo"], r["path"])
        assert got.num_rows == 1
        assert got.column("content_sha256")[0].as_py() == r["content_sha256"]


def test_lookup_on_chained_lake(ray_session, tmp_path):
    os.environ.update(
        {"ETL_RAY_DELTA_CHAIN": "1", "ETL_RAY_CHAIN_MAX": "9",
         "ETL_RAY_COMPACT_RATIO": "1.1"}
    )
    try:
        tmp = str(tmp_path)
        s0 = mklog([(1, "I", 1, "r1", "a", "a0")])
        s1 = mklog([(2, "U", 2, "r1", "a", "a1")])
        files = write_files([s0, s1], os.path.join(tmp, "log"))
        eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=4)
        eng.replay(files, window_events=1)
        assert any(
            p.get("deltas") for p in eng.store.current().partitions.values()
        )  # the chain actually formed
        row = eng.lookup("r1", "a")
        assert row.num_rows == 1
        assert row.column("content")[0].as_py() == "a1"
    finally:
        for k in ("ETL_RAY_DELTA_CHAIN", "ETL_RAY_CHAIN_MAX",
                  "ETL_RAY_COMPACT_RATIO"):
            os.environ.pop(k, None)
