"""fsck: manifest ↔ storage invariant checker."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from tests.util import mklog, write_files

from etl_ray.pipelines.replay import ReplayEngine


@pytest.fixture()
def lake(ray_session, tmp_path):
    tmp = str(tmp_path)
    s0 = mklog(
        [(1, "I", 1, "r1", "a", "a0"), (2, "I", 2, "r1", "b", "b0")]
    )
    s1 = mklog([(3, "U", 3, "r1", "a", "a1"), (4, "D", 4, "r1", "b", "")])
    files = write_files([s0, s1], os.path.join(tmp, "log"))
    eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=4)
    eng.replay(files, window_events=2)
    return eng


def test_fsck_clean_lake(lake):
    out = lake.fsck()
    assert out["ok"] and not out["errors"]
    assert out["checked_files"] > 0


def test_fsck_detects_missing_file(lake):
    m = lake.store.current()
    rel = next(iter(m.partitions.values()))["file"]
    os.unlink(lake.store.abs_path(rel))
    out = lake.fsck()
    assert not out["ok"]
    assert any("missing file" in e for e in out["errors"])


def test_fsck_detects_row_count_drift(lake):
    # simulate manifest/storage divergence: truncate a partition file
    m = lake.store.current()
    rel, info = next(
        (i["file"], i) for i in m.partitions.values() if i["rows"] > 0
    )
    p = lake.store.abs_path(rel)
    t = pq.read_table(p)
    pq.write_table(t.slice(0, 0), p)
    out = lake.fsck()
    assert not out["ok"]
    assert any("footer rows" in e for e in out["errors"])


def test_export_roundtrip(lake, tmp_path):
    out = os.path.join(str(tmp_path), "export")
    res = lake.export(out, partition_cols=["lang"])
    assert res["files"] >= 1
    import ray.data as rd

    got = rd.read_parquet(out).to_pandas()
    want = lake.final_state().to_pandas()
    assert len(got) == len(want)
    assert sorted(got["content_sha256"]) == sorted(want["content_sha256"])


def test_fsck_deep_chain_fold(ray_session, tmp_path):
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
        assert any(p.get("deltas") for p in eng.store.current().partitions.values())
        assert eng.fsck()["ok"]  # shallow skips chains
        assert eng.fsck(deep=True)["ok"]  # deep folds and recounts
    finally:
        for k in ("ETL_RAY_DELTA_CHAIN", "ETL_RAY_CHAIN_MAX",
                  "ETL_RAY_COMPACT_RATIO"):
            os.environ.pop(k, None)
