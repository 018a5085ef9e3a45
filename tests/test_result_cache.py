"""Fingerprint-keyed result cache: hit while inputs are unchanged,
automatic invalidation on any input change (file touch OR lake commit)."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from etl_ray.state.result_cache import ResultCache, dir_fingerprint


def _write(path, n):
    pq.write_table(pa.table({"x": pa.array(list(range(n)), pa.int64())}),
                   path)


def test_cache_hits_until_input_changes(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    _write(str(data / "t.parquet"), 5)
    cache = ResultCache(str(tmp_path / "cache"))
    calls = []

    def compute():
        calls.append(1)
        return pq.read_table(str(data / "t.parquet"))

    r1, hit1 = cache.get_or_compute("q", [str(data)], compute)
    r2, hit2 = cache.get_or_compute("q", [str(data)], compute)
    assert (not hit1) and hit2 and len(calls) == 1
    assert r2.equals(r1)

    # mutate the input (newer mtime); the cache must recompute
    time.sleep(0.02)
    _write(str(data / "t.parquet"), 7)
    r3, hit3 = cache.get_or_compute("q", [str(data)], compute)
    assert not hit3 and len(calls) == 2 and r3.num_rows == 7


def test_lake_fingerprint_is_the_manifest_pointer(ray_session, tmp_path):
    from etl_ray.generator import generate_events, write_event_log
    from etl_ray.pipelines.replay import ReplayEngine

    log = generate_events(n_keys=60, seed=11, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=2)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(lake, num_partitions=4)
    eng.replay(str(tmp_path / "log"), window_events=10, max_windows=1)
    fp1 = dir_fingerprint(lake)
    cache = ResultCache(str(tmp_path / "cache"))
    calls = []

    def compute():
        calls.append(1)
        return pa.table({"n": pa.array(
            [eng.store.current().checkpoint_id], pa.int64())})

    cache.get_or_compute("state", [lake], compute)
    _, hit = cache.get_or_compute("state", [lake], compute)
    assert hit and len(calls) == 1
    # a new commit moves the pointer → fingerprint changes → recompute
    eng.replay(str(tmp_path / "log"), window_events=10)
    assert dir_fingerprint(lake) != fp1
    _, hit = cache.get_or_compute("state", [lake], compute)
    assert not hit and len(calls) == 2


def test_invalidate_and_name_isolation(tmp_path):
    data = tmp_path / "d"
    data.mkdir()
    _write(str(data / "a.parquet"), 3)
    cache = ResultCache(str(tmp_path / "cache"))
    t = pa.table({"y": pa.array([1], pa.int64())})
    cache.get_or_compute("q1", [str(data)], lambda: t)
    _, hit_other = cache.get_or_compute("q2", [str(data)], lambda: t)
    assert not hit_other  # names are isolated
    assert cache.invalidate("q1") is True
    _, hit = cache.get_or_compute("q1", [str(data)], lambda: t)
    assert not hit
