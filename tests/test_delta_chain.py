"""Merge-on-read delta chains (ETL_RAY_DELTA_CHAIN=1): parity, chain
formation, compaction, resume, gc retention, rollback."""

from __future__ import annotations

import os

import pytest

from etl_ray import oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine

from tests.test_replay import assert_parity
from tests.util import engine_state_map


def _chain_env(monkeypatch, chain_max="3", ratio="0.25"):
    monkeypatch.setenv("ETL_RAY_DELTA_CHAIN", "1")
    monkeypatch.setenv("ETL_RAY_CHAIN_MAX", chain_max)
    monkeypatch.setenv("ETL_RAY_COMPACT_RATIO", ratio)


@pytest.mark.parametrize("scenario", ["mixed", "ooo", "delete", "evolve"])
def test_delta_chain_scenario_parity(ray_session, tmp_path, monkeypatch, scenario):
    _chain_env(monkeypatch)
    log = generate_events(n_keys=250, seed=42, scenario=scenario)
    write_event_log(log, str(tmp_path / "log"), n_files=6)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    # small windows so chains actually form and at least one compaction
    # fires (6 files -> several windows > chain_max)
    out = eng.replay(str(tmp_path / "log"), window_events=log.table.num_rows // 5)
    assert out["windows_run"] >= 3
    assert_parity(eng, log.table)


def test_chain_forms_and_compacts(ray_session, tmp_path, monkeypatch):
    _chain_env(monkeypatch, chain_max="2", ratio="1.1")  # ratio>1: never
    # compact on size — only the chain_max trigger fires
    log = generate_events(n_keys=200, seed=7, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=8)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(str(tmp_path / "log"), window_events=log.table.num_rows // 6)
    hist = eng.store.history()
    saw_delta = saw_compaction_after_chain = False
    for prev_m, m in zip(hist, hist[1:]):
        for p, info in m.partitions.items():
            chain = info.get("deltas", [])
            assert len(chain) <= 2, "chain exceeded chain_max"
            if chain:
                saw_delta = True
            prev_chain = prev_m.partitions.get(p, {}).get("deltas", [])
            if len(prev_chain) == 2 and not chain:
                saw_compaction_after_chain = True
    assert saw_delta, "delta mode never engaged"
    assert saw_compaction_after_chain, "no compaction observed"
    assert_parity(eng, log.table)


def test_delta_chain_matches_default_mode(ray_session, tmp_path, monkeypatch):
    log = generate_events(n_keys=300, seed=5, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=6)
    win = log.table.num_rows // 4

    monkeypatch.setenv("ETL_RAY_DELTA_CHAIN", "0")
    eng_a = ReplayEngine(str(tmp_path / "lake_a"), num_partitions=8)
    out_a = eng_a.replay(str(tmp_path / "log"), window_events=win)

    _chain_env(monkeypatch, chain_max="2")
    eng_b = ReplayEngine(str(tmp_path / "lake_b"), num_partitions=8)
    out_b = eng_b.replay(str(tmp_path / "log"), window_events=win)

    # identical per-window audit metrics and identical final state
    for k, v in out_a.items():
        if k.startswith("window_"):
            va, vb = dict(v), dict(out_b[k])
            va.pop("exec_sec"), va.pop("wall_sec")
            vb.pop("exec_sec"), vb.pop("wall_sec")
            assert va == vb, k
    sa, sb = engine_state_map(eng_a), engine_state_map(eng_b)
    assert set(sa) == set(sb)
    for key in sa:
        assert sa[key]["content_sha256"] == sb[key]["content_sha256"], key
    # summaries too (incremental rollups are mode-independent)
    assert eng_a.summary("summary_by_repo").equals(eng_b.summary("summary_by_repo"))


def test_delta_chain_resume(ray_session, tmp_path, monkeypatch):
    _chain_env(monkeypatch, chain_max="2")
    log = generate_events(n_keys=200, seed=9, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=6)
    files = sorted(
        os.path.join(tmp_path / "log", f)
        for f in os.listdir(tmp_path / "log")
        if f.endswith(".parquet")
    )
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(files[:4], window_events=10**9)
    out = eng.replay(files, window_events=10**9)
    assert out["windows_skipped"] >= 1
    assert_parity(eng, log.table)


def test_gc_keeps_chain_files_and_rollback_works(ray_session, tmp_path, monkeypatch):
    _chain_env(monkeypatch, chain_max="4", ratio="1.1")
    log = generate_events(n_keys=150, seed=13, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=6)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(str(tmp_path / "log"), window_events=log.table.num_rows // 4)
    current = eng.store.current()
    assert any(p.get("deltas") for p in current.partitions.values())
    eng.store.gc(keep_checkpoints=2)
    # every file the current manifest references must still exist
    for info in current.partitions.values():
        for rel in [info["file"], *info.get("deltas", [])]:
            assert os.path.exists(eng.store.abs_path(rel)), rel
    # the live state is still fully readable and correct
    assert_parity(eng, log.table)
    # rollback to the previous checkpoint (inside retention) then replay
    # the remainder again -> same terminal state
    prev_ckpt = current.checkpoint_id - 1
    eng.store.rollback(prev_ckpt)
    eng2 = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng2.replay(str(tmp_path / "log"), window_events=log.table.num_rows // 4)
    assert_parity(eng2, log.table)


def test_maintenance_compact_clears_all_chains(ray_session, tmp_path, monkeypatch):
    """ReplayEngine.compact() folds EVERY chained partition (including
    ones no recent window touched), after which the ensure-actor guard
    clears and the state is unchanged."""
    _chain_env(monkeypatch, chain_max="6", ratio="1.1")
    log = generate_events(n_keys=150, seed=17, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=6)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(str(tmp_path / "log"), window_events=log.table.num_rows // 4)
    before = engine_state_map(eng)
    assert any(p.get("deltas") for p in eng.store.current().partitions.values())
    out = eng.compact()
    assert out["compacted"] >= 1
    m = eng.store.current()
    assert not any(p.get("deltas") for p in m.partitions.values())
    after = engine_state_map(eng)
    assert set(before) == set(after)
    for k in before:
        assert before[k]["content_sha256"] == after[k]["content_sha256"], k
    assert_parity(eng, log.table)
