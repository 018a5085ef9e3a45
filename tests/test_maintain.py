"""maintain() autopilot: compact → plan → (apply) repartition → gc in
one call, state-preserving, dry-run by default, global-only.

Closes the r4 advisor gap end-to-end: plan_partitions() detected skew
but an operator still had to chain compact/repartition/gc by hand.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine


def _state(eng) -> pd.DataFrame:
    return (
        eng.final_state(columns=["repo", "path", "content_sha256"])
        .to_pandas()
        .sort_values(["repo", "path"], ignore_index=True)
    )


def _mk_skewed(tmp_path, name, **engine_kw):
    """Over-sharded skewed lake (150 keys / 64 partitions — the planner
    fixture shape)."""
    log = generate_events(n_keys=150, seed=11, scenario="mixed",
                          mean_versions=3.0, content_len=64)
    files = write_event_log(log, os.path.join(str(tmp_path), f"{name}_log"),
                            n_files=2)
    eng = ReplayEngine(os.path.join(str(tmp_path), f"{name}_lake"),
                       num_partitions=64, **engine_kw)
    eng.replay(files, window_events=10_000)
    return eng


def test_dry_run_reports_but_mutates_nothing(ray_session, tmp_path):
    eng = _mk_skewed(tmp_path, "dry")
    before_ckpt = eng.store.current().checkpoint_id
    rep = eng.maintain(apply=False, gc_keep=None)
    assert rep["plan"]["skewed"] is True
    assert rep["repartition_needed"] is True
    assert rep["repartitioned"] is None
    assert rep["compacted"] is None  # no delta chains in this lake
    assert rep["gc_deleted"] == 0
    assert eng.store.current().checkpoint_id == before_ckpt
    assert eng.num_partitions == 64


def test_apply_rebalances_preserves_state_and_gcs(ray_session, tmp_path):
    eng = _mk_skewed(tmp_path, "app")
    want = _state(eng)
    rep = eng.maintain(apply=True)
    assert rep["repartitioned"] is not None
    new_p = rep["plan"]["recommended_p"]
    m = eng.store.current()
    assert m.num_partitions == new_p == eng.num_partitions
    # rebalanced: within the planner tolerance on the executed layout
    counts = [
        int(i.get("rows", 0)) + int(i.get("tombstones", 0))
        for i in m.partitions.values()
    ]
    mean = sum(counts) / max(1, len(counts))
    assert max(counts) <= 2.0 * mean + 1
    got = _state(eng)
    pd.testing.assert_frame_equal(got, want)
    assert eng.fsck(deep=True)["errors"] == []


def test_maintain_compacts_chains_first(ray_session, tmp_path, monkeypatch):
    monkeypatch.setenv("ETL_RAY_DELTA_CHAIN", "1")
    monkeypatch.setenv("ETL_RAY_CHAIN_MAX", "100")
    monkeypatch.setenv("ETL_RAY_COMPACT_RATIO", "1000")
    log = generate_events(n_keys=120, seed=5, scenario="mixed",
                          mean_versions=3.0, content_len=64)
    files = write_event_log(log, str(tmp_path / "log"), n_files=4)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(files, window_events=150)  # many windows → chains build up
    m = eng.store.current()
    assert any(i.get("deltas") for i in m.partitions.values()), "fixture"
    want = _state(eng)
    rep = eng.maintain(apply=True)
    assert rep["compacted"] is not None
    m2 = eng.store.current()
    assert not any(i.get("deltas") for i in m2.partitions.values())
    pd.testing.assert_frame_equal(_state(eng), want)
    assert eng.fsck(deep=True)["errors"] == []


def test_scoped_writer_rejected(ray_session, tmp_path):
    eng = _mk_skewed(tmp_path, "scope")
    scoped = ReplayEngine(eng.lake_dir, partition_scope=(0, 31))
    with pytest.raises(RuntimeError, match="global"):
        scoped.maintain()


def test_balanced_lake_is_a_noop_report(ray_session, tmp_path):
    log = generate_events(n_keys=400, seed=3, scenario="mixed",
                          mean_versions=2.0, content_len=64)
    files = write_event_log(log, str(tmp_path / "log"), n_files=2)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(files, window_events=10_000)
    before = eng.store.current().checkpoint_id
    rep = eng.maintain(apply=True, gc_keep=None)
    assert rep["repartition_needed"] is False
    assert rep["repartitioned"] is None
    assert eng.store.current().checkpoint_id == before
