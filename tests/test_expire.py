"""Manifest expiry: lineage stays O(retention) on a long-lived stream
while the audit trail stays complete (the audit_log fold — reference
analog etl/init/sql/40_audit_log.sql)."""

from __future__ import annotations

import os

import pytest

from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine
from etl_ray.state.manifest import MANIFEST_DIR


def _manifest_files(eng):
    d = os.path.join(eng.lake_dir, MANIFEST_DIR)
    return sorted(
        f for f in os.listdir(d)
        if f.startswith("manifest-") and f.endswith(".json")
    )


def _mk(tmp_path, n_windows=8):
    log = generate_events(n_keys=300, seed=13, scenario="mixed",
                          mean_versions=3.0, content_len=64)
    files = write_event_log(log, str(tmp_path / "log"), n_files=n_windows)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(files, window_events=1)  # one window per file
    return eng


def test_expire_bounds_lineage_and_keeps_audit_complete(ray_session, tmp_path):
    eng = _mk(tmp_path)
    before = eng.metrics_history()
    assert len(before) >= 8
    assert len(_manifest_files(eng)) == len(before)
    res = eng.store.expire(keep_checkpoints=2)
    # retention = last 2 numbered manifests (the newest IS the current)
    assert res["expired"] == len(before) - 2
    assert len(_manifest_files(eng)) == 2
    after = eng.metrics_history()
    assert after == before  # the audit fold preserved every row
    # live state unaffected
    assert eng.fsck(deep=True)["errors"] == []
    # expire is idempotent
    assert eng.store.expire(keep_checkpoints=2)["expired"] == 0


def test_time_travel_ends_at_retention(ray_session, tmp_path):
    eng = _mk(tmp_path)
    cur = eng.store.current().checkpoint_id
    eng.store.expire(keep_checkpoints=2)
    # within retention: readable; beyond: clean ValueError
    eng.store.at(cur)
    eng.store.at(cur - 1)
    with pytest.raises(ValueError, match="no committed manifest"):
        eng.store.at(0)
    with pytest.raises(ValueError):
        eng.store.rollback(0)
    # rollback within retention still works
    eng.store.rollback(cur - 1)
    assert eng.store.current().checkpoint_id == cur - 1


def test_maintain_expires_with_gc_retention(ray_session, tmp_path):
    eng = _mk(tmp_path)
    rep = eng.maintain(apply=False, gc_keep=2)
    assert rep["manifests_expired"] > 0
    assert len(_manifest_files(eng)) == 2
    # audit survives an expiry + further windows
    hist = eng.metrics_history()
    assert [r["checkpoint_id"] for r in hist] == list(range(len(hist)))


def test_crash_between_audit_append_and_unlink_is_harmless(
    ray_session, tmp_path
):
    """expire() appends audit rows BEFORE unlinking manifests; a crash
    in between leaves a row whose manifest still exists. audit_history
    must dedup (live manifest wins) and a rerun must converge."""
    import json

    from etl_ray.state.manifest import AUDIT_LOG

    eng = _mk(tmp_path)
    before = eng.metrics_history()
    # simulate the torn state: audit row written for a LIVE checkpoint
    victim = before[0]
    audit = os.path.join(eng.lake_dir, MANIFEST_DIR, AUDIT_LOG)
    with open(audit, "a") as f:
        f.write(json.dumps({**victim, "torn": True}) + "\n")
    # dedup: the live manifest's row wins, the torn marker never shows
    hist = eng.metrics_history()
    assert hist == before
    assert not any("torn" in r for r in hist)
    # a rerun of expire converges and history stays complete
    eng.store.expire(keep_checkpoints=2)
    assert eng.metrics_history() == before
