"""Manifest rollback: erase later checkpoints, re-replay to full parity
(the reference's dipaal_rollback partition-level reprocessing)."""

from __future__ import annotations

import pyarrow as pa

from etl_ray import oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine

from tests.util import engine_state_map


def test_rollback_then_rereplay(ray_session, tmp_path):
    log = generate_events(n_keys=200, seed=41, scenario="mixed")
    files = write_event_log(log, str(tmp_path / "log"), n_files=4)
    lake = str(tmp_path / "lake")

    eng = ReplayEngine(lake, num_partitions=8)
    out = eng.replay(str(tmp_path / "log"), window_events=10)  # 1 window/file
    n_windows = out["windows_run"]
    assert n_windows == len(files)  # evolve split can add a file boundary

    # roll back to after window 1 (checkpoint id 1)
    m = eng.store.rollback(1)
    assert m.checkpoint_id == 1 and m.windows_done == 2

    # lake state now equals the oracle over the first two segments only
    import pyarrow.parquet as pq

    prefix = pa.concat_tables(
        [pq.read_table(f) for f in files[:2]], promote_options="default"
    )
    res_prefix = oracle.reduce_events(prefix)
    state = engine_state_map(ReplayEngine(lake))
    assert set(state) == set(res_prefix.state)

    # re-replay resumes from window 2 and reconverges to the full oracle
    fresh = ReplayEngine(lake, num_partitions=8)
    rest = fresh.replay(str(tmp_path / "log"), window_events=10)
    assert rest["windows_skipped"] == 2 and rest["windows_run"] == n_windows - 2
    res = oracle.reduce_events(log.table)
    state = engine_state_map(fresh)
    assert set(state) == set(res.state)
    for k, row in res.state.items():
        assert state[k]["content_sha256"] == row["content_sha256"], k


def test_rollback_to_missing_checkpoint_raises(ray_session, tmp_path):
    import pytest

    log = generate_events(n_keys=50, seed=43, scenario="inorder")
    write_event_log(log, str(tmp_path / "log"), n_files=1)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(str(tmp_path / "log"))
    with pytest.raises(ValueError):
        eng.store.rollback(99)


def test_gc_keeps_referenced_files_and_lake_stays_readable(ray_session, tmp_path):
    from etl_ray.generator import generate_events, write_event_log

    log = generate_events(n_keys=150, seed=47, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=4)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(lake, num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=10)

    deleted = eng.store.gc(keep_checkpoints=1)
    assert deleted  # early checkpoints' superseded files went away

    # the lake is still fully readable and oracle-exact after GC
    res = oracle.reduce_events(log.table)
    state = engine_state_map(ReplayEngine(lake))
    assert set(state) == set(res.state)
    for k, row in res.state.items():
        assert state[k]["content_sha256"] == row["content_sha256"], k

    # rollback within the retention window still works
    hist = eng.store.history()
    eng.store.rollback(hist[-1].checkpoint_id)


def test_rollback_past_gc_retention_refused(ray_session, tmp_path):
    """gc() reclaims files referenced only by old checkpoints; rollback to
    such a checkpoint must refuse instead of leaving an unreadable lake."""
    import pytest

    log = generate_events(n_keys=150, seed=55, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=4)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(lake, num_partitions=4)
    out = eng.replay(str(tmp_path / "log"), window_events=10)
    assert out["windows_run"] >= 3
    eng.store.gc(keep_checkpoints=1)
    with pytest.raises(ValueError, match="retention"):
        eng.store.rollback(0)
