"""Worker-death fault injection: exactly-once through a task retry.

The strongest exactly-once claim is not "the happy path writes once" but
"a worker that dies AFTER its staged file hit disk leaves no trace":
Ray retries the dead merge task, the deterministic staged path makes the
retry overwrite the same file (never append a second copy), and the
metrics come only from the attempt that returned. The hook
(`stages/merge.py:_maybe_die_after_stage`) kills the first merge worker
to win an O_EXCL flag race via ``os._exit`` — a real process death, not
an exception — so this exercises Ray's actual worker-failure retry path.
"""

from __future__ import annotations

import os

import pytest

from etl_ray import oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine

from tests.test_replay import assert_parity


def test_worker_death_after_staged_write_is_exactly_once(
    ray_session, tmp_path, monkeypatch
):
    log = generate_events(n_keys=300, seed=13, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=2)
    monkeypatch.setenv("ETL_RAY_FAULT_DIR", str(tmp_path))
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    metrics = eng.replay(str(tmp_path / "log"), window_events=10**9)
    # the fault actually fired — a merge worker died mid-window
    assert (tmp_path / "fault_fired").exists()
    # final state, summaries and watermarks still exactly match the oracle
    assert_parity(eng, log.table)
    # metrics were applied once: total applied equals the oracle's count of
    # winning upserts (every key's final non-delete version, applied once)
    res = oracle.reduce_events(log.table)
    total_applied = sum(
        w["applied"] for k, w in metrics.items() if k.startswith("window_")
    )
    # applied counts every event that won at its apply time (including ones
    # later superseded in a later window); with a single window the winners
    # surviving the per-batch LWW combiner are exactly the applied set, and
    # it can never be < the live keys nor double-counted beyond events_in
    assert total_applied >= len(res.state)
    total_events_in = sum(
        w["events_in"] for k, w in metrics.items() if k.startswith("window_")
    )
    assert total_applied <= total_events_in <= log.table.num_rows


def test_second_replay_without_fault_dir_is_clean(ray_session, tmp_path):
    """Control: same seed, no fault — identical final state map (the
    injected death changes nothing observable)."""
    from tests.util import engine_state_map

    log = generate_events(n_keys=300, seed=13, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=2)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=10**9)
    res = oracle.reduce_events(log.table)
    state = engine_state_map(eng)
    assert set(state) == set(res.state)
