"""Writer-epoch fencing: a zombie driver (older fence epoch) that tries
to commit after a newer writer advanced the lake is rejected loudly —
the multi-writer safety boundary on top of the two-phase manifest."""

from __future__ import annotations

import pytest

from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine
from etl_ray.state.manifest import ManifestStore, StaleWriterError


def _mk_lake(tmp_path, n_files=4):
    log = generate_events(n_keys=100, seed=47, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=n_files)
    return str(tmp_path / "log"), str(tmp_path / "lake")


def test_epochs_are_unique_and_monotonic(tmp_path):
    store = ManifestStore(str(tmp_path / "lake"))
    e1, e2, e3 = store.fence(), store.fence(), store.fence()
    assert e1 < e2 < e3
    assert len({e1, e2, e3}) == 3


def test_stale_writer_commit_is_rejected(ray_session, tmp_path):
    log_dir, lake = _mk_lake(tmp_path)

    zombie = ReplayEngine(lake, num_partitions=4)
    zombie.replay(log_dir, window_events=10, max_windows=1)
    stale_epoch = zombie._epoch
    assert stale_epoch is not None

    # a NEWER driver advances the lake (claims a later epoch)
    newer = ReplayEngine(lake, num_partitions=4)
    newer.replay(log_dir, window_events=10, max_windows=1)
    assert newer._epoch > stale_epoch

    # the zombie resumes with its OLD epoch and must be fenced at commit
    m = zombie.store.current()
    with pytest.raises(StaleWriterError):
        zombie.store.commit(m, epoch=stale_epoch)

    # the newer writer can still commit (its epoch is current)
    zombie.store.commit(m, epoch=newer._epoch)
    assert zombie.store.current().writer_epoch == newer._epoch


def test_replay_refences_per_call_and_survives(ray_session, tmp_path):
    log_dir, lake = _mk_lake(tmp_path)
    eng = ReplayEngine(lake, num_partitions=4)
    eng.replay(log_dir, window_events=10, max_windows=1)
    first = eng._epoch
    # the same engine replaying again claims a FRESH epoch, so an
    # interleaved other-writer commit between its calls cannot brick it
    eng.replay(log_dir, window_events=10)
    assert eng._epoch > first
    assert eng.store.current().writer_epoch == eng._epoch


def test_rollback_then_rereplay_still_works_with_fencing(ray_session,
                                                         tmp_path):
    log_dir, lake = _mk_lake(tmp_path)
    eng = ReplayEngine(lake, num_partitions=4)
    eng.replay(log_dir, window_events=10)
    ck = eng.store.current().checkpoint_id
    assert ck >= 1
    eng.store.rollback(ck - 1)
    fresh = ReplayEngine(lake, num_partitions=4)
    out = fresh.replay(log_dir, window_events=10)
    assert out["windows_run"] >= 1
    assert fresh.store.current().checkpoint_id == ck
    # the re-replayed manifest carries the newest epoch
    assert fresh.store.current().writer_epoch == fresh._epoch
