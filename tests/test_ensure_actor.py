"""Ensure-actor mode: parity with the stateless merge, cache reuse,
crash/resume safety (SURVEY S10/J3/D1 — the per-partition key→state
index held across checkpoint windows)."""

from __future__ import annotations

import pytest

from etl_ray import oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine

from tests.util import engine_state_map


def test_actor_mode_matches_oracle_and_stateless(ray_session, tmp_path):
    log = generate_events(n_keys=250, seed=17, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=4)

    plain = ReplayEngine(str(tmp_path / "lake_plain"), num_partitions=8)
    plain.replay(str(tmp_path / "log"), window_events=250)
    actored = ReplayEngine(str(tmp_path / "lake_act"), num_partitions=8, ensure_actors=2)
    out = actored.replay(str(tmp_path / "log"), window_events=250)
    assert out["windows_run"] >= 2

    res = oracle.reduce_events(log.table)
    for eng in (plain, actored):
        state = engine_state_map(eng)
        assert set(state) == set(res.state)
        for k, row in res.state.items():
            assert state[k]["content_sha256"] == row["content_sha256"], k
    # summaries agree too
    a = actored.summary("summary_by_repo").to_pandas().sort_values("repo").reset_index(drop=True)
    p = plain.summary("summary_by_repo").to_pandas().sort_values("repo").reset_index(drop=True)
    assert a.equals(p)


def test_actor_cache_survives_windows_and_resume(ray_session, tmp_path):
    import ray

    from etl_ray.stages.ensure import ACTOR_NAMESPACE

    log = generate_events(n_keys=150, seed=23, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=4)
    lake = str(tmp_path / "lake")

    a = ReplayEngine(lake, num_partitions=8, ensure_actors=2)
    a.replay(str(tmp_path / "log"), window_events=110, max_windows=2)

    # actors exist and hold cached partitions
    import hashlib, os

    tag = hashlib.md5(os.path.abspath(lake).encode()).hexdigest()[:10]
    actor = ray.get_actor(f"ensure-{tag}-0", namespace=ACTOR_NAMESPACE)
    assert len(ray.get(actor.cached_parts.remote())) > 0

    # fresh engine (restarted driver) resumes against the same actors
    b = ReplayEngine(lake, num_partitions=8, ensure_actors=2)
    rest = b.replay(str(tmp_path / "log"), window_events=110)
    assert rest["windows_skipped"] == 2 and rest["windows_run"] >= 1

    res = oracle.reduce_events(log.table)
    state = engine_state_map(b)
    assert set(state) == set(res.state)
    for k, row in res.state.items():
        assert state[k]["content_sha256"] == row["content_sha256"], k


def test_stale_actor_cache_reloads_from_manifest(ray_session, tmp_path):
    """Poison an actor's cache with a bogus checkpoint id — the next
    window must reload from the manifest's file, not trust the cache."""
    import ray

    log = generate_events(n_keys=100, seed=29, scenario="inorder")
    write_event_log(log, str(tmp_path / "log"), n_files=2)
    lake = str(tmp_path / "lake")

    eng = ReplayEngine(lake, num_partitions=4, ensure_actors=1)
    eng.replay(str(tmp_path / "log"), window_events=10, max_windows=1)

    import hashlib, os

    from etl_ray.stages.ensure import ACTOR_NAMESPACE

    tag = hashlib.md5(os.path.abspath(lake).encode()).hexdigest()[:10]
    actor = ray.get_actor(f"ensure-{tag}-0", namespace=ACTOR_NAMESPACE)

    @ray.remote
    def poison(a):
        return ray.get(a.__ray_call__.remote(_poison))

    def _poison(self):
        for part, (ck, t) in list(self.cache.items()):
            self.cache[part] = (ck + 999, t.slice(0, 0))  # wrong ckpt + empty
        return True

    ray.get(actor.__ray_call__.remote(_poison))

    eng.replay(str(tmp_path / "log"), window_events=10)
    res = oracle.reduce_events(log.table)
    state = engine_state_map(eng)
    assert set(state) == set(res.state)
