"""Long-run soak: a tailer applying many arrivals with periodic
maintenance stays CORRECT (oracle sha-parity) and BOUNDED (manifest
lineage, staging files) — the steady-state a year-long CDC deployment
needs, compressed into 24 arrivals."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from etl_ray import oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine
from etl_ray.state.manifest import MANIFEST_DIR, STAGING_DIR

from tests.util import engine_state_map


def test_soak_tailer_with_periodic_maintenance(ray_session, tmp_path):
    log = generate_events(n_keys=800, seed=21, scenario="mixed",
                          mean_versions=3.0, content_len=64)
    src = str(tmp_path / "segments")
    write_event_log(log, src, n_files=24)  # writer may add a remainder file
    seg_files = sorted(
        os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
    )
    n_arrivals = len(seg_files)
    live = str(tmp_path / "live")
    os.makedirs(live)
    lake = str(tmp_path / "lake")
    eng = ReplayEngine(lake, num_partitions=8)

    for i, f in enumerate(seg_files):
        os.link(f, os.path.join(live, os.path.basename(f)))
        eng.replay(live, window_events=1 << 60)
        if (i + 1) % 8 == 0:
            # the autopilot pass a cron job would run
            eng.maintain(apply=True, gc_keep=2)

    # ---- bounded: lineage and staging do not grow with stream age ----
    mdir = os.path.join(lake, MANIFEST_DIR)
    n_manifests = len([x for x in os.listdir(mdir)
                       if x.startswith("manifest-")])
    assert n_manifests <= 2 + (n_arrivals % 8) + 2, n_manifests
    # staged files: only checkpoints within the gc retention remain
    staged_ckpts = {
        d for d in os.listdir(os.path.join(lake, STAGING_DIR))
    }
    assert len(staged_ckpts) <= 12, sorted(staged_ckpts)

    # ---- correct: final state is sha-exact vs the golden reducer ----
    res = oracle.reduce_events(log.table)
    state = engine_state_map(eng)
    assert set(state) == set(res.state)
    for k, row in res.state.items():
        assert state[k]["content_sha256"] == row["content_sha256"], k
    assert eng.fsck(deep=True)["errors"] == []

    # ---- audit trail complete across every expiry ----
    hist = eng.metrics_history()
    ids = [r["checkpoint_id"] for r in hist]
    assert ids == sorted(set(ids))
    # every ARRIVAL checkpoint is present (maintenance commits add more)
    # maintenance commits (repartition/compact) carry the prior window's
    # metrics forward plus their own marker key — exclude them
    replay_rows = [
        r for r in hist
        if "window_rows" in r
        and "repartitioned_from" not in r
        and "compacted_partitions" not in r
        and "op" not in r
    ]
    assert len(replay_rows) == n_arrivals
    total_events = sum(r["events_in"] for r in replay_rows)
    assert total_events == log.table.num_rows
