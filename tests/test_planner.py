"""Partition-plan advisor: skew detection from lineage, exact candidate
simulation, executed recommendation rebalances the lake, hot-key list
surfaces the seeded monorepo."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine
from etl_ray.state.planner import partition_stats, plan_partitions


@pytest.fixture(scope="module")
def skewed_lake(ray_session, tmp_path_factory):
    """A monorepo-skewed stream (generator: org0/repo0 holds ~20% of
    keys) replayed into a DELIBERATELY over-sharded lake: 150 keys over
    64 hash partitions guarantees heavy per-partition imbalance (mean
    2.3 keys/part; the max partition is several times that)."""
    tmp = str(tmp_path_factory.mktemp("planner"))
    log = generate_events(n_keys=150, seed=11, scenario="mixed",
                          mean_versions=3.0, content_len=64)
    files = write_event_log(log, os.path.join(tmp, "log"), n_files=2)
    eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=64)
    eng.replay(files, window_events=10_000)
    return eng


def _live_counts(eng) -> list[int]:
    m = eng.store.current()
    return [
        int(i.get("rows", 0)) + int(i.get("tombstones", 0))
        for i in m.partitions.values()
    ]


def _state(eng) -> pd.DataFrame:
    return (
        eng.final_state(columns=["repo", "path", "content_sha256"])
        .to_pandas()
        .sort_values(["repo", "path"], ignore_index=True)
    )


def test_detects_skew_and_recommends_smaller_layout(skewed_lake):
    eng = skewed_lake
    plan = eng.plan_partitions(tolerance=2.0, candidates=[4, 16, 64])
    assert plan["current"]["num_partitions"] == 64
    # 150 keys over 64 buckets: max/mean far above 2 — detected
    assert plan["current"]["imbalance"] > 2.0
    assert plan["skewed"] is True
    # the exact simulation must find P'=4 balanced (mean ~37 keys/part)
    by_p = {c["p"]: c for c in plan["candidates"]}
    assert by_p[4]["imbalance"] <= 2.0
    # recommendation = the LARGEST balanced candidate (max parallelism
    # subject to balance), and strictly smaller than the skewed current
    fitting = [c["p"] for c in plan["candidates"] if c["imbalance"] <= 2.0]
    assert plan["recommended_p"] == max(fitting)
    assert plan["recommended_p"] < 64


def test_executed_recommendation_rebalances_and_preserves_state(skewed_lake):
    eng = skewed_lake
    before = _state(eng)
    plan = eng.plan_partitions(tolerance=2.0, candidates=[4, 16, 64])
    res = eng.repartition(plan["recommended_p"])
    assert res["num_partitions"] == plan["recommended_p"]
    # the simulation was exact: executed per-partition key counts match
    # the predicted max, and the lake is within the ~2x-of-even bar
    counts = _live_counts(eng)
    by_p = {c["p"]: c for c in plan["candidates"]}
    assert max(counts) == by_p[plan["recommended_p"]]["max_rows"]
    mean = sum(counts) / len(counts)
    assert max(counts) / mean <= 2.0
    # state is byte-identical (sha256 invariant) and fsck stays green
    assert before.equals(_state(eng))
    fsck = eng.fsck(deep=True)
    assert fsck["ok"], fsck["errors"]


def test_hot_key_list_surfaces_the_monorepo(skewed_lake):
    eng = skewed_lake
    plan = eng.plan_partitions(top_keys=5)
    assert plan["hot_keys"], "expected a non-empty hot-key list"
    top = plan["hot_keys"][0]
    # the generator pins ~20% of keys to org0/repo0 — it must lead, and
    # its key count must match the lake's own distinct-key count
    assert top["repo"] == "org0/repo0"
    df = _state(eng)
    m = eng.store.current()
    tomb = sum(int(i.get("tombstones", 0)) for i in m.partitions.values())
    # hot list counts state KEYS (live + tombstoned); live-only count is
    # a lower bound and the gap is bounded by total tombstones
    live_top = int((df["repo"] == "org0/repo0").sum())
    assert live_top <= top["keys"] <= live_top + tomb


def test_target_rows_triggers_grow(skewed_lake):
    eng = skewed_lake
    # force a grow: cap partitions at ~10 keys each → needs ≥ 16 parts
    plan = plan_partitions(
        eng.lake_dir, target_rows_per_partition=10, tolerance=1000.0
    )
    assert plan["skewed"] is True or plan["current"]["num_partitions"] >= 16
    assert plan["recommended_p"] * 10 >= plan["n_keys"]


def test_partition_stats_shape(skewed_lake):
    eng = skewed_lake
    stats = partition_stats(eng.store)
    assert stats and all(
        set(s) == {"part", "rows", "tombstones", "bytes", "chain_files"}
        for s in stats
    )
    assert all(s["bytes"] > 0 for s in stats)
