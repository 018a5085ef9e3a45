"""Small-window fast path: parity + batching-independent audit counts.

The fast path (replay.py:_read_validate_window_task) runs read+validate
of a sub-threshold window in ONE Ray task instead of a Dataset, feeding
the same split/fold/merge kernels — the tail-mode latency optimization.
These tests pin (a) byte-parity of final state/summaries/metrics vs the
Dataset path, and (b) that `events_in` reports the RAW pre-combine event
count no matter how the window was batched (the `_dups` multiplicity
carry in stages/validate.py) — including when duplicate keys share one
block, which the Dataset path's per-block combiner would otherwise
silently fold out of the audit trail.
"""

from __future__ import annotations

import pyarrow as pa

from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine

from tests.util import engine_state_map, mklog, write_files


def _metrics(eng):
    keys = ("events_in", "applied", "stale", "deletes", "invalid")
    return [
        {k: r.get(k) for k in keys} for r in eng.metrics_history()
    ]


def _replay_both(tmp_path, tables, monkeypatch, window_events=10_000):
    """Replay the same log with the fast path on (default) and off."""
    files = write_files(tables, str(tmp_path / "log"))
    out = {}
    for tag, thresh in (("fast", str(1 << 30)), ("ds", "0")):
        monkeypatch.setenv("ETL_RAY_SMALL_WINDOW_BYTES", thresh)
        eng = ReplayEngine(str(tmp_path / f"lake_{tag}"), num_partitions=8)
        eng.replay(files, window_events=window_events)
        out[tag] = eng
    return out


def test_fast_path_state_and_metric_parity(ray_session, tmp_path, monkeypatch):
    # duplicate keys INSIDE one file: rows for the same (repo, path) in
    # one block, so the per-block combiner folds some events — the case
    # where events_in must still count raw rows
    rows = []
    seq = 0
    for k in range(40):
        for v in range(3):  # 3 versions of every key, same file
            rows.append((seq, "U", k * 10 + v, f"r{k % 4}", f"f{k}.py", f"v{v}-{k}"))
            seq += 1
    rows.append((seq, "U", None, "r0", "bad.py", "x"))  # invalid: null commit_seq
    t = mklog(rows)
    engines = _replay_both(tmp_path, [t], monkeypatch)

    sf, sd = engine_state_map(engines["fast"]), engine_state_map(engines["ds"])
    assert set(sf) == set(sd)
    for k in sf:
        assert sf[k]["content_sha256"] == sd[k]["content_sha256"], k
    assert _metrics(engines["fast"]) == _metrics(engines["ds"])
    m = _metrics(engines["fast"])
    # raw count: 121 events (120 valid + 1 invalid), NOT the 40 winners
    assert sum(r["events_in"] for r in m) == 121
    assert sum(r["invalid"] for r in m) == 1


def test_events_in_raw_under_any_batching(ray_session, tmp_path, monkeypatch):
    """events_in sums to the raw log size for fast, dataset-direct AND
    groupby exchanges — batching/bocking may not leak into the audit."""
    log = generate_events(n_keys=300, seed=7, scenario="mixed")
    raw = log.table.num_rows
    src = str(tmp_path / "log")
    write_event_log(log, src, n_files=4)
    results = {}
    for tag, env in (
        ("fast", {"ETL_RAY_SMALL_WINDOW_BYTES": str(1 << 30)}),
        ("ds", {"ETL_RAY_SMALL_WINDOW_BYTES": "0"}),
        ("sort", {"ETL_RAY_SMALL_WINDOW_BYTES": "0", "ETL_RAY_SHUFFLE": "sort"}),
    ):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        eng = ReplayEngine(str(tmp_path / f"lake_{tag}"), num_partitions=8)
        eng.replay(src, window_events=400)
        results[tag] = (
            sum(r["events_in"] for r in _metrics(eng)),
            engine_state_map(eng),
        )
        monkeypatch.delenv("ETL_RAY_SHUFFLE", raising=False)
    for tag, (total, _state) in results.items():
        assert total == raw, (tag, total, raw)
    assert set(results["fast"][1]) == set(results["ds"][1]) == set(results["sort"][1])
    for k, row in results["fast"][1].items():
        assert row["content_sha256"] == results["ds"][1][k]["content_sha256"]
        assert row["content_sha256"] == results["sort"][1][k]["content_sha256"]


def test_fast_path_evolved_schema(ray_session, tmp_path, monkeypatch):
    """Schema-evolving segments (extra payload columns appear mid-log)
    replay identically through the single-task scanner read."""
    log = generate_events(n_keys=200, seed=11, scenario="evolve")
    src = str(tmp_path / "log")
    write_event_log(log, src, n_files=3)
    monkeypatch.setenv("ETL_RAY_SMALL_WINDOW_BYTES", str(1 << 30))
    fast = ReplayEngine(str(tmp_path / "lake_f"), num_partitions=8)
    fast.replay(src, window_events=300)
    monkeypatch.setenv("ETL_RAY_SMALL_WINDOW_BYTES", "0")
    ds = ReplayEngine(str(tmp_path / "lake_d"), num_partitions=8)
    ds.replay(src, window_events=300)
    tf, td = fast.final_state().to_pandas(), ds.final_state().to_pandas()
    assert sorted(tf.columns) == sorted(td.columns)
    sf, sd = engine_state_map(fast), engine_state_map(ds)
    assert set(sf) == set(sd)
    for k in sf:
        assert sf[k]["content_sha256"] == sd[k]["content_sha256"]
    assert _metrics(fast) == _metrics(ds)


def test_fast_path_empty_and_all_invalid_window(ray_session, tmp_path, monkeypatch):
    monkeypatch.setenv("ETL_RAY_SMALL_WINDOW_BYTES", str(1 << 30))
    rows = [(i, "U", None, f"r{i}", f"f{i}.py", "x") for i in range(5)]
    t = mklog(rows)
    files = write_files([t], str(tmp_path / "log"))
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(files, window_events=100)
    m = _metrics(eng)
    assert sum(r["events_in"] for r in m) == 5
    assert sum(r["invalid"] for r in m) == 5
    assert eng.final_state().count() == 0
