"""Long-lived tailer scaling: per-pass work must not grow with the
number of already-consumed segments (replay.py memoizes the verified
prefix; schema unification runs over the unconsumed suffix only).
Protection is unchanged: a FRESH engine still fully verifies the
consumed prefix once, and tampering is still refused."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import etl_ray.pipelines.replay as replay_mod
from etl_ray.pipelines.replay import ReplayEngine

from tests.util import mklog, write_files


def _segment(i, n=30):
    rows = [
        (i * n + j, "U", i * n + j, f"r{j % 3}", f"f{j}.py", f"c{i}-{j}")
        for j in range(n)
    ]
    return mklog(rows)


def test_long_lived_tailer_skips_prefix_reverification(
    ray_session, tmp_path, monkeypatch
):
    calls = []
    real = replay_mod.prefix_fingerprint

    def counting(files):
        calls.append(len(files))
        return real(files)

    monkeypatch.setattr(replay_mod, "prefix_fingerprint", counting)
    src = str(tmp_path / "log")
    os.makedirs(src)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    for i in range(6):
        pq.write_table(_segment(i), os.path.join(src, f"events-{i:05d}.parquet"))
        eng.replay(src, window_events=1 << 30)
    # the engine that chained every commit itself never re-reads footers
    assert calls == [], calls
    # a FRESH engine verifies the full consumed prefix exactly once...
    eng2 = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng2.replay(src, window_events=1 << 30)
    assert calls == [6]
    # ...and memoizes it for its own subsequent passes
    eng2.replay(src, window_events=1 << 30)
    assert calls == [6]


def test_fresh_engine_still_detects_tampered_prefix(ray_session, tmp_path):
    src = str(tmp_path / "log")
    write_files([_segment(0), _segment(1)], src)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(src, window_events=1 << 30)
    # mutate a consumed segment (row count changes its fingerprint)
    victim = sorted(os.listdir(src))[0]
    pq.write_table(_segment(0, n=5), os.path.join(src, victim))
    fresh = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    with pytest.raises(RuntimeError, match="append-only"):
        fresh.replay(src, window_events=1 << 30)


def test_suffix_only_schema_preserves_evolved_columns(
    ray_session, tmp_path, monkeypatch
):
    """A payload column that appeared in a CONSUMED segment and is absent
    from later segments must survive in the lake (manifest payload_types
    carry it; the suffix-only unify must not drop it)."""
    import pyarrow as pa

    t0 = mklog([(0, "U", 1, "r0", "a.py", "v0")])
    t0 = t0.append_column("extra", pa.array([42], pa.int64()))
    t1 = mklog([(1, "U", 2, "r0", "b.py", "v1")])  # no `extra`
    src = str(tmp_path / "log")
    write_files([t0], src)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=2)
    eng.replay(src, window_events=1 << 30)
    # second arrival lacks the evolved column entirely
    pq.write_table(t1, os.path.join(src, "events-99999.parquet"))
    eng.replay(src, window_events=1 << 30)
    df = eng.final_state().to_pandas().set_index("path")
    assert "extra" in df.columns
    assert int(df.loc["a.py", "extra"]) == 42
    assert df.loc["b.py", "extra"] != df.loc["b.py", "extra"] or \
        df.loc["b.py", "extra"] is None  # NaN/null for the new row
