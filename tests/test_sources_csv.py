"""CSV source parity: csv drop → parquet segments → replay == direct replay."""

from __future__ import annotations

from etl_ray import oracle
from etl_ray.generator import generate_events
from etl_ray.pipelines.replay import ReplayEngine
from etl_ray.sources.csv_events import ingest_csv_to_segments, read_csv_events, write_event_log_csv

from tests.util import engine_state_map


def test_csv_roundtrip_preserves_events(ray_session, tmp_path):
    log = generate_events(n_keys=120, seed=31, scenario="dup")
    write_event_log_csv(log.table, str(tmp_path / "csv"), n_files=3)
    ds = read_csv_events(str(tmp_path / "csv"))
    t = ds.to_pandas().sort_values("seq").reset_index(drop=True)
    orig = log.table.to_pandas().sort_values("seq").reset_index(drop=True)
    assert t.shape == orig.shape
    assert (t["commit_seq"] == orig["commit_seq"]).all()
    assert (t["content"].fillna("") == orig["content"].fillna("")).all()


def test_csv_ingest_then_replay_matches_oracle(ray_session, tmp_path):
    log = generate_events(n_keys=150, seed=37, scenario="mixed")
    # drop D-content empties: csv roundtrips "" as null; normalize upfront
    write_event_log_csv(log.table, str(tmp_path / "csv"), n_files=2)
    segs = ingest_csv_to_segments(str(tmp_path / "csv"), str(tmp_path / "segments"))
    assert segs

    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(str(tmp_path / "segments"), window_events=10**9)

    res = oracle.reduce_events(log.table)
    state = engine_state_map(eng)
    assert set(state) == set(res.state)
    for k, row in res.state.items():
        assert state[k]["content_sha256"] == row["content_sha256"], k
