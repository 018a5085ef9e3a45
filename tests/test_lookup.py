"""Point-lookup serving path: hash-route to ONE partition file, no scan."""

from __future__ import annotations

import os

import pytest

from tests.util import mklog, write_files, sha

from etl_ray.pipelines.replay import ReplayEngine


@pytest.fixture()
def lake(ray_session, tmp_path):
    tmp = str(tmp_path)
    s0 = mklog(
        [
            (1, "I", 1, "r1", "a", "a0"),
            (2, "I", 2, "r1", "b", "b0"),
            (3, "I", 3, "r2", "c", "c0"),
        ]
    )
    s1 = mklog(
        [
            (4, "U", 4, "r1", "a", "a1"),
            (5, "D", 5, "r1", "b", ""),
        ]
    )
    files = write_files([s0, s1], os.path.join(tmp, "log"))
    eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=8)
    eng.replay(files, window_events=3)  # two checkpoints
    return eng


def test_lookup_live_updated_deleted_absent(lake):
    row = lake.lookup("r1", "a")
    assert row.num_rows == 1
    assert row.column("content")[0].as_py() == "a1"
    assert row.column("content_sha256")[0].as_py() == sha("a1")
    assert lake.lookup("r1", "b").num_rows == 0  # tombstoned
    assert lake.lookup("rX", "nope").num_rows == 0  # never existed
    got = lake.lookup("r2", "c", columns=["repo", "path", "content"])
    assert got.column_names == ["repo", "path", "content"]


def test_lookup_time_travel(lake):
    old = lake.lookup("r1", "a", as_of=0)
    assert old.column("content")[0].as_py() == "a0"
    assert lake.lookup("r1", "b", as_of=0).num_rows == 1  # pre-delete


def test_lookup_matches_final_state(lake):
    fs = lake.final_state(columns=["repo", "path", "content_sha256"]).to_pandas()
    for _, r in fs.iterrows():
        got = lake.lookup(r["repo"], r["path"])
        assert got.num_rows == 1
        assert got.column("content_sha256")[0].as_py() == r["content_sha256"]


def test_lookup_on_chained_lake(ray_session, tmp_path):
    os.environ.update(
        {"ETL_RAY_DELTA_CHAIN": "1", "ETL_RAY_CHAIN_MAX": "9",
         "ETL_RAY_COMPACT_RATIO": "1.1"}
    )
    try:
        tmp = str(tmp_path)
        s0 = mklog([(1, "I", 1, "r1", "a", "a0")])
        s1 = mklog([(2, "U", 2, "r1", "a", "a1")])
        files = write_files([s0, s1], os.path.join(tmp, "log"))
        eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=4)
        eng.replay(files, window_events=1)
        assert any(
            p.get("deltas") for p in eng.store.current().partitions.values()
        )  # the chain actually formed
        row = eng.lookup("r1", "a")
        assert row.num_rows == 1
        assert row.column("content")[0].as_py() == "a1"
    finally:
        for k in ("ETL_RAY_DELTA_CHAIN", "ETL_RAY_CHAIN_MAX",
                  "ETL_RAY_COMPACT_RATIO"):
            os.environ.pop(k, None)


def test_prune_files_by_stats_skips_disjoint_files(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_ray.pipelines.replay import prune_files_by_stats

    paths = []
    for i, (lo, hi) in enumerate([(0, 99), (100, 199), (200, 299)]):
        f = str(tmp_path / f"f{i}.parquet")
        pq.write_table(
            pa.table({"commit_seq": pa.array(range(lo, hi + 1), pa.int64())}), f)
        paths.append(f)
    empty = str(tmp_path / "empty.parquet")
    pq.write_table(pa.table({"commit_seq": pa.array([], pa.int64())}), empty)
    paths.append(empty)

    assert prune_files_by_stats(paths, "commit_seq", 150, 160) == [paths[1]]
    assert prune_files_by_stats(paths, "commit_seq", 99, 100) == paths[:2]
    assert prune_files_by_stats(paths, "commit_seq", None, 50) == [paths[0]]
    assert prune_files_by_stats(paths, "commit_seq", 250, None) == [paths[2]]
    assert prune_files_by_stats(paths, "commit_seq", 1000, None) == []


def test_final_state_commit_seq_range_matches_post_filter(ray_session, tmp_path):
    """Range reads (zone-map pruned) return exactly the rows a full read
    + manual filter returns — including the empty range, which must
    still carry the schema."""
    from etl_ray.generator import generate_events, write_event_log
    from etl_ray.pipelines.replay import ReplayEngine

    log = tmp_path / "log"
    lake = str(tmp_path / "lake")
    write_event_log(
        generate_events(n_keys=300, seed=9, scenario="mixed"), str(log),
        n_files=4)
    eng = ReplayEngine(lake, num_partitions=8)
    eng.replay(str(log), window_events=600)

    full = eng.final_state(columns=["repo", "path", "commit_seq"]).to_pandas()
    lo, hi = 50, 900
    got = eng.final_state(
        columns=["repo", "path", "commit_seq"], commit_seq_range=(lo, hi)
    ).to_pandas().sort_values(["repo", "path"], ignore_index=True)
    want = full[(full.commit_seq >= lo) & (full.commit_seq <= hi)].sort_values(
        ["repo", "path"], ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)
    # commit_seq was injected for filtering but must NOT leak when the
    # caller did not ask for it
    no_cs = eng.final_state(
        columns=["repo", "path"], commit_seq_range=(lo, hi)).to_pandas()
    assert list(no_cs.columns) == ["repo", "path"]
    assert len(no_cs) == len(want)
    # empty range: zero rows, Dataset schema intact (Ray's to_pandas is
    # lossy on empty datasets engine-wide; the Dataset itself is typed)
    empty_ds = eng.final_state(
        columns=["repo", "path", "commit_seq"],
        commit_seq_range=(10**12, None))
    assert empty_ds.schema().names == ["repo", "path", "commit_seq"]
    assert empty_ds.count() == 0


def test_commit_seq_range_on_chained_lake(ray_session, tmp_path):
    """Zone-map range reads fold merge-on-read chains correctly: a chain
    is pruned only when EVERY file excludes the range, and folded rows
    filter exactly like a full read."""
    import os

    import pandas as pd

    from etl_ray.generator import generate_events, write_event_log
    from etl_ray.pipelines.replay import ReplayEngine

    saved = {k: os.environ.get(k) for k in
             ("ETL_RAY_DELTA_CHAIN", "ETL_RAY_CHAIN_MAX",
              "ETL_RAY_COMPACT_RATIO")}
    os.environ.update({"ETL_RAY_DELTA_CHAIN": "1", "ETL_RAY_CHAIN_MAX": "8",
                       "ETL_RAY_COMPACT_RATIO": "1.1"})
    try:
        log = tmp_path / "log"
        lake = str(tmp_path / "lake")
        write_event_log(
            generate_events(n_keys=300, seed=13, scenario="mixed"),
            str(log), n_files=4)
        eng = ReplayEngine(lake, num_partitions=8)
        import pyarrow.parquet as pq
        n = sum(pq.read_metadata(os.path.join(str(log), f)).num_rows
                for f in os.listdir(str(log)) if f.endswith(".parquet"))
        eng.replay(str(log), window_events=max(1, n // 2))
        m = eng.store.current()
        assert any(p.get("deltas") for p in m.partitions.values()), \
            "fixture must actually form a chain"

        full = eng.final_state(columns=["repo", "path", "commit_seq"]).to_pandas()
        lo, hi = int(full.commit_seq.quantile(0.3)), int(full.commit_seq.quantile(0.8))
        got = eng.final_state(
            columns=["repo", "path", "commit_seq"], commit_seq_range=(lo, hi)
        ).to_pandas().sort_values(["repo", "path"], ignore_index=True)
        want = full[(full.commit_seq >= lo) & (full.commit_seq <= hi)].sort_values(
            ["repo", "path"], ignore_index=True)
        pd.testing.assert_frame_equal(got, want)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
