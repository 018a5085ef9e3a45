"""End-to-end replay parity vs the oracle, resume, crash-recovery, evolution.

The correctness gate from BASELINE.json: per-row sha256(content) equality
of the final lake state under out-of-order, duplicate, delete and
schema-evolving events, plus incremental-summary parity and
exactly-once/resume behavior.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from etl_ray import oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine

from tests.util import engine_state_map, mklog, sha, write_files


def assert_parity(engine, table):
    res = oracle.reduce_events(table)
    state = engine_state_map(engine)
    assert set(state) == set(res.state)
    for k, row in res.state.items():
        assert state[k]["content_sha256"] == row["content_sha256"], k
    # summaries
    br = {r["repo"]: r for r in engine.summary("summary_by_repo").to_pylist()}
    obr = oracle.summary_by_repo(res)
    assert set(br) == set(obr)
    for repo, s in obr.items():
        e = br[repo]
        assert (e["file_count"], e["total_bytes"], e["distinct_langs"], e["last_commit_seq"]) == (
            s["file_count"], s["total_bytes"], s["distinct_langs"], s["last_commit_seq"]
        ), repo
    bl = {r["lang"]: r for r in engine.summary("summary_by_lang").to_pylist()}
    obl = oracle.summary_by_lang(res)
    assert set(bl) == set(obl)
    for lang, s in obl.items():
        assert (bl[lang]["file_count"], bl[lang]["total_bytes"]) == (
            s["file_count"], s["total_bytes"]
        ), lang
    return res


@pytest.mark.parametrize("scenario", ["inorder", "dup", "ooo", "delete", "evolve", "mixed"])
def test_scenario_parity(ray_session, tmp_path, scenario):
    log = generate_events(n_keys=250, seed=42, scenario=scenario)
    write_event_log(log, str(tmp_path / "log"), n_files=2)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    out = eng.replay(str(tmp_path / "log"), window_events=10**9)  # single window
    assert out["windows_run"] >= 1
    assert_parity(eng, log.table)


def test_multi_window_equals_single_window(ray_session, tmp_path):
    log = generate_events(n_keys=300, seed=11, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=4)

    one = ReplayEngine(str(tmp_path / "lake1"), num_partitions=8)
    one.replay(str(tmp_path / "log"), window_events=10**9)
    many = ReplayEngine(str(tmp_path / "lakeN"), num_partitions=8)
    out = many.replay(str(tmp_path / "log"), window_events=200)
    assert out["windows_run"] >= 3
    assert_parity(one, log.table)
    res = assert_parity(many, log.table)
    # incremental == recomputed: both lakes agree with the oracle and thus
    # with each other even though lakeN maintained summaries delta-by-delta
    assert len(res.state) > 0


def test_resume_skips_committed_windows(ray_session, tmp_path):
    log = generate_events(n_keys=300, seed=5, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=4)
    lake = str(tmp_path / "lake")

    a = ReplayEngine(lake, num_partitions=8)
    partial = a.replay(str(tmp_path / "log"), window_events=250, max_windows=2)
    assert partial["windows_run"] == 2

    b = ReplayEngine(lake, num_partitions=8)  # fresh engine = restarted driver
    rest = b.replay(str(tmp_path / "log"), window_events=250)
    assert rest["windows_skipped"] == 2
    assert rest["windows_run"] >= 1
    assert_parity(b, log.table)


def test_crash_between_staging_and_swap(ray_session, tmp_path, monkeypatch):
    """Kill after staged files are written but before the manifest swap:
    the committed manifest stays intact; a rerun re-stages the window
    deterministically and commits exactly once."""
    log = generate_events(n_keys=200, seed=3, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=2)
    lake = str(tmp_path / "lake")

    eng = ReplayEngine(lake, num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=10, max_windows=1)  # 1 window per file
    committed = eng.store.current()
    assert committed is not None and committed.checkpoint_id == 0

    from etl_ray.state.manifest import ManifestStore

    real_commit = ManifestStore.commit

    def boom(self, m, epoch=None):
        raise RuntimeError("simulated crash before manifest swap")

    monkeypatch.setattr(ManifestStore, "commit", boom)
    with pytest.raises(RuntimeError):
        ReplayEngine(lake, num_partitions=8).replay(str(tmp_path / "log"), window_events=10)
    monkeypatch.setattr(ManifestStore, "commit", real_commit)

    # lake still at checkpoint 0; staged ckpt=1 files are orphans
    assert ReplayEngine(lake).store.current().checkpoint_id == 0

    fresh = ReplayEngine(lake, num_partitions=8)
    out = fresh.replay(str(tmp_path / "log"), window_events=10)
    assert out["windows_skipped"] == 1 and out["windows_run"] >= 1
    assert_parity(fresh, log.table)

    # every manifest-referenced file exists and is referenced exactly once
    m = fresh.store.current()
    files = [p["file"] for p in m.partitions.values()]
    assert len(files) == len(set(files))
    for f in files:
        assert os.path.exists(fresh.store.abs_path(f))


def test_stale_cross_window_update_is_noop(ray_session, tmp_path):
    """A later window delivering an *earlier* commit must not regress state
    (the LWW ensure-dict semantics, reference bulk_inserter ensure)."""
    w1 = mklog([(0, "I", 1, "r", "p", "v0"), (1, "U", 10, "r", "p", "final")])
    w2 = mklog([(2, "U", 5, "r", "p", "stale")])
    write_files([w1, w2], str(tmp_path / "log"))
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(str(tmp_path / "log"), window_events=2)
    state = engine_state_map(eng)
    assert state[("r", "p")]["content_sha256"] == sha("final")
    hist = eng.metrics_history()
    assert hist[-1]["stale"] == 1 and hist[-1]["applied"] == 0


def test_tombstone_blocks_cross_window_resurrection(ray_session, tmp_path):
    w1 = mklog([(0, "I", 1, "r", "p", "v0"), (1, "D", 10, "r", "p", "")])
    w2 = mklog([(2, "U", 5, "r", "p", "zombie")])
    write_files([w1, w2], str(tmp_path / "log"))
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(str(tmp_path / "log"), window_events=2)
    assert engine_state_map(eng) == {}
    lineage = eng.partition_lineage()
    assert sum(p["tombstones"] for p in lineage.values()) == 1


def test_schema_evolution_adds_column_with_null_backfill(ray_session, tmp_path):
    log = generate_events(n_keys=150, seed=9, scenario="evolve")
    write_event_log(log, str(tmp_path / "log"), n_files=3)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=10**9)
    df = eng.final_state().to_pandas()
    assert "meta_owner" in df.columns
    assert df["meta_owner"].notna().any()
    res = oracle.reduce_events(log.table)
    for _, r in df.iterrows():
        want = res.state[(r["repo"], r["path"])].get("meta_owner")
        got = r["meta_owner"]
        assert (want is None and (got is None or got != got)) or want == got


def test_evolution_across_checkpoint_windows(ray_session, tmp_path):
    """Column appears only in window 2; window-1 partitions must unify."""
    log = generate_events(n_keys=150, seed=9, scenario="evolve")
    write_event_log(log, str(tmp_path / "log"), n_files=3)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=150)
    assert "meta_owner" in eng.store.current().payload_types
    assert_parity(eng, log.table)


def test_metrics_and_lineage(ray_session, tmp_path):
    log = generate_events(n_keys=200, seed=21, scenario="mixed")
    write_event_log(log, str(tmp_path / "log"), n_files=2)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(str(tmp_path / "log"), window_events=300)
    hist = eng.metrics_history()
    assert [h["checkpoint_id"] for h in hist] == list(range(len(hist)))
    # window_rows = raw log rows; events_in = rows surviving the per-batch
    # LWW combiner (within-window duplicates/superseded versions pre-reduced)
    assert sum(h["window_rows"] for h in hist) == log.table.num_rows
    assert sum(h["events_in"] for h in hist) <= log.table.num_rows
    res = oracle.reduce_events(log.table)
    lineage = eng.partition_lineage()
    assert sum(p["rows"] for p in lineage.values()) == len(res.state)
    # global watermark across partitions == max commit_seq ever applied
    assert max(p["watermark"] for p in lineage.values()) == max(
        res.repo_watermark.values()
    )
    # partition state files are disjoint by part and filter to live rows
    total = 0
    for p, info in lineage.items():
        t = pq.read_table(eng.store.abs_path(info["file"]))
        assert set(t.column("part").to_pylist()) <= {int(p)}
        total += t.num_rows
    assert total == len(res.state) + sum(pi["tombstones"] for pi in lineage.values())


def test_append_after_partial_tail_window_commit(ray_session, tmp_path):
    """Resume cursor is file-based: a committed below-threshold tail window
    must not swallow segments appended later (the round-1 lost-append bug:
    commit window0=[f1]; append f2,f3; old window-index resume re-planned
    window0=[f1,f2] and skipped it, losing f2)."""
    log = generate_events(n_keys=200, seed=77, scenario="mixed")
    staged = write_event_log(log, str(tmp_path / "staged"), n_files=3)
    assert len(staged) >= 3  # evolve split can add a file boundary
    live = tmp_path / "log"
    live.mkdir()
    import shutil

    # only f1 exists; window_events far above its rows -> partial tail window
    shutil.copy(staged[0], live / os.path.basename(staged[0]))
    lake = str(tmp_path / "lake")
    a = ReplayEngine(lake, num_partitions=8)
    first = a.replay(str(live), window_events=10**9)
    assert first["windows_run"] == 1

    # append f2, f3 and resume with a fresh engine (restarted driver)
    for f in staged[1:]:
        shutil.copy(f, live / os.path.basename(f))
    b = ReplayEngine(lake, num_partitions=8)
    rest = b.replay(str(live), window_events=10**9)
    assert rest["windows_run"] >= 1  # appended files form NEW windows
    assert_parity(b, log.table)  # nothing lost


def test_resume_refuses_mutated_log_prefix(ray_session, tmp_path):
    """A consumed segment that changes after commit fails loudly on resume
    (append-only discipline, fingerprint-verified)."""
    log = generate_events(n_keys=100, seed=78, scenario="inorder")
    files = write_event_log(log, str(tmp_path / "log"), n_files=2)
    lake = str(tmp_path / "lake")
    a = ReplayEngine(lake, num_partitions=4)
    a.replay(str(tmp_path / "log"), window_events=10)

    # mutate the first consumed segment (drop a row)
    t = pq.read_table(files[0])
    pq.write_table(t.slice(1), files[0])
    b = ReplayEngine(lake, num_partitions=4)
    with pytest.raises(RuntimeError, match="append-only"):
        b.replay(str(tmp_path / "log"), window_events=10)
