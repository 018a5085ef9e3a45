"""Dead-letter queue: invalid events are quarantined with reason codes
under the same exactly-once manifest commit as the state itself.

Reference analog: the cleaning filter's per-rule drop accounting
(etl/cleaning/clean_data.py:123-148) — the reference logs how many rows
each rule removed; the DLQ keeps the rows, says why, and makes them
rollback/gc/resume-consistent lake citizens.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from tests.util import mklog, write_files

from etl_ray.pipelines.replay import ReplayEngine
from etl_ray.stages.validate import make_validate_fn, reject_reasons


def _bad_log(tmp):
    """Two segments; 4 invalid rows covering every reason code."""
    s0 = mklog(
        [
            (1, "I", 1, "r1", "a", "x1"),
            (3, "X", 3, "r1", "c", "x3"),  # bad_op
            (4, "I", 4, "r2", "d", "x4"),
        ]
    )
    # hand-build rows with empty/null key fields (mklog requires them set)
    s0 = pa.concat_tables(
        [
            s0,
            pa.table(
                {
                    "seq": pa.array([2], pa.int64()),
                    "op": pa.array(["I"], pa.string()),
                    "commit_seq": pa.array([2], pa.int64()),
                    "repo": pa.array([""], pa.string()),  # null_repo
                    "path": pa.array(["b"], pa.string()),
                    "commit": pa.array(["c2"], pa.string()),
                    "lang": pa.array(["py"], pa.string()),
                    "content": pa.array(["x2"], pa.string()),
                }
            ),
        ]
    )
    s1 = pa.table(
        {
            "seq": pa.array([5, 6, 7], pa.int64()),
            "op": pa.array(["U", "D", "U"], pa.string()),
            "commit_seq": pa.array([5, None, 7], pa.int64()),  # seq6: null_commit_seq
            "repo": pa.array(["r1", "r1", "r1"], pa.string()),
            "path": pa.array(["a", "a", None], pa.string()),  # seq7: null_path? no —
            # seq7 has null path AND valid commit_seq → null_path
            "commit": pa.array(["c5", "c6", "c7"], pa.string()),
            "lang": pa.array(["py"] * 3, pa.string()),
            "content": pa.array(["x5", "x6", "x7"], pa.string()),
        }
    )
    return write_files([s0, s1], os.path.join(tmp, "log"))


def test_reject_reasons_agree_with_validate_flag(ray_session):
    """reason is null  ⟺  _valid is true, for every rule combination."""
    t = pa.table(
        {
            "seq": pa.array(range(6), pa.int64()),
            "op": pa.array(["I", "I", "X", "U", None, "D"], pa.string()),
            "commit_seq": pa.array([1, 2, 3, None, 5, 6], pa.int64()),
            "repo": pa.array(["r", "", "r", "r", "r", None], pa.string()),
            "path": pa.array(["p", "p", "p", "p", "p", "p"], pa.string()),
            "commit": pa.array(["c"] * 6, pa.string()),
            "lang": pa.array(["py"] * 6, pa.string()),
            "content": pa.array(["x"] * 6, pa.string()),
        }
    )
    reasons = reject_reasons(t)
    validated = make_validate_fn(4, pre_reduce=False)(t)
    # fill_null: a null op makes Arrow's is_in emit null validity, which
    # the engine already treats as invalid (split_block fill_null(False))
    valid = pc.fill_null(validated.column("_valid"), False)
    assert pc.is_null(reasons).to_pylist() == valid.to_pylist()
    assert reasons.to_pylist() == [
        None,
        "null_repo",
        "bad_op",
        "null_commit_seq",
        "bad_op",  # null op fails the op rule
        "null_repo",
    ]


def test_dlq_quarantines_with_reasons_and_metrics_parity(ray_session, tmp_path):
    tmp = str(tmp_path)
    files = _bad_log(tmp)
    eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=4)
    eng.replay(files, window_events=4)  # two windows (4 + 3 rows)
    rej = eng.rejects().to_pandas().sort_values("seq")
    assert list(rej["seq"]) == [2, 3, 6, 7]
    assert list(rej["reject_reason"]) == [
        "null_repo",
        "bad_op",
        "null_commit_seq",
        "null_path",
    ]
    # lineage: checkpoint + source segment per row
    assert list(rej["checkpoint_id"]) == [0, 0, 1, 1]
    assert set(rej["source_file"]) == {
        "events-00000.parquet",
        "events-00001.parquet",
    }
    # no spurious hive-partition column from the _staging/ckpt=N/ layout
    assert "ckpt" not in rej.columns
    # audit parity: quarantined == invalid counted by the merge metrics
    hist = eng.store.history()
    for m in hist:
        inv = m.metrics.get("invalid", 0)
        got = m.rejects.get(str(m.checkpoint_id), {}).get("rows", 0)
        assert got == inv
    # reason histograms are carried in the manifest
    assert hist[-1].rejects["1"]["reasons"] == {
        "null_commit_seq": 1,
        "null_path": 1,
    }


def test_dlq_resume_is_exactly_once(ray_session, tmp_path):
    tmp = str(tmp_path)
    files = _bad_log(tmp)
    lake = os.path.join(tmp, "lake")
    ReplayEngine(lake, num_partitions=4).replay(files, window_events=4)
    n1 = ReplayEngine(lake).rejects().count()
    # resume with no new files: no new window, no duplicate rejects
    ReplayEngine(lake).replay(files, window_events=4)
    assert ReplayEngine(lake).rejects().count() == n1 == 4


def test_dlq_rollback_and_gc(ray_session, tmp_path):
    tmp = str(tmp_path)
    files = _bad_log(tmp)
    lake = os.path.join(tmp, "lake")
    eng = ReplayEngine(lake, num_partitions=4)
    eng.replay(files, window_events=4)
    # gc with full retention keeps every referenced reject file
    eng.store.gc(keep_checkpoints=2)
    assert eng.rejects().count() == 4
    # rollback to checkpoint 0: snapshot semantics drop window 1's rejects
    eng.store.rollback(0)
    rej = ReplayEngine(lake).rejects().to_pandas()
    assert sorted(rej["seq"]) == [2, 3]
    assert set(rej["checkpoint_id"]) == {0}


def test_dirty_stream_final_state_equals_clean(ray_session, tmp_path):
    """Generator 'mixed-dirty' = 'mixed' + appended malformed copies.
    The invalid rows must all land in the DLQ and must NOT perturb the
    final lake state: same seed clean vs dirty → byte-identical state."""
    from etl_ray.generator import generate_events, write_event_log

    tmp = str(tmp_path)
    states = {}
    for scen in ("mixed", "mixed-dirty"):
        log = generate_events(n_keys=400, seed=11, scenario=scen)
        files = write_event_log(log, os.path.join(tmp, scen), n_files=3)
        eng = ReplayEngine(os.path.join(tmp, f"lake-{scen}"), num_partitions=8)
        eng.replay(files, window_events=700)
        df = (
            eng.final_state(columns=["repo", "path", "commit_seq", "content_sha256"])
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )
        states[scen] = (eng, df)
    dirty_eng, dirty_df = states["mixed-dirty"]
    clean_eng, clean_df = states["mixed"]
    assert dirty_df.equals(clean_df)
    n_rej = dirty_eng.rejects().count()
    assert n_rej > 0
    assert n_rej == sum(
        m.metrics.get("invalid", 0) for m in dirty_eng.store.history()
    )
    assert clean_eng.rejects().count() == 0


def test_dlq_off_and_clean_stream(ray_session, tmp_path):
    tmp = str(tmp_path)
    # clean stream: no rejects entry, no DLQ files staged
    clean = mklog([(1, "I", 1, "r1", "a", "x1"), (2, "U", 2, "r1", "a", "x2")])
    files = write_files([clean], os.path.join(tmp, "log"))
    lake = os.path.join(tmp, "lake")
    eng = ReplayEngine(lake, num_partitions=4)
    eng.replay(files, window_events=10)
    assert eng.store.current().rejects == {}
    assert eng.rejects().count() == 0
    # DLQ disabled: invalid rows are still counted but not quarantined
    os.environ["ETL_RAY_DLQ"] = "0"
    try:
        files2 = _bad_log(os.path.join(tmp, "2"))
        lake2 = os.path.join(tmp, "lake2")
        eng2 = ReplayEngine(lake2, num_partitions=4)
        eng2.replay(files2, window_events=10)
        assert eng2.store.current().metrics["invalid"] == 4
        assert eng2.store.current().rejects == {}
        assert eng2.rejects().count() == 0
    finally:
        os.environ.pop("ETL_RAY_DLQ", None)
