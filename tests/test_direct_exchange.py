"""Cascaded direct-exchange parity vs the groupby path (replay.py).

The known-boundary exchange (ReplayEngine._direct_exchange) pre-folds
slices with the associative keep-last comparator and carries per-part
(events_in, invalid) audit counts beside the rows. These tests pin the
contract the optimization must preserve: byte-identical final state AND
identical audit metrics to the one-shot ``groupby('part').map_groups``
path, including on streams with invalid rows and on partitions whose
window rows are ALL invalid (which must still emit a metrics row).
"""

from __future__ import annotations

import pyarrow as pa

import pytest

from etl_ray import hashing, oracle
from etl_ray.generator import generate_events, write_event_log
from etl_ray.pipelines.replay import ReplayEngine

from tests.util import engine_state_map, mklog, write_files


def _replay(tmp_path, tables, mode, monkeypatch, tag, **kw):
    monkeypatch.setenv("ETL_RAY_SHUFFLE", mode)
    # tiny fan-in so a multi-slice window actually exercises the fold tree
    monkeypatch.setenv("ETL_RAY_FOLD_FANIN", "2")
    log_dir = str(tmp_path / f"log_{tag}")
    write_files(tables, log_dir)
    eng = ReplayEngine(str(tmp_path / f"lake_{tag}"), num_partitions=8, **kw)
    out = eng.replay(log_dir, window_events=10**9)
    return eng, out


def _invalid_heavy_tables():
    """Several files (→ several split slices), with invalid rows mixed in:
    null repo, empty path, unknown op, null commit_seq."""
    t1 = mklog(
        [
            (1, "I", 1, "r1", "a.py", "v1"),
            (2, "U", 2, "r1", "a.py", "v2"),
            (3, "I", 1, "r2", "b.py", "w1"),
            (4, "X", 3, "r1", "a.py", "BAD-OP"),
        ]
    )
    t2 = mklog(
        [
            (5, "U", 4, "r1", "a.py", "v3"),
            (6, "I", 1, "r3", "c.py", "x1"),
            (7, "I", 5, None, "a.py", "BAD-NULL-REPO"),
            (8, "I", 5, "r1", "", "BAD-EMPTY-PATH"),
        ]
    )
    t3 = mklog(
        [
            (9, "D", 6, "r2", "b.py", ""),
            (10, "U", 7, "r3", "c.py", "x2"),
        ]
    )
    # null commit_seq row, built by hand (mklog types commit_seq int64)
    t4 = mklog([(11, "I", 1, "r4", "d.py", "y1")])
    t4 = t4.set_column(
        t4.schema.get_field_index("commit_seq"),
        "commit_seq",
        pa.array([None], pa.int64()),
    )
    return [t1, t2, t3, t4]


_METRIC_KEYS = (
    "events_in", "applied", "inserts", "updates", "deletes",
    "stale", "invalid", "parts_touched", "parts_changed",
)


def test_direct_exchange_matches_groupby_with_invalid_rows(
    ray_session, tmp_path, monkeypatch
):
    tables = _invalid_heavy_tables()
    eng_d, out_d = _replay(tmp_path, tables, "direct", monkeypatch, "d")
    eng_s, out_s = _replay(tmp_path, tables, "sort", monkeypatch, "s")

    md, ms = out_d["metrics"], out_s["metrics"]
    for k in _METRIC_KEYS:
        assert md[k] == ms[k], (k, md, ms)
    # bad op, null repo, empty path, null commit_seq
    assert md["invalid"] == 4
    sd, ss = engine_state_map(eng_d), engine_state_map(eng_s)
    assert set(sd) == set(ss)
    for k in sd:
        assert sd[k]["content_sha256"] == ss[k]["content_sha256"], k
    # final state is the oracle reduction of the VALID stream
    assert sd[("r1", "a.py")]["content_sha256"] == hashing.sha256_hex(
        pa.array(["v3"])
    )[0].as_py()
    assert ("r2", "b.py") not in sd  # deleted


def test_all_invalid_partition_still_reports_metrics(
    ray_session, tmp_path, monkeypatch
):
    """A partition whose only window rows are invalid must still surface
    its (events_in, invalid) counts in the window metrics on BOTH paths."""
    # find a repo whose partition (at P=8) is not touched by the valid key
    valid = ("r1", "a.py")
    p_valid = hashing.partition_ids(
        pa.array([valid[0]]), pa.array([valid[1]]), 8
    )[0].as_py()
    bad_repo = next(
        f"junk{i}"
        for i in range(1000)
        if hashing.partition_ids(pa.array([f"junk{i}"]), pa.array(["z"]), 8)[0].as_py()
        != p_valid
    )
    t = mklog(
        [
            (1, "I", 1, "r1", "a.py", "v1"),
            (2, "X", 2, bad_repo, "z", "BAD"),
            (3, "X", 3, bad_repo, "z", "BAD2"),
        ]
    )
    eng_d, out_d = _replay(tmp_path, [t], "direct", monkeypatch, "d2")
    eng_s, out_s = _replay(tmp_path, [t], "sort", monkeypatch, "s2")
    for k in _METRIC_KEYS:
        assert out_d["metrics"][k] == out_s["metrics"][k], k
    assert out_d["metrics"]["invalid"] == 2
    assert out_d["metrics"]["events_in"] == 3


def test_entirely_invalid_window(ray_session, tmp_path, monkeypatch):
    """A window with ZERO valid events still commits: empty delta, full
    audit metrics, no partition files beyond the metrics rows."""
    t = mklog(
        [
            (1, "X", 1, "r1", "a.py", "BAD"),
            (2, "I", 2, None, "b.py", "BAD"),
            (3, "U", 3, "r2", "", "BAD"),
        ]
    )
    eng_d, out_d = _replay(tmp_path, [t], "direct", monkeypatch, "inv_d")
    eng_s, out_s = _replay(tmp_path, [t], "sort", monkeypatch, "inv_s")
    for k in _METRIC_KEYS:
        assert out_d["metrics"][k] == out_s["metrics"][k], k
    assert out_d["metrics"]["invalid"] == 3
    assert out_d["metrics"]["applied"] == 0


@pytest.mark.parametrize("scenario", ["mixed", "ooo", "dup"])
def test_direct_exchange_scenario_parity_with_fold_tree(
    ray_session, tmp_path, monkeypatch, scenario
):
    """Generator scenarios through a deep fold tree (fan-in 2, many files)
    still match the oracle reducer exactly."""
    log = generate_events(n_keys=200, seed=5, scenario=scenario)
    monkeypatch.setenv("ETL_RAY_SHUFFLE", "direct")
    monkeypatch.setenv("ETL_RAY_FOLD_FANIN", "2")
    log_dir = str(tmp_path / "log")
    write_event_log(log, log_dir, n_files=6)
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=8)
    eng.replay(log_dir, window_events=10**9)
    res = oracle.reduce_events(log.table)
    state = engine_state_map(eng)
    assert set(state) == set(res.state)
    for k, row in res.state.items():
        assert state[k]["content_sha256"] == row["content_sha256"], k


def test_pack_exchange_width_rounds_to_full_rounds():
    """The exchange width must be a multiple of the worker-slot count
    whenever more than one reduce round is needed — rounding UP inside
    the partition budget, DOWN past it (never a partially-idle tail)."""
    from etl_ray.pipelines.replay import pack_exchange_width

    # single-round cases pass through untouched
    assert pack_exchange_width(5, 8, 64) == 5
    assert pack_exchange_width(8, 8, 64) == 8
    # round up to the next slot multiple when it fits
    assert pack_exchange_width(10, 8, 64) == 16
    assert pack_exchange_width(17, 8, 64) == 24
    # near the partition ceiling: round DOWN to the last full multiple
    # (clamping 66→64 would leave a 4/6 tail round)
    assert pack_exchange_width(62, 6, 64) == 60
    assert pack_exchange_width(64, 6, 64) == 60
    # degenerate ceiling: never drop below one full round of slots
    assert pack_exchange_width(9, 8, 9) == 8
    # every result is a multiple of slots (or the untouched input)
    for parts in range(1, 130):
        for slots in (2, 3, 6, 8, 32):
            for mx in (parts, 64, 128):
                got = pack_exchange_width(parts, slots, max(parts, 1) if mx == parts else mx)
                assert got >= min(parts, slots)
                if parts > slots:
                    assert got % slots == 0
