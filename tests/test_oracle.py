"""Directed oracle tests: tiny hand-built logs pinning LWW semantics.

Pattern mirrors the reference's golden boundary fixtures
(``tests/trajectory_construction_test.py`` — tiny hand-checkable streams
pinning the stateful operator's boundary behavior).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from etl_ray import oracle


def mklog(rows):
    """rows: list of (seq, op, commit_seq, repo, path, content)."""
    return pa.table(
        {
            "seq": pa.array([r[0] for r in rows], pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "commit_seq": pa.array([r[2] for r in rows], pa.int64()),
            "repo": pa.array([r[3] for r in rows], pa.string()),
            "path": pa.array([r[4] for r in rows], pa.string()),
            "commit": pa.array(["c%d" % r[0] for r in rows], pa.string()),
            "lang": pa.array(["py"] * len(rows), pa.string()),
            "content": pa.array([r[5] for r in rows], pa.string()),
        }
    )


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_last_writer_wins_on_commit_seq_not_seq():
    # recorded later (seq=1) but committed earlier (commit_seq=5) → loses
    t = mklog([(0, "I", 10, "r", "p", "new"), (1, "U", 5, "r", "p", "old")])
    res = oracle.reduce_events(t)
    assert res.state[("r", "p")]["content"] == "new"
    assert res.state[("r", "p")]["content_sha256"] == sha("new")


def test_tie_on_commit_seq_breaks_by_seq():
    t = mklog([(0, "I", 5, "r", "p", "a"), (1, "U", 5, "r", "p", "b")])
    res = oracle.reduce_events(t)
    assert res.state[("r", "p")]["content"] == "b"


def test_delete_tombstone_blocks_stale_update():
    t = mklog(
        [
            (0, "I", 1, "r", "p", "v0"),
            (1, "D", 9, "r", "p", ""),
            (2, "U", 4, "r", "p", "stale"),  # arrives after D, commits before
        ]
    )
    res = oracle.reduce_events(t)
    assert ("r", "p") not in res.state
    assert ("r", "p") in res.tombstones


def test_revive_after_delete():
    t = mklog(
        [
            (0, "I", 1, "r", "p", "v0"),
            (1, "D", 2, "r", "p", ""),
            (2, "I", 3, "r", "p", "back"),
        ]
    )
    res = oracle.reduce_events(t)
    assert res.state[("r", "p")]["content"] == "back"
    assert ("r", "p") not in res.tombstones


def test_duplicate_events_are_noops():
    t = mklog(
        [
            (0, "I", 1, "r", "p", "v0"),
            (1, "U", 2, "r", "p", "v1"),
            (2, "U", 2, "r", "p", "v1"),  # verbatim duplicate, later seq
        ]
    )
    res = oracle.reduce_events(t)
    assert res.state[("r", "p")]["content"] == "v1"
    assert len(res.state) == 1


def test_malformed_events_skipped():
    t = pa.table(
        {
            "seq": pa.array([0, 1, 2], pa.int64()),
            "op": pa.array(["I", "X", "I"], pa.string()),
            "commit_seq": pa.array([1, 2, None], pa.int64()),
            "repo": pa.array(["r", "r", "r"], pa.string()),
            "path": pa.array(["a", "b", "c"], pa.string()),
            "commit": pa.array(["x", "y", "z"], pa.string()),
            "lang": pa.array(["py"] * 3, pa.string()),
            "content": pa.array(["ok", "bad-op", "bad-cs"], pa.string()),
        }
    )
    res = oracle.reduce_events(t)
    assert set(res.state) == {("r", "a")}


def test_repo_watermark_includes_deletes_and_stale():
    t = mklog(
        [
            (0, "I", 1, "r", "p", "v0"),
            (1, "D", 9, "r", "q", ""),
            (2, "U", 4, "r", "p", "v1"),
        ]
    )
    res = oracle.reduce_events(t)
    assert res.repo_watermark["r"] == 9
    s = oracle.summary_by_repo(res)
    assert s["r"]["last_commit_seq"] == 9
    assert s["r"]["file_count"] == 1


def test_summary_counts_bytes_utf8():
    t = mklog([(0, "I", 1, "r", "p", "héllo")])  # 6 utf-8 bytes
    res = oracle.reduce_events(t)
    assert oracle.summary_by_repo(res)["r"]["total_bytes"] == len("héllo".encode())
    assert oracle.summary_by_lang(res)["py"]["total_bytes"] == len("héllo".encode())
