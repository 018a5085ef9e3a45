"""Change data feed: opt-in row-level effective-change output per
checkpoint (insert / update / delete + post-image sha), committed,
rolled back and gc'd with the manifest. Shape analog: Delta Lake CDF."""

from __future__ import annotations

import os

import pytest

from tests.util import mklog, write_files

from etl_ray.pipelines.replay import ReplayEngine


@pytest.fixture()
def cdf_env():
    os.environ["ETL_RAY_CHANGEFEED"] = "1"
    yield
    os.environ.pop("ETL_RAY_CHANGEFEED", None)


def _two_window_log(tmp):
    """Window 0: insert a, b, c and delete the never-seen key z (no-op).
    Window 1: update a, delete b, stale-update c (lower commit_seq than
    its window-0 winner — LWW drops it), insert d, re-insert after a
    tombstone is exercised via z (insert over absent key)."""
    s0 = mklog(
        [
            (1, "I", 10, "r", "a", "a0"),
            (2, "I", 11, "r", "b", "b0"),
            (3, "I", 12, "r", "c", "c0"),
            (4, "D", 13, "r", "z", ""),  # delete of an absent key: no-op
        ]
    )
    s1 = mklog(
        [
            (5, "U", 20, "r", "a", "a1"),  # update
            (6, "D", 21, "r", "b", ""),  # delete (prior live)
            (7, "U", 5, "r", "c", "c-stale"),  # stale: 5 < 12
            (8, "I", 22, "r", "d", "d0"),  # insert
            (9, "I", 23, "r", "z", "z1"),  # insert over a tombstone
        ]
    )
    return write_files([s0, s1], os.path.join(tmp, "log"))


def test_changefeed_classification(ray_session, tmp_path, cdf_env):
    tmp = str(tmp_path)
    files = _two_window_log(tmp)
    eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=4)
    eng.replay(files, window_events=4)
    df = eng.changefeed_read().to_pandas().sort_values(["checkpoint_id", "path"])
    got = list(zip(df["path"], df["change_type"], df["checkpoint_id"]))
    assert got == [
        ("a", "insert", 0),
        ("b", "insert", 0),
        ("c", "insert", 0),
        # z's no-op delete emitted nothing in window 0
        ("a", "update", 1),
        ("b", "delete", 1),
        # c's stale update emitted nothing
        ("d", "insert", 1),
        ("z", "insert", 1),  # insert over a tombstone, not an update
    ]
    # post-image sha travels with the feed
    assert df[df["change_type"] != "delete"]["content_sha256"].notna().all()
    # no spurious hive-partition column from the _staging/ckpt=N/ layout
    assert "ckpt" not in df.columns
    # incremental consumer read: checkpoint range prunes at file level
    inc = eng.changefeed_read(since=1).to_pandas()
    assert set(inc["checkpoint_id"]) == {1}
    assert len(inc) == 4
    assert eng.changefeed_read(until=0).to_pandas()["checkpoint_id"].eq(0).all()


def test_changefeed_off_by_default(ray_session, tmp_path):
    tmp = str(tmp_path)
    files = _two_window_log(tmp)
    eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=4)
    eng.replay(files, window_events=4)
    assert eng.store.current().changes == {}
    assert eng.changefeed_read().count() == 0


def test_changefeed_rollback_gc_and_compact_carry(ray_session, tmp_path, cdf_env):
    tmp = str(tmp_path)
    files = _two_window_log(tmp)
    lake = os.path.join(tmp, "lake")
    # delta-chain mode: proves CDF composes with merge-on-read AND that
    # compact() carries the feed (and DLQ) forward in its new manifest
    os.environ.update(
        {"ETL_RAY_DELTA_CHAIN": "1", "ETL_RAY_CHAIN_MAX": "9",
         "ETL_RAY_COMPACT_RATIO": "1.1"}
    )
    try:
        eng = ReplayEngine(lake, num_partitions=4)
        eng.replay(files, window_events=4)
        n = eng.changefeed_read().count()
        assert n == 7
        eng.compact()
        eng2 = ReplayEngine(lake)
        assert eng2.changefeed_read().count() == n  # carried through compact
        eng2.store.gc(keep_checkpoints=3)
        assert eng2.changefeed_read().count() == n  # gc kept referenced files
        eng2.store.rollback(0)
        df = ReplayEngine(lake).changefeed_read().to_pandas()
        assert set(df["checkpoint_id"]) == {0} and len(df) == 3
    finally:
        for k in ("ETL_RAY_DELTA_CHAIN", "ETL_RAY_CHAIN_MAX",
                  "ETL_RAY_COMPACT_RATIO"):
            os.environ.pop(k, None)


def test_changefeed_rejects_ensure_actor_combo(ray_session, tmp_path, cdf_env):
    os.environ["ETL_RAY_ENSURE_ACTORS"] = "2"
    try:
        with pytest.raises(RuntimeError, match="CHANGEFEED"):
            ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    finally:
        os.environ.pop("ETL_RAY_ENSURE_ACTORS", None)


def test_changefeed_prune_is_consumer_retention(ray_session, tmp_path, cdf_env):
    """Pruning acknowledged checkpoints drops their feed entries + files
    (via gc) while later checkpoints keep serving; committed as a normal
    fenced, audit-visible checkpoint."""
    files = _two_window_log(str(tmp_path))
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(files, window_events=4)
    before = eng.changefeed_read().to_pandas()
    assert set(before["checkpoint_id"]) == {0, 1}
    res = eng.changefeed_prune(up_to=0)
    assert res["dropped_entries"] == 1 and res["dropped_rows"] > 0
    after = eng.changefeed_read().to_pandas()
    assert set(after["checkpoint_id"]) == {1}
    # the retained range is byte-identical to the pre-prune read
    import pandas as pd

    pd.testing.assert_frame_equal(
        before[before["checkpoint_id"] == 1].reset_index(drop=True)
        .sort_values(["repo", "path"], ignore_index=True),
        after.sort_values(["repo", "path"], ignore_index=True),
    )
    # gc now reclaims the pruned feed files; state + later feed intact
    eng.store.gc(keep_checkpoints=0)
    assert eng.fsck(deep=True)["errors"] == []
    assert set(eng.changefeed_read().to_pandas()["checkpoint_id"]) == {1}
    # idempotent; audit trail recorded the prune
    assert eng.changefeed_prune(up_to=0)["dropped_entries"] == 0
    ops = [m.get("op") for m in (r for r in eng.metrics_history())]
    assert "changefeed_prune" in ops


def test_rejects_prune_drains_dlq(ray_session, tmp_path):
    bad = mklog([(1, "I", 10, "r", "a", "a0"), (2, "X", 11, "r", "b", "b0")])
    files = write_files([bad], str(tmp_path / "log"))
    eng = ReplayEngine(str(tmp_path / "lake"), num_partitions=4)
    eng.replay(files, window_events=100)
    assert eng.rejects().count() == 1
    res = eng.rejects_prune(up_to=eng.store.current().checkpoint_id)
    assert res["dropped_entries"] == 1
    assert eng.rejects().count() == 0
    eng.store.gc(keep_checkpoints=0)
    assert eng.fsck(deep=True)["errors"] == []
