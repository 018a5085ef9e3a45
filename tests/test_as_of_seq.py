"""Time travel by log position (as_of_seq): anchor a read to an
upstream commit_seq/LSN instead of an engine-internal checkpoint id."""

from __future__ import annotations

import os

import pytest

from tests.util import mklog, write_files

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
    eng.replay(files, window_events=3)  # two checkpoints: wm 3, wm 5
    return eng


def test_checkpoint_for_seq_picks_latest_covered_snapshot(lake):
    # ckpt 0 applied seqs 1..3, ckpt 1 applied 4..5
    assert lake.checkpoint_for_seq(3) == 0
    assert lake.checkpoint_for_seq(4) == 0  # ckpt 1's wm=5 > 4
    assert lake.checkpoint_for_seq(5) == 1
    assert lake.checkpoint_for_seq(10**9) == 1
    with pytest.raises(ValueError, match="watermark"):
        lake.checkpoint_for_seq(2)


def test_final_state_as_of_seq_matches_checkpoint_read(lake):
    old = lake.final_state(columns=["repo", "path", "content"],
                           as_of_seq=3).to_pandas()
    want = lake.final_state(columns=["repo", "path", "content"],
                            as_of=0).to_pandas()
    key = ["repo", "path"]
    assert (old.sort_values(key, ignore_index=True)
            .equals(want.sort_values(key, ignore_index=True)))
    # pre-delete: r1/b still live, r1/a still v0
    d = old.set_index(["repo", "path"])
    assert d.loc[("r1", "b"), "content"] == "b0"
    assert d.loc[("r1", "a"), "content"] == "a0"


def test_as_of_seq_rejects_conflicting_anchors(lake):
    with pytest.raises(ValueError, match="not both"):
        lake.final_state(as_of=0, as_of_seq=3)


def test_lookup_as_of_seq(lake):
    old = lake.lookup("r1", "a", as_of_seq=3)
    assert old.column("content")[0].as_py() == "a0"
    assert lake.lookup("r1", "b", as_of_seq=3).num_rows == 1  # pre-delete
    assert lake.lookup("r1", "b", as_of_seq=5).num_rows == 0  # post-delete


def test_as_of_seq_ignores_rolled_back_lineage(lake):
    # roll the pointer back to checkpoint 0; the orphaned manifest-1 on
    # disk must never anchor an as_of_seq read
    lake.store.rollback(0)
    assert lake.checkpoint_for_seq(10**9) == 0
    t = lake.lookup("r1", "a", as_of_seq=10**9)
    assert t.column("content")[0].as_py() == "a0"  # pre-update lineage
