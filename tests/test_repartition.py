"""Online repartition: re-shard the lake P -> P' in one distributed
pass; state, tombstones, lookups and resume semantics all survive."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from tests.util import mklog, write_files

from etl_ray.pipelines.replay import ReplayEngine


@pytest.fixture()
def lake(ray_session, tmp_path):
    tmp = str(tmp_path)
    rows = []
    seq = 0
    for i in range(40):
        seq += 1
        rows.append((seq, "I", seq, f"r{i % 5}", f"f{i}", f"v0-{i}"))
    for i in range(0, 40, 3):
        seq += 1
        rows.append((seq, "U", seq, f"r{i % 5}", f"f{i}", f"v1-{i}"))
    for i in range(0, 40, 10):
        seq += 1
        rows.append((seq, "D", seq, f"r{i % 5}", f"f{i}", ""))
    files = write_files([mklog(rows)], os.path.join(tmp, "log"))
    eng = ReplayEngine(os.path.join(tmp, "lake"), num_partitions=16)
    eng.replay(files, window_events=30)
    return eng, os.path.join(tmp, "log")


def _state(eng, **kw) -> pd.DataFrame:
    return (eng.final_state(columns=["repo", "path", "content",
                                     "content_sha256"], **kw)
            .to_pandas().sort_values(["repo", "path"], ignore_index=True))


@pytest.mark.parametrize("new_p", [4, 64])
def test_repartition_preserves_state_exactly(lake, new_p):
    eng, _ = lake
    before = _state(eng)
    res = eng.repartition(new_p)
    assert res["num_partitions"] == new_p
    after = _state(eng)
    assert before.equals(after)
    # manifest really moved
    m = eng.store.current()
    assert m.num_partitions == new_p
    assert all(int(p) < new_p for p in m.partitions)
    assert m.metrics["repartitioned_from"] == 16


def test_repartition_lookup_routes_on_new_layout(lake):
    eng, _ = lake
    before = _state(eng)
    eng.repartition(5)
    for _, r in before.head(10).iterrows():
        got = eng.lookup(r["repo"], r["path"])
        assert got.num_rows == 1
        assert got.column("content_sha256")[0].as_py() == r["content_sha256"]
    # deleted keys stay deleted
    assert eng.lookup("r0", "f0").num_rows == 0


def test_repartition_carries_tombstones_and_time_travel(lake):
    eng, _ = lake
    m0 = eng.store.current()
    tomb_before = sum(p["tombstones"] for p in m0.partitions.values())
    eng.repartition(8)
    m1 = eng.store.current()
    assert sum(p["tombstones"] for p in m1.partitions.values()) == tomb_before
    # time travel to the pre-repartition checkpoint still reads the old layout
    old = _state(eng, as_of=m0.checkpoint_id)
    new = _state(eng)
    assert old.equals(new)


def test_repartition_then_replay_resumes(lake, tmp_path):
    eng, log_dir = lake
    eng.repartition(8)
    # append a new segment; resume must keep consuming with the new layout
    extra = mklog([(1000, "U", 1000, "r1", "f1", "post-repart")])
    write_files([extra], os.path.join(str(tmp_path), "log2"))
    import shutil

    for f in os.listdir(os.path.join(str(tmp_path), "log2")):
        shutil.copy(os.path.join(str(tmp_path), "log2", f),
                    os.path.join(log_dir, "events-99999.parquet"))
    eng.replay(log_dir, window_events=10)
    got = eng.lookup("r1", "f1")
    assert got.column("content")[0].as_py() == "post-repart"
    # the resumed replay must STAY on the new layout (a stale engine
    # routing by the old count silently splits keys across layouts)
    m = eng.store.current()
    assert m.num_partitions == 8
    assert all(int(p) < 8 for p in m.partitions)
    # no key exists twice and every untouched key is still lookup-able
    fs = eng.final_state(columns=["repo", "path", "content_sha256"]).to_pandas()
    assert not fs.duplicated(["repo", "path"]).any()
    for _, r in fs.iterrows():
        assert eng.lookup(r["repo"], r["path"]).num_rows == 1
    assert eng.fsck(deep=True)["ok"]


def test_repartition_fsck_clean_and_status_rows_live(lake):
    eng, _ = lake
    before = eng.store.current()
    live_before = sum(p["rows"] for p in before.partitions.values())
    eng.repartition(8)
    m = eng.store.current()
    assert sum(p["rows"] for p in m.partitions.values()) == live_before
    report = eng.fsck(deep=True)
    assert report["ok"], report


def test_repartition_crash_before_swap_is_recoverable(lake, monkeypatch):
    """Kill after repartition shards are staged but before the manifest
    swap: the lake stays on the old layout, and a rerun repartitions
    deterministically and commits exactly once."""
    import pytest as _pytest

    from etl_ray.state.manifest import ManifestStore

    eng, _ = lake
    before = _state(eng)
    ckpt_before = eng.store.current().checkpoint_id
    real_commit = ManifestStore.commit

    def boom(self, m, epoch=None):
        raise RuntimeError("simulated crash before repartition swap")

    monkeypatch.setattr(ManifestStore, "commit", boom)
    with _pytest.raises(RuntimeError):
        eng.repartition(8)
    monkeypatch.setattr(ManifestStore, "commit", real_commit)
    # old layout intact
    assert eng.store.current().checkpoint_id == ckpt_before
    assert eng.store.current().num_partitions == 16
    assert _state(eng).equals(before)
    # rerun commits once with identical state
    res = eng.repartition(8)
    assert res["num_partitions"] == 8
    assert _state(eng).equals(before)
    assert eng.fsck(deep=True)["ok"]


def test_replay_with_stale_engine_after_external_repartition_fails_loudly(
        lake, tmp_path):
    import os as _os

    import pytest as _pytest

    from tests.util import mklog, write_files

    eng, log_dir = lake
    # another engine instance repartitions the same lake
    other = ReplayEngine(eng.lake_dir)
    other.repartition(4)
    # the stale engine (still routing by 16) must refuse to apply
    extra = mklog([(2000, "U", 2000, "r1", "f2", "stale-write")])
    write_files([extra], _os.path.join(str(tmp_path), "log3"))
    import shutil as _sh

    _sh.copy([_os.path.join(str(tmp_path), "log3", f)
              for f in _os.listdir(_os.path.join(str(tmp_path), "log3"))][0],
             _os.path.join(log_dir, "events-99998.parquet"))
    with _pytest.raises(ValueError, match="laid out"):
        eng.replay(log_dir, window_events=10)
