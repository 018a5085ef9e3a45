"""Concurrent partition-disjoint writers: two scoped ReplayEngines on
one lake, both commits land, overlap/zombie writers are fenced, and the
merged state is byte-identical to a single-writer replay of the union
log (reference analog: Citus loading disjoint shard sets in parallel)."""

from __future__ import annotations

import os
import threading

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.util import mklog, write_files

from etl_ray.generator import generate_events, write_event_log
from etl_ray.hashing import partition_ids
from etl_ray.pipelines.replay import ReplayEngine
from etl_ray.state.manifest import StaleWriterError

P = 16
SCOPE_A = (0, 7)
SCOPE_B = (8, 15)


def _split_log_by_scope(tmp: str, n_keys: int = 300, seed: int = 5):
    """One generated change log routed into two per-scope feeds (the
    shape a real deployment's router produces), plus the union dir."""
    log = generate_events(n_keys=n_keys, seed=seed, scenario="mixed",
                          mean_versions=3.0, content_len=64)
    union_dir = os.path.join(tmp, "log_union")
    files = write_event_log(log, union_dir, n_files=3)
    a_dir, b_dir = os.path.join(tmp, "log_a"), os.path.join(tmp, "log_b")
    os.makedirs(a_dir), os.makedirs(b_dir)
    for f in files:
        t = pq.read_table(f)
        part = partition_ids(t.column("repo"), t.column("path"), P)
        mask = pd.Series(part.to_pandas() <= SCOPE_A[1]).values
        import pyarrow as pa

        pq.write_table(t.filter(pa.array(mask)),
                       os.path.join(a_dir, os.path.basename(f)))
        pq.write_table(t.filter(pa.array(~mask)),
                       os.path.join(b_dir, os.path.basename(f)))
    return union_dir, a_dir, b_dir


def _state(eng) -> pd.DataFrame:
    return (
        eng.final_state(columns=["repo", "path", "commit_seq",
                                 "content", "content_sha256"])
        .to_pandas()
        .sort_values(["repo", "path"], ignore_index=True)
    )


@pytest.fixture(scope="module")
def logs(ray_session, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("cw"))
    return tmp, *_split_log_by_scope(tmp)


def test_disjoint_writers_interleaved_threads(logs):
    """Both writers replay concurrently (threads, interleaved commits);
    both land; fsck deep green; state == single-writer union replay."""
    tmp, union_dir, a_dir, b_dir = logs
    lake = os.path.join(tmp, "lake_dual")
    eng_a = ReplayEngine(lake, num_partitions=P, partition_scope=SCOPE_A)
    eng_b = ReplayEngine(lake, num_partitions=P, partition_scope=SCOPE_B)
    errs: list[BaseException] = []

    def run(eng, d):
        try:
            # small windows → several commits per writer → interleaving
            eng.replay(d, window_events=300)
        except BaseException as e:  # surfaced on join
            errs.append(e)

    ta = threading.Thread(target=run, args=(eng_a, a_dir))
    tb = threading.Thread(target=run, args=(eng_b, b_dir))
    ta.start(), tb.start()
    ta.join(), tb.join()
    assert not errs, errs

    m = eng_a.store.current()
    # both streams' cursors are durable and complete
    na = len([f for f in os.listdir(a_dir) if f.endswith(".parquet")])
    nb = len([f for f in os.listdir(b_dir) if f.endswith(".parquet")])
    assert m.cursors[eng_a._stream]["files_done"] == na
    assert m.cursors[eng_b._stream]["files_done"] == nb

    fsck = eng_a.fsck(deep=True)
    assert fsck["ok"], fsck["errors"]

    # oracle: one unscoped writer replaying the union log
    ref = ReplayEngine(os.path.join(tmp, "lake_ref"), num_partitions=P)
    ref.replay(union_dir, window_events=300)
    got, want = _state(eng_a), _state(ref)
    pd.testing.assert_frame_equal(got, want)
    # rollup summaries converge too (delta folds commute across writers)
    s_got = eng_a.summary("summary_repo_lang").to_pandas().sort_values(
        ["repo", "lang"], ignore_index=True)
    s_want = ref.summary("summary_repo_lang").to_pandas().sort_values(
        ["repo", "lang"], ignore_index=True)
    pd.testing.assert_frame_equal(s_got, s_want)


def test_scoped_resume_is_per_stream(logs):
    """A scoped writer resuming sees ONLY its own cursor: re-running a
    finished feed is a no-op; appending a segment replays just it."""
    tmp, _union, a_dir, b_dir = logs
    lake = os.path.join(tmp, "lake_resume")
    eng_a = ReplayEngine(lake, num_partitions=P, partition_scope=SCOPE_A)
    eng_b = ReplayEngine(lake, num_partitions=P, partition_scope=SCOPE_B)
    eng_a.replay(a_dir, window_events=10_000)
    eng_b.replay(b_dir, window_events=10_000)
    before = eng_a.store.current().checkpoint_id
    out = ReplayEngine(lake, num_partitions=P,
                       partition_scope=SCOPE_A).replay(a_dir)
    assert out["windows_run"] == 0
    assert eng_a.store.current().checkpoint_id == before


def test_out_of_scope_events_fail_loudly(logs, tmp_path):
    """Events routing outside the writer's scope are a config error."""
    tmp, _union, a_dir, _b = logs
    lake = os.path.join(str(tmp_path), "lake_oos")
    # writer B fed writer A's stream: every event lands out of scope
    eng = ReplayEngine(lake, num_partitions=P, partition_scope=SCOPE_B)
    with pytest.raises(ValueError, match="outside its scope"):
        eng.replay(a_dir, window_events=10_000)
    # nothing committed
    assert eng.store.current() is None


def test_same_scope_overlap_is_fenced_mid_window(ray_session, tmp_path):
    """Per-partition optimistic concurrency: a writer whose scope
    entries changed between its merge read and its commit (same-scope
    takeover / overlapping scope) gets StaleWriterError, and the other
    writer's data is untouched. The race is made deterministic by
    interposing right before the loser's commit critical section."""
    tmp = str(tmp_path)
    rows1 = [(i + 1, "I", i + 1, "r0", f"f{i}", f"v0-{i}") for i in range(24)]
    rows2 = [(100 + i, "U", 100 + i, "r0", f"f{i}", f"v1-{i}")
             for i in range(24)]
    f1 = write_files([mklog(rows1)], os.path.join(tmp, "log1"))
    f2 = write_files([mklog(rows2)], os.path.join(tmp, "log2"))
    lake = os.path.join(tmp, "lake_zombie")
    scope = (0, 7)
    loser = ReplayEngine(lake, num_partitions=8, partition_scope=scope,
                         stream="s1")
    winner = ReplayEngine(lake, num_partitions=8, partition_scope=scope,
                          stream="s1")
    orig = loser.store.commit_scoped

    def commit_after_winner(build, epoch, sc, prior_entries, **kw):
        # the winner advances the same scope AFTER the loser's merge
        # read its base snapshot but BEFORE the loser commits
        winner.replay(f1, window_events=10_000)
        return orig(build, epoch, sc, prior_entries, **kw)

    loser.store.commit_scoped = commit_after_winner
    with pytest.raises(StaleWriterError):
        loser.replay(f2, window_events=10_000)
    # winner's state intact: all v0, nothing from the loser's window
    df = _state(winner)
    assert len(df) == 24 and set(df["content"].str[:2]) == {"v0"}
    assert winner.fsck(deep=True)["ok"]


def test_unscoped_zombie_fenced_after_scoped_commit(ray_session, tmp_path):
    """writer_epoch stays monotone across scoped commits, so a stale
    UNSCOPED writer's commit is still rejected."""
    tmp = str(tmp_path)
    rows = [(i + 1, "I", i + 1, "r0", f"f{i}", f"x{i}") for i in range(16)]
    files = write_files([mklog(rows)], os.path.join(tmp, "log"))
    lake = os.path.join(tmp, "lake_uz")
    zombie = ReplayEngine(lake, num_partitions=8)
    stale_epoch = zombie._fence_epoch()  # claimed, then the driver stalls
    scoped = ReplayEngine(lake, num_partitions=8, partition_scope=(0, 7))
    scoped.replay(files, window_events=10_000)
    assert zombie.store.current().writer_epoch > stale_epoch
    with pytest.raises(StaleWriterError):
        zombie.store.commit(zombie.store.current(), epoch=stale_epoch)


def test_scope_param_validation(ray_session, tmp_path):
    lake = os.path.join(str(tmp_path), "lake_v")
    with pytest.raises(ValueError, match="non-empty subset"):
        ReplayEngine(lake, num_partitions=8, partition_scope=(0, 8))
    with pytest.raises(ValueError, match="stream requires"):
        ReplayEngine(lake, num_partitions=8, stream="solo")
    with pytest.raises(ValueError, match="filesystem-safe"):
        ReplayEngine(lake, num_partitions=8, partition_scope=(0, 3),
                     stream="a/b")
