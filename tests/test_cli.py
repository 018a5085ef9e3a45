"""CLI smoke tests (generate / replay / status share one Ray session)."""

from __future__ import annotations

import json

from etl_ray import cli


def test_generate_replay_status_roundtrip(ray_session, tmp_path, capsys):
    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    assert cli.main(["generate", "--out", log, "--n-keys", "120",
                     "--scenario", "mixed", "--n-files", "2"]) == 0
    gen = json.loads(capsys.readouterr().out.strip())
    assert gen["events"] > 0

    assert cli.main(["replay", "--events", log, "--lake", lake]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["windows_run"] >= 1

    assert cli.main(["status", "--lake", lake]) == 0
    st = json.loads(capsys.readouterr().out.strip())
    assert st["checkpoint_id"] >= 0 and st["rows"] > 0


def test_status_empty_lake(tmp_path, capsys):
    assert cli.main(["status", "--lake", str(tmp_path / "nope")]) == 1
    assert json.loads(capsys.readouterr().out.strip())["status"] == "empty"


def test_tail_replays_incrementally_and_exits_when_idle(
    ray_session, tmp_path, capsys
):
    """The tailer loop: first pass applies the log, appended segments are
    picked up by a later pass via the resume cursor, idle polls exit."""
    import os
    import shutil

    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    assert cli.main(["generate", "--out", log, "--n-keys", "100",
                     "--scenario", "mixed", "--n-files", "2"]) == 0
    capsys.readouterr()
    assert cli.main(["tail", "--events", log, "--lake", lake,
                     "--window-events", "1000000",
                     "--num-partitions", "8",
                     "--poll-sec", "0.1", "--max-idle-polls", "1"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["windows_run"] >= 1
    assert lines[-1]["windows_run"] == 0  # exited on the idle poll

    # "new segments arrive": a second generated log appended with names
    # sorting AFTER the existing ones
    more = str(tmp_path / "more")
    assert cli.main(["generate", "--out", more, "--n-keys", "40",
                     "--scenario", "mixed", "--n-files", "1"]) == 0
    capsys.readouterr()
    existing = sorted(os.listdir(log))
    for i, f in enumerate(sorted(os.listdir(more))):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(more, f),
                        os.path.join(log, f"zz-extra-{i:05d}.parquet"))
    assert sorted(os.listdir(log))[: len(existing)] == existing

    assert cli.main(["tail", "--events", log, "--lake", lake,
                     "--window-events", "1000000",
                     "--num-partitions", "8",
                     "--poll-sec", "0.1", "--max-idle-polls", "1"]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert lines[0]["windows_run"] >= 1  # the appended segment was applied


def test_gc_and_rollback_cli(ray_session, tmp_path, capsys):
    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    assert cli.main(["generate", "--out", log, "--n-keys", "120",
                     "--scenario", "mixed", "--n-files", "4"]) == 0
    capsys.readouterr()
    # two checkpoint windows
    assert cli.main(["replay", "--events", log, "--lake", lake,
                     "--window-events", "300", "--num-partitions", "8"]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["windows_run"] >= 2

    assert cli.main(["rollback", "--lake", lake, "--to", "0"]) == 0
    rb = json.loads(capsys.readouterr().out.strip())
    assert rb["checkpoint_id"] == 0

    assert cli.main(["gc", "--lake", lake, "--keep", "1"]) == 0
    gc = json.loads(capsys.readouterr().out.strip())
    assert gc["keep_checkpoints"] == 1


def test_diff_cli_classifies_window_effects(ray_session, tmp_path, capsys):
    """`diff --since 0`: the second window's effects come back classified,
    and they reconcile against the two final_state snapshots."""
    log = str(tmp_path / "log")
    lake = str(tmp_path / "lake")
    assert cli.main(["generate", "--out", log, "--n-keys", "300",
                     "--scenario", "mixed", "--n-files", "4"]) == 0
    capsys.readouterr()
    # two windows: half the events per window
    import pyarrow.parquet as pq
    import os
    n = sum(pq.read_metadata(os.path.join(log, f)).num_rows
            for f in os.listdir(log) if f.endswith(".parquet"))
    assert cli.main(["replay", "--events", log, "--lake", lake,
                     "--window-events", str(max(1, n // 2))]) == 0
    rep = json.loads(capsys.readouterr().out.strip())
    assert rep["windows_run"] >= 2

    assert cli.main(["diff", "--lake", lake, "--since", "0"]) == 0
    rows = [json.loads(line) for line in
            capsys.readouterr().out.strip().splitlines() if line]
    assert rows, "second window must change something"
    kinds = {r["change"] for r in rows}
    assert kinds <= {"added", "removed", "changed"}
    # reconcile against the engine's own snapshots
    from etl_ray.pipelines.replay import ReplayEngine

    eng = ReplayEngine(lake)
    old = eng.final_state(columns=["repo", "path", "content_sha256"],
                          as_of=0).to_pandas()
    new = eng.final_state(columns=["repo", "path", "content_sha256"]).to_pandas()
    om = {(r.repo, r.path): r.content_sha256 for r in old.itertuples()}
    nm = {(r.repo, r.path): r.content_sha256 for r in new.itertuples()}
    want = {}
    for k in set(om) | set(nm):
        if k not in om:
            want[k] = "added"
        elif k not in nm:
            want[k] = "removed"
        elif om[k] != nm[k]:
            want[k] = "changed"
    got = {(r["repo"], r["path"]): r["change"] for r in rows}
    assert got == want
