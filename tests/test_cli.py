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
