"""Unit tests for validate / merge internals (no Ray needed)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from etl_ray.hashing import partition_ids, sha256_hex, stable_hash64, key_strings
from etl_ray.pipelines import rollups
from etl_ray.stages.validate import _keep_last_per_key, make_validate_fn

from tests.util import mklog, sha


def test_keep_last_per_key_picks_lww_winner():
    t = mklog(
        [
            (0, "I", 1, "r", "p", "a"),
            (1, "U", 9, "r", "p", "win"),
            (2, "U", 5, "r", "p", "mid"),
            (3, "I", 2, "r", "q", "only"),
        ]
    )
    out = _keep_last_per_key(t)
    got = {(r["repo"], r["path"]): r["content"] for r in out.to_pylist()}
    assert got == {("r", "p"): "win", ("r", "q"): "only"}


def test_keep_last_tie_breaks_by_seq():
    t = mklog([(0, "I", 5, "r", "p", "first"), (7, "U", 5, "r", "p", "later-seq")])
    out = _keep_last_per_key(t)
    assert out.to_pylist()[0]["content"] == "later-seq"


def test_validate_marks_invalid_and_routes():
    t = pa.table(
        {
            "seq": pa.array([0, 1, 2, 3], pa.int64()),
            "op": pa.array(["I", "Z", "U", "D"], pa.string()),
            "commit_seq": pa.array([1, 2, None, 4], pa.int64()),
            "repo": pa.array(["r", "r", "r", None], pa.string()),
            "path": pa.array(["a", "b", "c", "d"], pa.string()),
            "commit": pa.array(["w", "x", "y", "z"], pa.string()),
            "lang": pa.array(["py"] * 4, pa.string()),
            "content": pa.array(["ok", "bad-op", "bad-cs", "bad-repo"], pa.string()),
        }
    )
    fn = make_validate_fn(num_partitions=8)
    out = fn(t)
    rows = {r["content"]: r for r in out.to_pylist()}
    assert rows["ok"]["_valid"] is True
    for bad in ("bad-op", "bad-cs", "bad-repo"):
        assert rows[bad]["_valid"] is False
    assert all(0 <= r["part"] < 8 for r in out.to_pylist())


def test_validate_combiner_reduces_within_batch():
    t = mklog([(0, "I", 1, "r", "p", "a"), (1, "U", 2, "r", "p", "b")])
    t = t.append_column("x", pa.array([1, 2], pa.int64())).drop_columns(["x"])
    out = make_validate_fn(4)(t)
    assert out.num_rows == 1
    assert out.to_pylist()[0]["content"] == "b"


def test_partition_ids_stable_and_in_range():
    repo = pa.array(["a", "a", "b", None])
    path = pa.array(["x", "x", "y", "z"])
    p1 = partition_ids(repo, path, 16).to_pylist()
    p2 = partition_ids(repo, path, 16).to_pylist()
    assert p1 == p2
    assert p1[0] == p1[1]
    assert all(0 <= x < 16 for x in p1)


def test_key_separator_prevents_collisions():
    a = stable_hash64(key_strings(pa.array(["a"]), pa.array(["b/c"])))
    b = stable_hash64(key_strings(pa.array(["a/b"]), pa.array(["c"])))
    assert a[0] != b[0]


def test_sha256_matches_hashlib():
    out = sha256_hex(pa.array(["hello", "", None])).to_pylist()
    assert out[0] == sha("hello")
    assert out[1] == sha("")
    assert out[2] is None


def test_rollup_update_base_is_additive():
    import pyarrow as pa

    d1 = pa.table(
        {
            "repo": ["r1", "r1"],
            "lang": ["py", "go"],
            "d_files": pa.array([2, 1], pa.int64()),
            "d_bytes": pa.array([100, 50], pa.int64()),
            "w_cs": pa.array([5, 3], pa.int64()),
        }
    )
    base = rollups.update_base(None, d1)
    d2 = pa.table(
        {
            "repo": ["r1", "r2"],
            "lang": ["py", "py"],
            "d_files": pa.array([-1, 4], pa.int64()),
            "d_bytes": pa.array([-40, 400], pa.int64()),
            "w_cs": pa.array([9, 7], pa.int64()),
        }
    )
    base = rollups.update_base(base, d2)
    rows = {(r["repo"], r["lang"]): r for r in base.to_pylist()}
    assert rows[("r1", "py")]["file_count"] == 1
    assert rows[("r1", "py")]["total_bytes"] == 60
    assert rows[("r1", "py")]["last_commit_seq"] == 9
    by_repo = {r["repo"]: r for r in rollups.derive_by_repo(base).to_pylist()}
    assert by_repo["r1"]["file_count"] == 2
    assert by_repo["r1"]["distinct_langs"] == 2
    assert by_repo["r1"]["last_commit_seq"] == 9
    by_lang = {r["lang"]: r for r in rollups.derive_by_lang(base).to_pylist()}
    assert by_lang["py"]["file_count"] == 5


def test_rollup_zero_rows_drop_from_by_lang_not_by_repo():
    d = pa.table(
        {
            "repo": ["r1"],
            "lang": ["py"],
            "d_files": pa.array([0], pa.int64()),
            "d_bytes": pa.array([0], pa.int64()),
            "w_cs": pa.array([4], pa.int64()),
        }
    )
    base = rollups.update_base(None, d)
    assert rollups.derive_by_lang(base).num_rows == 0
    br = rollups.derive_by_repo(base).to_pylist()
    assert br[0]["repo"] == "r1" and br[0]["file_count"] == 0
    assert br[0]["distinct_langs"] == 0 and br[0]["last_commit_seq"] == 4
