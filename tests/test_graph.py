"""Connected components (functions/graph.py) and semi/anti shuffle joins."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from etl_ray.functions.graph import connected_components
from etl_ray.stages.joins import shuffle_join


def _reference_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-side union-find oracle."""
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to the component MIN (union always roots the min)
    return {n: find(n) for n in parent}


import pytest as _pytest

# 0 forces the distributed superstep loop; default takes the
# single-task union-find fast path — both must agree everywhere
_PATHS = [{"single_task_max_edges": 0}, {}]


def _cc_table(edges, **kw):
    t = pa.table(
        {"a": pa.array([e[0] for e in edges], pa.int64()),
         "b": pa.array([e[1] for e in edges], pa.int64())}
    )
    got = connected_components(t, n_buckets=4, **kw).to_pandas()
    return dict(zip(got["id"], got["cluster_id"]))


@_pytest.mark.parametrize("path", _PATHS)
def test_cc_two_components(ray_session, path):
    got = _cc_table([(1, 2), (2, 3), (10, 11)], **path)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


@_pytest.mark.parametrize("path", _PATHS)
def test_cc_chain_needs_many_supersteps(ray_session, path):
    # a 12-node path: min-label propagation needs ~diameter supersteps
    edges = [(i, i + 1) for i in range(100, 112)]
    got = _cc_table(edges, **path)
    assert set(got.values()) == {100}
    assert len(got) == 13


@_pytest.mark.parametrize("path", _PATHS)
def test_cc_random_graph_matches_union_find(ray_session, path):
    rng = np.random.default_rng(5)
    edges = [tuple(sorted(map(int, rng.integers(0, 60, 2)))) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _cc_table(edges, **path) == _reference_components(edges)


@_pytest.mark.parametrize("path", _PATHS)
def test_cc_empty_edges(ray_session, path):
    got = connected_components(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}),
        n_buckets=4, **path,
    )
    assert got.num_rows == 0
    assert got.column_names == ["id", "cluster_id"]


def test_cc_superstep_cap_is_a_backstop(ray_session):
    # with max_supersteps=1 a long chain must NOT silently converge
    # (distributed path only — the cap governs supersteps)
    edges = [(i, i + 1) for i in range(6)]
    got = _cc_table(edges, max_supersteps=1, single_task_max_edges=0)
    assert set(got.values()) != {0}  # not fully propagated
    got_full = _cc_table(edges, single_task_max_edges=0)
    assert set(got_full.values()) == {0}


# ---------------------------------------------------------------- semi/anti

def _sides():
    rng = np.random.default_rng(17)
    left = pd.DataFrame(
        {"k": rng.integers(0, 40, 300).astype(np.int64),
         "lv": rng.normal(size=300)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(20, 60, 100).astype(np.int64),
         "rv": rng.integers(0, 9, 100)}
    )
    return left, right


@pytest.mark.parametrize("how", ["semi", "anti"])
def test_shuffle_join_semi_anti_matches_pandas(ray_session, how):
    left, right = _sides()
    got = (
        shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                     on="k", how=how, n_buckets=8)
        .to_pandas().sort_values(["k", "lv"]).reset_index(drop=True)
    )
    member = left["k"].isin(right["k"].unique())
    want = (
        left[member if how == "semi" else ~member]
        .sort_values(["k", "lv"]).reset_index(drop=True)
    )
    assert list(got.columns) == ["k", "lv"]  # left schema only
    assert len(got) == len(want)
    assert (got["k"].to_numpy() == want["k"].to_numpy()).all()
    assert np.allclose(got["lv"], want["lv"])


def test_semi_anti_partition_left(ray_session):
    left, right = _sides()
    semi = shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", how="semi", n_buckets=8).to_pandas()
    anti = shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                        on="k", how="anti", n_buckets=8).to_pandas()
    assert len(semi) + len(anti) == len(left)


def test_anti_join_empty_result_keeps_schema(ray_session):
    left = pd.DataFrame({"k": np.array([1, 2], np.int64), "lv": [1.0, 2.0]})
    right = pd.DataFrame({"k": np.array([1, 2, 3], np.int64)})
    ds = shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                      on="k", how="anti", n_buckets=4)
    assert ds.count() == 0
    # dataset-level schema survives (plain .to_pandas() on an empty
    # dataset drops columns — that is Ray's behavior, which is why
    # to_pandas_typed exists; assert on the block schema instead)
    assert ds.schema().names == ["k", "lv"]


def test_semi_join_with_salting_matches(ray_session):
    # one hot key holding half the left rows; salt fan must not
    # duplicate or drop membership results
    left = pd.DataFrame(
        {"k": np.array([7] * 150 + list(range(50)), np.int64),
         "lv": np.arange(200, dtype=np.int64)}
    )
    right = pd.DataFrame({"k": np.array([7, 1, 3], np.int64)})
    got = shuffle_join(rd.from_pandas(left), rd.from_pandas(right),
                       on="k", how="semi", n_buckets=8,
                       salt_threshold=20).to_pandas()
    want = left[left["k"].isin([7, 1, 3])]
    assert sorted(got["lv"]) == sorted(want["lv"])


def test_pagerank_query_matches_duckdb(ray_session):
    """Drive the REAL distributed pipeline at sf0.001 and compare to the
    SQL oracle in-repo (the external gate does the same at sf0.01)."""
    import duckdb
    import pandas as pd

    from etl_ray.pipelines.queries import _pagerank_sql, pagerank_dupgraph

    got = pagerank_dupgraph("/root/testdata/sf0.001")
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    want = con.execute(_pagerank_sql()).df()
    want["doc_id"] = want["doc_id"].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))


def test_pagerank_star_graph_ranks_hub_highest(ray_session, tmp_path):
    """On a star graph the hub out-ranks every leaf (unit check of the
    integer update rule itself)."""

    def iterate(edges, nodes, iters=2):
        deg = {n: 0 for n in nodes}
        for s, _ in edges:
            deg[s] += 1
        r = {n: 1_000_000 for n in nodes}
        for _ in range(iters):
            s = {n: 0 for n in nodes}
            for a, b in edges:
                s[b] += r[a] // deg[a]
            r = {n: 150_000 + (85 * s[n]) // 100 for n in nodes}
        return r

    leaves = list(range(1, 9))
    edges = [(0, l) for l in leaves] + [(l, 0) for l in leaves]
    r = iterate(edges, [0] + leaves)
    assert r[0] > max(r[l] for l in leaves) * 2
    assert all(r[l] == r[leaves[0]] for l in leaves)
