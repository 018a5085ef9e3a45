"""Pipeline tests for dedup / similarity operators on crafted fixtures
with planted duplicates (the golden-fixture discipline of SURVEY.md §5)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from etl_ray.functions import dedup as D
from etl_ray.functions import multimodal as M
from etl_ray.functions import similarity as S


def _corpus():
    base = " ".join(f"word{i} token{i % 7}" for i in range(60))
    docs = {
        0: base,
        1: base + " tiny tail addition",          # near-dup of 0
        2: base,                                   # exact dup of 0
        3: " ".join(f"other{i} stuff{i % 5}" for i in range(60)),
        4: "completely unrelated short text",
    }
    return pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )


def test_exact_dedup(ray_session):
    ds = rd.from_arrow(_corpus())
    out = D.exact_dedup(ds).to_pandas()
    assert set(out["doc_id"]) == {0, 1, 3, 4}  # 2 collapsed into 0


def test_minhash_finds_planted_near_dups(ray_session):
    ds = rd.from_arrow(_corpus())
    pairs = D.minhash_dedup_pairs(ds, threshold=0.5).to_pylist()
    got = {(p["a"], p["b"]) for p in pairs}
    assert (0, 1) in got and (0, 2) in got and (1, 2) in got
    assert all({a, b} <= {0, 1, 2} for a, b in got)
    exact = {p["jaccard"] for p in pairs if (p["a"], p["b"]) == (0, 2)}
    assert exact == {1.0}


def test_simhash_finds_planted_near_dups(ray_session):
    ds = rd.from_arrow(_corpus())
    pairs = D.simhash_near_pairs(ds, max_hamming=3).to_pylist()
    got = {(p["a"], p["b"]) for p in pairs}
    assert (0, 2) in got  # identical docs: hamming 0
    assert not any({a, b} == {0, 3} or {a, b} == {0, 4} for a, b in got)


def _vectors():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((20, 8))
    m[5] = m[0] + 0.01 * rng.standard_normal(8)  # near-dup of 0
    return pa.table(
        {
            "vec_id": pa.array(range(20), pa.int64()),
            "label": pa.array([i % 2 for i in range(20)], pa.int32()),
            "embedding": pa.array([list(map(float, r)) for r in m],
                                  pa.list_(pa.float32())),
        }
    )


def test_knn_cosine_orders_by_similarity(ray_session):
    ds = rd.from_arrow(_vectors())
    out = S.knn_cosine(ds, query_ids=[0], k=3).to_pylist()
    assert len(out) == 3
    assert out[0]["neighbor_id"] == 5  # planted near-dup ranks first
    sims = [r["sim"] for r in out]
    assert sims == sorted(sims, reverse=True)
    assert all(r["neighbor_id"] != 0 for r in out)


def test_brute_force_near_duplicates_finds_planted_pair(ray_session):
    ds = rd.from_arrow(_vectors())
    pairs = S.brute_force_near_duplicates(ds, threshold=0.95).to_pylist()
    assert {(p["a"], p["b"]) for p in pairs} == {(0, 5)}


def test_lsh_near_duplicates_finds_planted_pair(ray_session):
    ds = rd.from_arrow(_vectors())
    pairs = S.lsh_near_duplicates(ds, threshold=0.95, n_planes=8).to_pylist()
    assert (0, 5) in {(p["a"], p["b"]) for p in pairs}


def test_lsh_multi_table_recall_dominates_single(ray_session):
    """Multi-table LSH recall ≥ single-table recall vs the brute-force
    truth, and a near-dup pair missed by table 0 alone is recoverable."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(21)
    base = rng.normal(size=(40, 16))
    vecs, ids = [], []
    for i, v in enumerate(base):
        vecs.append(v)
        ids.append(2 * i)
        vecs.append(v + rng.normal(scale=0.02, size=16))  # planted near-dup
        ids.append(2 * i + 1)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t)
    truth = {
        (r["a"], r["b"])
        for r in S.brute_force_near_duplicates(ds, threshold=0.98).to_pylist()
    }
    assert truth, "no planted pairs above threshold — fixture broken"
    one = {
        (r["a"], r["b"])
        for r in S.lsh_near_duplicates(ds, threshold=0.98, n_planes=8,
                                       n_tables=1).to_pylist()
    }
    many = {
        (r["a"], r["b"])
        for r in S.lsh_near_duplicates(ds, threshold=0.98, n_planes=8,
                                       n_tables=4).to_pylist()
    }
    assert one <= many <= truth
    assert len(many & truth) / len(truth) >= 0.9
    assert len(many) >= len(one)


def test_lsh_sql_exact_subset_of_brute_force_truth(ray_session):
    """The sql_exact (fmix32-Rademacher, integer-dot) plane family is the
    gated production path: its pair set must be a subset of the exact
    brute-force truth (LSH never invents pairs) with bounded recall, and
    it must be bit-deterministic across runs (the DuckDB oracle replays
    the bucketing, so any nondeterminism would flap the gate)."""
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(33)
    base = rng.normal(size=(40, 16))
    vecs, ids = [], []
    for i, v in enumerate(base):
        vecs.append(v)
        ids.append(2 * i)
        vecs.append(v + rng.normal(scale=0.02, size=16))
        ids.append(2 * i + 1)
    t = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })
    ds = rd.from_arrow(t)
    truth = {
        (r["a"], r["b"])
        for r in S.brute_force_near_duplicates(ds, threshold=0.98).to_pylist()
    }
    got = {
        (r["a"], r["b"])
        for r in S.lsh_near_duplicates(ds, threshold=0.98, n_planes=8,
                                       n_tables=4, sql_exact=True).to_pylist()
    }
    again = {
        (r["a"], r["b"])
        for r in S.lsh_near_duplicates(ds, threshold=0.98, n_planes=8,
                                       n_tables=4, sql_exact=True).to_pylist()
    }
    assert got <= truth
    assert len(got & truth) / len(truth) >= 0.9
    assert got == again


def test_multimodal_feature_plumbing(ray_session):
    docs = rd.from_arrow(_corpus())
    media = docs.map_batches(M.documents_as_media, batch_format="pyarrow")
    out = M.extract_features(media, concurrency=2, batch_size=2).to_pandas()
    assert set(out.columns) >= {"media_id", "kind", "feat", "feat_norm"}
    assert len(out) == 5
    assert "payload" not in out.columns  # heavy bytes dropped after decode
    # deterministic: identical payloads (docs 0 and 2) → identical features
    by_id = {r["media_id"]: r["feat_norm"] for _, r in out.iterrows()}
    assert by_id[0] == by_id[2]


def test_ivf_topk_recall_vs_brute_force(ray_session):
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ds = rd.from_arrow(t)
    exact = S.knn_cosine(ds, query_ids=[0, 1, 2], k=10)
    approx = S.ivf_topk(rd.from_arrow(t), query_ids=[0, 1, 2], k=10,
                        n_probe=4, centroid_stride=25)
    ex = {}
    for r in exact.to_pylist():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.to_pylist():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5  # probe-limited, random vectors
    # approx scan is bucket-limited: every result's sim must match the
    # exact sim for that pair (same kernel, same rounding)
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact.to_pylist()}
    for r in approx.to_pylist():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sims:
            assert abs(r["sim"] - exact_sims[key]) < 1e-9


def test_simhash_no_pairs_returns_empty_with_schema(ray_session):
    """Regression: an all-empty direct-exchange result must keep the
    group fn's output schema (a zero-column dataset made downstream
    drop_duplicates crash with KeyError 'a')."""
    import pyarrow as pa

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["completely unrelated alpha beta gamma delta",
                 "zzz qqq www eee rrr ttt yyy uuu"],
                pa.string(),
            ),
        }
    )
    out = D.simhash_near_pairs(rd.from_arrow(t)).to_pylist()
    assert out == []


def test_kmeans_lloyd_converges_and_is_partition_invariant(ray_session):
    """Two well-separated blobs, k=2: every point lands with its blob's
    centroid, cluster sizes are exact, and the result is identical at
    different partition counts (associative partials)."""
    import pandas as pd

    from etl_ray.functions.similarity import kmeans_lloyd

    rng = np.random.default_rng(6)
    a = rng.normal(0.0, 0.02, (60, 8))
    b = rng.normal(0.4, 0.02, (40, 8))
    X = np.vstack([a, b])
    df = pd.DataFrame({
        "vec_id": np.arange(100, dtype=np.int64),
        "embedding": [row.astype(np.float32) for row in X],
    })
    got1 = kmeans_lloyd(rd.from_pandas(df).repartition(1), k=2, iters=2)
    got5 = kmeans_lloyd(rd.from_pandas(df).repartition(5), k=2, iters=2)
    pd.testing.assert_frame_equal(got1, got5)
    sizes = got1.groupby("cluster_id")["n_points"].first().to_numpy()
    assert sorted(sizes.tolist()) == [40, 60]
    # the size-60 cluster's centroid ≈ 0.0, the size-40 one ≈ 0.4
    for cid, grp in got1.groupby("cluster_id"):
        target = 0.0 if grp["n_points"].iloc[0] == 60 else 0.4
        assert np.allclose(grp["centroid"], target, atol=0.02)


def test_quantize_codes_range_and_partition_invariance(ray_session):
    import pandas as pd

    from etl_ray.functions.similarity import quantize_codes, quantize_minmax

    rng = np.random.default_rng(8)
    X = rng.normal(0, 0.3, (200, 16)).astype(np.float32)
    X[:, 3] = 0.5  # constant dimension → code 0 everywhere
    df = pd.DataFrame({
        "vec_id": np.arange(200, dtype=np.int64),
        "embedding": [r for r in X],
    })
    for parts in (1, 6):
        ds = rd.from_pandas(df).repartition(parts)
        ranges = quantize_minmax(ds)
        codes = np.stack(
            quantize_codes(ds, ranges).to_pandas()
            .sort_values("vec_id")["codes"].to_numpy())
        assert codes.min() >= 0 and codes.max() <= 255
        assert (codes[:, 3] == 0).all()
        # min/max rows of each dim map to the endpoints
        for j in (0, 1, 2):
            assert codes[X[:, j].argmin(), j] == 0
            assert codes[X[:, j].argmax(), j] == 255
        if parts == 1:
            base = codes
    assert (base == codes).all()


def test_frame_sample_layout(ray_session):
    """Uniform frame schedule: counts follow duration, timestamps are
    exact integer positions, short clips still yield one frame."""
    import pandas as pd

    from etl_ray.functions.multimodal import FrameSampleStage

    t = pa.table({
        "media_id": pa.array([1, 2, 3], pa.int64()),
        "kind": pa.array(["video"] * 3),
        "payload": pa.array([b"x", b"y", b"z"], pa.binary()),
        "meta_width": pa.array([0, 0, 0], pa.int32()),
        "meta_height": pa.array([0, 0, 0], pa.int32()),
        "meta_duration_ms": pa.array([400, 2500, 20000], pa.int32()),
    })
    out = FrameSampleStage(8)(t).to_pandas()
    g = out.groupby("media_id")
    assert g.size().tolist() == [1, 3, 8]          # ceil(0.4)=1, ceil(2.5)=3, cap 8
    m3 = out[out.media_id == 3]
    assert m3["frame_ts_ms"].tolist() == [i * 20000 // 8 for i in range(8)]
    assert (out.groupby("media_id")["n_frames"].nunique() == 1).all()
