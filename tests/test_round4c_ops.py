"""Invariant tests for the round-4c operators (beyond their SQL oracles):
reciprocal-rank fusion, key-skew report, token-bucket admission,
point-in-time dimension join."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _df(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_rrf_fusion_matches_bruteforce(ray_session):
    from etl_ray.functions.rounding import round_half_away
    from etl_ray.pipelines.queries import QUERIES

    got = _df(QUERIES["rrf_fusion"].fn(SF))
    assert len(got) == 20
    assert (got["doc_id"] != 0).all()
    # fused score is exactly the integer RRF of the two reported ranks
    for _, r in got.iterrows():
        want = (10**9 // (60 + int(r["rank_a"])) if r["rank_a"] else 0) + (
            10**9 // (60 + int(r["rank_b"])) if r["rank_b"] else 0
        )
        assert int(r["rrf_score"]) == want

    # brute-force signal A over the whole (small) corpus: quantized dot
    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy())
    codes = round_half_away(mat.astype(np.float64) * 1000.0, 0).astype(
        np.int64
    )
    qv = codes[emb.index[emb["vec_id"] == 0][0]]
    dots = codes @ qv
    ids = emb["vec_id"].to_numpy(np.int64)
    keep = ids != 0
    order = np.lexsort((ids[keep], -dots[keep]))
    rank_a = {
        int(ids[keep][j]): i + 1 for i, j in enumerate(order[:100])
    }
    for _, r in got.iterrows():
        assert int(r["rank_a"]) == rank_a.get(int(r["doc_id"]), 0)
