"""Invariant tests for the round-4 operators (beyond their SQL oracles):
BPE pair counts, z-score outliers, corpus mix sampling, canonical-doc
resolution, triangle enumeration."""

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _df(res):
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def test_bpe_pair_counts_matches_direct_recount(ray_session):
    import re

    import pyarrow.parquet as pq

    from etl_ray.pipelines.queries import QUERIES, _BPE_TOPK

    got = _df(QUERIES["bpe_pair_counts"].fn(SF))
    assert len(got) == _BPE_TOPK
    assert got["pair"].str.len().eq(2).all()
    assert got["pair"].str.fullmatch("[a-z]{2}").all()
    # direct recount of the top pair
    text = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    from collections import Counter

    c = Counter()
    for t in text.column("text").to_pylist():
        for w in re.findall(r"[a-z]+", (t or "").lower()):
            for i in range(len(w) - 1):
                c[w[i:i + 2]] += 1
    top_pair, top_n = got.iloc[0]["pair"], int(got.iloc[0]["n"])
    assert c[top_pair] == top_n
    assert top_n == max(c.values())


def test_zscore_outliers_match_direct_recompute(ray_session):
    import pyarrow.parquet as pq

    from etl_ray.functions.rounding import round_half_away
    from etl_ray.pipelines.queries import QUERIES

    got = _df(QUERIES["user_zscore_outliers"].fn(SF)).set_index("user_id")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "value"]).to_pandas()
    ev["vm"] = round_half_away(ev["value"].to_numpy() * 1000.0, 0).astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        vm = g["vm"].to_numpy()
        n, s, ss = len(vm), int(vm.sum()), int((vm.astype(object) ** 2).sum())
        var_num = n * ss - s * s
        if var_num <= 0:
            want = 0
        else:
            z = (vm - s / n) / np.sqrt(var_num / (n * n))
            want = int((np.abs(z) > 2.0).sum())
        assert got.loc[uid, "n_outliers"] == want
        assert got.loc[uid, "n_events"] == n


def test_corpus_mix_sample_hits_budget(ray_session):
    from etl_ray.pipelines.queries import QUERIES, _MIX_BUDGET

    got = _df(QUERIES["corpus_mix_sample"].fn(SF))
    assert set(got["keep"].unique()) <= {0, 1}
    kept = int(got["keep"].sum())
    # hash-threshold sampling: expected count = Σ min(1, p_s B / n_s)·n_s ≈ B
    assert abs(kept - _MIX_BUDGET) < _MIX_BUDGET * 0.3
    # deterministic
    again = _df(QUERIES["corpus_mix_sample"].fn(SF))
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id", ignore_index=True),
        again.sort_values("doc_id", ignore_index=True))


def test_dedup_canonical_one_winner_per_cluster(ray_session):
    from etl_ray.pipelines.queries import QUERIES

    got = _df(QUERIES["dedup_canonical"].fn(SF))
    per = got.groupby("cluster_id")["canonical"].sum()
    assert (per == 1).all()
    # the canonical doc carries the cluster's max n_chars
    mx = got.groupby("cluster_id")["n_chars"].max()
    winners = got[got["canonical"] == 1].set_index("cluster_id")["n_chars"]
    assert (winners == mx.loc[winners.index]).all()
    # planted dups (doc_id % 10 == 0 → +100000 copy with a longer tail):
    # the copy must win its cluster
    dup_clusters = got[got["doc_id"] >= 100000]["cluster_id"].unique()
    w = got[(got["canonical"] == 1) & got["cluster_id"].isin(dup_clusters)]
    assert (w["doc_id"] >= 100000).all()


def test_dup_triangles_are_ordered_unique_and_planted(ray_session):
    from etl_ray.pipelines.queries import QUERIES

    got = _df(QUERIES["dup_triangles"].fn(SF))
    assert len(got) > 0
    assert (got["x"] < got["y"]).all() and (got["y"] < got["z"]).all()
    assert not got.duplicated(["x", "y", "z"]).any()
    # every planted triple (d, d+100000, d+200000) with d % 20 == 0 must
    # appear — the two copies share the original's full text
    planted = got[(got["y"] == got["x"] + 100000)
                  & (got["z"] == got["x"] + 200000)]
    assert (planted["x"] % 20 == 0).all()
    assert len(planted) > 0


def test_asof_clicks_purchases_matches_bruteforce(ray_session):
    import pyarrow.parquet as pq

    from etl_ray.pipelines.queries import QUERIES

    got = _df(QUERIES["asof_clicks_purchases"].fn(SF)).sort_values(
        "event_id", ignore_index=True)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    clicks = ev[ev["event_type"] == "click"]
    pur = ev[ev["event_type"] == "purchase"]
    assert len(got) == len(clicks)
    # brute-force per-click backward lookup
    for _, row in clicks.sample(25, random_state=7).iterrows():
        cand = pur[(pur["user_id"] == row["user_id"])
                   & (pur["ts"] <= row["ts"])]
        g = got[got["event_id"] == row["event_id"]].iloc[0]
        if cand.empty:
            assert g["ref_event_id"] == 0 and g["age_us"] == -1
        else:
            best_ts = cand["ts"].max()
            best = cand[cand["ts"] == best_ts]["event_id"].max()
            assert g["ref_event_id"] == best
            assert g["age_us"] == (row["ts"] - best_ts).value // 1000


def test_asof_join_stage_edges(ray_session):
    import ray.data as rd

    from etl_ray.stages.asof import asof_join

    left = rd.from_arrow(pa.table({
        "lid": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([10, 10, 10, 99], pa.int64()),
        "t": pa.array([5, 15, 2, 7], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([10, 10, 10], pa.int64()),
        "t": pa.array([5, 5, 12], pa.int64()),
        "rid": pa.array([100, 101, 102], pa.int64()),
    }))
    out = asof_join(left, right, by="k", on="t", n_buckets=4,
                    tiebreak="rid").to_pandas().sort_values(
        "lid", ignore_index=True)
    # lid=1 t=5: tie at t=5 → max rid (101); lid=2 t=15: t=12 row (102);
    # lid=3 t=2: no match; lid=4: key absent → no match
    assert out.loc[0, "rid"] == 101
    assert out.loc[1, "rid"] == 102
    assert pd.isna(out.loc[2, "rid"]) and pd.isna(out.loc[3, "rid"])

    # empty right side: all-null right columns, left intact
    out2 = asof_join(left, rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "t": pa.array([], pa.int64()),
        "rid": pa.array([], pa.int64())})), by="k", on="t",
        n_buckets=4).to_pandas()
    assert len(out2) == 4 and out2["rid"].isna().all()


def test_batch_levenshtein_matches_reference_dp():
    import random

    from etl_ray.functions.editdist import batch_levenshtein

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            nd = [i + 1]
            for j, cb in enumerate(b):
                nd.append(min(dp[j + 1] + 1, nd[j] + 1, dp[j] + (ca != cb)))
            dp = nd
        return dp[-1]

    rng = random.Random(11)
    al = ["".join(rng.choice("abcd ") for _ in range(rng.randint(0, 30)))
          for _ in range(150)]
    bl = ["".join(rng.choice("abcd ") for _ in range(rng.randint(0, 30)))
          for _ in range(150)]
    got = batch_levenshtein(pd.Series(al), pd.Series(bl), cap=64)
    assert (got == np.array([ref(a, b) for a, b in zip(al, bl)])).all()
    # truncation to cap and empty-input edge
    assert batch_levenshtein(pd.Series(["x" * 100]), pd.Series(["x" * 50]),
                             cap=64)[0] == 14
    assert len(batch_levenshtein(pd.Series([], dtype=str),
                                 pd.Series([], dtype=str))) == 0


def test_editdist_pairs_invariants(ray_session):
    from etl_ray.pipelines.queries import QUERIES, _EDIT_CAP

    got = _df(QUERIES["editdist_pairs"].fn(SF))
    assert len(got) > 0
    assert got["dist"].between(0, _EDIT_CAP).all()
    planted = got[got["b"] == got["a"] + 100000]
    adjacent = got[got["b"] == got["a"] + 1]
    assert len(planted) > 0 and len(adjacent) > 0
    # planted dups share their first 64 chars unless the doc is shorter
    # than the cap — distances concentrate at/near zero
    assert (planted["dist"] <= 28).all()
    # unrelated adjacent docs should mostly be far apart
    assert adjacent["dist"].median() > 10
