"""Unit tests for the scalar/text/dedup/similarity function library."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_ray.functions import scalar as S
from etl_ray.functions import text as T
from etl_ray.functions.rounding import round_half_away


# --------------------------------------------------------------- scalar UDFs

@pytest.mark.parametrize(
    "vals,expect",
    [([1, 2, 3], 2.0), ([3, 1, 4], 5.0), ([5], 0.0), ([], 0.0), ([2, 2, 2], 0.0)],
)
def test_calculate_delta(vals, expect):
    assert S.calculate_delta(np.array(vals)) == expect


def test_calculate_delta_signed():
    assert S.calculate_delta(np.array([1, 4, 2]), signed=True) == 1.0


@pytest.mark.parametrize(
    "vals,expect",
    [
        ([350, 10], 20.0),    # wraps across 360
        ([10, 350], 20.0),
        ([0, 180], 180.0),
        ([0, 190], 170.0),    # shorter way around
        ([90], 0.0),
    ],
)
def test_delta_upperbounded(vals, expect):
    assert S.calculate_delta_upperbounded(np.array(vals)) == expect


def test_dpmod():
    out = S.dpmod(np.array([7.5, -1.5]), 2.0)
    assert np.allclose(out, [1.5, 0.5])


def test_smart_keys_roundtrip():
    import pandas as pd

    ts = pa.array(pd.to_datetime(["2024-03-05 07:08:09", None]))
    d = S.smart_date_id(ts).to_pylist()
    t = S.smart_time_id(ts).to_pylist()
    assert d == [20240305, -1]
    assert t == [70809, -1]
    back = S.timestamp_from_date_time_id(20240305, 70809)
    assert (back.year, back.month, back.day, back.hour, back.minute, back.second) == (
        2024, 3, 5, 7, 8, 9
    )
    assert S.timestamp_from_date_time_id(-1, 0) is None


@given(st.lists(st.floats(0, 360, allow_nan=False), max_size=30))
@settings(max_examples=50, deadline=None)
def test_delta_upperbounded_bounded_by_plain_delta(vals):
    v = np.array(vals)
    assert S.calculate_delta_upperbounded(v) <= S.calculate_delta(v) + 1e-9


def test_consecutive_change_count():
    assert S.consecutive_change_count(np.array([1, 1, 2, 2, 1])) == 3
    assert S.consecutive_change_count(np.array([])) == 0
    assert S.consecutive_change_count(np.array([np.nan, np.nan, 1.0])) == 2


# ------------------------------------------------------------------ rounding

def test_round_half_away_matches_duckdb():
    import duckdb

    vals = [906.625, 0.5, -0.5, 2.675, 1.005, 0.1235, -906.625]
    for v in vals:
        for n in (2, 3):
            want = duckdb.sql(f"select round({v!r}::DOUBLE, {n})").fetchone()[0]
            got = float(round_half_away(np.array([v]), n)[0])
            assert got == want, (v, n, got, want)


# ---------------------------------------------------------------------- text

def test_token_count_matches_duckdb_semantics():
    import duckdb

    texts = ["a b  c", "  lead", "trail  ", "", "one", "tab\tsep\nline"]
    got = T.token_count_column(pa.array(texts)).to_pylist()
    con = duckdb.connect()
    want = [
        con.execute("select length(regexp_extract_all(?, '\\S+'))", [t]).fetchone()[0]
        for t in texts
    ]
    assert got == want


def test_quality_metrics_ratios():
    t = pa.table({"doc_id": [1], "text": ["Ab 1"]})
    out = T.quality_metrics(t).to_pylist()[0]
    assert out["n_chars_calc"] == 4
    assert out["n_tokens"] == 2
    assert out["space_ratio"] == 0.25
    assert out["digit_ratio"] == 0.25
    assert out["upper_ratio"] == 0.25


def test_langid_heuristic_obvious_cases():
    stage = T.LangIdStage()
    assert stage.predict_one("the cat and the dog in the house") == "en"
    assert stage.predict_one("der hund und die katze ist nicht da") == "de"
    assert stage.predict_one("") == "und"


def test_fingerprint_scalar_matches_vectorized():
    texts = ["hello world", "", "a", "x" * 300]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    vec = T.fingerprint_batch(t).column("fingerprint").to_pylist()
    for txt, v in zip(texts, vec):
        assert np.uint64(T.rolling_fingerprint(txt)) == np.uint64(v)


def test_fingerprint_distinguishes_and_is_deterministic():
    t = pa.table({"doc_id": [0, 1, 2], "text": ["abc", "abd", "abc"]})
    f = T.fingerprint_batch(t).column("fingerprint").to_pylist()
    assert f[0] == f[2] and f[0] != f[1]


# --------------------------------------------------------------------- dedup

def test_jaccard_and_shingles():
    from etl_ray.functions.dedup import jaccard

    a = "one two three four five six"
    assert jaccard(a, a) == 1.0
    assert jaccard(a, "totally different words here now ok") == 0.0
    assert 0.0 < jaccard(a, a + " seven") < 1.0
    assert jaccard("", "") == 1.0
    assert jaccard(a, "") == 0.0


def test_minhash_signature_similarity_tracks_jaccard():
    from etl_ray.functions.dedup import MinHashStage, jaccard

    st_ = MinHashStage(n_perm=128)
    a = " ".join(f"w{i}" for i in range(100))
    b = a + " extra tokens at the end making it differ somewhat"
    sa, sb = st_.signature(a), st_.signature(b)
    est = float((sa == sb).mean())
    true = jaccard(a, b)
    assert abs(est - true) < 0.15
    assert float((sa == st_.signature(a)).mean()) == 1.0


def test_simhash_near_for_similar_far_for_different():
    from etl_ray.functions.dedup import SimHashStage

    st_ = SimHashStage()
    a = " ".join(f"tok{i}" for i in range(200))
    b = a + " tail"
    c = " ".join(f"other{i}" for i in range(200))
    ha, hb, hc = st_.simhash(a), st_.simhash(b), st_.simhash(c)
    assert bin(ha ^ hb).count("1") < bin(ha ^ hc).count("1")
    assert st_.simhash(a) == ha


# ---------------------------------------------------------------- similarity

def test_cosine_normalize_handles_zero_vectors():
    from etl_ray.functions.similarity import _normalize

    m = _normalize(np.array([[0.0, 0.0], [3.0, 4.0]]))
    assert np.allclose(m[1], [0.6, 0.8])
    assert np.allclose(m[0], [0.0, 0.0])


def test_containment_asymmetric_vs_jaccard():
    from etl_ray.functions.dedup import containment, jaccard

    a = "alpha beta gamma delta epsilon zeta"
    b = a + " eta theta iota kappa"
    # b subsumes a: containment(a→b) is total, jaccard is not
    assert containment(a, b, k=3) == 1.0
    assert containment(b, a, k=3) < 1.0
    assert jaccard(a, b, k=3) < 1.0
    assert containment("", b, k=3) == 1.0  # vacuous
