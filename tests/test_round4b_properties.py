"""Property-based tests (hypothesis) for the round-4b kernels: the
fixed-corpus gates prove engine/oracle parity on the driver data; these
prove the kernels' algebraic contracts on adversarial inputs."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 8), st.integers(0, 8)),
                min_size=1, max_size=40))
def test_skyline_matches_bruteforce(pts):
    from etl_ray.pipelines.queries import _skyline_2d

    df = pd.DataFrame({"p_partkey": range(len(pts)),
                       "p_size": [a for a, _ in pts],
                       "price_cents": [b for _, b in pts]})
    out = set(_skyline_2d(df)["p_partkey"])
    s = np.array([a for a, _ in pts])
    c = np.array([b for _, b in pts])
    want = {i for i in range(len(pts))
            if not np.any((s >= s[i]) & (c >= c[i])
                          & ((s > s[i]) | (c > c[i])))}
    assert out == want


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(1, 50), min_size=1, max_size=120),
       st.integers(2, 16))
def test_mg_reduce_never_overcounts_and_keeps_heavy(counts, k):
    from etl_ray.pipelines.queries import _mg_reduce

    toks = np.array([f"t{i}" for i in range(len(counts))])
    cnts = np.array(counts, dtype=np.int64)
    kt, kc = _mg_reduce(toks, cnts, k)
    assert len(kt) <= max(k, len(toks))
    est = dict(zip(kt, kc))
    n = int(cnts.sum())
    for t, c in zip(toks, cnts):
        e = est.get(t, 0)
        assert e <= c  # never overcounts
        assert c - e <= n // (k + 1) + 1  # MG undercount bound
        if c * (k + 1) > n:  # true heavy hitters always survive
            assert t in est


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abcd", max_size=12), min_size=1,
                max_size=20))
def test_batch_levenshtein_matches_reference_dp(texts):
    from etl_ray.functions.editdist import batch_levenshtein

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    a = pd.Series(texts)
    b = pd.Series(list(reversed(texts)))
    got = batch_levenshtein(a, b, cap=16)
    for x, y, d in zip(a, b, got):
        assert d == ref(x[:16], y[:16])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=60),
       st.integers(1, 200))
def test_debounce_jump_loop_equals_sequential(ts_list, gap):
    # the output-bounded searchsorted-jump kernel == the sequential fold
    ts = np.sort(np.array(ts_list, dtype=np.int64))
    keep_seq, last = [], None
    for i, t in enumerate(ts):
        if last is None or t - last >= gap:
            keep_seq.append(i)
            last = t
    keep_jump, cur = [], 0
    while cur < len(ts):
        keep_jump.append(cur)
        nxt = int(np.searchsorted(ts, ts[cur] + gap, side="left"))
        cur = nxt if nxt > cur else cur + 1
    assert keep_jump == keep_seq


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-500, 500), min_size=1, max_size=50))
def test_mad_median_rule_matches_numpy_lower_median(vals):
    v = np.sort(np.array(vals, dtype=np.int64))
    lower = int(v[(len(v) - 1) // 2])
    # lower median == numpy's 50th percentile with 'lower' interpolation
    assert lower == int(np.percentile(v, 50, method="lower"))
