"""Property-based tests (hypothesis) for the round-4c kernels: the
fixed-corpus gates prove engine/oracle parity on the driver data; these
prove the kernels' algebraic contracts on adversarial inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

CAP, COST, DIV = 3_000_000, 1_000_000, 28_800


def _bucket_replay(gaps_us):
    """Sequential token-bucket fold (the query's per-user recurrence)."""
    tok, out = CAP, []
    for i, g in enumerate(gaps_us):
        avail = CAP if i == 0 else min(CAP, tok + g // DIV)
        adm = 1 if avail >= COST else 0
        tok = avail - COST * adm
        out.append((adm, tok))
    return out


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(0, 10**12), min_size=1, max_size=60))
def test_token_bucket_invariants(gaps):
    out = _bucket_replay(gaps)
    # tokens always within [0, CAP]; first event always admitted
    assert out[0][0] == 1
    for adm, tok in out:
        assert 0 <= tok <= CAP
        assert adm in (0, 1)
    # monotonicity: widening every gap never admits FEWER events
    wider = [g + 10**9 for g in gaps]
    assert sum(a for a, _ in _bucket_replay(wider)) >= sum(
        a for a, _ in out)


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=0x2FF),
               min_size=0, max_size=300),
       st.text(alphabet=st.characters(min_codepoint=32,
                                      max_codepoint=0x2FF),
               min_size=20, max_size=200))
def test_content_chunks_shift_invariance(prefix, body):
    """Interior boundaries of `body` survive any prefix — the defining
    property of content-defined chunking."""
    W, DIV_ = 8, 64

    def boundaries(txt):
        cp = [ord(c) for c in txt]
        b = set()
        for i in range(W, len(cp) + 1):
            h = 0
            for k in range(W):
                h = h * 31 + cp[i - W + k]
            if (h % (1 << 32)) % DIV_ == 0:
                b.add(i)
        return b

    base = boundaries(body)
    shifted = boundaries(prefix + body)
    # every boundary of body (its window lies fully inside body)
    # reappears at position + len(prefix)
    off = len(prefix)
    assert {b + off for b in base} <= shifted


@settings(max_examples=80, deadline=None)
@given(st.lists(st.integers(0, 2**40), min_size=1, max_size=50))
def test_varint_size_bounds(gaps):
    """LEB128 size formula: 1 byte per 7 bits, never 0, never > 6 for
    2^40-bounded gaps."""
    for g in gaps:
        vb = (max(g, 1).bit_length() + 6) // 7
        assert 1 <= vb <= 6
        # exact: re-encode with a real LEB128 loop and compare
        x, n = max(g, 1), 0
        while True:
            n += 1
            x >>= 7
            if x == 0:
                break
        assert n == vb


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=64))
def test_decimate_box_filter_range(samples):
    """Decimated output stays within int16 range and halves the length
    (truncating division toward zero, the oracle's semantics)."""
    s = np.array(samples, dtype=np.int64)
    n2 = len(s) // 2
    pair = s[: 2 * n2].reshape(n2, 2).sum(axis=1)
    q = np.abs(pair) // 2
    dec = np.where(pair < 0, -q, q)
    assert len(dec) == len(samples) // 2
    # int16 range is asymmetric: avg of (-32768, -32768) is -32768, valid
    assert (dec >= -32768).all() and (dec <= 32767).all()
    for p, d in zip(pair, dec):
        assert d == int(p / 2)  # trunc toward zero


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1000), st.booleans()),
                min_size=1, max_size=80))
def test_kaplan_meier_monotone_and_bounded(durs):
    """KM survival is non-increasing and in (0, 1]."""
    durs = [(t, e) for t, e in durs if t > 0]
    times = sorted({t for t, e in durs if e})
    prev = 1.0
    last = 1.0
    for t in times:
        n_risk = sum(1 for tt, _ in durs if tt >= t)
        d = sum(1 for tt, e in durs if tt == t and e)
        prev *= 1.0 - d / n_risk
        assert 0.0 <= prev <= last + 1e-12
        last = prev
