"""Property tests for the shared split kernel (`_split_validated`) —
the one function both the streaming exchange and the fused small-window
task route through. Pure (no Ray): conservation laws must hold for any
parts/validity/multiplicity layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_ray.pipelines.replay import _split_validated
from tests.util import mklog


def _validated_table(parts, valid, dups):
    n = len(parts)
    rows = [(i, "U", i, f"r{i}", f"f{i}.py", "x") for i in range(n)]
    t = mklog(rows)
    t = t.append_column("_valid", pa.array(valid, pa.bool_()))
    t = t.append_column("part", pa.array(parts, pa.int32()))
    if dups is not None:
        t = t.append_column("_dups", pa.array(dups, pa.int64()))
    return t


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_split_conserves_counts_and_routes_by_range(data):
    P = data.draw(st.integers(1, 16), label="P")
    S = data.draw(st.integers(1, 8).filter(lambda s: s <= P), label="S")
    n = data.draw(st.integers(0, 40), label="n")
    parts = data.draw(
        st.lists(st.integers(0, P - 1), min_size=n, max_size=n), label="parts"
    )
    valid = data.draw(
        st.lists(st.booleans(), min_size=n, max_size=n), label="valid"
    )
    with_dups = data.draw(st.booleans(), label="with_dups")
    dups = (
        data.draw(st.lists(st.integers(1, 5), min_size=n, max_size=n),
                  label="dups")
        if with_dups else None
    )
    t = _validated_table(parts, valid, dups)
    out = _split_validated(t, P, S)
    assert len(out) == S

    w = np.array(dups if with_dups else [1] * n, dtype=np.int64)
    pa_parts = np.array(parts, dtype=np.int64)
    va = np.array(valid, dtype=bool)

    total_ev = total_inv = total_rows = 0
    for i, (rows, counts) in enumerate(out):
        # routed rows carry neither engine helper column
        assert "_dups" not in rows.column_names
        assert "_valid" not in rows.column_names
        # every routed row's part belongs to range i ((part*S)//P == i)
        for p in rows.column("part").to_pylist():
            assert (p * S) // P == i, (p, i, P, S)
        for p in counts.column("part").to_pylist():
            assert (p * S) // P == i
        total_rows += rows.num_rows
        total_ev += sum(counts.column("events_in").to_pylist())
        total_inv += sum(counts.column("invalid").to_pylist())

    # conservation: events_in == total multiplicity mass, invalid == the
    # invalid rows' mass, routed rows == the valid rows (no reduce here)
    assert total_ev == int(w.sum())
    assert total_inv == int(w[~va].sum()) if n else total_inv == 0
    assert total_rows == int(va.sum())

    # per-part events_in equals that part's mass exactly
    got = {}
    for _rows, counts in out:
        for p, e in zip(counts.column("part").to_pylist(),
                        counts.column("events_in").to_pylist()):
            got[p] = got.get(p, 0) + e
    for p in set(parts):
        assert got.get(p, 0) == int(w[pa_parts == p].sum())


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_keep_last_with_counts_conserves_mass(data):
    """`_keep_last_per_key(with_counts=True)`: one winner per key, the
    winner is the max-(commit_seq, seq) row, and the `_dups` column's
    total equals the input row count — the invariant events_in relies
    on under ANY batching."""
    import pyarrow.compute as pc

    from etl_ray.stages.validate import _keep_last_per_key

    n = data.draw(st.integers(0, 50), label="n")
    keys = data.draw(
        st.lists(st.integers(0, 6), min_size=n, max_size=n), label="keys"
    )
    cs = data.draw(
        st.lists(st.integers(0, 9), min_size=n, max_size=n), label="cs"
    )
    rows = [
        (i, "U", cs[i], f"r{keys[i]}", "f.py", f"v{i}") for i in range(n)
    ]
    t = mklog(rows)
    out = _keep_last_per_key(t, with_counts=True)
    assert "_dups" in out.column_names
    # mass conservation
    assert sum(out.column("_dups").to_pylist()) == n
    # one winner per key, and it carries the key's max (commit_seq, seq)
    seen = {}
    for r in out.to_pylist():
        assert r["repo"] not in seen
        seen[r["repo"]] = (r["commit_seq"], r["seq"])
    for k in set(keys):
        repo = f"r{k}"
        want = max((cs[i], i) for i in range(n) if keys[i] == k)
        assert seen[repo] == want, (repo, want, seen[repo])
    # per-winner multiplicity == that key's input row count
    from collections import Counter

    cnt = Counter(keys)
    for r in out.to_pylist():
        assert r["_dups"] == cnt[int(r["repo"][1:])]
