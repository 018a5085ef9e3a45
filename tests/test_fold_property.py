"""Property-based testing of the LWW merge fold (no Ray needed).

Drives ``make_merge_fn`` directly on arbitrary hypothesis-generated event
streams split at arbitrary window boundaries, asserting the chained
multi-window fold always equals the single-threaded oracle — the
windowed fold must be insensitive to where checkpoint cuts land
(SURVEY §2.10 ordering semantics; the reference pins this only with a
handful of golden CSVs, we pin it for the whole input space).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_ray import oracle
from etl_ray.stages.merge import _empty_state, make_merge_fn
from etl_ray.stages.validate import make_validate_fn

KEYS = [("r0", "a"), ("r0", "b"), ("r1", "a"), ("r1", "c")]

event_st = st.tuples(
    st.integers(0, len(KEYS) - 1),          # key index
    st.sampled_from(["I", "U", "D", "X"]),  # X = malformed op
    st.integers(0, 15),                      # commit_seq (collisions allowed)
    st.text(alphabet="abcdef", min_size=0, max_size=6),  # content
)
stream_st = st.lists(event_st, min_size=0, max_size=25)


def to_table(events, seq_start=0):
    rows = {
        "seq": [], "op": [], "commit_seq": [], "repo": [], "path": [],
        "commit": [], "lang": [], "content": [],
    }
    for i, (ki, op, cs, content) in enumerate(events):
        repo, path = KEYS[ki]
        rows["seq"].append(seq_start + i)
        rows["op"].append(op)
        rows["commit_seq"].append(cs)
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(f"c{seq_start + i}")
        rows["lang"].append("py")
        rows["content"].append("" if op == "D" else content)
    return pa.table(
        {
            "seq": pa.array(rows["seq"], pa.int64()),
            "op": pa.array(rows["op"], pa.string()),
            "commit_seq": pa.array(rows["commit_seq"], pa.int64()),
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows["path"], pa.string()),
            "commit": pa.array(rows["commit"], pa.string()),
            "lang": pa.array(rows["lang"], pa.string()),
            "content": pa.array(rows["content"], pa.string()),
        }
    )


def fold_windows(tables, tmpdir):
    """Chain the merge fn across windows; returns final live state dict."""
    validate = make_validate_fn(num_partitions=1)
    prior = _empty_state()
    prior_path = None
    for i, t in enumerate(tables):
        staging = os.path.join(tmpdir, f"ckpt{i}")
        os.makedirs(staging, exist_ok=True)
        v = validate(t)
        if v.num_rows == 0:
            continue
        fn = make_merge_fn(staging, {}, {}, i, prior_override=prior,
                           prior_override_path=prior_path)
        stats = fn(v)
        met = stats.slice(0, 1).to_pylist()[0]
        if met["changed"]:
            prior_path = met["staged_file"]
            prior = pq.read_table(prior_path)
    live = prior.filter(
        pa.compute.invert(pa.compute.fill_null(prior.column("deleted"), False))
    )
    return {
        (r["repo"], r["path"]): r["content_sha256"] for r in live.to_pylist()
    }


@given(stream=stream_st, cut=st.integers(0, 25), cut2=st.integers(0, 25))
@settings(max_examples=60, deadline=None)
def test_windowed_fold_equals_oracle(tmp_path_factory, stream, cut, cut2):
    tmpdir = str(tmp_path_factory.mktemp("fold"))
    table = to_table(stream)
    a, b = sorted((min(cut, len(stream)), min(cut2, len(stream))))
    windows = [table.slice(0, a), table.slice(a, b - a), table.slice(b)]
    got = fold_windows(windows, tmpdir)

    res = oracle.reduce_events(table)
    want = {k: v["content_sha256"] for k, v in res.state.items()}
    assert got == want


@given(stream=stream_st)
@settings(max_examples=30, deadline=None)
def test_single_window_equals_oracle(tmp_path_factory, stream):
    tmpdir = str(tmp_path_factory.mktemp("fold1"))
    table = to_table(stream)
    got = fold_windows([table], tmpdir)
    res = oracle.reduce_events(table)
    assert got == {k: v["content_sha256"] for k, v in res.state.items()}


@given(stream=stream_st, dup_at=st.integers(0, 24))
@settings(max_examples=30, deadline=None)
def test_replayed_window_is_idempotent(tmp_path_factory, stream, dup_at):
    """Replaying an entire window verbatim (at-least-once delivery) must
    not change the final state — the ensure/ON-CONFLICT guarantee."""
    tmpdir = str(tmp_path_factory.mktemp("foldd"))
    table = to_table(stream)
    k = min(dup_at, len(stream))
    w1, w2 = table.slice(0, k), table.slice(k)
    got = fold_windows([w1, w2, w1, w2], tmpdir)  # both windows re-delivered
    res = oracle.reduce_events(table)
    assert got == {k_: v["content_sha256"] for k_, v in res.state.items()}


def fold_windows_chain(tables, tmpdir, chain_max=2, ratio=1.1):
    """The same chained fold but in MERGE-ON-READ mode (delta_chain=True,
    ratio>1 so every non-compaction window appends a chain file), with
    the driver's manifest bookkeeping mimicked inline. Final state =
    fold_state_chain over [base, deltas]."""
    from etl_ray.stages.merge import fold_state_chain

    validate = make_validate_fn(num_partitions=1)
    base, chain, size = None, [], 0
    for i, t in enumerate(tables):
        staging = os.path.join(tmpdir, f"ckpt{i}")
        os.makedirs(staging, exist_ok=True)
        v = validate(t)
        if v.num_rows == 0:
            continue
        fn = make_merge_fn(
            staging, ({0: base} if base else {}), {}, i,
            prior_deltas={0: list(chain)}, prior_sizes={0: size},
            delta_chain=True, chain_max=chain_max, compact_ratio=ratio,
        )
        stats = fn(v)
        met = stats.slice(0, 1).to_pylist()[0]
        if met["mode"] == "delta":
            chain.append(met["staged_file"])
        elif met["mode"] == "rewrite":
            base, chain = met["staged_file"], []
        size = met["state_rows"] + met["tombstones"]
    files = ([base] if base else []) + chain
    if not files:
        return {}
    tabs = [pq.read_table(f) for f in files]
    cols, seen = [], set()
    for tab in tabs:
        for f in tab.schema:
            if f.name not in seen:
                seen.add(f.name)
                cols.append((f.name, f.type))
    folded = fold_state_chain(tabs, cols)
    live = folded.filter(
        pa.compute.invert(pa.compute.fill_null(folded.column("deleted"), False))
    )
    return {
        (r["repo"], r["path"]): r["content_sha256"] for r in live.to_pylist()
    }


@given(stream=stream_st, cut=st.integers(0, 25), cut2=st.integers(0, 25))
@settings(max_examples=60, deadline=None)
def test_delta_chain_fold_equals_oracle(tmp_path_factory, stream, cut, cut2):
    """Merge-on-read windows (chain appends + periodic compaction) land
    on the oracle state for EVERY stream and window-cut placement."""
    tmpdir = str(tmp_path_factory.mktemp("foldc"))
    table = to_table(stream)
    a, b = sorted((min(cut, len(stream)), min(cut2, len(stream))))
    windows = [table.slice(0, a), table.slice(a, b - a), table.slice(b)]
    got = fold_windows_chain(windows, tmpdir)
    res = oracle.reduce_events(table)
    assert got == {k: v["content_sha256"] for k, v in res.state.items()}
