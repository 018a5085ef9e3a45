"""Training-data pipeline operators: decontamination, sequence packing,
PII redaction, stratified sampling — each vs its DuckDB oracle at
sf0.001 (the driver gate re-runs them at sf0.01)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con.execute(sql).df()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), ignore_index=True)


@pytest.mark.parametrize(
    "name",
    ["decontaminate_docs", "pack_sequences", "redact_docs",
     "stratified_sample_docs", "repetition_stats"],
)
def test_training_op_matches_oracle(ray_session, name):
    from etl_ray.pipelines.queries import QUERIES

    q = QUERIES[name]
    got = _norm(pd.DataFrame(q.fn(SF)))
    want = _norm(_oracle(q.sql))
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_dtype=False
    )


def test_pack_sequences_offsets_are_contiguous(ray_session):
    """The packing invariant: offsets in doc_id order are an exclusive
    prefix sum — offset[i+1] == offset[i] + n_tokens[i], starting at 0."""
    from etl_ray.pipelines.queries import QUERIES

    df = QUERIES["pack_sequences"].fn(SF).sort_values("doc_id", ignore_index=True)
    off = df["tok_offset"].to_numpy()
    ntok = df["n_tokens"].to_numpy()
    assert off[0] == 0
    assert np.array_equal(off[1:], off[:-1] + ntok[:-1])
    assert (df["shard_id"].to_numpy() == off // 2048).all()


def test_redact_pii_kernel_counts():
    import pyarrow as pa

    from etl_ray.functions.text import redact_pii

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["mail me at a.b@x.co or c@d.e now", "no pii 12345 here 1234567"]
            ),
        }
    )
    out = redact_pii(t)
    assert out.column("n_emails").to_pylist() == [2, 0]
    assert out.column("n_longnums").to_pylist() == [0, 1]
    # "no pii 12345 here 1234567" -> "no pii 12345 here <NUM>"
    assert out.column("red_len").to_pylist()[1] == len("no pii 12345 here <NUM>")


def test_decontaminate_excludes_benchmark_docs(ray_session):
    from etl_ray.pipelines.queries import QUERIES

    df = QUERIES["decontaminate_docs"].fn(SF)
    assert (df["doc_id"] % 29 != 0).all()
    assert (df["n_overlap"] > 0).all()


@pytest.mark.parametrize("name", ["tfidf_top_terms", "inverted_index"])
def test_corpus_stats_match_oracle(ray_session, name):
    from etl_ray.pipelines.queries import QUERIES

    q = QUERIES[name]
    got = _norm(pd.DataFrame(q.fn(SF)))
    want = _norm(_oracle(q.sql))
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_dtype=False
    )


def test_inverted_index_postings_sorted(ray_session):
    from etl_ray.pipelines.queries import QUERIES

    df = QUERIES["inverted_index"].fn(SF)
    for _, row in df.head(10).iterrows():
        ids = [int(x) for x in row["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == row["df"]


def test_cdc_replay_evolved_matches_oracle(ray_session):
    """Schema-evolution end-to-end: tail log segments add meta_rev; the
    final lake state must match the SQL oracle's full-row-LWW semantics
    (a winner written before evolution carries NULL meta_rev)."""
    from etl_ray.pipelines.queries import QUERIES

    q = QUERIES["cdc_replay_docs_evolved"]
    got = _norm(pd.DataFrame(q.fn(SF)))
    want = _norm(_oracle(q.sql))
    assert got["meta_rev"].notna().any() and got["meta_rev"].isna().any()
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_dtype=False
    )


def test_time_travel_read_matches_oracle_and_differs_from_current(ray_session):
    from etl_ray.pipelines.queries import QUERIES

    q = QUERIES["cdc_time_travel"]
    got = _norm(pd.DataFrame(q.fn(SF)))
    want = _norm(_oracle(q.sql))
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_dtype=False
    )
    cur = pd.DataFrame(QUERIES["cdc_replay_docs"].fn(SF))
    assert len(got) < len(cur)  # window-1 inserts are absent as-of ckpt 0


def test_incremental_sigs_equal_from_scratch(ray_session):
    """The delta-maintained MinHash index equals a from-scratch signature
    pass over the same final state (engine-vs-engine; the SQL gate
    separately pins both against DuckDB)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from etl_ray.functions.dedup import MinHashStage
    from etl_ray.pipelines.queries import _run_doc_replay, cdc_incremental_sigs

    got = cdc_incremental_sigs(SF)

    mh = MinHashStage()
    eng = _run_doc_replay(SF, variant="-incsig-scratch")
    state = eng.final_state(columns=["repo", "path", "content"]).to_pandas()
    sigs = np.stack([mh.signature(c or "") for c in state["content"]]).astype(np.int64)
    want = state[["repo", "path"]].copy()
    for i in range(mh.n_perm):
        want[f"s{i}"] = sigs[:, i]
    want = want.sort_values(["repo", "path"], ignore_index=True)
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_unigram_logprob_score_flags_rare_tokens(ray_session):
    """A doc of rare tokens scores higher surprisal than one of common
    tokens, and token counts are exact."""
    from etl_ray.pipelines.queries import unigram_logprob_score

    got = unigram_logprob_score(SF)
    assert (got["n_tokens"] > 0).all()
    assert (got["sum_lp_micro"] > 0).all()
    # avg_nats is the int-exact micro sum divided back out
    import numpy as np

    recomputed = np.round(
        got["sum_lp_micro"].to_numpy()
        / got["n_tokens"].to_numpy() / 1e6, 6)
    assert np.allclose(got["avg_nats"], recomputed, atol=1e-9)
    # surprisal is bounded by the corpus-uniform extremes
    assert got["avg_nats"].between(0, 30).all()


@pytest.mark.parametrize(
    "name",
    ["json_props_extract", "jsonl_roundtrip", "char_entropy_quality",
     "cohort_retention", "user_value_trend"],
)
def test_round3_tail_ops_match_oracle(ray_session, name):
    from etl_ray.pipelines.queries import QUERIES

    q = QUERIES[name]
    got = _norm(pd.DataFrame(q.fn(SF)))
    want = _norm(_oracle(q.sql))
    pd.testing.assert_frame_equal(
        got.astype(str), want.astype(str), check_dtype=False
    )


def test_char_entropy_degenerate_doc_scores_zero(ray_session):
    """A single-character flood has exactly zero entropy; a doc with all
    distinct chars scores ln(n). The kernel is driven through a real
    Dataset to exercise the batch path."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from etl_ray.pipelines import queries as Q

    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["aaaaaaaa", "abcdefgh"], pa.string()),
    })
    import os
    import tempfile

    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        df = Q.QUERIES["char_entropy_quality"].fn(d)
    df = df.set_index("doc_id")
    assert df.loc[1, "surprisal_micro"] == 0
    assert df.loc[1, "entropy_nats"] == 0.0
    # 8 distinct chars of 8: entropy = ln(8)
    assert abs(df.loc[2, "entropy_nats"] - np.log(8)) < 1e-5


def test_cohort_retention_offsets_nonnegative_and_day0_complete(ray_session):
    """Every user appears in their own cohort at offset 0, so the
    offset-0 user count summed over cohorts equals the distinct-user
    count; offsets are never negative."""
    from etl_ray.pipelines.queries import QUERIES

    df = QUERIES["cohort_retention"].fn(SF)
    assert (df["day_offset"] >= 0).all()
    n_users = _oracle("SELECT count(DISTINCT user_id) AS n FROM events")["n"][0]
    assert df.loc[df["day_offset"] == 0, "n_users"].sum() == n_users


def test_jsonl_roundtrip_preserves_escaping(ray_session):
    """Quotes, backslashes, newlines and unicode survive the JSONL
    round-trip byte-exactly (sha256 of the text equals the source's)."""
    import hashlib
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_ray.pipelines import queries as Q

    texts = ['he said "hi"\\n', "tab\there", "unié中", "a\nb"]
    t = pa.table({
        "doc_id": pa.array(list(range(len(texts))), pa.int64()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "text": pa.array(texts, pa.string()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(t, os.path.join(d, "documents.parquet"))
        df = Q.QUERIES["jsonl_roundtrip"].fn(d)
    df = df.sort_values("doc_id", ignore_index=True)
    for i, s in enumerate(texts):
        assert df.loc[i, "text_sha256"] == hashlib.sha256(s.encode()).hexdigest()


TRICKY_PROPS = [
    '{"k": 3}', '{"k" : 7}', '{"k":-4}', None, "", "   ", "not json",
    "null", '{"k": "12"}', '{"k": "abc"}', '{"k": 2.5}', '{"k": -2.5}',
    '{"k": true}', '{"k": null}', '{"k": [1]}', '{"k": {"x": 1}}',
    '{"a": {"k": 9}}', "{}", '{"k": 99999999999999999999}',
    '{"k": "99999999999999999999"}',
]


def _duckdb_k(props_list):
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INTEGER, props VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    list(enumerate(props_list)))
    return [r[0] for r in con.execute(
        """SELECT CASE WHEN json_valid(props)
                  THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
             END FROM t ORDER BY i"""
    ).fetchall()]


def test_json_k_rowwise_matches_duckdb_try_cast():
    """The per-row fallback mirrors the oracle expression exactly on
    hostile inputs: invalid JSON, nesting, bools, floats (half-away
    rounding), numeric strings, int64 overflow."""
    from etl_ray.pipelines.queries import _json_k_rowwise

    want = _duckdb_k(TRICKY_PROPS)
    got = _json_k_rowwise(TRICKY_PROPS)
    for g, w, p in zip(got, want, TRICKY_PROPS):
        assert g == w, (p, g, w)


def test_json_props_extract_end_to_end_hostile(ray_session, tmp_path):
    """Full query vs oracle over a synthetic events table whose props
    exercise every fallback path (mixed types force the per-row path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_ray.pipelines.queries import QUERIES

    props = TRICKY_PROPS * 3
    et = [f"t{i % 4}" for i in range(len(props))]
    pq.write_table(
        pa.table({"event_type": pa.array(et),
                  "props": pa.array(props, pa.string())}),
        tmp_path / "events.parquet")
    q = QUERIES["json_props_extract"]
    got = q.fn(str(tmp_path))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(q.sql).df()
    pd.testing.assert_frame_equal(
        _norm(pd.DataFrame(got)).astype(str), _norm(want).astype(str),
        check_dtype=False)


def test_user_value_trend_exact_slope_and_degenerate_sentinel(ray_session, tmp_path):
    """A perfectly linear user recovers the exact slope in micro-units;
    a constant-timestamp user emits the documented 0 sentinel; and the
    full query matches its oracle on the same synthetic table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_ray.pipelines.queries import QUERIES

    X0 = 1_704_067_200
    us = 1_000_000
    rows = {
        "event_id": list(range(5)),
        "user_id": [1, 1, 1, 2, 2],
        # user 1: value = 2.5 + 2.0 * x  -> slope 2000 milli/s = 2e9 micro
        # user 2: both events in the same second -> den = 0 -> sentinel
        "ts": pa.array(
            [(X0 + 0) * us, (X0 + 1) * us, (X0 + 2) * us,
             (X0 + 50) * us, (X0 + 50) * us + 1],
            pa.timestamp("us")),
        "value": [2.5, 4.5, 6.5, 9.0, 11.0],
    }
    pq.write_table(pa.table(rows), tmp_path / "events.parquet")
    df = QUERIES["user_value_trend"].fn(str(tmp_path)).set_index("user_id")
    assert df.loc[1, "slope_micro"] == 2_000_000_000
    assert df.loc[1, "n_events"] == 3
    assert df.loc[2, "slope_micro"] == 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet')")
    want = con.execute(QUERIES["user_value_trend"].sql).df()
    pd.testing.assert_frame_equal(
        _norm(df.reset_index()).astype(str), _norm(want).astype(str),
        check_dtype=False)


def test_event_transitions_conserves_rows_and_matches_oracle(ray_session):
    """Total transition count equals Σ_user (n_events − 1) — no pair is
    dropped or double-counted across bucket boundaries — and the full
    matrix matches the lead() oracle."""
    from etl_ray.pipelines.queries import QUERIES

    q = QUERIES["event_transitions"]
    got = q.fn(SF)
    per_user = _oracle(
        "SELECT user_id, count(*) AS n FROM events GROUP BY user_id")
    assert got["n_transitions"].sum() == (per_user["n"] - 1).sum()
    want = _oracle(q.sql)
    pd.testing.assert_frame_equal(
        _norm(pd.DataFrame(got)).astype(str), _norm(want).astype(str),
        check_dtype=False)


def test_split_assign_proportions_and_determinism(ray_session):
    """The hash split is ~80/10/10 overall, covers every document
    exactly once, is deterministic across runs, and matches its
    oracle."""
    from etl_ray.pipelines.queries import QUERIES

    q = QUERIES["split_assign"]
    a = q.fn(SF)
    b = q.fn(SF)
    pd.testing.assert_frame_equal(a, b)

    n_docs = _oracle("SELECT count(*) AS n FROM documents")["n"][0]
    assert a["n_docs"].sum() == n_docs
    frac = a.groupby("split")["n_docs"].sum() / n_docs
    assert 0.7 < frac["train"] < 0.9
    assert frac["val"] < 0.2 and frac["test"] < 0.2

    want = _oracle(q.sql)
    pd.testing.assert_frame_equal(
        _norm(pd.DataFrame(a)).astype(str), _norm(want).astype(str),
        check_dtype=False)


def test_bigram_pmi_known_corpus(ray_session, tmp_path):
    """On a crafted corpus the top pair and its PMI are known in closed
    form, and the full query matches its oracle on the same table."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_ray.functions.rounding import round_half_away
    from etl_ray.pipelines.queries import QUERIES

    # "new york" appears 3x and never apart; fillers share no pairs
    texts = ["new york new york new york", "alpha beta", "gamma delta"]
    pq.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array(texts)}),
        tmp_path / "documents.parquet")
    df = QUERIES["bigram_pmi"].fn(str(tmp_path))
    top = df.iloc[0]
    assert (top["w1"], top["w2"], top["n_pair"]) == ("new", "york", 3)
    # T_tok=10, T_pair=7; p(xy)=3/7, p(new)=p(york)=3/10
    want = float(round_half_away(
        math.log((3 / 7) / ((3 / 10) * (3 / 10))) * 1e6, 0))
    assert top["pmi_micro"] == want

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')")
    oracle = con.execute(QUERIES["bigram_pmi"].sql).df()
    pd.testing.assert_frame_equal(
        _norm(pd.DataFrame(df)).astype(str), _norm(oracle).astype(str),
        check_dtype=False)


def test_assoc_event_pairs_symmetric_bounds_and_oracle(ray_session):
    """Pair counts are bounded by each member's user count, the pair set
    is the unordered upper triangle, and the query matches its oracle."""
    from etl_ray.pipelines.queries import QUERIES

    q = QUERIES["assoc_event_pairs"]
    got = q.fn(SF)
    assert (got["t1"] < got["t2"]).all()
    per_type = _oracle(
        "SELECT event_type, count(DISTINCT user_id) AS c FROM events "
        "GROUP BY 1").set_index("event_type")["c"]
    assert (got["n_both"] <= got["t1"].map(per_type)).all()
    assert (got["n_both"] <= got["t2"].map(per_type)).all()
    want = _oracle(q.sql)
    pd.testing.assert_frame_equal(
        _norm(pd.DataFrame(got)).astype(str), _norm(want).astype(str),
        check_dtype=False)
