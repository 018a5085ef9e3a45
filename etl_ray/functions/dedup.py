"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Shapes follow the guide's scale patterns: hash/signature computation is a
stateless vectorized ``map_batches`` (one pass over the corpus), the
candidate-generation step is a ``groupby`` on the bucket key (the only
shuffle), and verification is exact similarity on the tiny candidate
set. Reference analog for exact dedup: natural-key drop_duplicates +
unique-index ensure (``etl/insert/bulk_inserter.py:59-113``, D1/D2).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from etl_ray.stages.keyed import (
    bucket_ids,
    bucketed_groups,
    default_buckets,
    grouped_by_bucket as _grouped,
    to_pandas_typed,
)

_EMPTY_JACCARD = pa.table(
    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
     "jaccard": pa.array([], pa.float64())}
)
_EMPTY_HAMMING = pa.table(
    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
     "hamming": pa.array([], pa.int64())}
)


# --- exact dedup -------------------------------------------------------------

def add_sha256(batch: pa.Table, text_col: str = "text", out: str = "content_sha256") -> pa.Table:
    texts = batch.column(text_col).to_pandas()
    hashes = [hashlib.sha256((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(hashes, pa.string()))


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id",
                n_buckets: int | None = None) -> rd.Dataset:
    """Keep the min-id row per identical content hash.

    hash column via map_batches → ``groupby(hash(sha) % B)`` — BUCKETED,
    one vectorized pandas pass per partition, never a Python dispatch per
    distinct document (the round-1 anti-pattern; stages/keyed.py). All
    rows of a hash land in one bucket, so the min-id winner is global.
    """
    ds = ds.map_batches(
        lambda b: add_sha256(b, text_col), batch_format="pyarrow", zero_copy_batch=True
    )

    def first_per_hash(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values([("content_sha256"), id_col], kind="stable")
        df = df.drop_duplicates(subset="content_sha256", keep="first")
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_groups(ds, "content_sha256", first_per_hash,
                           n_buckets=n_buckets)


# --- shingles + MinHash ------------------------------------------------------

_TOKEN_RE = re.compile(r"\S+")

#: whitespace codepoints — MUST match the SQL token regex
#: ``[^ \t\n\r\f\v]+`` (RE2 ASCII \s) so both engines tokenize identically
_WS_CODES = np.array([9, 10, 11, 12, 13, 32], dtype=np.uint32)
_MOD32 = np.uint64(4294967296)
_EMPTY_SIG = np.uint64(4294967295)


def token_hashes(text: str) -> np.ndarray:
    """Per-token Horner hash ``h = (h*31 + codepoint) mod 2^32`` over the
    lowercased document — fully vectorized (ONE utf-32 decode, boundary
    masks, weighted segment sums via ``np.add.reduceat``; no per-token
    Python loop). The DuckDB oracle reproduces it exactly with
    ``list_reduce`` over ``unicode(x)`` codepoints, which is why the hash
    is an explicit Horner instead of SipHash."""
    codes = np.frombuffer((text or "").lower().encode("utf-32-le"), dtype=np.uint32)
    if len(codes) == 0:
        return np.empty(0, dtype=np.uint64)
    is_tok = ~np.isin(codes, _WS_CODES)
    if not is_tok.any():
        return np.empty(0, dtype=np.uint64)
    n = len(codes)
    start = is_tok.copy()
    start[1:] &= ~is_tok[:-1]
    starts = np.flatnonzero(start)
    # token id per char; -1 padding chars excluded via is_tok mask
    tok_id = np.cumsum(start) - 1
    # per-char position FROM THE END of its token → weight 31^pos
    idx = np.arange(n)
    tok_char = is_tok
    # end index (exclusive) of each token
    end_mask = is_tok.copy()
    end_mask[:-1] &= ~is_tok[1:]
    ends = np.flatnonzero(end_mask)
    pos_from_end = ends[tok_id[tok_char]] - idx[tok_char]
    max_len = int(pos_from_end.max()) + 1
    powers = np.empty(max_len, dtype=np.uint64)
    powers[0] = 1
    for j in range(1, max_len):
        powers[j] = (powers[j - 1] * np.uint64(31)) % _MOD32
    terms = codes[tok_char].astype(np.uint64) * powers[pos_from_end]
    # segment boundaries within the compacted char stream
    seg_starts = np.searchsorted(np.flatnonzero(tok_char), starts)
    with np.errstate(over="ignore"):
        sums = np.add.reduceat(terms, seg_starts)
    return sums % _MOD32


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Hashes of the k-token shingles: Horner(31) over the k token hashes
    mod 2^32 — SQL-replicable (see token_hashes)."""
    th = token_hashes(text)
    if len(th) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(th) < k:
        k = len(th)
    n = len(th) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = (acc * np.uint64(31) + th[j : j + n]) % _MOD32
    return acc


def minhash_params(n_perm: int = 24, seed: int = 1337):
    """The (a, b) permutation constants — shared by the Ray stage and the
    SQL-oracle generator so both engines compute identical signatures."""
    rng = np.random.default_rng(seed)
    a = (rng.integers(1, 1 << 32, size=n_perm, dtype=np.uint64) | np.uint64(1)) % _MOD32
    b = rng.integers(0, 1 << 32, size=n_perm, dtype=np.uint64)
    return a, b


class MinHashStage:
    """Per-doc MinHash signature (n_perm permutations), run task-based
    (param derivation is microseconds).

    Permutation parameters are derived in ``__init__`` from
    a fixed seed; per batch the signature is a
    vectorized min over ``(a*x + b) mod 2^32`` universal hashes of the
    shingle set. The 32-bit modular domain is deliberate: the DuckDB
    oracle evaluates the same permutations with HUGEINT arithmetic.
    """

    def __init__(self, n_perm: int = 24, k: int = 3, seed: int = 1337):
        self.a, self.b = minhash_params(n_perm, seed)
        self.n_perm = n_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.full(self.n_perm, _EMPTY_SIG, dtype=np.uint64)
        # (n_perm, n_shingles) universal hash mod 2^32, min over shingles
        with np.errstate(over="ignore"):
            vals = (np.outer(self.a, sh) + self.b[:, None]) % _MOD32
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas()
        sigs = np.stack([self.signature(t) for t in texts])
        return batch.append_column(
            "minhash", pa.array(list(sigs.astype(np.int64)), pa.list_(pa.int64(), self.n_perm))
        )


def lsh_band_rows(batch: pa.Table, n_bands: int = 6, id_col: str = "doc_id") -> pa.Table:
    """Explode signatures into (band_id, band_hash, id) rows — the LSH
    bucketing key for the candidate ``groupby``. Band hash = Horner
    (B=1000003) over the band's signature values mod 2^32 — the same fold
    the SQL oracle evaluates."""
    sigs = np.stack(batch.column("minhash").to_pandas().to_numpy())
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    n, n_perm = sigs.shape
    r = n_perm // n_bands
    band_ids, band_hashes, out_ids = [], [], []
    for bnd in range(n_bands):
        seg = np.ascontiguousarray(sigs[:, bnd * r : (bnd + 1) * r]).astype(np.uint64)
        h = np.zeros(n, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(r):
                h = (h * np.uint64(1000003) + seg[:, j]) % _MOD32
        band_ids.append(np.full(n, bnd, dtype=np.int32))
        band_hashes.append(h.astype(np.int64))
        out_ids.append(ids)
    return pa.table(
        {
            "band_id": pa.array(np.concatenate(band_ids)),
            "band_hash": pa.array(np.concatenate(band_hashes)),
            id_col: pa.array(np.concatenate(out_ids)),
        }
    )


def candidate_pairs(group: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """Same-bucket id pairs (a < b) from one (band_id, band_hash) group."""
    ids = np.sort(group[id_col].unique())
    if len(ids) < 2:
        return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
    ai, bi = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[ai], "b": ids[bi]})


def candidate_pairs_partition(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """Vectorized candidate generation over a WHOLE shuffle partition of
    (band_id, band_hash, id) rows: one lexsort + run detection instead of
    one Python call per bucket (millions of tiny buckets otherwise make
    per-group dispatch the bottleneck). Buckets are whole within a
    partition because the shuffle key is hash(band_id, band_hash)."""
    if t.num_rows < 2:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    band = t.column("band_id").to_numpy(zero_copy_only=False)
    h = t.column("band_hash").to_numpy(zero_copy_only=False)
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, h, band))
    band, h, ids = band[order], h[order], ids[order]
    new_run = np.empty(len(ids), dtype=bool)
    new_run[0] = True
    new_run[1:] = (band[1:] != band[:-1]) | (h[1:] != h[:-1])
    starts = np.flatnonzero(new_run)
    ends = np.append(starts[1:], len(ids))
    out_a, out_b = [], []
    for s, e in zip(starts, ends):  # touches only buckets with ≥2 members
        if e - s < 2:
            continue
        bucket = np.unique(ids[s:e])
        if len(bucket) < 2:
            continue
        ai, bi = np.triu_indices(len(bucket), k=1)
        out_a.append(bucket[ai])
        out_b.append(bucket[bi])
    if not out_a:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
    return pa.table(
        {
            "a": pa.array(np.concatenate(out_a).astype(np.int64)),
            "b": pa.array(np.concatenate(out_b).astype(np.int64)),
        }
    )


def containment(text_a: str, text_b: str, k: int = 5) -> float:
    """Asymmetric containment |A∩B| / |A| over k-token shingle sets —
    detects b SUBSUMING a (quotes, boilerplate, doc+appendix), which
    symmetric Jaccard under-scores. Vacuously 1.0 when A is empty."""
    a = set(_shingle_hashes(text_a, k).tolist())
    b = set(_shingle_hashes(text_b, k).tolist())
    if not a:
        return 1.0
    return len(a & b) / len(a)


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    """Exact k-token-shingle Jaccard — the verification kernel."""
    sa = set(_shingle_hashes(text_a, k).tolist())
    sb = set(_shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(
    ds: rd.Dataset,
    threshold: float = 0.5,
    n_perm: int = 24,
    n_bands: int = 6,
    k: int = 3,
    id_col: str = "doc_id",
    n_buckets: int | None = None,
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline:

    shingle→minhash (actor pool) → band explode → groupby(band) →
    candidate pairs → distinct → exact-Jaccard verify via a BUCKETED
    pair⋈text join (two shuffles on hashed id) → pairs ≥ threshold.

    The corpus text is never materialized on the driver and never
    broadcast: only the candidate-pair ID SET (8 bytes/id, ≪ corpus)
    flows back to prune the text side before the join shuffles.
    ``n_buckets`` scales with cluster CPUs (stages/keyed.py).
    """
    import ray

    # task-based: deriving the (a, b) permutation params from the fixed
    # seed is microseconds per call — actor-pool spawn costs more than
    # the state it would amortize
    def minhash(b: pa.Table) -> pa.Table:
        return MinHashStage(n_perm=n_perm, k=k)(b)

    sigs = ds.map_batches(minhash, batch_format="pyarrow", batch_size=1024)
    # size the exchange to the DATA when the caller knows it (bytes/64MB
    # floor 8 — per-bucket dispatch dominates tiny corpora); CPU-derived
    # width otherwise
    n_buckets = n_buckets or default_buckets()

    def explode_with_bucket(b: pa.Table) -> pa.Table:
        rows = lsh_band_rows(b, n_bands=n_bands, id_col=id_col)
        band = rows.column("band_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        h = rows.column("band_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bucket = ((band * np.uint64(0x9E3779B97F4A7C15)) ^ h) % np.uint64(n_buckets)
        return rows.append_column("bucket", pa.array(bucket.astype(np.int32)))

    bands = sigs.map_batches(explode_with_bucket, batch_format="pyarrow")
    # shuffle on the bucket (whole LSH buckets co-locate), then ONE
    # vectorized candidate pass per partition — per-bucket Python dispatch
    # would dominate (millions of tiny buckets)
    pairs = _grouped(
        bands, "bucket", n_buckets, lambda t: candidate_pairs_partition(t, id_col)
    )

    # Materialized: the candidate set is the SMALL intermediate
    # (≪ corpus) and is consumed twice downstream (id-prune + join
    # shuffle) — without pinning it, each consumer would re-run the whole
    # MinHash lineage. Cross-band duplicate pairs are NOT deduped here:
    # the verify join buckets by hash(a), so duplicates co-locate and are
    # dropped in-partition there, saving a dedicated shuffle.
    pairs = pairs.materialize()
    verified = _verify_pairs_bucketed(ds, pairs, k, threshold, id_col, n_buckets)
    res = to_pandas_typed(verified, _EMPTY_JACCARD).sort_values(
        ["a", "b"]
    ).reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False)


def _bucketed_by(ds_in: rd.Dataset, col: str, n_buckets: int) -> rd.Dataset:
    def add(t: pa.Table) -> pa.Table:
        if "_jbucket" in t.column_names:
            t = t.drop_columns(["_jbucket"])
        return t.append_column("_jbucket", bucket_ids(t.column(col), n_buckets))

    return ds_in.map_batches(add, batch_format="pyarrow", zero_copy_batch=True)


def _verify_pairs_bucketed(
    corpus: rd.Dataset,
    pairs: rd.Dataset,
    k: int,
    threshold: float,
    id_col: str,
    n_buckets: int,
    metric: str = "jaccard",
) -> rd.Dataset:
    """Exact-Jaccard verify of candidate (a, b) pairs WITHOUT broadcasting
    corpus text: texts are pruned to candidate ids (ids-only broadcast),
    then attached via two bucketed union-shuffle joins (on a, then on b).
    Partitioning assumption: all rows sharing hash(join-id) land in one
    group — guaranteed by the groupby.
    """
    import ray

    # prune the text side: candidate-id set (ints only) ≪ corpus.
    # Ray Data can emit COLUMNLESS empty blocks between stages (observed:
    # "RefBundle with a different schema ... new schema: ."), and
    # pa.concat_tables rejects the mismatched empty schema — drop
    # zero-row tables before concatenating block refs (engine-wide rule).
    id_tables = [
        t
        for t in ray.get(
            pairs.map_batches(
                lambda t: pa.table(
                    {
                        "id": pc.unique(
                            pa.concat_arrays(
                                [
                                    t.column("a").combine_chunks().cast(pa.int64()),
                                    t.column("b").combine_chunks().cast(pa.int64()),
                                ]
                            )
                        )
                    }
                )
                if t.num_rows
                else pa.table({"id": pa.array([], pa.int64())}),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    if not id_tables or sum(t.num_rows for t in id_tables) == 0:
        return rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      metric: pa.array([], pa.float64())})
        )
    wanted = pc.unique(pa.concat_tables(id_tables).column("id").combine_chunks())
    wanted_ref = ray.put(wanted)

    def prune(t: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        keep = pc.is_in(t.column(id_col), value_set=w)
        kept = t.filter(keep)
        return pa.table(
            {"id": kept.column(id_col).cast(pa.int64()), "text": kept.column("text")}
        )

    # pruned text side = candidate texts only (small by the same ≪-corpus
    # assumption as the id set); materialized because BOTH join passes
    # consume it — one corpus scan instead of two
    texts = corpus.select_columns([id_col, "text"]).map_batches(
        prune, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def join_side(
        side: str, pairs_ds: rd.Dataset, text_out: str, cols_keep: list[str]
    ) -> rd.Dataset:
        """One bucketed union-join: attach text of ``side``'s id.
        ``cols_keep`` passed explicitly — calling .schema() here would
        force an extra execution of the upstream pipeline."""

        def tag_pairs(t: pa.Table) -> pa.Table:
            n = t.num_rows
            out = {c: t.column(c) for c in cols_keep}
            out["id"] = t.column(side).cast(pa.int64())
            out["text"] = pa.nulls(n, pa.string())
            out["_is_text"] = pa.nulls(n, pa.bool_()).fill_null(False)
            return pa.table(out)

        def tag_texts(t: pa.Table) -> pa.Table:
            n = t.num_rows
            out = {}
            for c in cols_keep:
                out[c] = pa.nulls(n, pa.int64() if c in ("a", "b") else pa.string())
            out["id"] = t.column("id")
            out["text"] = t.column("text")
            out["_is_text"] = pa.nulls(n, pa.bool_()).fill_null(True)
            return pa.table(out)

        tagged = pairs_ds.map_batches(tag_pairs, batch_format="pyarrow").union(
            texts.map_batches(tag_texts, batch_format="pyarrow")
        )

        def merge_partition(t: pa.Table) -> pa.Table:
            df = t.to_pandas()
            is_text = df["_is_text"].to_numpy()
            tdf = df[is_text][["id", "text"]].rename(columns={"text": text_out})
            pdf = df[~is_text].drop(columns=["text", "_is_text"])
            # cross-band duplicate candidates co-locate here (bucketed by
            # the join id) — dedup in-partition, no dedicated shuffle
            pdf = pdf.drop_duplicates(subset=["a", "b"])
            out = pdf.merge(tdf.drop_duplicates("id"), on="id", how="left").drop(
                columns=["id"]
            )
            # the union null-fill widened a/b to float64 in pandas; pair
            # rows carry no nulls, so restore int64 HERE — downstream
            # tag_pairs/tag_texts then agree on int64 and the union no
            # longer mixes block schemas (the BENCH_r02 RefBundle warnings)
            for c in ("a", "b"):
                out[c] = out[c].astype("int64")
            return pa.Table.from_pandas(out, preserve_index=False)

        return _grouped(
            _bucketed_by(tagged, "id", n_buckets), "_jbucket", n_buckets,
            merge_partition,
        )

    with_a = join_side("a", pairs, "text_a", ["a", "b"])
    with_ab = join_side("b", with_a, "text_b", ["a", "b", "text_a"])

    metric_fn = {"jaccard": jaccard, "containment": containment}[metric]

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        from etl_ray.functions.rounding import round_half_away

        js = [
            metric_fn(ta, tb, k)
            for ta, tb in zip(batch["text_a"], batch["text_b"])
        ]
        batch = batch.copy()
        batch[metric] = round_half_away(np.asarray(js, dtype=np.float64), 6)
        batch = batch[batch[metric] >= threshold]
        out = batch[["a", "b", metric]].copy()
        # the union-join null-fills turned the id columns float — restore
        out["a"] = out["a"].astype("int64")
        out["b"] = out["b"].astype("int64")
        return out

    return with_ab.map_batches(verify, batch_format="pandas")


# --- SimHash -----------------------------------------------------------------

def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (SWAR) — no per-element Python."""
    x = x.astype(np.uint64, copy=True)
    x -= (x >> np.uint64(1)) & np.uint64(0x5555555555555555)
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        x *= np.uint64(0x0101010101010101)
    return (x >> np.uint64(56)).astype(np.int64)

class SimHashStage:
    """32-bit SimHash over the k=3 SHINGLE hashes (SQL-replicable: the
    DuckDB oracle recomputes the same bit-majority vote with 32 grouped
    SUM aggregates over the unnested shingle-hash list).

    Shingles, not bare tokens: this corpus shares a small vocabulary, so
    token-level bit majorities converge and every doc pair looks near-dup
    (measured 26k false pairs at sf0.001); position-sensitive shingles
    decorrelate unrelated docs while planted near-verbatim copies stay
    within the Hamming budget."""

    def simhash(self, text: str) -> int:
        hs = _shingle_hashes(text, 3)
        if len(hs) == 0:
            return 0
        bits = ((hs[:, None] >> np.arange(32, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        score = bits.sum(axis=0) * 2 - len(hs)
        return int(((score > 0).astype(np.uint64) << np.arange(32, dtype=np.uint64)).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas()
        vals = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        return batch.append_column("simhash", pa.array(vals.astype(np.int64)))


def simhash_near_pairs(ds: rd.Dataset, max_hamming: int = 3,
                       id_col: str = "doc_id",
                       n_buckets: int | None = None) -> pa.Table:
    """Near-dup pairs by SimHash Hamming distance ≤ k.

    Bucket by the 4×8-bit bands of the 32-bit signature (pigeonhole: any
    pair within Hamming 3 shares at least one of 4 bands — the banding is
    EXACT, not probabilistic) → groupby band → verify exact Hamming
    inside the group.
    """
    sig = ds.map_batches(lambda b: SimHashStage()(b), batch_format="pyarrow",
                         batch_size=2048)
    n_buckets = n_buckets or default_buckets()

    def explode(batch: pa.Table) -> pa.Table:
        s = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        outs = []
        for band in range(4):
            piece = (s >> np.uint64(band * 8)) & np.uint64(0xFF)
            with np.errstate(over="ignore"):
                bucket = (
                    (np.uint64(band) * np.uint64(0x9E3779B97F4A7C15)) ^ piece
                ) % np.uint64(n_buckets)
            outs.append(
                pa.table(
                    {
                        "band_id": pa.array(np.full(len(s), band, dtype=np.int32)),
                        "band_val": pa.array(piece.astype(np.int64)),
                        id_col: pa.array(ids),
                        "simhash": pa.array(s.astype(np.int64)),
                        "bucket": pa.array(bucket.astype(np.int32)),
                    }
                )
            )
        return pa.concat_tables(outs)

    bands = sig.map_batches(explode, batch_format="pyarrow")

    def verify_partition(t: pa.Table) -> pa.Table:
        """Whole-partition vectorized verify (one call per shuffle bucket,
        not per (band, value) group — same rationale as
        candidate_pairs_partition)."""
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "hamming": pa.array([], pa.int64())})
        if t.num_rows < 2:
            return empty
        band = t.column("band_id").to_numpy(zero_copy_only=False)
        val = t.column("band_val").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        hs = t.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((ids, val, band))
        band, val, ids, hs = band[order], val[order], ids[order], hs[order]
        new_run = np.empty(len(ids), dtype=bool)
        new_run[0] = True
        new_run[1:] = (band[1:] != band[:-1]) | (val[1:] != val[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(ids))
        out_a, out_b, out_h = [], [], []
        for s0, e0 in zip(starts, ends):
            if e0 - s0 < 2:
                continue
            gi, gh = ids[s0:e0], hs[s0:e0]
            _, uniq_idx = np.unique(gi, return_index=True)
            gi, gh = gi[uniq_idx], gh[uniq_idx]
            if len(gi) < 2:
                continue
            ai, bi = np.triu_indices(len(gi), k=1)
            x = gh[ai] ^ gh[bi]
            ham = _popcount64(x)
            keep = ham <= max_hamming
            out_a.append(gi[ai][keep])
            out_b.append(gi[bi][keep])
            out_h.append(ham[keep])
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "hamming": pa.array(np.concatenate(out_h).astype(np.int64)),
            }
        )

    pairs = _grouped(bands, "bucket", n_buckets, verify_partition)
    res = to_pandas_typed(pairs, _EMPTY_HAMMING).drop_duplicates(
        subset=["a", "b"]
    ).sort_values(["a", "b"])
    return pa.Table.from_pandas(res.reset_index(drop=True), preserve_index=False)
