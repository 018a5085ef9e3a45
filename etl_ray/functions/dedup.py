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


# --- exact dedup -------------------------------------------------------------

def add_sha256(batch: pa.Table, text_col: str = "text", out: str = "content_sha256") -> pa.Table:
    texts = batch.column(text_col).to_pandas()
    hashes = [hashlib.sha256((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column(out, pa.array(hashes, pa.string()))


def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """Keep the min-id row per identical content hash.

    hash column via map_batches → ``groupby(hash)`` (hash-partitioned, so
    each group lands wholly in one task) → min-id winner per group.
    """
    ds = ds.map_batches(
        lambda b: add_sha256(b, text_col), batch_format="pyarrow", zero_copy_batch=True
    )

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(id_col).head(1)

    return ds.groupby("content_sha256").map_groups(first, batch_format="pandas")


# --- shingles + MinHash ------------------------------------------------------

_TOKEN_RE = re.compile(r"\S+")


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """uint64 hashes of the k-token shingles of a document."""
    toks = _TOKEN_RE.findall((text or "").lower())
    if len(toks) < k:
        joined = [" ".join(toks)] if toks else []
    else:
        joined = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not joined:
        return np.empty(0, dtype=np.uint64)
    # vectorized SipHash over the shingle strings (C loop, not Python)
    return pd.util.hash_array(
        np.asarray(joined, dtype=object), hash_key="etl_ray_shingle1", categorize=False
    )


class MinHashStage:
    """Actor-pool stage: per-doc MinHash signature (n_perm permutations).

    Permutation parameters are derived ONCE per actor in ``__init__`` from
    a fixed seed (stateful-stage discipline); per batch the signature is a
    vectorized min over (a*x + b) universal hashes of the shingle set.
    """

    PRIME = np.uint64(0xFFFFFFFFFFFFFFC5)

    def __init__(self, n_perm: int = 128, k: int = 5, seed: int = 1337):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, 1 << 61, size=n_perm, dtype=np.uint64) | np.uint64(1)
        self.b = rng.integers(0, 1 << 61, size=n_perm, dtype=np.uint64)
        self.n_perm = n_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        if len(sh) == 0:
            return np.full(self.n_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        # (n_perm, n_shingles) universal hash, min over shingles
        vals = (np.outer(self.a, sh) + self.b[:, None]) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas()
        sigs = np.stack([self.signature(t) for t in texts])
        return batch.append_column(
            "minhash", pa.array(list(sigs.astype(np.int64)), pa.list_(pa.int64(), self.n_perm))
        )


def lsh_band_rows(batch: pa.Table, n_bands: int = 16, id_col: str = "doc_id") -> pa.Table:
    """Explode signatures into (band_id, band_hash, id) rows — the LSH
    bucketing key for the candidate ``groupby``."""
    sigs = np.stack(batch.column("minhash").to_pandas().to_numpy())
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    n, n_perm = sigs.shape
    r = n_perm // n_bands
    band_ids, band_hashes, out_ids = [], [], []
    for bnd in range(n_bands):
        seg = np.ascontiguousarray(sigs[:, bnd * r : (bnd + 1) * r]).astype(np.uint64)
        h = seg[:, 0].copy()
        for j in range(1, r):
            h = (h * np.uint64(1000003)) ^ seg[:, j]
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
    n_perm: int = 128,
    n_bands: int = 16,
    k: int = 5,
    id_col: str = "doc_id",
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline:

    shingle→minhash (actor pool) → band explode → groupby(band) →
    candidate pairs → distinct → exact-Jaccard verify (broadcast text
    lookup) → pairs with jaccard ≥ threshold.

    The text side-table for verification is broadcast via ``ray.put`` —
    appropriate while candidates ≪ corpus; for 100 TB corpora swap the
    verify stage for a bucketed join on ``a``'s partition (documented
    partitioning assumption).
    """
    import ray

    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"n_perm": n_perm, "k": k},
        batch_format="pyarrow",
        concurrency=2,
        batch_size=1024,
    )
    bands = sigs.map_batches(
        lambda b: lsh_band_rows(b, n_bands=n_bands, id_col=id_col),
        batch_format="pyarrow",
    )
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: candidate_pairs(g, id_col), batch_format="pandas"
    )
    pairs_t = pairs.to_pandas().drop_duplicates().reset_index(drop=True)
    if pairs_t.empty:
        return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})

    texts = {r[id_col]: r["text"] for r in ds.select_columns([id_col, "text"]).take_all()}
    texts_ref = ray.put(texts)

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(texts_ref)
        js = [jaccard(lookup[a], lookup[b], k) for a, b in zip(batch["a"], batch["b"])]
        batch = batch.copy()
        from etl_ray.functions.rounding import round_half_away
        batch["jaccard"] = round_half_away(np.asarray(js), 6)
        return batch[batch["jaccard"] >= threshold]

    out = rd.from_pandas(pairs_t).map_batches(verify, batch_format="pandas")
    res = out.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False)


# --- SimHash -----------------------------------------------------------------

class SimHashStage:
    """64-bit SimHash over token hashes (stateless math, stateful regex)."""

    def __init__(self):
        self.token = _TOKEN_RE

    def simhash(self, text: str) -> int:
        toks = self.token.findall((text or "").lower())
        if not toks:
            return 0
        hs = pd.util.hash_array(
            np.asarray(toks, dtype=object), hash_key="etl_ray_simhash1", categorize=False
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        score = bits.sum(axis=0) * 2 - len(hs)
        out = np.uint64(0)
        for i in np.nonzero(score > 0)[0]:
            out |= np.uint64(1) << np.uint64(i)
        return int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pandas()
        vals = np.array([self.simhash(t) for t in texts], dtype=np.uint64)
        return batch.append_column("simhash", pa.array(vals.astype(np.int64)))


def simhash_near_pairs(ds: rd.Dataset, max_hamming: int = 3, id_col: str = "doc_id") -> pa.Table:
    """Near-dup pairs by SimHash Hamming distance ≤ k.

    Bucket by the 4×16-bit bands of the signature (pigeonhole: any pair
    within Hamming 3 shares at least one of 4 bands) → groupby band →
    verify exact Hamming inside the group.
    """
    sig = ds.map_batches(SimHashStage, batch_format="pyarrow", concurrency=2, batch_size=2048)

    def explode(batch: pa.Table) -> pa.Table:
        s = batch.column("simhash").to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        outs = []
        for band in range(4):
            piece = (s >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            outs.append(
                pa.table(
                    {
                        "band_id": pa.array(np.full(len(s), band, dtype=np.int32)),
                        "band_val": pa.array(piece.astype(np.int64)),
                        id_col: pa.array(ids),
                        "simhash": pa.array(s.astype(np.int64)),
                    }
                )
            )
        return pa.concat_tables(outs)

    bands = sig.map_batches(explode, batch_format="pyarrow")

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []}, dtype=np.int64)
        ai, bi = np.triu_indices(len(ids), k=1)
        x = hs[ai] ^ hs[bi]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= verify.max_hamming
        return pd.DataFrame({"a": ids[ai][keep], "b": ids[bi][keep], "hamming": ham[keep]})

    verify.max_hamming = max_hamming
    pairs = bands.groupby(["band_id", "band_val"]).map_groups(verify, batch_format="pandas")
    res = pairs.to_pandas().drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"])
    return pa.Table.from_pandas(res.reset_index(drop=True), preserve_index=False)
