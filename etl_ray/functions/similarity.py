"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE
via ``ray.put`` and every ``map_batches`` task does one numpy matmul per
batch (never re-shipped per batch). Scale path: LSH-bucketed variant
(random-hyperplane signs → bucket groupby → in-bucket brute force) that
turns the all-pairs scan into a per-bucket scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from etl_ray.functions.rounding import round_half_away
from etl_ray.stages.keyed import bucketed_groups, to_pandas_typed


def _topk_merge(cand: rd.Dataset, k: int, exclude_self: bool) -> pa.Table:
    """Distributed top-k merge of (query_id, neighbor_id, sim) candidates.

    Bucketed by query hash — ONE vectorized sort + cython
    ``groupby.head`` per partition, never a per-query Python dispatch
    (stages/keyed.py pattern).
    """

    def topk_partition(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if exclude_self:
            df = df[df["neighbor_id"] != df["query_id"]]
        df = df.sort_values(
            ["query_id", "sim", "neighbor_id"],
            ascending=[True, False, True], kind="stable",
        )
        df = df.groupby("query_id", sort=False).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    empty_topk = pa.table(
        {"query_id": pa.array([], pa.int64()),
         "neighbor_id": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())}
    )
    res = to_pandas_typed(
        bucketed_groups(cand, "query_id", topk_partition), empty_topk
    ).sort_values(["query_id", "sim", "neighbor_id"],
                  ascending=[True, False, True])
    return pa.Table.from_pandas(res.reset_index(drop=True), preserve_index=False)


def _matrix(batch_embeddings) -> np.ndarray:
    return np.stack(batch_embeddings.to_pandas().to_numpy()).astype(np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _partial_topk(
    q_ids: np.ndarray, sims: np.ndarray, ids: np.ndarray, k: int
) -> pa.Table:
    """Per-batch partial top-k: emit ≤ n_queries × k candidate rows.

    ``sims`` is the rounded (n_queries × n_rows) matrix. Selection is one
    row-wise ``np.lexsort`` on the composite key (sim desc, neighbor_id
    asc) — EXACTLY the final merge's order, so a boundary tie can never
    prune a neighbor the global order would keep (argpartition broke
    boundary ties arbitrarily; with sims rounded to 6 dp such ties are
    common). Emits ≤ n_queries × k rows; no per-query Python loop."""
    nq, nb = sims.shape
    if nb == 0 or nq == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "sim": pa.array([], pa.float64()),
            }
        )
    kk = min(k, nb)
    order = np.lexsort(
        (np.broadcast_to(ids, sims.shape), -sims), axis=1
    )[:, :kk]
    sel_ids = ids[order]  # (nq, kk)
    sel_sims = np.take_along_axis(sims, order, axis=1)
    return pa.table(
        {
            "query_id": pa.array(np.repeat(q_ids, kk).astype(np.int64)),
            "neighbor_id": pa.array(sel_ids.ravel().astype(np.int64)),
            "sim": pa.array(sel_sims.ravel().astype(np.float64)),
        }
    )


class BruteForceTopK:
    """Per-batch cosine top-k against broadcast queries (run task-based —
    see knn_cosine; construction is one zero-copy plasma get).

    ``__init__`` fetches the query matrix (``ray.get`` of a
    ``ray.put`` handle) and pre-normalizes it; ``__call__`` is one matmul
    per batch followed by a PARTIAL top-(k+1) (argpartition) — the stage
    emits ≤ n_queries × (k+1) rows per batch, never the full sim matrix
    (k+1 so the final merge can still drop a self-match without
    starving)."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id"):
        q = ray.get(queries_ref)
        self.q_ids = q["ids"]
        self.q_mat = _normalize(q["matrix"])
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # Ray Data can emit empty blocks
            return _partial_topk(
                np.empty(0, np.int64), np.empty((0, 0)), np.empty(0, np.int64), 1
            )
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(batch.column("embedding")))
        sims = round_half_away(self.q_mat @ m.T, 6)  # (n_queries, batch)
        return _partial_topk(self.q_ids, sims, ids, self.k + 1)


def knn_cosine(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    exclude_self: bool = True,
) -> pa.Table:
    """Exact cosine top-k for each query id (brute force baseline).

    Ties broken by neighbor_id ascending; sims rounded to 6 dp BEFORE
    ranking so results are stable across engines and summation orders.
    """
    qset = pa.array(list(query_ids), pa.int64())
    qrows = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(id_col), value_set=qset)),
        batch_format="pyarrow",
    ).take_all()
    qrows.sort(key=lambda r: r[id_col])
    qref = ray.put(
        {
            "ids": np.array([r[id_col] for r in qrows], dtype=np.int64),
            "matrix": np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows]),
        }
    )
    # TASK-based stage, not an actor pool: the per-worker state here is
    # one ray.get of the broadcast handle + a tiny normalize — trivial
    # enough that spawning a pool of actors costs more than it saves
    # (measured: the 16-actor pool added ~1.5 s to a 2k-row scan; plasma
    # serves the query matrix zero-copy to every task on the node).
    def scan(batch: pa.Table) -> pa.Table:
        return BruteForceTopK(qref, k, id_col)(batch)

    cand = ds.map_batches(scan, batch_format="pyarrow", batch_size=4096)
    return _topk_merge(cand, k, exclude_self)


class LshBucketStage:
    """Random-hyperplane LSH: sign-bit bucket id per row (seeded planes
    built once per actor). Vectors in the same bucket are near-duplicates
    candidates; brute force runs within buckets only."""

    def __init__(self, dim: int, n_planes: int = 12, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((n_planes, dim))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _matrix(batch.column("embedding"))
        signs = (m @ self.planes.T) > 0
        bucket = np.zeros(len(m), dtype=np.int64)
        for i in range(signs.shape[1]):
            bucket |= signs[:, i].astype(np.int64) << i
        return batch.append_column("bucket", pa.array(bucket))


def rademacher_signs(n_tables: int, n_planes: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes from the fmix32 parity bit — the
    SQL-replicable plane family (sign-random-projection with Rademacher
    entries is a valid cosine LSH; Charikar 2002 needs only symmetric
    zero-mean directions, not Gaussians). Key layout
    ``(table*n_planes + plane)*65536 + dim`` is replayed verbatim by the
    oracle (see NEARDUP_SQL in pipelines/queries.py)."""
    from etl_ray.functions.sketch import _fmix32

    tp = np.arange(n_tables * n_planes, dtype=np.int64)
    keys = (tp[:, None] * 65536 + np.arange(dim, dtype=np.int64)[None, :]).reshape(-1)
    bits = _fmix32(keys.astype(np.uint64)) & np.uint64(1)
    return np.where(bits == 1, 1, -1).astype(np.int64).reshape(
        n_tables * n_planes, dim
    )


def lsh_near_duplicates(
    ds: rd.Dataset,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
    n_tables: int = 1,
    sql_exact: bool = False,
) -> pa.Table:
    """Embedding near-dup pairs (cosine ≥ threshold) via LSH buckets.

    Approximate: pairs split across every table's buckets are missed.
    ``n_tables > 1`` is the MULTI-TABLE recall path — each row hashes
    into ``n_tables`` independent plane sets (distinct seeds) and a pair
    is found if ANY table co-buckets it (miss probability decays
    exponentially in n_tables). All tables ride the SAME single shuffle:
    rows are exploded ×n_tables with a composite (table, bucket) key, so
    recall costs bandwidth, not extra exchanges. Duplicated findings
    across tables are dropped at the tiny pair set, never recomputed
    against the corpus.

    ``sql_exact=True`` switches the plane family from seeded Gaussians
    to :func:`rademacher_signs` and the bucket-bit test to an EXACT
    integer dot over micro-quantized embeddings
    (``round_half_away(x*1e6)`` as int64 — order-independent, so numpy's
    sum order and DuckDB's agree bit-for-bit), making the whole pair set
    hash-gateable against a DuckDB oracle that replays the bucketing
    constant-for-constant. Scale shape is unchanged: one bucket
    exchange, in-bucket verify only, never a corpus materialization.
    """
    dim = len(ds.take(1)[0]["embedding"])

    signs = rademacher_signs(n_tables, n_planes, dim) if sql_exact else None

    # task-based: plane generation from a fixed seed is microseconds —
    # an actor pool's spawn cost dwarfs the state it would keep
    def lsh_bucket(batch: pa.Table) -> pa.Table:
        if sql_exact:
            m = _matrix(batch.column("embedding"))
            q = round_half_away(m * 1e6, 0).astype(np.int64)
            dots = q @ signs.T                      # (rows, n_tables*n_planes), exact
            bits = (dots > 0).astype(np.int64)
            outs = []
            for ti in range(n_tables):
                bkt = np.zeros(batch.num_rows, dtype=np.int64)
                for p in range(n_planes):
                    bkt |= bits[:, ti * n_planes + p] << p
                outs.append(batch.append_column(
                    "bucket", pa.array(bkt + (ti << n_planes))))
            return pa.concat_tables(outs)
        outs = []
        for ti in range(n_tables):
            t = LshBucketStage(dim=dim, n_planes=n_planes, seed=7 + ti)(batch)
            bkt = t.column("bucket").to_numpy(zero_copy_only=False)
            outs.append(
                t.set_column(
                    t.column_names.index("bucket"),
                    "bucket",
                    pa.array(bkt + (ti << n_planes)),
                )
            )
        return pa.concat_tables(outs)

    b = ds.map_batches(lsh_bucket, batch_format="pyarrow", batch_size=4096)

    def pairs_partition(t: pa.Table) -> pa.Table:
        """Whole-partition verify: ONE lexsort + run detection over a
        shuffle partition holding many whole LSH buckets (2^n_planes tiny
        buckets would otherwise each pay a Python dispatch — the
        candidate_pairs_partition pattern, stages/keyed.py)."""
        empty = pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                          "sim": pa.array([], pa.float64())})
        if t.num_rows < 2:
            return empty
        bucket = t.column("bucket").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        m = _normalize(np.stack(t.column("embedding").to_pandas().to_numpy()).astype(np.float64))
        order = np.lexsort((ids, bucket))
        bucket, ids, m = bucket[order], ids[order], m[order]
        new_run = np.empty(len(ids), dtype=bool)
        new_run[0] = True
        new_run[1:] = bucket[1:] != bucket[:-1]
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(ids))
        out_a, out_b, out_s = [], [], []
        for s0, e0 in zip(starts, ends):  # touches only buckets with ≥2 rows
            if e0 - s0 < 2:
                continue
            gi, gm = ids[s0:e0], m[s0:e0]
            sims = gm @ gm.T
            ai, bi = np.triu_indices(len(gi), k=1)
            s = round_half_away(sims[ai, bi], 6)
            keep = s >= threshold
            a, bb = gi[ai][keep], gi[bi][keep]
            out_a.append(np.minimum(a, bb))
            out_b.append(np.maximum(a, bb))
            out_s.append(s[keep])
        if not out_a:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(out_a).astype(np.int64)),
                "b": pa.array(np.concatenate(out_b).astype(np.int64)),
                "sim": pa.array(np.concatenate(out_s).astype(np.float64)),
            }
        )

    pairs = bucketed_groups(b, "bucket", pairs_partition)
    empty_pairs = pa.table(
        {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
         "sim": pa.array([], pa.float64())}
    )
    res = to_pandas_typed(pairs, empty_pairs).drop_duplicates(
        subset=["a", "b"]
    ).sort_values(["a", "b"])
    return pa.Table.from_pandas(res.reset_index(drop=True), preserve_index=False)


def brute_force_near_duplicates(
    ds: rd.Dataset, threshold: float = 0.95, id_col: str = "vec_id",
    predicate=None,
) -> pa.Table:
    """Exact near-dup pairs — one side broadcast, the other streamed.

    ``predicate``: optional vectorized fn ``pa.Table -> boolean mask``
    restricting the pair domain. Suitable when the filtered side fits in
    memory; for symmetric all-pairs at scale use ``lsh_near_duplicates``.
    """
    # fuse filter + projection into ONE map: a separate select_columns
    # stage downstream of the filter would receive the filter's 0-row
    # blocks as INPUT, and Ray forwards empty input blocks as schemaless
    # RefBundles (warning noise + schema instability)
    def prune(t: pa.Table) -> pa.Table:
        if predicate is not None:
            t = t.filter(predicate(t))
        return t.select([id_col, "embedding"])

    rows = ds.map_batches(prune, batch_format="pyarrow").take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    m = _normalize(np.stack([np.asarray(r["embedding"], np.float64) for r in rows]))
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    sims = m @ m.T
    ai, bi = np.triu_indices(len(ids), k=1)
    s = round_half_away(sims[ai, bi], 6)
    keep = s >= threshold
    return pa.table(
        {
            "a": pa.array(ids[ai][keep]),
            "b": pa.array(ids[bi][keep]),
            "sim": pa.array(s[keep]),
        }
    )


class IvfIndexStage:
    """IVF-style ANN assignment stage: nearest-centroid id per row.

    Centroids are a broadcast matrix (``ray.put`` once, fetched per actor
    in ``__init__``); assignment is one matmul per batch. With the lake's
    discipline this is the 'coarse quantizer' of a classic IVF index —
    vectors co-locate by centroid for probe-limited search.
    """

    def __init__(self, centroids_ref):
        self.centroids = _normalize(ray.get(centroids_ref))

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_matrix(batch.column("embedding")))
        # round BEFORE argmax (ties → smallest centroid id, np.argmax
        # first-max rule) so assignment is reproducible across engines —
        # the SQL oracle ranks by (round(sim,6) DESC, cid ASC)
        sims = round_half_away(m @ self.centroids.T, 6)
        assign = np.argmax(sims, axis=1).astype(np.int32)
        return batch.append_column("centroid_id", pa.array(assign))


class IvfScanStage:
    """Actor-pool probe-limited scan: one matmul per batch vs the
    broadcast query matrix, probe-masked by each row's centroid, then a
    partial top-(k+1) — emits ≤ n_queries × (k+1) rows per batch."""

    def __init__(self, scan_ref, k: int, id_col: str = "vec_id"):
        s = ray.get(scan_ref)
        self.q_ids = s["ids"]
        self.q_mat = s["matrix"]  # already normalized
        self.probe = s["probe"]  # (n_queries, n_centroids) bool
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        cent_ids = batch.column("centroid_id").to_numpy(zero_copy_only=False)
        m = _normalize(_matrix(batch.column("embedding")))
        sims = round_half_away(self.q_mat @ m.T, 6)
        allowed = self.probe[:, cent_ids]  # (n_queries, batch)
        sims = np.where(allowed, sims, -np.inf)
        t = _partial_topk(self.q_ids, sims, ids, self.k + 1)
        return t.filter(pc.greater(t.column("sim"), float("-inf")))


class IvfFusedScanStage:
    """Assign + probe-filter + scan fused into ONE stage: holds both the
    centroid matrix and the query/probe state. Run task-based (state =
    two zero-copy plasma gets); fusing also means no stacked stages
    competing for CPUs."""

    def __init__(self, centroids_ref, scan_ref, wanted, k: int, id_col: str = "vec_id"):
        self.index = IvfIndexStage(centroids_ref)
        self.scan = IvfScanStage(scan_ref, k, id_col)
        self.wanted = wanted

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _partial_topk(
                np.empty(0, np.int64), np.empty((0, 0)), np.empty(0, np.int64), 1
            )
        b = self.index(batch)
        b = b.filter(pc.is_in(b.column("centroid_id"), value_set=self.wanted))
        if b.num_rows == 0:
            return _partial_topk(
                np.empty(0, np.int64), np.empty((0, 0)), np.empty(0, np.int64), 1
            )
        return self.scan(b)


def ivf_topk(
    ds: rd.Dataset,
    query_ids: list[int],
    k: int = 10,
    n_probe: int = 3,
    id_col: str = "vec_id",
    centroid_stride: int = 50,
    max_centroids: int = 4096,
) -> pa.Table:
    """Approximate cosine top-k via an IVF coarse index.

    Deterministic 'training': every ``centroid_stride``-th vector (by id)
    is a centroid — seedless and reproducible (real systems run k-means;
    the index mechanics are identical). Each vector is assigned to its
    nearest centroid (one matmul, broadcast centroids); each query probes
    only its ``n_probe`` nearest centroid buckets — the scan shrinks by
    ~``centroid_stride / n_probe`` at some recall cost
    (tests pin recall ≥ 0.6 vs the brute-force baseline).

    ``max_centroids`` bounds the broadcast centroid matrix (the one
    driver-side collect): at 10^10 rows a fixed stride would collect
    n/stride vectors, so the stride is widened to keep ≤ max_centroids
    (``ds.count()`` is parquet-metadata-cheap on source datasets; pass a
    pre-widened stride when ``ds`` is a transformed pipeline).
    """
    n_rows = ds.count()
    if n_rows > centroid_stride * max_centroids:
        centroid_stride = -(-n_rows // max_centroids)  # ceil div
    cent_rows = ds.map_batches(
        lambda t: t.filter(
            pa.array(
                (t.column(id_col).to_numpy(zero_copy_only=False) % centroid_stride) == 0
            )
        ),
        batch_format="pyarrow",
    ).take_all()
    cent_rows.sort(key=lambda r: r[id_col])
    cent = np.stack([np.asarray(r["embedding"], np.float64) for r in cent_rows])
    cent_ref = ray.put(cent)

    qset = pa.array(list(query_ids), pa.int64())
    qrows = ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column(id_col), value_set=qset)),
        batch_format="pyarrow",
    ).take_all()
    qrows.sort(key=lambda r: r[id_col])
    q_mat = _normalize(np.stack([np.asarray(r["embedding"], np.float64) for r in qrows]))
    q_ids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    # probe membership as a dense (n_queries × n_centroids) bool matrix —
    # tiny, broadcast once with the query matrix. Rounded sims + STABLE
    # argsort → ties resolve to the smaller centroid id, matching the
    # SQL oracle's (sim DESC, cid ASC) ranking
    probe_sims = round_half_away(q_mat @ _normalize(cent).T, 6)
    probe = np.argsort(-probe_sims, axis=1, kind="stable")[:, :n_probe]
    probe_mat = np.zeros((len(q_ids), len(cent)), dtype=bool)
    probe_mat[np.arange(len(q_ids))[:, None], probe] = True
    wanted = pa.array(sorted({int(c) for row in probe for c in row}), pa.int32())
    scan_ref = ray.put({"ids": q_ids, "matrix": q_mat, "probe": probe_mat})

    # ONE fused pass does assign → probe-filter → scan per batch. Each
    # batch computes sims vs all queries, masks rows whose centroid a
    # query does not probe, and emits a partial top-k — no driver
    # materialization. TASK-based: the stage's per-worker state is two
    # zero-copy plasma gets, so an actor pool (plus its spawn cost and
    # producer-starvation sizing constraints) buys nothing here.
    def fused_scan(batch: pa.Table) -> pa.Table:
        return IvfFusedScanStage(cent_ref, scan_ref, wanted, k, id_col)(batch)

    cand = ds.map_batches(fused_scan, batch_format="pyarrow", batch_size=4096)
    return _topk_merge(cand, k, exclude_self=True)


# --- distributed k-means (Lloyd) ----------------------------------------------

def _milli_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Embedding list column → (n, d) int64 milli-unit matrix. The
    quantization (round(x*1000) half-away) makes EVERY k-means quantity
    exact integer math or an IEEE-exact int/int division — assignments
    and means are then bit-identical between the engine and the SQL
    oracle regardless of summation order."""
    m = np.stack(col.to_pandas().to_numpy()).astype(np.float64)
    return round_half_away(m * 1000.0, 0).astype(np.int64)


def kmeans_lloyd(
    ds: rd.Dataset, k: int = 8, iters: int = 2, id_col: str = "vec_id"
) -> pd.DataFrame:
    """Distributed Lloyd k-means over an embedding column — the
    iterative-algorithm shape: per iteration, centroids are broadcast
    ONCE (``ray.put``), one ``map_batches`` pass computes exact integer
    squared distances + per-(cluster, dim) partial sums (k × d rows per
    batch, never the points), and a tiny grouped-sum merge yields the
    next centroids. Data transits the cluster once per iteration; the
    driver only ever sees k × d aggregates.

    Determinism: init = the k smallest ``id_col`` rows; ties in the
    argmin break to the smaller cluster id; intermediate centroids are
    re-quantized to micro-units so every iteration's distances stay
    exact integers (see ``_milli_matrix``). Empty clusters drop out
    (documented; the SQL oracle's GROUP BY does the same).

    Returns one row per (cluster_id, dim): final centroid value
    (rounded 6) + the cluster's point count.
    """
    from etl_ray.stages.agg import grouped_sum

    if iters < 1:
        raise ValueError(f"kmeans_lloyd: iters must be >= 1, got {iters}")

    empty_init = pa.table({
        "_id": pa.array([], pa.int64()),
        "_v": pa.array([], pa.list_(pa.int64())),
    })

    def init_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not t.column_names:
            return empty_init
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")[:k]
        X = _milli_matrix(t.column("embedding"))[order]
        return pa.table({"_id": pa.array(ids[order].astype(np.int64)),
                         "_v": pa.array(list(X))})

    # k-bounded partials per block → driver sees ≤ k × blocks rows
    parts = [
        t for t in ray.get(
            ds.map_batches(init_partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        raise ValueError("kmeans_lloyd: empty input dataset")
    init = pa.concat_tables(parts)
    order = np.argsort(init.column("_id").to_numpy(zero_copy_only=False),
                       kind="stable")[:k]
    C = np.stack(
        init.column("_v").to_pandas().to_numpy()[order]
    ).astype(np.int64)            # (k_eff, d) milli units
    cids = np.arange(len(C), dtype=np.int64)

    empty_part = pa.table({
        "cid": pa.array([], pa.int64()),
        "dim": pa.array([], pa.int64()),
        "s": pa.array([], pa.int64()),
        "n": pa.array([], pa.int64()),
    })

    def assign_pass(c_ref, scale: int):
        """One Lloyd pass: exact distances at ``scale`` (1 = milli init,
        1000 = micro re-quantized centroids), per-(cid, dim) partials."""

        def fn(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or not t.column_names:
                return empty_part
            cc = ray.get(c_ref)
            cen, ids_c = cc["C"], cc["cids"]
            X = _milli_matrix(t.column("embedding"))
            Xs = X * scale
            # int64 overflow guard: worst-case Σ_d (Δ)² must fit 2^63
            # (micro-scaled values near 1e7 at d≈512 approach the edge —
            # unbounded Python ints make the bound check itself safe)
            m = max(int(np.abs(Xs).max(initial=0)),
                    int(np.abs(cen).max(initial=0)))
            if m and X.shape[1] * (2 * m) ** 2 >= 2 ** 63:
                raise OverflowError(
                    "kmeans_lloyd: |embedding| too large for exact int64 "
                    f"distance math (max quantized magnitude {m} at "
                    f"d={X.shape[1]})")
            # (n, k, d) int64 — exact; batch × k × d bounded by batch_size
            d2 = ((Xs[:, None, :] - cen[None, :, :]) ** 2).sum(axis=2)
            pos = np.argmin(d2, axis=1)  # first min = smallest cid
            kk, d = len(cen), X.shape[1]
            S = np.zeros((kk, d), dtype=np.int64)
            np.add.at(S, pos, X)
            n = np.bincount(pos, minlength=kk).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.repeat(ids_c, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), kk)),
                "s": pa.array(S.ravel()),
                "n": pa.array(np.repeat(n, d)),
            })

        return fn

    stats = None
    for it in range(iters):
        scale = 1 if it == 0 else 1000
        c_ref = ray.put({"C": C, "cids": cids})
        folded = grouped_sum(
            ds.map_batches(assign_pass(c_ref, scale), batch_format="pyarrow",
                           zero_copy_batch=True),
            ["cid", "dim"], empty_part,
        )
        folded = folded[folded["n"] > 0]          # empty clusters drop out
        folded = folded.sort_values(["cid", "dim"], ignore_index=True)
        stats = folded
        if it < iters - 1:
            # micro-unit re-quantization: mean = exact_int_sum / count is
            # IEEE-identical on both engines; the round pins iteration
            # it+1's centroids to integers so its distances stay exact
            mean_milli = folded["s"].to_numpy() / folded["n"].to_numpy()
            micro = round_half_away(mean_milli * 1000.0, 0).astype(np.int64)
            d = int(folded["dim"].max())
            C = micro.reshape(-1, d)
            cids = folded["cid"].to_numpy()[::d].astype(np.int64)

    out = stats.copy()
    out["centroid"] = round_half_away(
        out["s"].to_numpy() / out["n"].to_numpy() / 1000.0, 6)
    out = out.rename(columns={"cid": "cluster_id", "n": "n_points"})
    out["cluster_id"] = out["cluster_id"].astype("int64")
    out["dim"] = out["dim"].astype("int64")
    out["n_points"] = out["n_points"].astype("int64")
    return out[["cluster_id", "dim", "centroid", "n_points"]].sort_values(
        ["cluster_id", "dim"], ignore_index=True)


# --- int8 scalar quantization --------------------------------------------------

def quantize_minmax(ds: rd.Dataset) -> np.ndarray:
    """Global per-dimension (min, max) of the embedding column — the
    scalar-quantization calibration pass. Per-batch partials are (d, 2)
    arrays; the fold is min/max (exact, order-free), collected driver-side
    at d-bounded size. Returns float64 (d, 2)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not t.column_names:
            return pa.table({"dim": pa.array([], pa.int64()),
                             "mn": pa.array([], pa.float64()),
                             "mx": pa.array([], pa.float64())})
        m = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(
            np.float64)
        d = m.shape[1]
        return pa.table({"dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                         "mn": pa.array(m.min(axis=0)),
                         "mx": pa.array(m.max(axis=0))})

    parts = [
        t for t in ray.get(
            ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).to_arrow_refs())
        if t.num_rows
    ]
    if not parts:
        return np.empty((0, 2), dtype=np.float64)
    df = pa.concat_tables(parts).to_pandas()
    g = df.groupby("dim", sort=True).agg(mn=("mn", "min"), mx=("mx", "max"))
    return np.stack([g["mn"].to_numpy(), g["mx"].to_numpy()], axis=1)


def quantize_codes(ds: rd.Dataset, ranges: np.ndarray,
                   id_col: str = "vec_id") -> rd.Dataset:
    """int8-style scalar quantization: code = round((x-mn)/(mx-mn)*255)
    per dimension (0 when the dimension is constant). The op sequence is
    shared verbatim with the SQL oracle, so codes are bit-identical.
    Returns a Dataset of (id, codes list<int64>)."""
    ref = ray.put(ranges)
    empty = pa.table({id_col: pa.array([], pa.int64()),
                      "codes": pa.array([], pa.list_(pa.int64()))})

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or not t.column_names:
            return empty
        r = ray.get(ref)
        mn, mx = r[:, 0], r[:, 1]
        span = mx - mn
        m = np.stack(t.column("embedding").to_pandas().to_numpy()).astype(
            np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            c = round_half_away((m - mn) / span * 255.0, 0)
        c = np.where(span == 0, 0, c).astype(np.int64)
        return pa.table({id_col: t.column(id_col),
                         "codes": pa.array(list(c))})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
