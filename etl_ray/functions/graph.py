"""Connected components over an edge Dataset — duplicate-CLUSTER
resolution, the step between near-dup pair discovery and a deduplicated
corpus (pairs → components → one canonical doc per component).

Reference semantic: the exact-dedup discipline picks ONE winner per
duplicate group (``etl/insert/bulk_inserter.py:59-113`` ensure/NOT-IN
scans); near-dup pairs generalize the group to a graph whose components
are the duplicate clusters, and the canonical representative is the
component minimum (min-label a.k.a. hash-to-min propagation).

Ray shape — Pregel supersteps, not a driver-side union-find:

- Edges are normalized to BOTH directions and materialized ONCE (they
  are re-read every superstep; the input pair set is tiny relative to
  the corpus — only docs that appear in some pair).
- Labels (node → current component min) are re-materialized per
  superstep so the lazy lineage never replays earlier rounds
  (the standard iterative-algorithm rule for Ray Data).
- One superstep = ``shuffle_join`` (ship each node's label to its
  out-edges, ONE exchange) + a bucketed min-groupby (gather incoming
  candidates at their target node, ONE exchange). All routing goes
  through the known-boundary direct exchange (stages/keyed.py).
- Convergence: under min-propagation ``sum(label)`` is monotonically
  non-increasing and strictly decreases until the fixpoint, so the loop
  stops when the sum repeats — a scalar aggregate per superstep, never
  a driver-side diff of the label table. Supersteps needed = component
  diameter (bounded by ``max_supersteps`` as a runaway backstop).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from etl_ray.stages.joins import shuffle_join
from etl_ray.stages.keyed import bucketed_groups, to_pandas_typed

_EDGE_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
_LABEL_SCHEMA = pa.schema([("src", pa.int64()), ("lbl", pa.int64())])
_EMPTY_EDGES = pa.table(
    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
)
_EMPTY_LABELS = pa.table(
    {"id": pa.array([], pa.int64()), "lbl": pa.array([], pa.int64())}
)


def _as_dataset(edges) -> rd.Dataset:
    if isinstance(edges, pa.Table):
        return rd.from_arrow(edges)
    return edges


def _cc_single_task(tables: list[pa.Table], src: str, dst: str) -> pa.Table:
    """Whole-graph min-label with path halving — runs inside ONE remote
    task (numpy, O(E) per round, ~log(diameter) rounds)."""
    s = np.concatenate(
        [t.column(src).to_numpy(zero_copy_only=False) for t in tables]
    ).astype(np.int64)
    d = np.concatenate(
        [t.column(dst).to_numpy(zero_copy_only=False) for t in tables]
    ).astype(np.int64)
    nodes = np.unique(np.concatenate([s, d]))
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    lbl = nodes.copy()
    for _ in range(64):
        new = lbl.copy()
        np.minimum.at(new, di, lbl[si])
        np.minimum.at(new, si, lbl[di])
        # path halving: a label is itself a node id — jump to ITS label
        new = np.minimum(new, new[np.searchsorted(nodes, new)])
        if (new == lbl).all():
            break
        lbl = new
    return pa.table({"id": pa.array(nodes), "cluster_id": pa.array(lbl)})


def connected_components(
    edges,
    src: str = "a",
    dst: str = "b",
    max_supersteps: int = 64,
    n_buckets: int | None = None,
    single_task_max_edges: int = 1 << 22,
) -> pa.Table:
    """Component label per node of the undirected graph ``edges``.

    ``edges``: Dataset or Arrow table with integer endpoint columns
    ``src``/``dst``. Returns ``(id, cluster_id)`` sorted by id, where
    ``cluster_id`` is the minimum node id of the component — rows exist
    only for nodes that appear in at least one edge (singletons are
    their own trivial cluster by definition; callers needing them emit
    ``id == cluster_id`` rows for untouched keys).

    ``n_buckets`` sizes every exchange (join scatter + min gather) —
    size it to the EDGE count (~edge_bytes / 64 MB), not the cluster CPU
    count: a near-dup pair graph is orders of magnitude smaller than its
    corpus, and per-bucket task dispatch dominates when buckets ≫ data.

    ``single_task_max_edges``: a pair graph at or below this edge count
    (default 4M edges ≈ 64 MB — one Ray block) runs as ONE remote
    union-find task over the plasma-resident edge blocks instead of the
    superstep loop — the broadcast-small-side analog for graphs
    (near-dup pair sets are ≪ their corpus; each superstep otherwise
    pays ~4 streaming-execution fixed costs). The distributed loop is
    the ≥-threshold path and stays under test via
    ``single_task_max_edges=0``.
    """
    ds = _as_dataset(edges)

    def both_ways(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_EDGES
        s = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
        d = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"src": pa.array(np.concatenate([s, d])),
             "dst": pa.array(np.concatenate([d, s]))}
        )

    import ray

    raw = ds.materialize()
    if raw.count() <= single_task_max_edges:
        block_refs = [
            r for b in raw.iter_internal_ref_bundles() for r in b.block_refs
        ]
        if not block_refs:
            return _EMPTY_LABELS.rename_columns(["id", "cluster_id"])

        @ray.remote
        def uf(*tables):
            ts = [
                t for t in tables
                if t.num_rows and {src, dst} <= set(t.column_names)
            ]
            if not ts:
                return _EMPTY_LABELS.rename_columns(["id", "cluster_id"])
            return _cc_single_task(ts, src, dst)

        return ray.get(uf.remote(*block_refs))

    e = raw.map_batches(
        both_ways, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        ids = np.unique(t.column("src").to_numpy(zero_copy_only=False))
        return pa.table({"id": pa.array(ids), "lbl": pa.array(ids)})

    labels = bucketed_groups(
        e.select_columns(["src"]), "src", init_labels, n_buckets=n_buckets
    ).materialize()
    if labels.count() == 0:
        return _EMPTY_LABELS.rename_columns(["id", "cluster_id"])

    def min_partition(t: pa.Table) -> pa.Table:
        g = (
            t.select(["id", "lbl"])
            .to_pandas()
            .groupby("id", sort=False, as_index=False)["lbl"]
            .min()
        )
        return pa.table(
            {"id": pa.array(g["id"].to_numpy().astype(np.int64)),
             "lbl": pa.array(g["lbl"].to_numpy().astype(np.int64))}
        )

    def as_candidates(t: pa.Table) -> pa.Table:
        # join output: (src, dst, lbl) — the message is (id=dst, lbl)
        if t.num_rows == 0:
            return _EMPTY_LABELS
        return pa.table(
            {
                "id": pa.array(
                    t.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "lbl": pa.array(
                    t.column("lbl").to_numpy(zero_copy_only=False).astype(np.int64)
                ),
            }
        )

    prev_sum = None
    for _ in range(max_supersteps):
        lab_as_src = labels.map_batches(
            lambda t: pa.table({"src": t.column("id"), "lbl": t.column("lbl")}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        msgs = shuffle_join(
            e, lab_as_src, on="src", how="inner",
            schemas=(_EDGE_SCHEMA, _LABEL_SCHEMA), n_buckets=n_buckets,
        ).map_batches(as_candidates, batch_format="pyarrow", zero_copy_batch=True)
        labels = bucketed_groups(
            msgs.union(labels), "id", min_partition, n_buckets=n_buckets
        ).materialize()
        s = labels.sum("lbl")
        if s == prev_sum:
            break
        prev_sum = s

    out = to_pandas_typed(labels, _EMPTY_LABELS).sort_values("id")
    out = out.rename(columns={"lbl": "cluster_id"})
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
