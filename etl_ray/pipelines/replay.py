"""ReplayEngine — the checkpoint-window replay loop (the driver program).

Reference analog: the per-day ingest loop ``main.py:81-86`` with its
staging → ensure → load → rollup → audit → commit protocol (SURVEY.md
§2.9). One checkpoint window here = one day there: the unit of
fault-isolation, resume and audit.

Per window:

    read_parquet(window files, unified schema)        [S6 analog]
      └─ map_batches(validate+route+combiner)         [M3 + Citus routing]
           └─ groupby('part')                         [THE one shuffle]
                └─ map_groups(LWW merge)              [K1-K7 + ensure S10]
                     ├─ staged partition parquet      [S9 bulk sink]
                     └─ stats rows (tiny)  ──► incremental rollups [A4-A6]
                                          ──► manifest swap        [commit]

The merge stage returns only metrics + per-(repo,lang) delta rows — the
full partition state never flows back to the driver; ``take_all`` here
materializes O(P + touched repo×lang) rows, not data.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


from etl_ray.sources.events import (
    Window,
    chain_fingerprint,
    list_segments,
    plan_windows,
    prefix_fingerprint,
    read_window,
    unified_schema,
)
from etl_ray.stages.merge import make_merge_fn

#: per-slice audit-count schema carried through the cascaded exchange
_COUNTS_SCHEMA = pa.schema(
    [("part", pa.int32()), ("events_in", pa.int64()), ("invalid", pa.int64())]
)
_COUNTS_EMPTY = _COUNTS_SCHEMA.empty_table()

#: canonical zero-row VALIDATED-events table (post `_valid` drop): the
#: fallback when every slice of a reduce range is empty — Ray Data can
#: emit COLUMNLESS empty blocks whose sliced schema would otherwise
#: crash the range merge's `part` access (evolved payload columns are
#: unified by concat's promote, so the base schema suffices here)
_ROWS_EMPTY = None  # built lazily below (EVENT_SCHEMA imported later)


def _rows_empty() -> pa.Table:
    global _ROWS_EMPTY
    if _ROWS_EMPTY is None:
        _ROWS_EMPTY = pa.schema(
            [*EVENT_SCHEMA, pa.field("part", pa.int32())]
        ).empty_table()
    return _ROWS_EMPTY


def pack_exchange_width(parts: int, slots: int, max_parts: int) -> int:
    """Round the exchange width to a multiple of the worker-slot count so
    no reduce round runs partially idle. Rounds UP when that stays within
    ``max_parts`` (more, smaller ranges only shrink per-group memory);
    otherwise rounds DOWN to the last full multiple — clamping to
    ``max_parts`` would reintroduce the partially-idle tail round (64
    parts on 6 slots → a 4/6 final round; 60 packs perfectly)."""
    if parts <= slots:
        return parts
    up = -(-parts // slots) * slots
    return up if up <= max_parts else max(slots, (max_parts // slots) * slots)


def _sum_counts(tables: list[pa.Table]) -> pa.Table:
    """Associative fold of per-part (events_in, invalid) count tables."""
    ts = [t for t in tables if t.num_rows]
    if not ts:
        return _COUNTS_EMPTY
    t = pa.concat_tables(ts)
    g = t.group_by("part").aggregate([("events_in", "sum"), ("invalid", "sum")])
    return pa.table(
        {
            "part": g.column("part"),
            "events_in": g.column("events_in_sum"),
            "invalid": g.column("invalid_sum"),
        }
    )
from etl_ray.stages.validate import make_validate_fn
from etl_ray.state.manifest import Manifest, ManifestStore


def _split_validated(t: pa.Table, P: int, S: int) -> list:
    """Split one validated block into S reduce-range slices, extracting
    per-part audit counts (events_in incl. invalid) first.

    Counts are weighted by the validate combiner's ``_dups``
    multiplicities so events_in == RAW events regardless of block
    boundaries; ``_dups``/``_valid`` are dropped before routing. Shared
    by the per-block split task of the streaming exchange and the fused
    small-window task below — one kernel, one semantics.
    """
    import numpy as _np

    if t.num_rows == 0:
        # a COLUMNLESS Ray block would propagate a schemaless empty into
        # the range merge; substitute the canonical typed empty (evolved
        # columns unify via concat promote)
        base = t.slice(0, 0) if "part" in t.column_names else _rows_empty()
        helpers = [c for c in ("_dups", "_valid") if c in base.column_names]
        if helpers:
            base = base.drop_columns(helpers)
        return [(base, _COUNTS_EMPTY)] * S
    part = t.column("part").to_numpy(zero_copy_only=False).astype(_np.int64)
    valid = pc.fill_null(t.column("_valid"), False).to_numpy(
        zero_copy_only=False
    )
    if "_dups" in t.column_names:
        w = t.column("_dups").to_numpy(zero_copy_only=False).astype(_np.int64)
        t = t.drop_columns(["_dups"])
    else:
        w = _np.ones(len(part), dtype=_np.int64)
    ev = _np.bincount(part, weights=w, minlength=P).astype(_np.int64)
    inv = _np.bincount(part[~valid], weights=w[~valid], minlength=P).astype(
        _np.int64
    )
    nz = _np.flatnonzero(ev)
    counts = pa.table(
        {
            "part": pa.array(nz.astype(_np.int32)),
            "events_in": pa.array(ev[nz]),
            "invalid": pa.array(inv[nz]),
        }
    )
    t = t.filter(pa.array(valid)).drop_columns(["_valid"])
    part_v = t.column("part").to_numpy(zero_copy_only=False).astype(_np.int64)
    rng = (part_v * S) // P
    order = _np.argsort(rng, kind="stable")
    st = t.take(pa.array(order))
    bounds = _np.searchsorted(rng[order], _np.arange(S + 1))
    crng = (nz * S) // P  # nz ascending → counts contiguous per range
    cbounds = _np.searchsorted(crng, _np.arange(S + 1))
    return [
        (
            st.slice(bounds[i], bounds[i + 1] - bounds[i]),
            counts.slice(cbounds[i], cbounds[i + 1] - cbounds[i]),
        )
        for i in range(S)
    ]


@ray.remote
def _read_validate_split_task(
    files: list[str], schema: pa.Schema, P: int, S: int
):
    """Small-window fast path: read + validate + range-split one (small)
    window in a single Ray task, bypassing Ray Data entirely.

    Tail-mode profile (bench.py --tail): a freshly-arrived CDC segment is
    ~1-3 MB, but pushing it through a read_parquet→map_batches Dataset
    pays ~0.4-0.6 s of per-dataset streaming-executor startup — pure
    fixed overhead at that size, and the dominant term of the per-commit
    latency floor a streaming tailer experiences. This task produces
    slices BYTE-IDENTICAL to the streaming exchange's (same unified-
    schema null-backfill via the pyarrow dataset scanner, same validate
    kernel — `_keep_last_per_key` is associative so whole-window vs
    per-batch application folds to the same winner set — and the same
    `_split_validated`), returned as S objects (``num_returns=S`` at the
    call site) feeding `merge_range` directly: read → merge is two task
    hops, with no whole-table object-store round trip in between.
    """
    import pyarrow.dataset as pads

    from etl_ray.stages.merge import _pin_arrow_once

    _pin_arrow_once()
    t = pads.dataset(files, format="parquet", schema=schema).to_table()
    out = _split_validated(make_validate_fn(P)(t), P, S)
    return out if S > 1 else out[0]
from etl_ray.pipelines import rollups
from etl_ray.schema import EVENT_COLUMNS, EVENT_SCHEMA, widen_type

#: Core event columns the engine owns; everything else is evolved payload.
_CORE = set(EVENT_COLUMNS)

#: Dead-letter-queue row layout: the core event envelope + classification
#: and lineage. Uniform by construction (evolved payload columns stay
#: recoverable from the named source segment), so ``rejects()`` reads are
#: never ragged.
_REJECT_EMPTY = pa.schema(
    [(f.name, f.type) for f in EVENT_SCHEMA]
    + [
        ("reject_reason", pa.string()),
        ("checkpoint_id", pa.int64()),
        ("source_file", pa.string()),
    ]
).empty_table()

#: Change-data-feed row layout (opt-in output; stages/merge.py writes it).
_CHANGES_EMPTY = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("commit_seq", pa.int64()),
        ("seq", pa.int64()),
        ("lang", pa.string()),
        ("content_sha256", pa.string()),
        ("change_type", pa.string()),
        ("checkpoint_id", pa.int64()),
    ]
).empty_table()



#: Serializes dataset CONSTRUCTION across driver threads. Ray Data's
#: read-path resolution lazily does `from fsspec.implementations.http
#: import HTTPFileSystem` and catches only ModuleNotFoundError; with two
#: driver threads constructing datasets concurrently (concurrent scoped
#: writers), the second thread can observe the partially-initialized
#: module and get a plain ImportError that nothing catches. Python does
#: not negative-cache failed imports, so warming once does not fix it —
#: construction is cheap and serialized instead (execution stays
#: concurrent). Same discipline the prefetch path applies by keeping
#: construction on the main thread.
import threading as _threading

_DATASET_BUILD_LOCK = _threading.Lock()

#: depth-counted guard for the process-global DataContext parallelism cap
#: (see ReplayEngine._parallelism_scope)
_PAR_SCOPE_LOCK = _threading.Lock()
_PAR_SCOPE_DEPTH = 0
_PAR_SCOPE_SAVED = None

#: composite (repo, path) join-key separator used by ``ReplayEngine.diff``
#: and every consumer that reconstructs keys from its output
DIFF_SEP = "\x1f"


def composite_key(repo: "pa.ChunkedArray | pa.Array",
                  path: "pa.ChunkedArray | pa.Array"):
    """Collision-free ``repo + DIFF_SEP + path`` composite key.

    Decoding splits on the FIRST separator (``max_splits=1``), so a path
    containing DIFF_SEP round-trips — but a repo containing it would
    mis-split AND collide (('a','b\\x1fc') vs ('a\\x1fb','c') join to the
    same bytes). Rejecting separator bytes in repo makes the encoding
    injective; this is a per-batch vectorized check, not a per-row loop.
    """
    bad = pc.any(pc.match_substring(repo, DIFF_SEP)).as_py()
    if bad:
        raise ValueError(
            "repo names must not contain the composite-key separator "
            f"{DIFF_SEP!r} — (repo, path) keys would collide")
    return pc.binary_join_element_wise(repo, path, DIFF_SEP)


def prune_files_by_stats(
    files: list[str], col: str, lo, hi
) -> list[str]:
    """Zone-map pruning from parquet FOOTERS: drop files whose row-group
    min/max statistics for ``col`` prove no row can lie in [lo, hi]
    (either bound None = unbounded). The footer IS the zone map — no
    write-path sidecar to maintain, and the check is O(files) metadata
    reads (same cost class as the ragged-schema footer check). A file
    with no statistics for the column is conservatively kept; an empty
    file is dropped. Reference analog: monthly RANGE partition pruning
    (etl/insert/ensure_partitions.py) generalized to any stats column.
    """
    import pyarrow.parquet as _pq

    kept = []
    for f in files:
        md = _pq.read_metadata(f)
        if md.num_rows == 0:
            continue
        keep = False
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            st = None
            for ci in range(row_group.num_columns):
                c = row_group.column(ci)
                if c.path_in_schema == col:
                    st = c.statistics
                    break
            if st is None or not st.has_min_max:
                keep = True  # no stats → cannot prune
                break
            if (hi is None or st.min <= hi) and (lo is None or st.max >= lo):
                keep = True
                break
        if keep:
            kept.append(f)
    return kept


@ray.remote
def _stage_rejects_task(path: str, out_path: str, ckpt_id: int):
    """Quarantine one log segment's invalid rows into a staged DLQ file.

    Output name is deterministic per (checkpoint, segment index) →
    retry/crash-safe: a re-staged window overwrites, never duplicates
    (same discipline as the merge stage's staged partition files).
    Reference analog: the cleaning filter's per-rule drop accounting
    (``etl/cleaning/clean_data.py:123-148``) made durable — the reference
    logs how many rows each rule removed; we keep the rows, say why, and
    commit them under the same exactly-once manifest as the state itself.
    """
    import pyarrow.parquet as _pq

    from etl_ray.stages.merge import _pin_arrow_once, write_atomic_parquet
    from etl_ray.stages.validate import reject_reasons

    _pin_arrow_once()

    def _backfill(t: pa.Table, cols) -> pa.Table:
        # ragged logs: segments written before an evolution may lack core
        # columns — null-backfill so classification sees the full envelope
        for f in cols:
            if f.name not in t.column_names:
                t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
        return t

    # two-phase read: classify on the 4 validity columns ONLY (a tiny
    # fraction of the file — content dominates), and pay the full-row
    # read just for files that actually hold invalid rows. A dirty
    # window re-reads its clean segments almost for free, so the DLQ's
    # read amplification is bounded by the invalid rows' OWN files, not
    # the window size.
    key_fields = [f for f in EVENT_SCHEMA if f.name in
                  ("repo", "path", "op", "commit_seq")]
    names = set(_pq.read_schema(path).names)
    probe = _pq.read_table(
        path, columns=[f.name for f in key_fields if f.name in names]
    )
    reason = reject_reasons(_backfill(probe, key_fields))
    mask = pc.is_valid(reason)
    n_bad = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
    if n_bad == 0:
        return 0, {}
    t = _backfill(_pq.read_table(path), EVENT_SCHEMA)
    bad_reason = reason.filter(mask)
    out = t.filter(mask).select(EVENT_COLUMNS)
    out = out.append_column("reject_reason", bad_reason)
    out = out.append_column(
        "checkpoint_id", pa.array([ckpt_id] * n_bad, pa.int64())
    )
    out = out.append_column(
        "source_file", pa.array([os.path.basename(path)] * n_bad, pa.string())
    )
    write_atomic_parquet(out, out_path)
    vc = pc.value_counts(
        bad_reason.combine_chunks()
        if isinstance(bad_reason, pa.ChunkedArray)
        else bad_reason
    )
    reasons = {str(s["values"]): int(s["counts"]) for s in vc.to_pylist()}
    return n_bad, reasons


class ReplayEngine:
    """Applies a recorded change log to a partitioned Parquet lake.

    Parameters
    ----------
    lake_dir : str
        Root of the lake (created if missing). Holds partition state
        files, summaries, staged files and manifests.
    num_partitions : int
        Hash-partition count ``P`` for ``part = hash(repo, path) % P``.
        Pinned in the first manifest; must stay constant for a lake's
        lifetime (like Citus' shard_count). Size ``P ≈ max(2×cluster
        cores, 64)`` so each partition state stays object-store sized.
    batch_size : int | None
        ``map_batches`` batch size for the validate stage. None lets Ray
        pick (full blocks) — right for slim rows; lower it for very wide
        ``content`` payloads.
    """

    def __init__(
        self,
        lake_dir: str,
        num_partitions: int = 64,
        batch_size: int | None = None,
        ensure_actors: int | None = None,
        partition_scope: tuple[int, int] | list[int] | None = None,
        stream: str | None = None,
    ):
        self.store = ManifestStore(lake_dir)
        self.lake_dir = lake_dir
        #: writer-fence epoch (state/manifest.py:fence) — claimed lazily
        #: before the first commit-producing operation of this engine,
        #: re-claimed per replay() call; a zombie engine resuming after
        #: another driver advanced the lake fails loudly at its commit
        self._epoch: int | None = None
        #: (files_done, fingerprint) of the log prefix this instance has
        #: verified or committed — lets a long-lived tailer skip the
        #: O(consumed-files) footer re-read on every replay() pass
        self._verified_prefix: tuple[int, str] = (0, "")
        current = self.store.current()
        if current is not None and current.num_partitions:
            num_partitions = current.num_partitions
        self.num_partitions = num_partitions
        self.batch_size = batch_size
        cpus = 8
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 8))
        #: Effective Ray-Data concurrency cap. This VM's Ray Data block
        #: path saturates near 16 concurrent workers (BASELINE.md §"Why
        #: the single node caps efficiency": identical parquet-decode work
        #: degrades 3-10x when issued as 32-way Ray Data tasks while ray
        #: core + multiprocessing scale to 32). The cap is enforced via
        #: execution_options.resource_limits (_parallelism_scope), which
        #: bounds every stage including the shuffle's internal tasks —
        #: measured 27s -> 16.9s for the 32-CPU sf0.1 bench. On a real
        #: multi-node cluster set ETL_RAY_DATA_SATURATION to total worker
        #: slots (or a large value to disable).
        saturation = int(os.environ.get("ETL_RAY_DATA_SATURATION", "16"))
        self._data_parallelism = max(2, min(cpus, saturation))
        #: shuffle partitions for the routing exchange — capped by the
        #: effective parallelism so the exchange never oversubscribes
        self.shuffle_partitions = max(2, min(num_partitions, self._data_parallelism))
        self._cpus = cpus
        #: >0 → merge via the cross-window EnsureActor pool (the
        #: per-partition key→state index of stages/ensure.py) instead of
        #: the stateless merge fn; steady-state windows then skip the
        #: prior-state parquet read. Correctness is identical
        #: (tests/test_ensure_actor.py proves parity + resume safety).
        self.ensure_actors = ensure_actors or int(
            os.environ.get("ETL_RAY_ENSURE_ACTORS", "0")
        )
        #: merge-on-read delta chains (ETL_RAY_DELTA_CHAIN=1): windows
        #: append O(delta) chain files instead of rewriting O(state)
        #: partition files; compaction folds a chain back into its base
        #: every ETL_RAY_CHAIN_MAX windows (stages/merge.py docstring).
        #: Not combined with the ensure-actor path (the actor cache is an
        #: alternative answer to the same prior-state cost).
        self.delta_chain = (
            os.environ.get("ETL_RAY_DELTA_CHAIN", "0") == "1"
            and not self.ensure_actors
        )
        self.chain_max = int(os.environ.get("ETL_RAY_CHAIN_MAX", "3"))
        self.compact_ratio = float(os.environ.get("ETL_RAY_COMPACT_RATIO", "0.25"))
        #: dead-letter queue (default ON): windows whose audit metrics
        #: report invalid events quarantine them — full rows + reason code
        #: + source lineage — under the same two-phase manifest commit.
        #: Clean windows pay NOTHING (the pass is gated on the already-
        #: computed invalid count, so the common case adds zero reads).
        self.dlq = os.environ.get("ETL_RAY_DLQ", "1") == "1"
        #: change data feed (opt-in, ETL_RAY_CHANGEFEED=1): merge tasks
        #: also stage row-level effective changes (insert/update/delete +
        #: post-image sha) per partition, committed/rolled-back/gc'd with
        #: the manifest — the downstream-consumer CDC output (Delta-CDF
        #: shape). Off by default: it adds an O(applied) write per touched
        #: partition per window.
        self.changefeed = os.environ.get("ETL_RAY_CHANGEFEED", "0") == "1"
        if self.changefeed and self.ensure_actors:
            raise RuntimeError(
                "ETL_RAY_CHANGEFEED is not supported with "
                "ETL_RAY_ENSURE_ACTORS: the actor merge path does not "
                "stage change files — disable one of the two"
            )
        #: CONCURRENT PARTITION-DISJOINT WRITERS (the Citus parallel
        #: shard-load analog): a writer constructed with
        #: ``partition_scope`` owns a subset of partitions and its own
        #: named resume cursor (``stream``); commits go through the
        #: rebase path (state/manifest.py:commit_scoped) — per-partition
        #: optimistic concurrency under a short lake-level commit lock —
        #: so writers on DISJOINT scopes commit in any interleaving,
        #: while an overlapping or zombie writer fails loudly with
        #: StaleWriterError. ``partition_scope``: an inclusive (lo, hi)
        #: tuple or an explicit id list. Events that route outside the
        #: scope are a configuration error and fail the window before
        #: commit. Maintenance ops (repartition/compact/rollback) stay
        #: global — run them from an unscoped engine. NOTE: within one
        #: driver process, run concurrent writers only where
        #: _parallelism_scope is a no-op (cap >= cpus) or accept shared
        #: DataContext limits; production writers are separate drivers
        #: (one `ray job submit` each).
        self._scope: frozenset[int] | None = None
        self._stream = "main"
        if partition_scope is not None:
            if isinstance(partition_scope, tuple):
                lo, hi = partition_scope
                scope = frozenset(range(int(lo), int(hi) + 1))
            else:
                scope = frozenset(int(p) for p in partition_scope)
            if not scope or min(scope) < 0 or max(scope) >= self.num_partitions:
                raise ValueError(
                    f"partition_scope must be a non-empty subset of "
                    f"[0, {self.num_partitions})"
                )
            self._scope = scope
            self._stream = stream or f"scope-{min(scope)}-{max(scope)}"
            import re as _re

            if not _re.fullmatch(r"[A-Za-z0-9._-]+", self._stream):
                raise ValueError(
                    "stream must be filesystem-safe ([A-Za-z0-9._-]+): "
                    f"{self._stream!r}"
                )
            if self.ensure_actors:
                raise RuntimeError(
                    "partition_scope is not supported with "
                    "ETL_RAY_ENSURE_ACTORS (the actor pool is shared per "
                    "lake, not per scope)"
                )
            if self.changefeed:
                raise RuntimeError(
                    "partition_scope is not supported with "
                    "ETL_RAY_CHANGEFEED (change files embed the checkpoint "
                    "id, which a scoped writer learns only at commit)"
                )
        elif stream is not None:
            raise ValueError("stream requires partition_scope")

    def _fence_epoch(self) -> int:
        """The engine's writer fence, claimed lazily before the first
        commit-producing operation (replay() re-claims per call)."""
        if self._epoch is None:
            self._epoch = self.store.fence()
        return self._epoch

    @contextmanager
    def _parallelism_scope(self):
        """Cap the streaming executor at the effective data parallelism.

        ``execution_options.resource_limits.cpu`` bounds EVERY stage of
        the window pipeline (read, validate, sort-shuffle map/reduce,
        merge) — per-task num_cpus alone cannot reach the shuffle's
        internal tasks. Above the measured ~16-worker saturation point of
        this VM's Ray Data block path, extra advertised CPUs make
        pipelines SLOWER (BASELINE.md); on a real cluster set
        ETL_RAY_DATA_SATURATION high to lift the cap.

        DataContext is process-global, so with CONCURRENT scoped writers
        in one driver the scope is depth-counted: the first entrant saves
        and sets, the last restores — an unbalanced thread interleaving
        can no longer leak the cap past the writers' lifetime. (Writers
        in one session share the same cap value by construction.)
        """
        if self._data_parallelism >= self._cpus:
            yield
            return
        from ray.data import ExecutionResources
        from ray.data.context import DataContext

        ctx = DataContext.get_current()
        global _PAR_SCOPE_DEPTH, _PAR_SCOPE_SAVED
        with _PAR_SCOPE_LOCK:
            _PAR_SCOPE_DEPTH += 1
            if _PAR_SCOPE_DEPTH == 1:
                _PAR_SCOPE_SAVED = ctx.execution_options.resource_limits
                ctx.execution_options.resource_limits = ExecutionResources(
                    cpu=self._data_parallelism
                )
        try:
            yield
        finally:
            with _PAR_SCOPE_LOCK:
                _PAR_SCOPE_DEPTH -= 1
                if _PAR_SCOPE_DEPTH == 0:
                    ctx.execution_options.resource_limits = _PAR_SCOPE_SAVED

    @contextmanager
    def _shuffle_scope(self):
        """Scope the shuffle strategy to THIS engine's pipelines.

        The routing exchange groups by an integer bucket we computed
        ourselves, so either of Ray's strategies partitions it correctly:

        - ``sort`` (Ray's default, task-based): measured fastest on the
          single-node sandbox — no per-window aggregator-actor spawns
          (see BASELINE.md for the 4/8/16/32-CPU curves).
        - ``hash`` (actor-based exchange): the shape a multi-node
          cluster's network shuffle takes; enable with
          ``ETL_RAY_SHUFFLE=hash``. Aggregator count is capped to the
          CPU count — an oversized aggregator pool deadlocks small
          clusters (actors hold CPUs the map tasks need).

        The knobs are global DataContext state, so they are set around
        the window pipeline and restored after (Ray snapshots the
        context at Dataset creation — the read must happen inside).
        """
        mode = os.environ.get("ETL_RAY_SHUFFLE", "sort")
        if mode not in ("hash", "push"):
            yield
            return
        from ray.data.context import DataContext, ShuffleStrategy

        ctx = DataContext.get_current()
        saved = (
            ctx.shuffle_strategy,
            ctx.max_hash_shuffle_aggregators,
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
        )
        if mode == "push":
            # push-based (magnet-style) sort shuffle: map outputs are
            # pushed/merged eagerly instead of waiting at a strict
            # map→reduce barrier
            ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
        else:
            ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
            ctx.max_hash_shuffle_aggregators = max(1, self._cpus // 2)
            ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.25
        try:
            yield
        finally:
            (
                ctx.shuffle_strategy,
                ctx.max_hash_shuffle_aggregators,
                ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override,
            ) = saved

    # ------------------------------------------------- direct exchange

    def _direct_exchange(self, ds: rd.Dataset, merge, shuffle_parts: int) -> list:
        """Known-boundary routing exchange: 2-round map/reduce over raw
        Ray tasks, returning the per-partition stats tables.

        Why not ``groupby('part')``: Ray's sort-based AllToAll pays a
        boundary-SAMPLING pass plus a full sort, but ``part`` is OUR
        precomputed dense int in [0, num_partitions) — the reduce ranges
        are known a priori (range(part) = part*S // P, contiguous), so
        the exchange needs no sampling and no ordering (measured: the
        Sort operator spent 7.6 s span for 4.6 s of compute on an 8-CPU
        window; this path removes the sampling/sort span). The merge
        fold re-sorts per key anyway (stages/merge.py LWW sort), so
        block order into the reduce is irrelevant.

        Partitioning assumptions (documented per the custom-operator
        rule): 'part' is int32 in [0, P); every row of a part reaches
        exactly one reduce range; staged-file writes inside ``merge``
        are deterministic + atomic, so Ray task retries stay
        exactly-once. Multi-node shape: round 1 runs where the validated
        blocks live and ships only each reduce range's slice — the same
        traffic pattern as the built-in shuffle.

        Blocks are consumed via ``iter_internal_ref_bundles`` rather
        than ``to_arrow_refs``: (a) bundles stream out while the
        read+validate pipeline is still executing, so split tasks
        OVERLAP the scan instead of waiting at a materialize barrier;
        (b) ``to_arrow_refs`` internally calls
        ``schema(fetch_if_missing=True)``, which re-executes a
        ``limit(1)`` prefix of the whole pipeline — a measured ~0.9 s
        of serial dead time per window.

        CASCADED FOLDING: the LWW keep-last comparator (repo, path,
        commit_seq, seq, commit, content) is a total order, so per-key
        max is ASSOCIATIVE — slices of a reduce range can be pre-folded
        pairwise/k-wise as they arrive, in any tree shape, and the final
        winner set is byte-identical. Every ``ETL_RAY_FOLD_FANIN``
        slices per range are combined by a ``fold`` task while the scan
        is still decoding upstream blocks, which (a) hides most of the
        merge CPU inside the scan's wall time — the scan is memory-bus
        bound on this VM and leaves CPUs idle that folds can use — and
        (b) dedups in-window losers early, so the final merge_range sees
        roughly the per-key winner set instead of the full event stream
        (smaller peak memory per reduce task at any scale). Audit-metric
        parity: per-part (events_in, invalid) counts are taken at split
        time, BEFORE any folding, and carried alongside the rows
        (summed, associative) — merge_delta reports exactly what the
        one-shot group path would.
        """
        P, S = self.num_partitions, shuffle_parts
        fanin = max(2, int(os.environ.get("ETL_RAY_FOLD_FANIN", "8")))
        delta_fn = merge.delta_fn

        @ray.remote(num_returns=S)
        def split_block(t: pa.Table):
            out = _split_validated(t, P, S)
            return out if S > 1 else out[0]

        @ray.remote
        def fold(*pairs):
            from etl_ray.stages.merge import _pin_arrow_once
            from etl_ray.stages.validate import _keep_last_per_key

            _pin_arrow_once()
            ts = [p[0] for p in pairs if p[0].num_rows]
            rows = (
                _keep_last_per_key(pa.concat_tables(ts, promote_options="default"))
                if ts
                else next(
                    (p[0] for p in pairs if "part" in p[0].column_names),
                    _rows_empty(),
                )
            )
            return rows, _sum_counts([p[1] for p in pairs])

        @ray.remote
        def merge_range(*pairs):
            import numpy as _np

            from etl_ray.stages.merge import STATS_SCHEMA
            from etl_ray.stages.validate import _keep_last_per_key

            counts = _sum_counts([p[1] for p in pairs])
            ts = [p[0] for p in pairs if p[0].num_rows]
            rows = (
                _keep_last_per_key(pa.concat_tables(ts, promote_options="default"))
                if ts
                else next(
                    (p[0] for p in pairs if "part" in p[0].column_names),
                    _rows_empty(),
                )
            )
            part_np = rows.column("part").to_numpy(zero_copy_only=False)
            order = _np.argsort(part_np, kind="stable")
            rows = rows.take(pa.array(order))
            ps = part_np[order]
            starts = (
                _np.flatnonzero(_np.concatenate(([True], ps[1:] != ps[:-1])))
                if len(ps)
                else _np.zeros(0, dtype=_np.int64)
            )
            ends = _np.append(starts[1:], len(ps))
            cnt = {
                int(p): (int(e), int(i))
                for p, e, i in zip(
                    counts.column("part").to_pylist(),
                    counts.column("events_in").to_pylist(),
                    counts.column("invalid").to_pylist(),
                )
            }
            outs, seen = [], set()
            for s, e in zip(starts, ends):
                part = int(ps[s])
                seen.add(part)
                ein, inv = cnt.get(part, (int(e - s), 0))
                outs.append(delta_fn(part, rows.slice(s, e - s), ein, inv))
            empty_delta = rows.slice(0, 0)
            for part, (ein, inv) in cnt.items():
                # parts whose window rows were ALL invalid still get a
                # metrics row (events_in/invalid audit parity)
                if part not in seen:
                    outs.append(delta_fn(part, empty_delta, ein, inv))
            outs = [o for o in outs if o.num_rows]
            return (
                pa.concat_tables(outs, promote_options="default")
                if outs
                else STATS_SCHEMA.empty_table()
            )

        if isinstance(ds, list):
            # per-range refs from the fused small-window task — already
            # read+validated+split; no Dataset, no streaming executor,
            # no separate split hop: merge_range consumes them directly
            pending: list[list] = [[r] for r in ds]
            assert len(pending) == S
        else:
            pending = [[] for _ in range(S)]
            for bundle in ds.iter_internal_ref_bundles():
                for block_ref in bundle.block_refs:
                    r = split_block.remote(block_ref)
                    for i in range(S):
                        pending[i].append(r if S == 1 else r[i])
                        if len(pending[i]) >= fanin:
                            pending[i] = [fold.remote(*pending[i])]
        if not any(pending):
            return []
        out_refs = [merge_range.remote(*pending[i]) for i in range(S)]
        return [t for t in ray.get(out_refs) if t.num_rows]

    # ------------------------------------------------------------------ run

    def replay(
        self,
        events_path: str | list[str],
        window_events: int = 250_000,
        max_windows: int | None = None,
    ) -> dict[str, Any]:
        """Replay a recorded log, resuming from the committed manifest.

        The resume cursor is the FILE prefix consumed by committed windows
        (``manifest.log_files_done`` + chained fingerprint), not a window
        index over a re-planned whole-log plan: windows are planned only
        over the not-yet-consumed suffix, so segments appended after a
        below-threshold tail window was committed form new windows instead
        of silently merging into (and being skipped with) an
        already-committed window. A mutated / reordered consumed prefix
        fails loudly.
        """
        files = (
            events_path if isinstance(events_path, list) else list_segments(events_path)
        )
        self._epoch = self.store.fence()
        current = self.store.current()
        if self._scope is None:
            files_done = current.log_files_done if current else 0
            base_windows = current.windows_done if current else 0
            done_fp = current.log_fingerprint if current else ""
        else:
            # scoped writers resume from their OWN named cursor — the
            # legacy top-level cursor belongs to the unscoped writer
            c = (current.cursors.get(self._stream, {}) if current else {})
            files_done = int(c.get("files_done", 0))
            base_windows = int(c.get("windows_done", 0))
            done_fp = c.get("fingerprint", "")
        if files_done > len(files):
            raise RuntimeError(
                f"log truncated: manifest says {files_done} segment files "
                f"were consumed but only {len(files)} exist — the change "
                "log must be append-only"
            )
        if current is not None and files_done:
            # A LONG-LIVED TAILER calls replay() per arrival: re-reading
            # every consumed footer each pass is O(N) per pass, O(N²)
            # over the stream's life. This engine instance memoizes the
            # prefix it last verified/committed — a fresh engine (crash,
            # new driver) still verifies the full prefix once.
            if self._verified_prefix != (files_done, done_fp):
                fp = prefix_fingerprint(files[:files_done])
                if fp != done_fp:
                    raise RuntimeError(
                        "consumed log prefix changed since the last commit "
                        f"(fingerprint mismatch over the first {files_done} "
                        "segment files) — the change log must be append-only; "
                        "refusing to resume"
                    )
                self._verified_prefix = (files_done, done_fp)
        # schema over the UNCONSUMED suffix only (windows read nothing
        # else; evolved columns from consumed files live on in the
        # manifest's payload_types, which run_window widens against) —
        # the all-files unify was the other O(N)-footers-per-pass cost
        suffix = files[files_done:]
        schema = unified_schema(suffix) if suffix else None
        windows = plan_windows(suffix, window_events)
        cursor_fp = done_fp
        cursor_files = files_done
        ran = 0
        out: dict[str, Any] = {
            "windows_total": base_windows + len(windows),
            "windows_skipped": base_windows,
        }
        run_list = windows if max_windows is None else windows[:max_windows]
        # Read-ahead (OFF by default): the read+validate of window i+1 is
        # PURE (no dependence on prior lake state — only the merge needs
        # the committed manifest), so it CAN materialize in a background
        # thread while window i shuffles/merges/commits, without touching
        # the exactly-once boundary (a crash discards the prefetch).
        # Measured on the single-node sandbox it is a LOSS (28.1 s vs
        # 16.2 s at 32 cpus): the two concurrent executions each carry
        # their own resource limit, so the shared block data path runs
        # 2x the saturation width. On a multi-node cluster where window
        # i+1's read lands on different nodes' disks than window i's
        # shuffle, enable with ETL_RAY_PREFETCH=1 and re-measure.
        prefetch_on = os.environ.get("ETL_RAY_PREFETCH", "0") == "1"
        prefetch: dict[int, Any] = {}

        def _start_prefetch(idx: int):
            import threading

            # dataset CONSTRUCTION stays on the main thread — read_parquet
            # path resolution does lazy driver-side imports that race when
            # two threads construct datasets concurrently (observed:
            # partially-imported fsspec module). Only the EXECUTION
            # (materialize) runs in the background.
            ds_next = self._build_validated(run_list[idx], schema)
            holder: list = []

            def go():
                try:
                    holder.append(ds_next.materialize())
                except BaseException as e:  # surface on join
                    holder.append(e)

            t = threading.Thread(target=go, daemon=True)
            t.start()
            prefetch[idx] = (t, holder)

        def _take_prefetch(idx: int):
            if idx not in prefetch:
                return None
            t, holder = prefetch.pop(idx)
            t.join()
            if holder and isinstance(holder[0], BaseException):
                return None  # fall back to a fresh build
            return holder[0] if holder else None

        try:
            with self._parallelism_scope(), self._shuffle_scope():
                for i, w in enumerate(run_list):
                    w.index += base_windows
                    # per-file rows come from the window plan — no second
                    # footer read per file per pass
                    for f, n in zip(w.files, w.file_rows):
                        cursor_fp = chain_fingerprint(cursor_fp, f, n)
                    cursor_files += len(w.files)
                    if prefetch_on and i + 1 < len(run_list):
                        _start_prefetch(i + 1)
                    out[f"window_{w.index}"] = self.run_window(
                        w,
                        schema,
                        log_cursor=(cursor_files, cursor_fp),
                        validated=_take_prefetch(i),
                    )
                    ran += 1
                    # this prefix is now committed AND was chained by us
                    self._verified_prefix = (cursor_files, cursor_fp)
        finally:
            for t, _h in prefetch.values():
                t.join()
        out["windows_run"] = ran
        m = self.store.current()
        if m:
            out["checkpoint_id"] = m.checkpoint_id
            out["metrics"] = m.metrics
        return out

    def _build_validated(self, window: Window, schema: pa.Schema) -> rd.Dataset:
        """The pure (state-independent) prefix of the window pipeline:
        pruned unified-schema read + validate/route/combine. Safe to
        execute ahead of the previous window's commit."""
        # Block count: at least 2x the effective parallelism AND enough
        # that a block stays ~64 MB of compressed parquet (~150-200 MB in
        # memory). Sizing blocks to CPUs alone is a trap: a large window
        # on few CPUs would produce GB-sized blocks and thrash the object
        # store (measured 2-5x degradation on a 12.6M-event window).
        window_bytes = sum(os.path.getsize(f) for f in window.files)
        n_blocks = max(
            2 * self._data_parallelism,
            len(window.files),
            int(window_bytes // (64 << 20)) + 1,
        )
        with _DATASET_BUILD_LOCK, self._parallelism_scope(), \
                self._shuffle_scope():
            ds = read_window(window, schema, override_num_blocks=n_blocks)
            return ds.map_batches(
                make_validate_fn(self.num_partitions),
                batch_format="pyarrow",
                batch_size=self.batch_size,
                zero_copy_batch=True,
            )

    def run_window(
        self,
        window: Window,
        schema: pa.Schema,
        log_cursor: tuple[int, str] | None = None,
        validated: rd.Dataset | None = None,
    ) -> dict[str, Any]:
        """Execute one checkpoint window end-to-end and commit it.

        ``log_cursor`` = (segment files consumed after this window, chained
        prefix fingerprint) — persisted in the manifest as the durable
        resume cursor. ``validated``: optionally a pre-materialized
        read+validate dataset for this window (the replay loop's
        read-ahead); the merge/commit half always runs here.
        """
        t0 = time.perf_counter()
        prior = self.store.current() or Manifest(num_partitions=self.num_partitions)
        if prior.checkpoint_id >= 0 and prior.num_partitions and \
                prior.num_partitions != self.num_partitions:
            raise ValueError(
                f"engine routes by {self.num_partitions} partitions but the "
                f"lake is laid out in {prior.num_partitions} (repartitioned "
                "elsewhere?) — rebuild the engine from the lake dir")
        ckpt_id = prior.checkpoint_id + 1  # provisional under a scoped writer

        payload_types = self._widen_payload_types(prior.payload_types, schema)

        if self._scope is None:
            staging = self.store.staging_dir(ckpt_id)
        else:
            # checkpoint id is assigned at commit (rebase) — stage under a
            # writer-unique name so concurrent writers never collide
            staging = self.store.staging_dir_named(
                f"scoped-{self._stream}-e{self._fence_epoch():06d}"
                f"-w{window.index:06d}"
            )
        prior_files = {
            int(p): self.store.abs_path(info["file"])
            for p, info in prior.partitions.items()
        }
        if self.ensure_actors:
            import hashlib as _hl

            from etl_ray.stages.ensure import get_or_create_actors, make_actor_merge_fn

            if any(info.get("deltas") for info in prior.partitions.values()):
                raise RuntimeError(
                    "this lake has merge-on-read delta chains; the ensure-"
                    "actor path reads base files only — run "
                    "ReplayEngine(lake).compact() (CLI: `python -m "
                    "etl_ray.cli compact --lake ...`) before enabling "
                    "ETL_RAY_ENSURE_ACTORS"
                )

            tag = _hl.md5(os.path.abspath(self.lake_dir).encode()).hexdigest()[:10]
            actors = get_or_create_actors(self.ensure_actors, tag)
            prior_ckpts = {
                int(p): info.get("ckpt", -1) for p, info in prior.partitions.items()
            }
            merge = make_actor_merge_fn(
                actors, staging, prior_files, prior_ckpts, payload_types, ckpt_id
            )
        else:
            prior_deltas = {
                int(p): [self.store.abs_path(d) for d in info.get("deltas", [])]
                for p, info in prior.partitions.items()
                if info.get("deltas")
            }
            prior_sizes = {
                int(p): int(info.get("rows", 0)) + int(info.get("tombstones", 0))
                for p, info in prior.partitions.items()
            }
            merge = make_merge_fn(
                staging, prior_files, payload_types, ckpt_id,
                prior_deltas=prior_deltas, prior_sizes=prior_sizes,
                delta_chain=self.delta_chain, chain_max=self.chain_max,
                compact_ratio=self.compact_ratio, changefeed=self.changefeed,
            )
        # NOTE: pipelines are built inside the parallelism/shuffle scopes
        # — Ray snapshots DataContext at Dataset creation, so settings
        # applied after dataset construction would not apply.
        window_bytes = sum(os.path.getsize(f) for f in window.files)
        # exec_sec measures the PIPELINE (read -> exchange -> merge) only;
        # driver-side setup above (manifest load, merge-fn construction,
        # actor spawn in ensure mode) belongs to wall_sec, not exec_sec —
        # profile_window.py's phase attribution depends on the split
        # SMALL-WINDOW FAST PATH (tail-mode latency): below
        # ETL_RAY_SMALL_WINDOW_BYTES (default 32 MB of source parquet) the
        # read+validate runs as ONE Ray task feeding the same exchange
        # kernels — a Dataset at that size spends ~0.4-0.6 s on streaming-
        # executor startup alone, the dominant term of the per-commit
        # latency floor (bench.py --tail). Results are byte-identical
        # (same scanner schema backfill, same validate/fold/merge
        # kernels; tests/test_small_window.py pins parity). Bulk-replay
        # windows (~128 MB+) never take this branch.
        small_bytes = int(
            os.environ.get("ETL_RAY_SMALL_WINDOW_BYTES", str(32 << 20))
        )
        fast_small = (
            validated is None
            and window_bytes <= small_bytes
            and os.environ.get("ETL_RAY_SHUFFLE", "direct") == "direct"
        )
        t_pipe = time.perf_counter()
        with self._parallelism_scope(), self._shuffle_scope():
            ds = (
                validated
                if validated is not None or fast_small
                else self._build_validated(window, schema)
            )
            # shuffle partition count: CPU-based floor, data-based bump —
            # a merge group materializes its whole slice (prior + delta),
            # so groups are kept near ~128 MB of source data regardless
            # of how few CPUs the cluster advertises
            shuffle_parts = min(
                self.num_partitions,
                max(self.shuffle_partitions, int(window_bytes // (128 << 20)) + 1),
            )
            # round UP to a multiple of the effective worker slots: a
            # 10-range exchange on 8 slots runs a second round that is
            # 2/8 occupied (~38% of the merge wall idle — exactly the
            # high-CPU side of the 2-vs-8 scaling protocol), while the
            # same 10 ranges pack 2 slots perfectly; more, smaller
            # ranges only shrink per-group memory. Packing matters
            # whenever more than one round is needed.
            shuffle_parts = pack_exchange_width(
                shuffle_parts, self._data_parallelism, self.num_partitions
            )
            if os.environ.get("ETL_RAY_SHUFFLE", "direct") == "direct":
                # default: the known-boundary 2-round exchange (below) —
                # no sampling pass, no sort barrier
                if fast_small:
                    refs = _read_validate_split_task.options(
                        num_returns=shuffle_parts
                    ).remote(
                        list(window.files), schema,
                        self.num_partitions, shuffle_parts,
                    )
                    if shuffle_parts == 1:
                        refs = [refs]
                    blocks = self._direct_exchange(
                        list(refs), merge, shuffle_parts
                    )
                else:
                    blocks = self._direct_exchange(ds, merge, shuffle_parts)
                stats_ds = None
            else:
                stats_ds = ds.groupby(
                    "part", num_partitions=shuffle_parts
                ).map_groups(merge, batch_format="pyarrow")
                # tiny result: metrics + per-(repo,lang) delta rows only —
                # collected as Arrow blocks, never as Python row dicts
                blocks = [
                    t for t in ray.get(stats_ds.to_arrow_refs()) if t.num_rows
                ]
        t_exec = time.perf_counter() - t_pipe
        if os.environ.get("ETL_RAY_PROFILE") and stats_ds is not None:
            print(stats_ds.stats())
        stats_t = (
            pa.concat_tables(blocks, promote_options="default") if blocks else None
        )

        met_rows: list[dict] = []
        deltas = None
        if stats_t is not None and stats_t.num_rows:
            kinds = stats_t.column("kind")
            met_rows = stats_t.filter(pc.equal(kinds, "metrics")).to_pylist()
            deltas = stats_t.filter(pc.equal(kinds, "delta"))

        if self._scope is not None:
            return self._commit_scoped_window(
                window, schema, prior, met_rows, deltas, staging,
                log_cursor, t0, t_exec,
            )

        # --- fold window results into the next manifest --------------------
        m = Manifest(
            checkpoint_id=ckpt_id,
            num_partitions=self.num_partitions,
            summaries=dict(prior.summaries),
            payload_types=payload_types,
            windows_done=window.index + 1,
            log_files_done=log_cursor[0] if log_cursor else prior.log_files_done,
            log_fingerprint=log_cursor[1] if log_cursor else prior.log_fingerprint,
            cursors={k: dict(v) for k, v in prior.cursors.items()},
        )
        agg = self._new_agg()
        m.partitions, cf_files, cf_rows = self._fold_partition_rows(
            prior.partitions, met_rows, ckpt_id, staging, agg
        )
        m.summaries = self._fold_summaries(prior.summaries, deltas, staging)

        # --- dead-letter queue ----------------------------------------------
        # snapshot-carried like ``partitions``: rollback to N automatically
        # drops rejects staged after N; gc retains referenced reject files
        m.rejects = dict(prior.rejects)
        if self.dlq and agg["invalid"]:
            rej = self._stage_rejects(window, staging, ckpt_id)
            if rej["rows"]:
                m.rejects[str(ckpt_id)] = rej
            agg["rejects_quarantined"] = rej["rows"]

        # --- change data feed (opt-in) ---------------------------------------
        m.changes = dict(prior.changes)
        if cf_files:
            m.changes[str(ckpt_id)] = {"files": sorted(cf_files), "rows": cf_rows}
            agg["changes_rows"] = cf_rows

        agg["window_rows"] = window.rows
        agg["exec_sec"] = round(t_exec, 4)  # pipeline (read→merge) wall
        agg["wall_sec"] = round(time.perf_counter() - t0, 4)
        m.metrics = agg
        self.store.commit(m, epoch=self._fence_epoch())  # ← the exactly-once boundary
        return agg

    # ----------------------------------------------- window-fold helpers

    @staticmethod
    def _new_agg() -> dict[str, Any]:
        return {
            k: 0
            for k in ("events_in", "applied", "inserts", "updates", "deletes",
                      "stale", "invalid", "parts_touched", "parts_changed")
        }

    def _widen_payload_types(
        self, base_types: dict[str, str], schema: pa.Schema
    ) -> dict[str, str]:
        """Evolved payload columns = anything beyond the core event
        envelope, remembered across windows in the manifest (additive
        evolution); a known column reappearing with a different numeric
        type WIDENS via the lossless lattice (schema.py:widen_type) —
        old partition files keep their narrow type on disk and cast up
        at read."""
        payload_types = dict(base_types)
        for f in schema:
            if f.name in _CORE:
                continue
            prev = payload_types.get(f.name)
            if prev is None:
                payload_types[f.name] = str(f.type)
            else:
                prev_t = pa.type_for_alias(prev)
                if not prev_t.equals(f.type):
                    payload_types[f.name] = str(widen_type(prev_t, f.type))
        return payload_types

    def _fold_partition_rows(
        self,
        base_parts: dict[str, dict[str, Any]],
        met_rows: list[dict],
        ckpt_id: int,
        staging: str,
        agg: dict[str, Any],
    ) -> tuple[dict[str, dict[str, Any]], list[str], int]:
        """Fold the merge stage's per-partition metrics rows onto a base
        partition map; accumulates audit counters into ``agg``. Returns
        (partitions, changefeed file relpaths, changefeed rows)."""
        parts = dict(base_parts)
        cf_files: list[str] = []
        cf_rows = 0
        for row in met_rows:
            part = str(row["part"])
            prev = base_parts.get(part, {})
            prev_wm = prev.get("watermark", -1)
            mode = row.get("mode") or "rewrite"
            if mode == "delta":
                # merge-on-read append: base file unchanged, chain grows
                file_rel = prev["file"]
                chain_rels = list(prev.get("deltas", [])) + [
                    self.store.rel_path(row["staged_file"])
                ]
            elif mode == "none":
                # untouched partition: keep base AND its existing chain
                file_rel = prev.get(
                    "file", self.store.rel_path(row["staged_file"])
                )
                chain_rels = list(prev.get("deltas", []))
            else:  # rewrite / compaction: chain folded into a new base
                file_rel = self.store.rel_path(row["staged_file"])
                chain_rels = []
            entry = {
                "file": file_rel,
                "rows": row["state_rows"],
                "tombstones": row["tombstones"],
                "watermark": max(prev_wm, row["watermark"]),
                # checkpoint that last rewrote this partition's file —
                # the ensure-actor cache key (stages/ensure.py)
                "ckpt": ckpt_id if row["changed"] else prev.get("ckpt", -1),
            }
            if chain_rels:
                entry["deltas"] = chain_rels
            parts[part] = entry
            for k in ("events_in", "applied", "inserts", "updates",
                      "deletes", "stale", "invalid"):
                agg[k] += row[k] or 0
            agg["parts_touched"] += 1
            agg["parts_changed"] += 1 if row["changed"] else 0
            if row.get("changes_rows"):
                # deterministic per-partition name — reconstructable,
                # never listed from disk (the manifest IS the lake)
                cf_files.append(
                    self.store.rel_path(
                        os.path.join(
                            staging, f"changes-{int(row['part']):05d}.parquet"
                        )
                    )
                )
                cf_rows += int(row["changes_rows"])
        return parts, cf_files, cf_rows

    def _fold_summaries(
        self, base_summaries: dict[str, str], deltas, staging: str
    ) -> dict[str, str]:
        """Incremental rollups (delta-by-delta): fold the window's
        (repo, lang) delta rows onto the base summary and stage the new
        summary files. Returns the summaries relpath map."""
        prior_base_path = (
            self.store.abs_path(base_summaries["summary_repo_lang"])
            if "summary_repo_lang" in base_summaries
            else None
        )
        dl = (
            deltas.select(["repo", "lang", "d_files", "d_bytes", "w_cs"])
            if deltas is not None and deltas.num_rows
            else pa.table(
                {
                    "repo": pa.array([], pa.string()),
                    "lang": pa.array([], pa.string()),
                    "d_files": pa.array([], pa.int64()),
                    "d_bytes": pa.array([], pa.int64()),
                    "w_cs": pa.array([], pa.int64()),
                }
            )
        )
        import pyarrow.parquet as _pq

        base_rows = (
            _pq.read_metadata(prior_base_path).num_rows if prior_base_path else 0
        )
        if base_rows + dl.num_rows > rollups.RAY_THRESHOLD:
            # scale path: distributed fold (see rollups.update_base_ray)
            out_path = os.path.join(staging, "summary_repo_lang.parquet")
            rollups.update_base_ray(prior_base_path, dl, out_path)
            new_base = _pq.read_table(out_path)
        else:
            new_base = rollups.update_base(rollups.load_base(prior_base_path), dl)
        summary_paths = rollups.stage_summaries(new_base, staging)
        return {k: self.store.rel_path(v) for k, v in summary_paths.items()}

    def _commit_scoped_window(
        self,
        window: Window,
        schema: pa.Schema,
        prior: Manifest,
        met_rows: list[dict],
        deltas,
        staging: str,
        log_cursor: tuple[int, str] | None,
        t0: float,
        t_exec: float,
    ) -> dict[str, Any]:
        """Commit one window from a PARTITION-SCOPED writer.

        The merge above ran against ``prior`` (the manifest at window
        start); safety requires only that the SCOPE's entries are
        unchanged at commit — other writers advancing disjoint
        partitions, summaries, rejects or cursors in the meantime is the
        point. ``commit_scoped`` verifies that per-partition snapshot
        under the lake commit lock and rejects with StaleWriterError
        otherwise; the manifest committed here is REBASED onto the
        current snapshot inside the lock (partitions of other scopes,
        rejects, cursors, payload types and the rollup summary all fold
        onto ``cur``'s values, never ``prior``'s)."""
        from etl_ray.state.manifest import StaleWriterError

        touched = {int(r["part"]) for r in met_rows}
        out_of_scope = touched - self._scope
        if out_of_scope:
            raise ValueError(
                f"scoped writer '{self._stream}' received events routing "
                f"to partitions outside its scope: "
                f"{sorted(out_of_scope)[:8]} — each scoped writer must "
                "tail a feed pre-routed to its partition scope"
            )
        prior_entries = {
            str(p): prior.partitions.get(str(p)) for p in self._scope
        }

        def build(cur: Manifest | None, ckpt_id: int) -> Manifest:
            base = cur or Manifest(num_partitions=self.num_partitions)
            if (
                base.checkpoint_id >= 0
                and base.num_partitions
                and base.num_partitions != self.num_partitions
            ):
                raise StaleWriterError(
                    f"lake was repartitioned to {base.num_partitions} "
                    f"partitions while scoped writer '{self._stream}' "
                    f"routed by {self.num_partitions}"
                )
            agg = self._new_agg()
            parts, _cf, _cfr = self._fold_partition_rows(
                base.partitions, met_rows, ckpt_id, staging, agg
            )
            m = Manifest(
                checkpoint_id=ckpt_id,
                num_partitions=self.num_partitions,
                partitions=parts,
                payload_types=self._widen_payload_types(
                    base.payload_types, schema
                ),
                windows_done=base.windows_done + 1,
                log_files_done=base.log_files_done,
                log_fingerprint=base.log_fingerprint,
            )
            m.summaries = self._fold_summaries(base.summaries, deltas, staging)
            m.rejects = dict(base.rejects)
            if self.dlq and agg["invalid"]:
                # staged INSIDE the lock: reject files embed the
                # checkpoint id, which exists only after rebase
                rej = self._stage_rejects(window, staging, ckpt_id)
                if rej["rows"]:
                    m.rejects[str(ckpt_id)] = rej
                agg["rejects_quarantined"] = rej["rows"]
            m.changes = dict(base.changes)
            m.cursors = {k: dict(v) for k, v in base.cursors.items()}
            cursor = dict(m.cursors.get(self._stream, {}))
            if log_cursor:
                cursor["files_done"] = log_cursor[0]
                cursor["fingerprint"] = log_cursor[1]
            cursor["windows_done"] = window.index + 1
            m.cursors[self._stream] = cursor
            agg["window_rows"] = window.rows
            agg["stream"] = self._stream
            agg["exec_sec"] = round(t_exec, 4)
            agg["wall_sec"] = round(time.perf_counter() - t0, 4)
            m.metrics = agg
            return m

        m = self.store.commit_scoped(
            build, self._fence_epoch(), self._scope, prior_entries
        )
        return dict(m.metrics)

    def _stage_rejects(self, window: Window, staging: str, ckpt_id: int) -> dict:
        """Quarantine the window's invalid events (one raw task per
        segment file, deterministic staged names). Returns the manifest
        entry: {"files": [relpaths], "rows": n, "reasons": {reason: n}}.
        Runs ONLY when the window's audit metrics counted invalid rows,
        so clean streams never re-read a byte."""
        outs = [
            os.path.join(staging, f"rejects-{i:05d}.parquet")
            for i in range(len(window.files))
        ]
        got = ray.get(
            [
                _stage_rejects_task.remote(f, out, ckpt_id)
                for f, out in zip(window.files, outs)
            ]
        )
        files, rows, reasons = [], 0, {}
        for out, (n, rc) in zip(outs, got):
            if n:
                files.append(self.store.rel_path(out))
                rows += n
                for k, v in rc.items():
                    reasons[k] = reasons.get(k, 0) + v
        return {"files": files, "rows": rows, "reasons": reasons}

    # ------------------------------------------------------------- reading

    def rejects(self) -> rd.Dataset:
        """The dead-letter queue under the current manifest, as a Dataset.

        Uniform schema (core envelope + ``reject_reason`` +
        ``checkpoint_id`` + ``source_file``) — never ragged, because the
        DLQ keeps the envelope only and points at the source segment for
        evolved payload columns."""
        m = self._require_manifest()
        files = [
            self.store.abs_path(f)
            for _ckpt, info in sorted(m.rejects.items())
            for f in info.get("files", [])
        ]
        if not files:
            return rd.from_arrow(_REJECT_EMPTY)
        # partitioning=None: staged paths look hive-partitioned
        # (_staging/ckpt=N/) and would otherwise grow a spurious 'ckpt'
        # string column duplicating checkpoint_id
        return rd.read_parquet(files, partitioning=None)

    def changefeed_prune(self, up_to: int) -> dict[str, Any]:
        """Drop change-feed entries for checkpoints <= ``up_to`` — the
        consumer-acknowledged retention cut (Delta-CDF retention
        analog: once every downstream cursor has advanced past
        ``up_to``, the feed files behind it are dead weight).
        Committed as a normal fenced checkpoint (atomic, rollback-able,
        audit-visible); the dropped files become unreferenced and the
        next :meth:`~etl_ray.state.manifest.ManifestStore.gc` reclaims
        them."""
        return self._prune_feed("changes", up_to, "changefeed_prune")

    def rejects_prune(self, up_to: int) -> dict[str, Any]:
        """Drain acknowledged dead-letter entries (checkpoints <=
        ``up_to``) after an operator has inspected / re-delivered them
        — same commit mechanics as :meth:`changefeed_prune`."""
        return self._prune_feed("rejects", up_to, "rejects_prune")

    def _prune_feed(self, attr: str, up_to: int, op: str) -> dict[str, Any]:
        import dataclasses

        if self._scope is not None:
            raise RuntimeError(
                f"{op}() is a global maintenance op — run it from an "
                "unscoped engine"
            )
        m = self._require_manifest()
        d = getattr(m, attr)
        keep = {k: v for k, v in d.items() if int(k) > up_to}
        dropped_rows = sum(
            int(v.get("rows", 0)) for k, v in d.items() if int(k) <= up_to
        )
        if len(keep) == len(d):
            return {"dropped_entries": 0, "dropped_rows": 0,
                    "checkpoint_id": m.checkpoint_id}
        new = dataclasses.replace(
            m,
            checkpoint_id=m.checkpoint_id + 1,
            **{attr: keep},
            metrics={"op": op, "up_to": up_to,
                     "dropped_entries": len(d) - len(keep),
                     "dropped_rows": dropped_rows},
        )
        self.store.commit(new, epoch=self._fence_epoch())
        return {"dropped_entries": len(d) - len(keep),
                "dropped_rows": dropped_rows,
                "checkpoint_id": new.checkpoint_id}

    def changefeed_read(
        self, since: int | None = None, until: int | None = None
    ) -> rd.Dataset:
        """The change data feed (opt-in writes, ETL_RAY_CHANGEFEED=1) as a
        Dataset: row-level effective changes (insert/update/delete + the
        post-image content sha) per committed checkpoint. ``since``/
        ``until`` bound the checkpoint range inclusively — the incremental-
        consumer read ("give me everything after my last cursor"), pruned
        at the FILE level from the manifest, no data read outside the
        range. The Delta-CDF-shaped output surface for downstream
        pipelines (reference analog: the per-day audit deltas,
        etl/audit/logger.py:81-103, at row grain)."""
        m = self._require_manifest()
        files = [
            self.store.abs_path(f)
            for ckpt, info in sorted(m.changes.items(), key=lambda kv: int(kv[0]))
            if (since is None or int(ckpt) >= since)
            and (until is None or int(ckpt) <= until)
            for f in info.get("files", [])
        ]
        if not files:
            return rd.from_arrow(_CHANGES_EMPTY)
        return rd.read_parquet(files, partitioning=None)  # see rejects()

    def repartition(self, new_num_partitions: int) -> dict[str, Any]:
        """Online re-shard: rewrite the lake from P to P' partitions in
        one two-round distributed pass and commit it as a new checkpoint
        — the operational lever a fixed-at-bootstrap partition count
        otherwise lacks (shrink an over-sharded lake, grow a hot one;
        reference analog: Citus shard rebalancing). Round 1: one task
        per OLD partition folds its delta chain and splits rows by the
        NEW routing hash (the same partition_ids the exchange and
        lookup use) into per-(src, dst) shard files. Round 2: one task
        per NEW partition concatenates its shards into the final base
        file and reports (rows, tombstones, watermark). Tombstones are
        carried (stale events still can't resurrect), MOR chains fold
        away, summaries / rejects / changefeed / resume cursor carry
        unchanged, and the swap is the usual atomic manifest commit —
        crash-safe, time-travel keeps working against the old layout.
        """
        import pyarrow.parquet as _pq

        from etl_ray.hashing import partition_ids
        from etl_ray.stages.merge import fold_state_chain, write_atomic_parquet

        if new_num_partitions < 1:
            raise ValueError("new_num_partitions must be >= 1")
        m = self._require_manifest()
        ckpt_id = m.checkpoint_id + 1
        staging = self.store.staging_dir(ckpt_id)
        new_p = int(new_num_partitions)

        @ray.remote
        def split_old(files: list[str], src: int, staging: str,
                      new_p: int) -> list[tuple[int, str]]:
            tabs = [_pq.read_table(f) for f in files]
            cols, seen = [], set()
            for tab in tabs:
                for f in tab.schema:
                    if f.name not in seen:
                        seen.add(f.name)
                        cols.append((f.name, f.type))
            t = fold_state_chain(tabs, cols) if len(tabs) > 1 else tabs[0]
            if t.num_rows == 0:
                return []
            dst = partition_ids(t.column("repo"), t.column("path"), new_p)
            t = t.set_column(t.schema.get_field_index("part"), "part",
                             dst.cast(t.schema.field("part").type))
            dst_np = dst.to_numpy(zero_copy_only=False)
            out = []
            for d in sorted(set(dst_np.tolist())):
                shard = t.filter(pa.array(dst_np == d))
                path = os.path.join(
                    staging, f"repart-src{src:05d}-dst{int(d):05d}.parquet")
                write_atomic_parquet(shard, path)
                out.append((int(d), path))
            return out

        shard_lists = ray.get([
            split_old.remote(
                [self.store.abs_path(info["file"])]
                + [self.store.abs_path(x) for x in info.get("deltas", [])],
                int(src), staging, new_p)
            for src, info in m.partitions.items()
        ])
        by_dst: dict[int, list[str]] = {}
        for shards in shard_lists:
            for d, path in shards:
                by_dst.setdefault(d, []).append(path)

        @ray.remote
        def build_new(files: list[str], out_path: str) -> tuple[int, int, int]:
            tabs = [_pq.read_table(f) for f in sorted(files)]
            t = pa.concat_tables([x for x in tabs if x.num_rows], promote_options="default")
            write_atomic_parquet(t, out_path)
            tomb = int(pc.sum(pc.cast(pc.fill_null(
                t.column("deleted"), False), pa.int64())).as_py() or 0)
            wm = pc.max(t.column("commit_seq")).as_py()
            return t.num_rows, tomb, int(wm if wm is not None else -1)

        refs = {
            d: (build_new.remote(
                files, os.path.join(staging, f"part-{d:05d}.parquet")),
                os.path.join(staging, f"part-{d:05d}.parquet"))
            for d, files in by_dst.items()
        }
        new_parts: dict[str, dict[str, Any]] = {}
        total_rows = 0
        for d, (ref, out) in refs.items():
            rows, tomb, wm = ray.get(ref)
            total_rows += rows - tomb
            # manifest convention: "rows" = LIVE rows; the parquet footer
            # holds rows + tombstones (what fsck reconciles against)
            new_parts[str(d)] = {
                "file": self.store.rel_path(out), "rows": rows - tomb,
                "tombstones": tomb, "watermark": wm, "ckpt": ckpt_id,
            }
        new_m = Manifest(
            checkpoint_id=ckpt_id,
            num_partitions=new_p,
            partitions=new_parts,
            summaries=dict(m.summaries),
            payload_types=dict(m.payload_types),
            windows_done=m.windows_done,
            log_files_done=m.log_files_done,
            log_fingerprint=m.log_fingerprint,
            metrics={**m.metrics, "repartitioned_from": m.num_partitions,
                     "repartitioned_to": new_p},
            rejects=dict(m.rejects),
            changes=dict(m.changes),
            cursors={k: dict(v) for k, v in m.cursors.items()},
        )
        self.store.commit(new_m, epoch=self._fence_epoch())
        # sync the LIVE engine: subsequent apply()/replay() on this
        # instance must route by the new layout (a stale
        # self.num_partitions silently splits keys across layouts)
        self.num_partitions = new_p
        self.shuffle_partitions = max(
            2, min(new_p, self._data_parallelism))
        return {"checkpoint_id": ckpt_id, "num_partitions": new_p,
                "rows": total_rows, "old_partitions": m.num_partitions}

    def plan_partitions(self, **kwargs) -> dict[str, Any]:
        """Density-driven partition-plan advisor (state/planner.py): read
        per-partition rows/bytes from manifest lineage, exactly simulate
        candidate layouts from the actual key hashes, and recommend a
        new P (execute it with :meth:`repartition`) plus a hot-repo salt
        list for the join-salting path. Reference analog: the KD-tree
        density balancer, etl/partition_builder/02_kd_tree_construction
        .sql:36-60 over the 5k heatmap (01_5k_heatmap.sql:11-15)."""
        from etl_ray.state.planner import plan_partitions

        return plan_partitions(self.lake_dir, **kwargs)

    def maintain(
        self,
        apply: bool = False,
        tolerance: float = 2.0,
        target_rows_per_partition: int | None = None,
        gc_keep: int | None = 2,
    ) -> dict[str, Any]:
        """Lake autopilot: the maintenance loop an operator would
        otherwise run by hand (the r4 gap: the advisor existed but skew
        had to be noticed manually). One call, fixed order:

        1. **compact** — fold merge-on-read delta chains into their base
           files first (so the planner's pruned key pass reads each key
           once, and a subsequent repartition moves single files);
           skipped when no partition carries a chain.
        2. **plan** — the density advisor (:meth:`plan_partitions`).
        3. **repartition** — executed only when the plan says ``skewed``,
           recommends a different P, AND ``apply=True``; with
           ``apply=False`` (default) this is a dry run that reports what
           it would do — the operator reviews ``plan`` first, like the
           reference's offline KD-tree rebuild being an explicit step
           (etl/partition_builder/10_execute.sql:1-10).
        4. **gc + manifest expiry** — reclaim unreferenced staged files
           and fold manifests older than the same ``gc_keep`` retention
           into the append-only audit log
           (``state/manifest.py:expire``); ``metrics_history`` stays
           complete, time travel beyond the retention window ends —
           exactly :meth:`ManifestStore.gc`'s existing file-retention
           contract applied to the manifest lineage itself (None skips
           both).

        Global-only (like compact/repartition/rollback): a scoped
        concurrent writer must not rewrite partitions it does not own.
        """
        if self._scope is not None:
            raise RuntimeError(
                "maintain() is a global maintenance op — run it from an "
                "unscoped engine (scoped writers own only their "
                "partition subset)"
            )
        m = self._require_manifest()
        report: dict[str, Any] = {"applied": apply}
        if any(info.get("deltas") for info in m.partitions.values()):
            report["compacted"] = self.compact()
        else:
            report["compacted"] = None
        plan = self.plan_partitions(
            tolerance=tolerance,
            target_rows_per_partition=target_rows_per_partition,
        )
        report["plan"] = plan
        rec = plan["recommended_p"]
        should = bool(plan["skewed"] and rec != plan["current"]["num_partitions"])
        report["repartition_needed"] = should
        if should and apply:
            report["repartitioned"] = self.repartition(rec)
            # engine now routes by the new layout
        else:
            report["repartitioned"] = None
        if gc_keep is not None:
            report["gc_deleted"] = len(self.store.gc(keep_checkpoints=gc_keep))
            report["manifests_expired"] = self.store.expire(
                keep_checkpoints=gc_keep
            )["expired"]
        else:
            report["gc_deleted"] = 0
            report["manifests_expired"] = 0
        return report

    def compact(self) -> dict[str, Any]:
        """Fold EVERY partition's delta chain back into its base file and
        commit a new checkpoint (the maintenance OPTIMIZE — reference
        analog: the explicit month-partition maintenance scripts,
        ``etl/init/single_statement_sql/98_rollback.sql`` discipline).
        Untouched-by-any-window partitions are compacted too, which the
        per-window compaction trigger can never reach. One raw task per
        chained partition; the driver sees row counts only. Required
        before enabling the ensure-actor path on a chained lake."""
        import pyarrow.parquet as _pq

        from etl_ray.stages.merge import fold_state_chain, write_atomic_parquet

        m = self._require_manifest()
        chained = {p: i for p, i in m.partitions.items() if i.get("deltas")}
        if not chained:
            return {"compacted": 0, "checkpoint_id": m.checkpoint_id}
        ckpt_id = m.checkpoint_id + 1
        staging = self.store.staging_dir(ckpt_id)

        @ray.remote
        def compact_part(files: list[str], out_path: str) -> int:
            tabs = [_pq.read_table(f) for f in files]
            cols, seen = [], set()
            for tab in tabs:
                for f in tab.schema:
                    if f.name not in seen:
                        seen.add(f.name)
                        cols.append((f.name, f.type))
            folded = fold_state_chain(tabs, cols)
            write_atomic_parquet(folded, out_path)
            return folded.num_rows

        refs = {}
        for p, info in chained.items():
            files = [self.store.abs_path(info["file"])] + [
                self.store.abs_path(d) for d in info["deltas"]
            ]
            out = os.path.join(staging, f"part-{int(p):05d}.parquet")
            refs[p] = (compact_part.remote(files, out), out)
        new_m = Manifest(
            checkpoint_id=ckpt_id,
            num_partitions=m.num_partitions,
            partitions=dict(m.partitions),
            summaries=dict(m.summaries),
            payload_types=dict(m.payload_types),
            windows_done=m.windows_done,
            log_files_done=m.log_files_done,
            log_fingerprint=m.log_fingerprint,
            metrics={**m.metrics, "compacted_partitions": len(chained)},
            rejects=dict(m.rejects),
            changes=dict(m.changes),
            cursors={k: dict(v) for k, v in m.cursors.items()},
        )
        for p, (ref, out) in refs.items():
            ray.get(ref)
            entry = dict(m.partitions[p])
            entry.pop("deltas", None)
            entry["file"] = self.store.rel_path(out)
            entry["ckpt"] = ckpt_id
            new_m.partitions[p] = entry
        self.store.commit(new_m, epoch=self._fence_epoch())
        return {"compacted": len(chained), "checkpoint_id": ckpt_id}

    def export(
        self,
        out_dir: str,
        columns: list[str] | None = None,
        partition_cols: list[str] | None = None,
        as_of: int | None = None,
    ) -> dict[str, Any]:
        """Bulk-export the live state to a user-facing parquet dataset.

        Streams ``final_state`` (pruned read, tombstones dropped) through
        ``Dataset.write_parquet`` — one file per block, optionally
        hive-partitioned by ``partition_cols`` (e.g. ["lang"]) so a
        failed export can be re-run per partition directory and
        downstream readers prune at the directory level. Never
        materializes the state on the driver. Reference analog: the bulk
        sink S9 (etl/insert/bulk_inserter.py) pointed at files instead
        of a warehouse.
        """
        ds = self.final_state(columns=columns, as_of=as_of)
        if partition_cols:
            ds.write_parquet(out_dir, partition_cols=list(partition_cols))
        else:
            ds.write_parquet(out_dir)
        files = [
            os.path.join(dp, f)
            for dp, _dn, fn in os.walk(out_dir)
            for f in fn
            if f.endswith(".parquet")
        ]
        return {"out": out_dir, "files": len(files)}

    def fsck(self, deep: bool = False) -> dict[str, Any]:
        """Verify manifest ↔ storage invariants; returns {"ok", "errors",
        "checked_files"}. Parquet-footer checks only (no data reads)
        unless ``deep``:

        - every referenced file (partition bases, MOR chains, summaries,
          DLQ, changefeed) exists on disk;
        - each flat partition file's footer row count equals the
          manifest's ``rows + tombstones`` (chained partitions can't be
          checked from footers alone — chain folding dedups keys — so
          they're counted under ``deep``);
        - DLQ / changefeed per-checkpoint ``rows`` match the sum of
          their files' footer counts;
        - ``deep``: chained partitions are chain-folded and the live/
          tombstone split is recomputed and compared.

        Reference analog: the audit_log row-count reconciliation
        discipline (etl/audit/logger.py:81-103) as an explicit check.
        """
        import pyarrow.parquet as _pq

        m = self._require_manifest()
        errors: list[str] = []
        checked = 0

        def _exists(rel: str, what: str) -> str | None:
            nonlocal checked
            p = self.store.abs_path(rel)
            checked += 1
            if not os.path.exists(p):
                errors.append(f"{what}: missing file {rel}")
                return None
            return p

        for part, info in sorted(m.partitions.items(), key=lambda kv: int(kv[0])):
            p = _exists(info["file"], f"partition {part}")
            chain = [
                _exists(d, f"partition {part} chain") for d in info.get("deltas", [])
            ]
            want = int(info.get("rows", 0)) + int(info.get("tombstones", 0))
            if p and not info.get("deltas"):
                got = _pq.read_metadata(p).num_rows
                if got != want:
                    errors.append(
                        f"partition {part}: footer rows {got} != manifest "
                        f"rows+tombstones {want}"
                    )
            elif p and deep and all(chain):
                from etl_ray.stages.merge import fold_state_chain

                tabs = [_pq.read_table(f) for f in [p, *chain]]
                cols, seen = [], set()
                for tab in tabs:
                    for f in tab.schema:
                        if f.name not in seen:
                            seen.add(f.name)
                            cols.append((f.name, f.type))
                folded = fold_state_chain(tabs, cols)
                if folded.num_rows != want:
                    errors.append(
                        f"partition {part}: chain-folded rows "
                        f"{folded.num_rows} != manifest {want}"
                    )
        for name, rel in sorted(m.summaries.items()):
            _exists(rel, f"summary {name}")
        for label, d in (("rejects", m.rejects), ("changes", m.changes)):
            for ckpt, info in sorted(d.items()):
                got = 0
                for rel in info.get("files", []):
                    p = _exists(rel, f"{label} ckpt {ckpt}")
                    if p:
                        got += _pq.read_metadata(p).num_rows
                if got != int(info.get("rows", 0)):
                    errors.append(
                        f"{label} ckpt {ckpt}: footer rows {got} != "
                        f"manifest {info.get('rows', 0)}"
                    )
        return {"ok": not errors, "errors": errors, "checked_files": checked}

    def lookup(
        self,
        repo: str,
        path: str,
        columns: list[str] | None = None,
        as_of: int | None = None,
        as_of_seq: int | None = None,
    ) -> pa.Table:
        """Point read of one key's live row — the CDC serving path.

        The routing hash IS the index: ``part = hash(repo, path) % P``
        (hashing.py:partition_ids, the same function the exchange uses),
        so a lookup touches exactly ONE partition's base file (+ its
        merge-on-read chain when present) out of P — O(state/P) I/O
        regardless of lake size, no Dataset scan, no Ray tasks. Returns
        a 0- or 1-row Arrow table (tombstoned/absent keys → 0 rows).
        Reference analog: Citus routing a single-key query to one shard
        (etl/init/sql/50_citus_distribution.sql).
        """
        import pyarrow.parquet as _pq

        from etl_ray.hashing import partition_ids
        from etl_ray.stages.merge import fold_state_chain

        if as_of_seq is not None:
            if as_of is not None:
                raise ValueError("pass as_of or as_of_seq, not both")
            as_of = self.checkpoint_for_seq(as_of_seq)
        m = self.store.at(as_of) if as_of is not None else self._require_manifest()
        part = int(
            partition_ids(
                pa.array([repo], pa.string()),
                pa.array([path], pa.string()),
                m.num_partitions,
            )[0].as_py()
        )
        info = m.partitions.get(str(part))
        if info is None:
            from etl_ray.stages.merge import _empty_state

            t = _empty_state()
            return t.select([c for c in columns if c in t.column_names]) if columns else t
        key_filter = [("repo", "=", repo), ("path", "=", path)]
        files = [self.store.abs_path(info["file"])] + [
            self.store.abs_path(d) for d in info.get("deltas", [])
        ]
        tabs = [
            _pq.read_table(f, filters=key_filter) for f in files
        ]
        if len(tabs) > 1:
            cols, seen = [], set()
            for tab in tabs:
                for f in tab.schema:
                    if f.name not in seen:
                        seen.add(f.name)
                        cols.append((f.name, f.type))
            t = fold_state_chain(tabs, cols)
        else:
            t = tabs[0]
        t = t.filter(pc.invert(pc.fill_null(t.column("deleted"), False)))
        if columns:
            t = t.select([c for c in columns if c in t.column_names])
        return t

    def checkpoint_for_seq(self, seq: int) -> int:
        """Time travel by LOG POSITION: the latest committed checkpoint
        whose applied watermark (max commit_seq across partitions) is
        <= ``seq`` — how a replica anchors a read to an upstream LSN
        instead of an engine-internal checkpoint id. Snapshot-aligned:
        the returned checkpoint contains exactly the events its windows
        applied, all with commit_seq <= seq. Raises when no committed
        snapshot is old enough."""
        cur = self.store.current()
        if cur is None:
            raise ValueError("empty lake: no committed checkpoints")
        # scan DESCENDING from the current pointer only: numbered
        # manifests beyond it are rolled-back or crash-orphaned lineage
        # (store.at() refuses them) and must never anchor a read;
        # watermarks are monotone along the committed lineage, so the
        # first hit is the answer (O(1) manifest reads in the common
        # "recent seq" case, never O(history) JSON parses per lookup)
        for ckpt in range(cur.checkpoint_id, -1, -1):
            try:
                m = self.store.at(ckpt)
            except ValueError:
                continue
            wm = max(
                (part.get("watermark", -1) for part in m.partitions.values()),
                default=-1,
            )
            if wm <= seq:
                return ckpt
        raise ValueError(
            f"no committed checkpoint has watermark <= {seq}"
        )

    def final_state(
        self, columns: list[str] | None = None, as_of: int | None = None,
        commit_seq_range: tuple[int | None, int | None] | None = None,
        as_of_seq: int | None = None,
    ) -> rd.Dataset:
        """The lake's live rows as a streaming Dataset.

        Column pruning is pushed into the parquet read (only the
        requested columns + the tombstone flag leave storage).

        ``commit_seq_range=(lo, hi)`` (either bound None = open): only
        live rows whose commit_seq lies in the range. Pushed down THREE
        levels: (1) whole files/chains are skipped via parquet-footer
        zone maps (``prune_files_by_stats`` — a chain is skipped only
        when every file in it excludes the range, which is sound
        because a folded row's commit_seq is always one of the chain's
        stored values), (2) a pyarrow dataset filter prunes row groups
        inside the flat read, (3) a vectorized row filter makes the
        bound exact on every path.

        ``as_of``: TIME TRAVEL — read the state exactly as committed at
        an earlier checkpoint id, without moving the current pointer.
        Each manifest is a full snapshot, so this is a pure metadata
        redirect (no log replay, no extra I/O vs a current read); it
        stays valid until ``gc`` reclaims that snapshot's files.
        Reference analog: dipaal_rollback's erase-a-delta semantics
        (etl/init/single_statement_sql/98_rollback.sql), read-only.
        """
        if as_of_seq is not None:
            if as_of is not None:
                raise ValueError("pass as_of or as_of_seq, not both")
            as_of = self.checkpoint_for_seq(as_of_seq)
        m = self.store.at(as_of) if as_of is not None else self._require_manifest()
        flat_files = [
            self.store.abs_path(p["file"])
            for p in m.partitions.values()
            if not p.get("deltas")
        ]
        chained = [
            [self.store.abs_path(p["file"])]
            + [self.store.abs_path(d) for d in p["deltas"]]
            for p in m.partitions.values()
            if p.get("deltas")
        ]
        if not flat_files and not chained:
            raise ValueError("empty lake: no partitions committed yet")
        cs_lo = cs_hi = None
        if commit_seq_range is not None:
            cs_lo, cs_hi = commit_seq_range
            pruned_flat = prune_files_by_stats(
                flat_files, "commit_seq", cs_lo, cs_hi)
            pruned_chained = [
                files for files in chained
                if prune_files_by_stats(files, "commit_seq", cs_lo, cs_hi)
            ]
            if pruned_flat or pruned_chained:
                flat_files, chained = pruned_flat, pruned_chained
            else:
                # nothing can match: return a TYPED empty dataset built
                # from one footer schema (a filtered read would come back
                # as Ray's columnless empty blocks and lose the schema)
                import pyarrow.parquet as _pqz

                src = flat_files[0] if flat_files else chained[0][0]
                sch = _pqz.read_schema(src)

                def _etype(c: str) -> pa.DataType:
                    if sch.get_field_index(c) >= 0:
                        return sch.field(c).type
                    return pa.type_for_alias(
                        m.payload_types.get(c, "string"))

                # mirror a non-empty read's schema: columns when pruned,
                # else footer names ∪ evolved payload columns (incl.
                # 'deleted' — the non-empty path keeps it when
                # columns=None)
                out_cols = columns or list(dict.fromkeys(
                    [*sch.names, *m.payload_types.keys()]))
                return rd.from_arrow(pa.table(
                    {c: pa.array([], _etype(c)) for c in out_cols}))
        read_cols = None
        if columns:
            read_cols = list(dict.fromkeys([*columns, "deleted"]))
            if commit_seq_range is not None:
                read_cols = list(dict.fromkeys([*read_cols, "commit_seq"]))
        parts_ds = []
        if flat_files:
            # schema evolution can leave the lake's flat files RAGGED: a
            # partition untouched after a column was added keeps its old
            # schema (merge reuses the prior file when nothing changed),
            # and rd.read_parquet over heterogeneous files infers from
            # one fragment — missing-field errors or silent drops. When
            # the manifest records evolved columns, split the files by a
            # footer check (O(P) metadata reads): uniform files take the
            # plain pruned read; ragged ones are read per-file with
            # typed null backfill, mirroring the chain-fold path below.
            import pyarrow.parquet as _pqf

            want = read_cols
            if m.payload_types and want is None:
                first = set(_pqf.read_schema(flat_files[0]).names)
                want = list(
                    dict.fromkeys(
                        [*_pqf.read_schema(flat_files[0]).names,
                         *m.payload_types.keys()]
                    )
                )
                uniform_ok = all(
                    set(_pqf.read_schema(f).names) == first for f in flat_files
                ) and set(want) <= first
            else:
                uniform_ok = True
            if m.payload_types:
                need = set(want or [])
                uniform = [
                    f for f in flat_files
                    if uniform_ok and need <= set(_pqf.read_schema(f).names)
                ]
            else:
                uniform = flat_files
            ragged = [f for f in flat_files if f not in set(uniform)]
            if uniform:
                flt = None
                if commit_seq_range is not None:
                    import pyarrow.dataset as _pds

                    flt = _pds.field("commit_seq") >= (
                        cs_lo if cs_lo is not None else -(1 << 62))
                    if cs_hi is not None:
                        flt = flt & (_pds.field("commit_seq") <= cs_hi)
                parts_ds.append(
                    rd.read_parquet(uniform, columns=want, filter=flt))
            if ragged:
                fill_types = {
                    n: pa.type_for_alias(t) for n, t in m.payload_types.items()
                }

                @ray.remote
                def read_fill(f: str, cols: list[str]) -> pa.Table:
                    present = set(_pqf.read_schema(f).names)
                    t = _pqf.read_table(
                        f, columns=[c for c in cols if c in present]
                    )
                    for c in cols:
                        if c not in t.column_names:
                            t = t.append_column(
                                c,
                                pa.nulls(
                                    t.num_rows, fill_types.get(c, pa.string())
                                ),
                            )
                    return t.select(cols)

                parts_ds.append(
                    rd.from_arrow_refs(
                        [read_fill.remote(f, list(want)) for f in ragged]
                    )
                )
        if chained:
            # merge-on-read: fold each chained partition's [base, deltas]
            # to one row per key — one raw task per partition (keys
            # co-locate by construction, so no shuffle). Chain-fold needs
            # the LWW columns even when the caller pruned them away.
            import pyarrow.parquet as _pq

            from etl_ray.stages.merge import fold_state_chain

            fold_cols = (
                list(dict.fromkeys(
                    [*read_cols, "repo", "path", "commit_seq", "seq"]
                ))
                if read_cols
                else None
            )

            @ray.remote
            def fold_part(files: list[str]) -> pa.Table:
                tabs = []
                for f in files:
                    file_names = _pq.read_schema(f).names  # one footer read
                    present = set(file_names)
                    tabs.append(
                        _pq.read_table(
                            f,
                            columns=[
                                c for c in (fold_cols or file_names)
                                if c in present
                            ],
                        )
                    )
                # union of columns across the chain: a delta written after
                # a schema evolution can carry columns the base lacks
                cols, seen = [], set()
                for tab in tabs:
                    for f in tab.schema:
                        if f.name not in seen:
                            seen.add(f.name)
                            cols.append((f.name, f.type))
                folded = fold_state_chain(tabs, cols)
                if read_cols:
                    folded = folded.select(
                        [c for c in read_cols if c in folded.column_names]
                    )
                return folded

            refs = [fold_part.remote(files) for files in chained]
            parts_ds.append(rd.from_arrow_refs(refs))
        ds = parts_ds[0]
        for extra in parts_ds[1:]:
            ds = ds.union(extra)
        def _live(t: pa.Table) -> pa.Table:
            t = t.filter(pc.invert(pc.fill_null(t.column("deleted"), False)))
            if commit_seq_range is not None:
                cs = t.column("commit_seq")
                mask = None
                if cs_lo is not None:
                    mask = pc.greater_equal(cs, cs_lo)
                if cs_hi is not None:
                    hi_mask = pc.less_equal(cs, cs_hi)
                    mask = hi_mask if mask is None else pc.and_(mask, hi_mask)
                if mask is not None:
                    t = t.filter(mask)
            return t

        ds = ds.map_batches(_live, batch_format="pyarrow", zero_copy_batch=True)
        if columns:
            ds = ds.select_columns(columns)
        return ds

    def diff(self, from_ckpt: int, to_ckpt: int | None = None,
             n_buckets: int | None = None) -> rd.Dataset:
        """Snapshot reconciliation: classify every key as added / removed
        / changed between two committed checkpoints (``to_ckpt=None`` =
        current), from the two manifest snapshots alone — no log re-read.

        ONE full-outer ``shuffle_join`` exchange over (repo␟path, sha)
        rows streamed from both states; unchanged keys are dropped, so
        the result is diff-sized. The distributed answer to "what did
        these windows do to the table?" — the reference reaches the same
        truth only by erase-and-reload (98_rollback.sql). Output columns:
        repo, path, change ∈ {added, removed, changed}, old_sha, new_sha
        (empty string where absent).
        """
        from etl_ray.stages.joins import shuffle_join

        sep = DIFF_SEP
        cols = ["repo", "path", "content_sha256"]

        def keyed(tag):
            def fn(t: pa.Table) -> pa.Table:
                if t.num_rows == 0 or not t.column_names:
                    return pa.table({"key": pa.array([], pa.string()),
                                     tag: pa.array([], pa.string())})
                key = composite_key(t.column("repo"), t.column("path"))
                return pa.table({"key": key, tag: t.column("content_sha256")})
            return fn

        joined = shuffle_join(
            self.final_state(columns=cols, as_of=from_ckpt).map_batches(
                keyed("old_sha"), batch_format="pyarrow",
                zero_copy_batch=True),
            self.final_state(columns=cols, as_of=to_ckpt).map_batches(
                keyed("new_sha"), batch_format="pyarrow",
                zero_copy_batch=True),
            on="key", how="outer",
            schemas=(
                pa.schema([("key", pa.string()), ("old_sha", pa.string())]),
                pa.schema([("key", pa.string()), ("new_sha", pa.string())]),
            ),
            n_buckets=n_buckets,
        )

        empty_out = pa.table({
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "change": pa.array([], pa.string()),
            "old_sha": pa.array([], pa.string()),
            "new_sha": pa.array([], pa.string()),
        })

        def classify(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or not t.column_names:
                return empty_out
            import numpy as np

            old_s = t.column("old_sha").to_pandas()
            new_s = t.column("new_sha").to_pandas()
            change = np.where(old_s.isna(), "added",
                              np.where(new_s.isna(), "removed", "changed"))
            keep = old_s.isna() | new_s.isna() | (old_s != new_s)
            parts = pc.split_pattern(t.column("key"), sep, max_splits=1)
            return pa.table({
                "repo": pc.list_element(parts, 0),
                "path": pc.list_element(parts, 1),
                "change": pa.array(change),
                "old_sha": pa.array(old_s.fillna("")),
                "new_sha": pa.array(new_s.fillna("")),
            }).filter(pa.array(keep.to_numpy()))

        return joined.map_batches(classify, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def summary(self, name: str) -> pa.Table:
        """One of summary_repo_lang / summary_by_repo / summary_by_lang."""
        import pyarrow.parquet as pq

        m = self._require_manifest()
        return pq.read_table(self.store.abs_path(m.summaries[name]))

    def metrics_history(self) -> list[dict[str, Any]]:
        """Per-checkpoint audit rows (analog of audit_log) — complete
        across manifest expiry (expired checkpoints come from the folded
        audit log, live ones from manifest lineage)."""
        return self.store.audit_history()

    def partition_lineage(self) -> dict[str, dict[str, Any]]:
        """part -> {file, rows, tombstones, watermark} from the manifest."""
        return self._require_manifest().partitions

    def _require_manifest(self) -> Manifest:
        m = self.store.current()
        if m is None:
            raise ValueError(f"no manifest in {self.lake_dir}")
        return m
