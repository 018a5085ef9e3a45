"""Per-partition last-writer-wins merge — the engine's core operator.

Reference analog: the per-key ordered state machine of the trajectory
builder (``etl/trajectory/builder.py:41-78,93`` — group by key, sort by
time, sequential fold) combined with the ensure/upsert discipline of the
loaders (``etl/insert/bulk_inserter.py:59-113`` select-or-insert;
``etl/rollup/sql/fact_cell_rollup.sql:138`` ``ON CONFLICT DO NOTHING``).

Runs inside ``groupby('part').map_groups`` — one invocation per touched
lake partition per checkpoint window. Everything is vectorized Arrow
(sort + adjacent-compare dedup), no Python row loop; the only per-row
Python is ``hashlib.sha256`` over the *newly applied* rows (the mandated
per-row invariant column), never over the raw event stream.

Exactly-once: the staged file path is deterministic in
``(checkpoint, part)`` and written via temp-file + ``os.replace``; a
retried task overwrites its own output byte-compatibly and the manifest
swap (state/manifest.py) is the single commit point. If a window leaves
a partition unchanged (all events stale duplicates), the prior file is
reused — untouched partitions are never rewritten.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_ray.hashing import sha256_hex
from etl_ray.schema import OP_DELETE
from etl_ray.stages.validate import _keep_last_per_key

_ARROW_PINNED = False


def _pin_arrow_once() -> None:
    """Pin Arrow's intra-op pool once per worker process (Ray already
    parallelizes across tasks; per-call set_cpu_count is harmless but
    repeated syscalls per group are waste)."""
    global _ARROW_PINNED
    if not _ARROW_PINNED:
        pa.set_cpu_count(1)
        _ARROW_PINNED = True

#: Schema of the small stats table each merge call returns (metrics rows +
#: per-(repo,lang) delta rows for the incremental rollups).
STATS_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'metrics' | 'delta'
        ("part", pa.int32()),
        ("staged_file", pa.string()),
        ("changed", pa.bool_()),
        ("state_rows", pa.int64()),
        ("tombstones", pa.int64()),
        ("watermark", pa.int64()),
        ("events_in", pa.int64()),
        ("applied", pa.int64()),
        ("inserts", pa.int64()),
        ("updates", pa.int64()),
        ("deletes", pa.int64()),
        ("stale", pa.int64()),
        ("invalid", pa.int64()),
        ("repo", pa.string()),
        ("lang", pa.string()),
        ("d_files", pa.int64()),
        ("d_bytes", pa.int64()),
        ("w_cs", pa.int64()),
        # 'rewrite' (full base file) | 'delta' (merge-on-read chain append)
        # | 'none' (partition unchanged, prior file reused)
        ("mode", pa.string()),
        # rows written to this partition's change-data-feed file this
        # window (0 / null when the feed is off or nothing changed)
        ("changes_rows", pa.int64()),
    ]
)

_STATE_CORE = [
    "repo", "path", "commit", "commit_seq", "seq", "lang", "content",
    "content_sha256", "deleted", "part", "content_bytes",
]


def _empty_state(part_type: pa.DataType = pa.int32()) -> pa.Table:
    return pa.table(
        {
            "repo": pa.array([], pa.string()),
            "path": pa.array([], pa.string()),
            "commit": pa.array([], pa.string()),
            "commit_seq": pa.array([], pa.int64()),
            "seq": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "content": pa.array([], pa.string()),
            "content_sha256": pa.array([], pa.string()),
            "deleted": pa.array([], pa.bool_()),
            "part": pa.array([], part_type),
            "content_bytes": pa.array([], pa.int64()),
        }
    )


def fold_state_chain(tabs: list[pa.Table], columns: list[tuple[str, pa.DataType]]) -> pa.Table:
    """Fold a partition's [base, delta1, delta2, ...] chain to one row per
    key (merge-on-read). A later chain file's row always carries a
    strictly greater (commit_seq, seq) for its key — delta files contain
    only APPLIED rows — so keep-max-per-key is exact; the chain index is
    a pure safety tie-breaker (earlier file wins, matching the write-time
    'prior wins ties' rule)."""
    if len(tabs) == 1:
        return _align_columns(tabs[0], columns)
    parts = []
    for i, t in enumerate(tabs):
        parts.append(
            _align_columns(t, columns).append_column(
                "_chain", pa.nulls(t.num_rows, pa.int16()).fill_null(i)
            )
        )
    t = pa.concat_tables(parts)
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("repo", "ascending"), ("path", "ascending"),
            ("commit_seq", "ascending"), ("seq", "ascending"),
            ("_chain", "descending"),
        ],
    )
    t = t.take(idx)
    n = t.num_rows
    repo_a = t.column("repo").combine_chunks()
    path_a = t.column("path").combine_chunks()
    last = np.ones(n, dtype=bool)
    if n > 1:
        same_next = pc.and_(
            pc.equal(repo_a.slice(0, n - 1), repo_a.slice(1)),
            pc.equal(path_a.slice(0, n - 1), path_a.slice(1)),
        )
        last[: n - 1] = np.invert(same_next.to_numpy(zero_copy_only=False))
    return t.filter(pa.array(last)).drop_columns(["_chain"])


def _align_columns(t: pa.Table, columns: list[tuple[str, pa.DataType]]) -> pa.Table:
    """Project ``t`` onto exactly ``columns``, null-filling missing ones
    (the Arrow schema-evolution path: additive columns appear as nulls in
    older data — SURVEY.md §1.3 'ensure' tolerance)."""
    arrays = []
    for name, typ in columns:
        if name in t.column_names:
            arrays.append(t.column(name).cast(typ))
        else:
            arrays.append(pa.nulls(t.num_rows, typ))
    return pa.table(dict(zip([c[0] for c in columns], arrays)))


def _group_counts(t: pa.Table) -> pa.Table:
    """(repo, lang) -> (cnt, bytes) over live rows."""
    if t.num_rows == 0:
        return pa.table(
            {
                "repo": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
                "bytes": pa.array([], pa.int64()),
            }
        )
    # content_bytes is authoritative when present (merge-on-read meta
    # tables carry it INSTEAD of content); fall back to measuring content
    # for pre-upgrade base files
    measured = pc.cast(
        pc.binary_length(pc.fill_null(t.column("content"), "")), pa.int64()
    )
    if "content_bytes" in t.column_names:
        b = pc.coalesce(pc.cast(t.column("content_bytes"), pa.int64()), measured)
    else:
        b = measured
    tb = pa.table(
        {
            "repo": t.column("repo"),
            "lang": pc.fill_null(t.column("lang"), ""),
            "b": b,
        }
    )
    g = tb.group_by(["repo", "lang"]).aggregate([("b", "count"), ("b", "sum")])
    return g.rename_columns(["repo", "lang", "cnt", "bytes"])


def write_atomic_parquet(table: pa.Table, path: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


def _maybe_die_after_stage(fault_dir: str | None) -> None:
    """Fault-injection hook (tests only): when ``fault_dir`` is set (from
    ``ETL_RAY_FAULT_DIR`` on the DRIVER, captured into the merge closure
    at plan time), the FIRST merge task to win the O_EXCL flag race kills
    its worker process — simulating a mid-window worker loss immediately
    AFTER its staged file hit disk. Ray's task retry re-executes the
    merge; the deterministic staged path (part id + chain position, no
    randomness) makes the retry overwrite, not duplicate — exactly-once
    by replacement. tests/test_fault_injection.py asserts oracle parity
    and single-application metrics through the death."""
    if not fault_dir:
        return
    try:
        fd = os.open(os.path.join(fault_dir, "fault_fired"),
                     os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        return
    except (FileNotFoundError, NotADirectoryError, PermissionError):
        # stale ETL_RAY_FAULT_DIR (deleted tmp dir from an aborted test
        # run): the hook must degrade to a no-op, not crash every merge
        # task on every retry
        return
    os.close(fd)
    os._exit(1)


def make_merge_fn(
    staging_dir: str,
    prior_files: dict[int, str],
    payload_types: dict[str, str],
    ckpt_id: int,
    prior_override: pa.Table | None = None,
    prior_override_path: str | None = None,
    prior_deltas: dict[int, list[str]] | None = None,
    prior_sizes: dict[int, int] | None = None,
    delta_chain: bool = False,
    chain_max: int = 3,
    compact_ratio: float = 0.25,
    changefeed: bool = False,
):
    """Build the map_groups merge fn for one checkpoint window.

    ``prior_files``: part -> absolute path of the partition's current state
    file (from the committed manifest). ``payload_types``: evolved payload
    column name -> arrow type string (beyond the core state columns).
    ``prior_override``: when set (ensure-actor mode, stages/ensure.py),
    the prior state table is supplied in-memory instead of read from
    ``prior_files``; ``prior_override_path`` is the manifest file it
    corresponds to (reused when the window leaves the partition
    unchanged).

    ``delta_chain=True`` enables MERGE-ON-READ output (the Hudi/Iceberg
    MOR shape; `ETL_RAY_DELTA_CHAIN=1` at the engine): instead of
    rewriting a partition's full state file every window (O(state) read
    AND write per window — ruinous for small windows over a large lake),
    the window writes only its APPLIED rows as a chained delta file and
    the prior is read WITHOUT the content column (content_bytes carries
    the rollup arithmetic). A partition falls back to a full rewrite
    (compaction) when its chain would exceed ``chain_max`` files or the
    incoming delta is ≥ ``compact_ratio`` of its state rows — the write
    amplification is then amortized over ≥chain_max windows.
    ``prior_deltas``: part -> existing chain (abs paths, oldest first);
    ``prior_sizes``: part -> state rows+tombstones (compaction trigger).
    """

    extra_cols = [(n, pa.type_for_alias(t)) for n, t in payload_types.items()]
    # captured on the DRIVER (env vars do not propagate to running
    # workers); non-None only under the fault-injection tests
    fault_dir = os.environ.get("ETL_RAY_FAULT_DIR")
    state_cols = [
        ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
        ("commit_seq", pa.int64()), ("seq", pa.int64()), ("lang", pa.string()),
        ("content", pa.string()), ("content_sha256", pa.string()),
        ("deleted", pa.bool_()), ("part", pa.int32()),
        ("content_bytes", pa.int64()),
    ] + extra_cols
    meta_cols = [c for c, _ in state_cols if c != "content"]

    def merge_delta(
        part: int, delta: pa.Table, events_in: int, invalid: int
    ) -> pa.Table:
        """Core fold on an already-combined delta (valid rows, one winner
        per key). ``events_in``/``invalid`` are the pre-combine counts —
        carried separately so callers that reduce upstream (the cascaded
        streaming exchange, replay.py) report identical audit metrics to
        the one-shot group path below."""
        _pin_arrow_once()
        chain = (prior_deltas or {}).get(part, [])
        delta_mode = False
        if prior_override is not None:
            prior_path = prior_override_path
            prior = prior_override
        else:
            prior_path = prior_files.get(part)
            if delta_chain and prior_path is not None:
                psize = (prior_sizes or {}).get(part, 0)
                compact_due = (
                    len(chain) + 1 > chain_max
                    or delta.num_rows >= compact_ratio * max(1, psize)
                )
                # meta-only prior reads need the base to carry
                # content_bytes (additive upgrade; first rewrite adds it)
                delta_mode = (
                    not compact_due
                    and "content_bytes" in pq.read_schema(prior_path).names
                )
            if prior_path is None:
                prior = _empty_state()
            elif delta_mode:
                # merge-on-read: prior = base + chain WITHOUT the content
                # column — the only O(state) cost left is the metadata
                # columns, ~10x smaller than content
                tabs = []
                for f in [prior_path, *chain]:
                    names = set(pq.read_schema(f).names)  # one footer read
                    tabs.append(
                        pq.read_table(f, columns=[c for c in meta_cols if c in names])
                    )
                prior = fold_state_chain(tabs, state_cols)
            elif chain:
                prior = fold_state_chain(
                    [pq.read_table(f) for f in [prior_path, *chain]], state_cols
                )
            else:
                prior = pq.read_table(prior_path)

        # --- align prior + delta onto the (possibly evolved) state schema ---
        delta_deleted = pc.equal(delta.column("op"), OP_DELETE)
        delta_t = _align_columns(delta, state_cols)
        delta_t = delta_t.set_column(
            delta_t.column_names.index("deleted"), "deleted", delta_deleted
        )
        prior_t = _align_columns(prior, state_cols)
        src = pa.concat_tables([delta_t, prior_t]).append_column(
            "_src",
            pa.concat_arrays(
                [
                    pa.nulls(delta_t.num_rows, pa.int8()).fill_null(0),
                    pa.nulls(prior_t.num_rows, pa.int8()).fill_null(1),
                ]
            ),
        )

        # --- LWW combine: sort + keep-last; prior wins (commit_seq, seq) ties.
        # commit + content are deterministic final tie-breakers: if a
        # pathological tailer emits CONFLICTING events sharing the same
        # (commit_seq, seq), the winner no longer depends on shuffle
        # arrival order, so a retried task stays byte-identical.
        # Arrow's multi-key comparator only evaluates later keys on ties,
        # so the extra keys cost nothing on well-formed streams.
        idx = pc.sort_indices(
            src,
            sort_keys=[
                ("repo", "ascending"), ("path", "ascending"),
                ("commit_seq", "ascending"), ("seq", "ascending"),
                ("_src", "ascending"),
                ("commit", "ascending"), ("content", "ascending"),
            ],
        )
        src = src.take(idx)
        n = src.num_rows
        repo_a = src.column("repo").combine_chunks()
        path_a = src.column("path").combine_chunks()
        last = np.ones(n, dtype=bool)
        if n > 1:
            same_next = pc.and_(
                pc.equal(repo_a.slice(0, n - 1), repo_a.slice(1)),
                pc.equal(path_a.slice(0, n - 1), path_a.slice(1)),
            )
            last[: n - 1] = np.invert(same_next.to_numpy(zero_copy_only=False))
        new_state = src.filter(pa.array(last))

        # effective deletes (prior-live keys now tombstoned) folded into
        # the same run-boundary pass — no extra per-partition join
        src_np = src.column("_src").to_numpy(zero_copy_only=False)
        del_np = pc.fill_null(src.column("deleted"), False).to_numpy(
            zero_copy_only=False
        )
        run_starts = np.flatnonzero(np.concatenate(([True], last[:-1])))
        prior_live_run = (
            np.maximum.reduceat((src_np == 1) & ~del_np, run_starts)
            if n
            else np.zeros(0, dtype=bool)
        )
        kept_del = del_np[last]
        deletes_eff = int(np.sum(prior_live_run.astype(bool) & kept_del))

        applied_mask = pc.equal(new_state.column("_src"), 0).combine_chunks()
        applied = int(pc.sum(applied_mask).as_py() or 0)
        stale = delta_t.num_rows - applied

        # --- per-row sha256 invariant, computed only for newly applied rows
        del_col = new_state.column("deleted").combine_chunks()
        need_sha = pc.and_(applied_mask, pc.invert(pc.fill_null(del_col, False)))
        need_np = need_sha.to_numpy(zero_copy_only=False)
        if need_np.any():
            sha_old = new_state.column("content_sha256").to_pandas().to_numpy(dtype=object)
            new_contents = new_state.column("content").combine_chunks().filter(need_sha)
            sha_new = sha256_hex(new_contents).to_pandas().to_numpy(dtype=object)
            sha_old[need_np] = sha_new
            new_state = new_state.set_column(
                new_state.column_names.index("content_sha256"),
                "content_sha256",
                pa.array(sha_old, type=pa.string()),
            )
        # tombstones carry no content
        if applied:
            dead = pc.fill_null(del_col, False)
            new_state = new_state.set_column(
                new_state.column_names.index("content"),
                "content",
                pc.if_else(dead, pa.nulls(new_state.num_rows, pa.string()),
                           new_state.column("content")),
            )
        # content_bytes: preserve prior values (the merge-on-read meta
        # read carries them WITHOUT content); measure for newly applied
        # rows / pre-upgrade bases
        measured = pc.cast(
            pc.binary_length(pc.fill_null(new_state.column("content"), "")),
            pa.int64(),
        )
        new_state = new_state.set_column(
            new_state.column_names.index("content_bytes"),
            "content_bytes",
            pc.coalesce(pc.cast(new_state.column("content_bytes"), pa.int64()), measured),
        )

        # --- metrics -------------------------------------------------------
        applied_rows = new_state.filter(applied_mask)
        ops_applied = applied_rows.column("deleted")
        deletes = int(pc.sum(pc.fill_null(ops_applied, False)).as_py() or 0)
        # insert = applied live row whose key was absent-or-tombstone in prior
        upserts = applied - deletes
        prior_live = prior_t.filter(pc.invert(pc.fill_null(prior_t.column("deleted"), False)))
        live_mask = pc.invert(pc.fill_null(new_state.column("deleted"), False))
        new_live = new_state.filter(live_mask)
        state_rows = new_live.num_rows
        tombstones = new_state.num_rows - state_rows
        inserts = max(0, state_rows - prior_live.num_rows + deletes_eff)
        updates = upserts - inserts if upserts >= inserts else 0
        wm_col = applied_rows.column("commit_seq")
        prior_wm = -1
        watermark = int(pc.max(wm_col).as_py()) if applied else prior_wm

        # --- change data feed (opt-in): row-level effective changes --------
        # Classification reuses the run-boundary arrays already computed
        # for the metrics: one winner row per key (new_state order), its
        # tombstone flag (kept_del) and the key's prior liveness
        # (prior_live_run). Only EFFECTIVE changes are emitted — a
        # tombstone applied over an already-absent key changes nothing
        # for readers (the tombstone itself stays engine-internal
        # anti-resurrection state). Reference analog: the per-day audit
        # row counts (etl/audit/logger.py:81-103) at row granularity,
        # shaped like Delta Lake's change-data-feed output.
        changes_rows = 0
        if changefeed and applied:
            applied_np = applied_mask.to_numpy(zero_copy_only=False)
            prior_live_np = prior_live_run.astype(bool)
            emit = applied_np & (prior_live_np | ~kept_del)
            if emit.any():
                ctype = np.where(
                    kept_del, "delete", np.where(prior_live_np, "update", "insert")
                )
                ch = new_state.filter(pa.array(emit)).select(
                    ["repo", "path", "commit", "commit_seq", "seq", "lang",
                     "content_sha256"]
                )
                n_ch = ch.num_rows
                ch = ch.append_column(
                    "change_type", pa.array(ctype[emit].astype(object), pa.string())
                )
                ch = ch.append_column(
                    "checkpoint_id",
                    pa.array(np.full(n_ch, ckpt_id, dtype=np.int64)),
                )
                write_atomic_parquet(
                    ch, os.path.join(staging_dir, f"changes-{part:05d}.parquet")
                )
                changes_rows = n_ch

        # --- stage the new partition file (or reuse prior when unchanged) ---
        changed = applied > 0 or prior_path is None
        if changed and delta_mode and applied > 0:
            # merge-on-read append: ONLY the applied rows leave this task
            # — write cost is O(delta), not O(state)
            out = new_state.filter(applied_mask).drop_columns(["_src"])
            staged = os.path.join(
                staging_dir, f"part-{part:05d}-d{len(chain) + 1:03d}.parquet"
            )
            write_atomic_parquet(out, staged)
            _maybe_die_after_stage(fault_dir)
            mode = "delta"
        elif changed:
            out = new_state.drop_columns(["_src"])
            staged = os.path.join(staging_dir, f"part-{part:05d}.parquet")
            write_atomic_parquet(out, staged)
            _maybe_die_after_stage(fault_dir)
            mode = "rewrite"
        else:
            staged = prior_path
            mode = "none"

        # --- per-(repo,lang) deltas for the incremental rollups -------------
        gp = _group_counts(prior_live)
        gn = _group_counts(new_live)
        j = gn.join(gp, keys=["repo", "lang"], join_type="full outer",
                    right_suffix="_p")
        d_files = pc.subtract(pc.fill_null(j.column("cnt"), 0), pc.fill_null(j.column("cnt_p"), 0))
        d_bytes = pc.subtract(pc.fill_null(j.column("bytes"), 0), pc.fill_null(j.column("bytes_p"), 0))
        wtab = (
            pa.table(
                {
                    "repo": applied_rows.column("repo"),
                    "lang": pc.fill_null(applied_rows.column("lang"), ""),
                    "cs": applied_rows.column("commit_seq"),
                }
            )
            .group_by(["repo", "lang"])
            .aggregate([("cs", "max")])
            .rename_columns(["repo", "lang", "w_cs"])
        )
        dtab = pa.table(
            {
                "repo": j.column("repo"),
                "lang": j.column("lang"),
                "d_files": d_files,
                "d_bytes": d_bytes,
            }
        ).join(wtab, keys=["repo", "lang"], join_type="full outer")
        nz = pc.or_(
            pc.or_(
                pc.not_equal(pc.fill_null(dtab.column("d_files"), 0), 0),
                pc.not_equal(pc.fill_null(dtab.column("d_bytes"), 0), 0),
            ),
            pc.is_valid(dtab.column("w_cs")),
        )
        dtab = dtab.filter(nz)

        # --- assemble stats table (vectorized, no Python row lists) --------
        nd = dtab.num_rows
        metrics_row = pa.table(
            {
                "kind": ["metrics"], "part": pa.array([part], pa.int32()),
                "staged_file": [staged], "changed": [changed],
                "state_rows": pa.array([state_rows], pa.int64()),
                "tombstones": pa.array([tombstones], pa.int64()),
                "watermark": pa.array([watermark], pa.int64()),
                "events_in": pa.array([events_in], pa.int64()),
                "applied": pa.array([applied], pa.int64()),
                "inserts": pa.array([inserts], pa.int64()),
                "updates": pa.array([updates], pa.int64()),
                "deletes": pa.array([deletes], pa.int64()),
                "stale": pa.array([stale], pa.int64()),
                "invalid": pa.array([invalid], pa.int64()),
                "repo": pa.nulls(1, pa.string()), "lang": pa.nulls(1, pa.string()),
                "d_files": pa.nulls(1, pa.int64()), "d_bytes": pa.nulls(1, pa.int64()),
                "w_cs": pa.nulls(1, pa.int64()),
                "mode": [mode],
                "changes_rows": pa.array([changes_rows], pa.int64()),
            },
            schema=STATS_SCHEMA,
        )
        if nd == 0:
            return metrics_row
        delta_rows = pa.table(
            {
                "kind": pa.array(["delta"] * nd, pa.string()),
                "part": pa.array(np.full(nd, part, dtype=np.int32)),
                "staged_file": pa.nulls(nd, pa.string()),
                "changed": pa.nulls(nd, pa.bool_()),
                "state_rows": pa.nulls(nd, pa.int64()),
                "tombstones": pa.nulls(nd, pa.int64()),
                "watermark": pa.nulls(nd, pa.int64()),
                "events_in": pa.nulls(nd, pa.int64()),
                "applied": pa.nulls(nd, pa.int64()),
                "inserts": pa.nulls(nd, pa.int64()),
                "updates": pa.nulls(nd, pa.int64()),
                "deletes": pa.nulls(nd, pa.int64()),
                "stale": pa.nulls(nd, pa.int64()),
                "invalid": pa.nulls(nd, pa.int64()),
                "repo": dtab.column("repo").cast(pa.string()),
                "lang": dtab.column("lang").cast(pa.string()),
                "d_files": pc.fill_null(dtab.column("d_files"), 0).cast(pa.int64()),
                "d_bytes": pc.fill_null(dtab.column("d_bytes"), 0).cast(pa.int64()),
                "w_cs": dtab.column("w_cs").cast(pa.int64()),
                "mode": pa.nulls(nd, pa.string()),
                "changes_rows": pa.nulls(nd, pa.int64()),
            },
            schema=STATS_SCHEMA,
        )
        return pa.concat_tables([metrics_row, delta_rows])

    def merge(group: pa.Table) -> pa.Table:
        # single-threaded Arrow inside the task — Ray parallelizes across
        # partitions; per-worker thread pools would oversubscribe the node
        _pin_arrow_once()
        if group.num_rows == 0:
            return STATS_SCHEMA.empty_table()
        part = int(group.column("part")[0].as_py())
        valid_mask = group.column("_valid").combine_chunks()
        if "_dups" in group.column_names:
            # validate's combiner multiplicities: events_in must report
            # the RAW (pre-combine) event count, batching-independently
            w = group.column("_dups")
            events_in = int(pc.sum(w).as_py() or 0)
            invalid = int(
                pc.sum(pc.if_else(valid_mask, 0, w)).as_py() or 0
            )
            group = group.drop_columns(["_dups"])
        else:
            invalid = int(pc.sum(pc.invert(valid_mask)).as_py() or 0)
            events_in = group.num_rows
        delta = _keep_last_per_key(group.filter(valid_mask))
        return merge_delta(part, delta, events_in, invalid)

    merge.delta_fn = merge_delta
    return merge


