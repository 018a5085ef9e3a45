"""Validate / normalize / route stage — stateless ``map_batches`` over Arrow.

Reference analog: the predicate cleaning filter
(``etl/cleaning/clean_data.py:123-148`` — 7 conjunctive rules dropping
malformed AIS rows) plus the Citus hash routing
(``etl/init/sql/50_citus_distribution.sql``). Here a change event is
*invalid* when repo/path is null or empty, ``op`` is not one of I/U/D, or
``commit_seq`` is null. Invalid rows are NOT dropped silently: they are
flagged ``_valid=false`` and carried (they are rare) so the merge stage
can count them into the per-window audit metrics (reference analog:
audit_log row counts, ``etl/audit/logger.py:81-103``) before discarding.

The stage also pre-reduces each batch to the per-key last-writer winner
(max ``(commit_seq, seq)`` per (repo, path)) — the combiner that cuts
shuffle volume for duplicate/update-heavy streams BEFORE the single
all-to-all exchange on ``part`` (SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from etl_ray.hashing import partition_ids
from etl_ray.schema import VALID_OPS


def _keep_last_per_key(t: pa.Table, with_counts: bool = False) -> pa.Table:
    """Keep only the max-(commit_seq, seq) row per (repo, path).

    Vectorized: one multi-key sort + an adjacent-shift compare — no Python
    row loop (reference's per-key winner selection is the pandas
    sort+dedup idiom; ours stays in Arrow).

    ``with_counts=True`` appends an ``_dups`` int64 column holding each
    winner's raw multiplicity (absorbed rows incl. itself), so audit
    counts (events_in) stay equal to the PRE-combine event count no
    matter how the window was batched — per 64 MB block, per whole
    window (the small-window fast path), or any fold tree in between.
    """
    if t.num_rows <= 1:
        if with_counts:
            return t.append_column(
                "_dups", pa.array(np.ones(t.num_rows, dtype=np.int64))
            )
        return t
    idx = pc.sort_indices(
        t,
        sort_keys=[
            ("repo", "ascending"),
            ("path", "ascending"),
            ("commit_seq", "ascending"),
            ("seq", "ascending"),
            # deterministic tie-breakers for pathological streams where
            # distinct events share (commit_seq, seq) — see merge.py LWW
            ("commit", "ascending"),
            ("content", "ascending"),
        ],
    )
    t = t.take(idx)
    repo = t.column("repo").combine_chunks()
    path = t.column("path").combine_chunks()
    n = t.num_rows
    # row i is a winner iff key[i] != key[i+1]
    same_next = pc.and_(
        pc.equal(repo.slice(0, n - 1), repo.slice(1)),
        pc.equal(path.slice(0, n - 1), path.slice(1)),
    )
    last = np.ones(n, dtype=bool)
    last[: n - 1] = np.invert(same_next.to_numpy(zero_copy_only=False))
    if with_counts:
        idxs = np.flatnonzero(last)
        runs = np.diff(np.concatenate(([-1], idxs)))
        return t.filter(pa.array(last)).append_column(
            "_dups", pa.array(runs.astype(np.int64))
        )
    return t.filter(pa.array(last))


def make_validate_fn(num_partitions: int, pre_reduce: bool = True):
    """Build the validate/route batch fn for ``map_batches`` (pyarrow)."""

    def validate(batch: pa.Table) -> pa.Table:
        # Pin Arrow's intra-op thread pool inside the worker: Ray already
        # parallelizes across tasks, and N workers × N-thread Arrow pools
        # thrash the node (measured 3.5x slowdown at 32 CPUs, BASELINE.md).
        from etl_ray.stages.merge import _pin_arrow_once

        _pin_arrow_once()
        repo = batch.column("repo")
        path = batch.column("path")
        op = batch.column("op")
        cs = batch.column("commit_seq")
        valid = pc.and_(
            pc.and_(
                pc.and_(pc.is_valid(repo), pc.not_equal(pc.fill_null(repo, ""), "")),
                pc.and_(pc.is_valid(path), pc.not_equal(pc.fill_null(path, ""), "")),
            ),
            pc.and_(pc.is_in(op, value_set=pa.array(VALID_OPS)), pc.is_valid(cs)),
        )
        batch = batch.append_column("_valid", valid)
        batch = batch.append_column(
            "part", partition_ids(repo, path, num_partitions)
        )
        if not pre_reduce:
            return batch
        mask = valid.combine_chunks() if isinstance(valid, pa.ChunkedArray) else valid
        good = batch.filter(mask)
        bad = batch.filter(pc.invert(mask))
        # `_dups` carries raw multiplicities so downstream audit counts
        # (split_block / merge) report PRE-combine events_in regardless
        # of block/batch boundaries (invalid rows are never combined: 1)
        good = _keep_last_per_key(good, with_counts=True)
        if bad.num_rows == 0:
            return good
        bad = bad.append_column(
            "_dups", pa.array(np.ones(bad.num_rows, dtype=np.int64))
        )
        return pa.concat_tables([good, bad], promote_options="default")

    return validate


#: DLQ reason codes, in rule-priority order (first failing rule names the
#: row's reason). Mirrored constant-for-constant by the ``cdc_rejects``
#: DuckDB oracle (pipelines/queries.py) so the quarantine output itself is
#: hash-gated.
REJECT_REASONS = ("null_repo", "null_path", "bad_op", "null_commit_seq")


def reject_reasons(batch: pa.Table) -> pa.Array:
    """Classify each row: reason string, or null when the row is valid.

    Vectorized priority CASE over the same four validity rules as
    ``make_validate_fn`` (reference analog: the per-rule drop accounting of
    the cleaning filter, ``etl/cleaning/clean_data.py:123-148`` — the
    reference logs how many rows each rule removed; we keep the rows and
    say why). Deliberately SQL-replicable: CASE WHEN over
    null/empty/NOT-IN tests, no engine-private state.
    """
    repo = batch.column("repo")
    path = batch.column("path")
    op = batch.column("op")
    cs = batch.column("commit_seq")
    bad_repo = pc.equal(pc.fill_null(repo, ""), "")
    bad_path = pc.equal(pc.fill_null(path, ""), "")
    bad_op = pc.invert(
        pc.fill_null(pc.is_in(op, value_set=pa.array(VALID_OPS)), False)
    )
    bad_cs = pc.is_null(cs)
    null_s = pa.scalar(None, pa.string())
    return pc.if_else(
        bad_repo,
        "null_repo",
        pc.if_else(
            bad_path,
            "null_path",
            pc.if_else(
                bad_op, "bad_op", pc.if_else(bad_cs, "null_commit_seq", null_s)
            ),
        ),
    )
