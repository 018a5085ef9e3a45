"""Two-phase-commit manifest — the engine's exactly-once boundary.

Reference analog: the single per-day ``conn.commit()`` that makes a whole
day's staging → ensure → load → rollup visible atomically
(``main.py:144-147``), plus the audit_log row written in the same
transaction (``etl/insert/insert_audit.py:16-32``).

Protocol (Iceberg-style, single-writer driver):

1. merge tasks write staged partition files under
   ``<lake>/_staging/ckpt=<N>/`` with deterministic names (retry-safe),
2. the driver writes ``<lake>/_manifests/manifest-<N>.json`` (temp +
   ``os.replace`` → atomic on POSIX),
3. the driver atomically swaps ``<lake>/MANIFEST.json`` to point at it.

The manifest IS the lake: files not referenced by the current manifest
do not exist as far as readers are concerned; a crash between any two
steps leaves the previous manifest intact and the next run re-stages the
window deterministically (analog of ``dipaal_rollback`` partition-level
reprocessing, ``etl/init/single_statement_sql/98_rollback.sql``).
Numbered manifests are retained as lineage history.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Callable


CURRENT_POINTER = "MANIFEST.json"
MANIFEST_DIR = "_manifests"
STAGING_DIR = "_staging"
#: append-only per-checkpoint audit rows folded out of expired manifests
#: (reference: the audit_log table, etl/init/sql/40_audit_log.sql)
AUDIT_LOG = "audit-log.jsonl"


class StaleWriterError(RuntimeError):
    """A writer with an older fence epoch tried to commit after a newer
    writer already committed — the zombie-driver failure mode (a paused
    replay resuming against a lake another driver has since advanced)."""


@dataclass
class Manifest:
    checkpoint_id: int = -1
    num_partitions: int = 0
    #: part(str) -> {"file": relpath, "rows", "tombstones", "watermark"}
    partitions: dict[str, dict[str, Any]] = field(default_factory=dict)
    #: logical summary name -> relpath of its parquet file
    summaries: dict[str, str] = field(default_factory=dict)
    #: evolved payload columns beyond the core state schema: name -> arrow type alias
    payload_types: dict[str, str] = field(default_factory=dict)
    #: metrics of the window that produced this manifest
    metrics: dict[str, Any] = field(default_factory=dict)
    #: dead-letter queue: checkpoint id (str) -> {"files": [relpaths],
    #: "rows": n, "reasons": {reason: count}} for windows that quarantined
    #: invalid events (pipelines/replay.py:_stage_rejects). Carried forward
    #: snapshot-style like ``partitions``: rollback to checkpoint N
    #: automatically drops rejects staged after N.
    rejects: dict[str, Any] = field(default_factory=dict)
    #: change data feed (opt-in, ETL_RAY_CHANGEFEED=1): checkpoint id (str)
    #: -> {"files": [relpaths], "rows": n} of row-level effective changes
    #: (insert/update/delete) the window applied. Snapshot-carried like
    #: ``partitions``: rollback to N drops the feed past N.
    changes: dict[str, Any] = field(default_factory=dict)
    #: count of committed replay windows (informational / lineage)
    windows_done: int = 0
    #: resume cursor: log segment files fully consumed by committed windows
    log_files_done: int = 0
    #: chained fingerprint of the consumed (name, rows) prefix —
    #: sources/events.py:chain_fingerprint; verified loudly on resume
    log_fingerprint: str = ""
    #: per-stream resume cursors for SCOPED writers (concurrent
    #: partition-disjoint ingest): stream name -> {"files_done",
    #: "fingerprint", "windows_done"}. The legacy top-level
    #: log_files_done / log_fingerprint / windows_done fields stay owned
    #: by the single unscoped writer ("main" stream).
    cursors: dict[str, dict[str, Any]] = field(default_factory=dict)
    #: optimistic-concurrency fence: the epoch of the writer that
    #: committed this manifest (0 = unfenced/legacy). Epochs are claimed
    #: atomically (O_EXCL claim files) and never recycled — rollback
    #: moves the pointer, not the epoch domain — so a zombie writer
    #: resuming after a pause always holds a LOWER epoch than any newer
    #: writer and is rejected at its next commit.
    writer_epoch: int = 0

    def to_json(self) -> str:
        return json.dumps(self.__dict__, indent=1, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Manifest":
        d = json.loads(s)
        m = cls()
        for k, v in d.items():
            if hasattr(m, k):
                setattr(m, k, v)
        return m


def _atomic_write(path: str, data: str) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class ManifestStore:
    """Reads/writes manifests under a lake directory (single-writer)."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir
        os.makedirs(os.path.join(lake_dir, MANIFEST_DIR), exist_ok=True)

    def staging_dir(self, ckpt_id: int) -> str:
        d = os.path.join(self.lake_dir, STAGING_DIR, f"ckpt={ckpt_id:06d}")
        os.makedirs(d, exist_ok=True)
        return d

    def staging_dir_named(self, name: str) -> str:
        """Staging dir for a SCOPED writer's window: the checkpoint id is
        assigned only at commit (rebase), so scoped staging is named by
        (stream, epoch, window) instead — unique per writer, so two
        concurrent writers never collide on staged file names."""
        d = os.path.join(self.lake_dir, STAGING_DIR, name)
        os.makedirs(d, exist_ok=True)
        return d

    def current(self) -> Manifest | None:
        p = os.path.join(self.lake_dir, CURRENT_POINTER)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return Manifest.from_json(f.read())

    def fence(self) -> int:
        """Claim the next writer epoch atomically (O_CREAT|O_EXCL claim
        file — POSIX-atomic, exactly one claimant per epoch). Claim files
        survive rollback, so epochs are never recycled."""
        cur = self.current()
        e = (cur.writer_epoch if cur else 0) + 1
        d = os.path.join(self.lake_dir, MANIFEST_DIR)
        while True:
            try:
                fd = os.open(os.path.join(d, f"epoch-{e:06d}.claim"),
                             os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
                return e
            except FileExistsError:
                e += 1

    def commit(self, m: Manifest, epoch: int | None = None) -> None:
        """Two-phase: write numbered manifest, then swap the pointer.

        With ``epoch`` (from :meth:`fence`), the commit is rejected when
        a NEWER writer has already committed — optimistic concurrency on
        the pointer. This fences the realistic multi-writer failure (a
        zombie driver resuming a paused replay); it is not a byte-level
        CAS — two writers racing inside the read-swap window need an
        external catalog, the same caveat Iceberg has on bare POSIX."""
        if epoch is not None:
            cur = self.current()
            if cur is not None and cur.writer_epoch > epoch:
                raise StaleWriterError(
                    f"writer epoch {epoch} is stale: the lake was advanced "
                    f"by epoch {cur.writer_epoch} (checkpoint "
                    f"{cur.checkpoint_id}); this driver must re-read the "
                    f"manifest and re-plan before writing"
                )
            m.writer_epoch = epoch
        numbered = os.path.join(
            self.lake_dir, MANIFEST_DIR, f"manifest-{m.checkpoint_id:06d}.json"
        )
        _atomic_write(numbered, m.to_json())
        _atomic_write(os.path.join(self.lake_dir, CURRENT_POINTER), m.to_json())

    @contextmanager
    def commit_lock(self, timeout_s: float = 60.0):
        """Short mutual-exclusion section around a read-rebase-swap
        commit (the concurrent-writer path). O_CREAT|O_EXCL lock file —
        POSIX-atomic on the shared lake filesystem. A lock left by a
        DEAD process on this host is stolen (pid liveness probe); on a
        real multi-node deployment the lake sits behind a catalog
        service and this file is the single-host stand-in, the same
        caveat :meth:`commit` documents for the pointer swap."""
        path = os.path.join(self.lake_dir, MANIFEST_DIR, "COMMIT.lock")
        deadline = time.monotonic() + timeout_s
        while True:
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                break
            except FileExistsError:
                try:
                    with open(path) as f:
                        holder = int(f.read().strip() or 0)
                except (OSError, ValueError):
                    holder = 0
                if holder and holder != os.getpid():
                    try:
                        os.kill(holder, 0)
                    except ProcessLookupError:
                        # dead holder: steal (unlink may race another
                        # stealer; the retry loop absorbs it)
                        try:
                            os.unlink(path)
                        except FileNotFoundError:
                            pass
                        continue
                    except PermissionError:
                        pass  # alive, not ours
                if time.monotonic() > deadline:
                    raise TimeoutError(
                        f"commit lock {path} held for >{timeout_s}s "
                        f"(holder pid {holder or 'unknown'})"
                    )
                time.sleep(0.02)
        try:
            yield
        finally:
            try:
                os.unlink(path)
            except FileNotFoundError:
                pass

    def commit_scoped(
        self,
        build: Callable[[Manifest | None, int], Manifest],
        epoch: int,
        scope: frozenset[int],
        prior_entries: dict[str, dict[str, Any]],
        timeout_s: float = 60.0,
    ) -> Manifest:
        """Commit from a PARTITION-SCOPED writer — the concurrent-ingest
        path (reference analog: Citus loading disjoint shard sets in
        parallel, ``etl/init/sql/50_citus_distribution.sql``).

        Under :meth:`commit_lock`, the writer's manifest is REBASED onto
        the current snapshot by ``build(current, new_ckpt_id)`` (the
        caller folds its touched partitions / rejects / summary delta
        onto ``current``'s dicts, never its own stale base). Safety is
        per-partition optimistic concurrency: ``prior_entries`` is the
        snapshot of the scope's partition entries the writer's MERGE
        read; if any of them changed since — a same-scope zombie
        takeover, an overlapping scope, or an unscoped writer rewriting
        the world — the commit raises :class:`StaleWriterError` and
        nothing is written. Disjoint-scope writers always pass the check
        and may commit in any interleaving.

        ``writer_epoch`` advances monotonically (max), so the legacy
        unscoped fence keeps rejecting zombie unscoped writers after any
        scoped commit.
        """
        with self.commit_lock(timeout_s):
            cur = self.current()
            for p in sorted(scope):
                now = (cur.partitions.get(str(p)) if cur else None)
                if now != prior_entries.get(str(p)):
                    raise StaleWriterError(
                        f"scoped writer (epoch {epoch}) lost partition {p}: "
                        f"its manifest entry changed since this writer's "
                        f"merge read it — another writer advanced an "
                        f"overlapping scope; re-read the manifest and "
                        f"re-run the window"
                    )
            m = build(cur, (cur.checkpoint_id if cur else -1) + 1)
            m.writer_epoch = max(epoch, cur.writer_epoch if cur else 0)
            numbered = os.path.join(
                self.lake_dir, MANIFEST_DIR,
                f"manifest-{m.checkpoint_id:06d}.json",
            )
            _atomic_write(numbered, m.to_json())
            _atomic_write(
                os.path.join(self.lake_dir, CURRENT_POINTER), m.to_json()
            )
            return m

    def at(self, ckpt_id: int) -> Manifest:
        """The committed manifest for one checkpoint — the time-travel
        read anchor. Every manifest is a FULL snapshot (file list per
        partition), so reading state as-of checkpoint N needs no log
        replay: just this manifest's files. Raises ValueError when the
        checkpoint is not COMMITTED (never was, or the pointer was
        rolled back past it — a numbered manifest orphaned by a crash
        between the two commit writes is not committed) or when gc has
        already reclaimed any of its data files."""
        cur = self.current()
        if cur is None or ckpt_id > cur.checkpoint_id:
            raise ValueError(
                f"checkpoint {ckpt_id} is not committed (current pointer: "
                f"{'empty lake' if cur is None else cur.checkpoint_id})"
            )
        p = os.path.join(
            self.lake_dir, MANIFEST_DIR, f"manifest-{ckpt_id:06d}.json"
        )
        if not os.path.exists(p):
            raise ValueError(f"no committed manifest for checkpoint {ckpt_id}")
        with open(p) as f:
            m = Manifest.from_json(f.read())
        missing = [
            rel
            for part in m.partitions.values()
            for rel in [part["file"], *part.get("deltas", [])]
            if not os.path.exists(self.abs_path(rel))
        ]
        if missing:
            raise ValueError(
                f"checkpoint {ckpt_id} was garbage-collected: "
                f"{len(missing)} data file(s) gone (first: {missing[0]})"
            )
        return m

    def history(self) -> list[Manifest]:
        d = os.path.join(self.lake_dir, MANIFEST_DIR)
        out = []
        for name in sorted(os.listdir(d)):
            if name.startswith("manifest-") and name.endswith(".json"):
                with open(os.path.join(d, name)) as f:
                    out.append(Manifest.from_json(f.read()))
        return out

    def expire(self, keep_checkpoints: int = 2) -> dict[str, Any]:
        """Delete numbered manifests older than the retention window,
        folding each expired checkpoint's audit metrics row into
        ``_manifests/audit-log.jsonl`` FIRST.

        Every manifest is a full snapshot (O(P) partition entries), so a
        long-lived tailer committing one checkpoint per arrival
        accumulates manifest lineage linearly with stream age — the one
        remaining O(history) artifact. Expiry bounds it the way
        Iceberg's expire_snapshots does, while the audit fold keeps
        :meth:`audit_history` complete at O(1) bytes per expired
        checkpoint — the reference persists exactly this shape as an
        audit_log TABLE row per load (etl/init/sql/40_audit_log.sql:1-11,
        etl/audit/logger.py:81-103).

        Time travel / rollback to an expired checkpoint becomes
        unavailable (``at()`` already raises ValueError for a missing
        numbered manifest — ``checkpoint_for_seq``'s descending scan
        skips them). Crash-safe: audit lines are appended+fsynced before
        any unlink, and ``audit_history`` dedups by checkpoint id, so a
        crash between the two steps only leaves a duplicate-source row.
        Retention matches :meth:`gc`: the last ``keep_checkpoints``
        numbered manifests plus the current pointer survive.
        """
        cur = self.current()
        hist = self.history()
        keep_ids = {
            m.checkpoint_id for m in (hist[-keep_checkpoints:] if keep_checkpoints else [])
        }
        if cur is not None:
            keep_ids.add(cur.checkpoint_id)
        expired = [
            m for m in hist
            if m.checkpoint_id not in keep_ids
            and cur is not None
            and m.checkpoint_id < cur.checkpoint_id
        ]
        if not expired:
            return {"expired": 0, "audit_rows": 0}
        audit_path = os.path.join(self.lake_dir, MANIFEST_DIR, AUDIT_LOG)
        with open(audit_path, "a") as f:
            for m in expired:
                f.write(json.dumps(
                    {"checkpoint_id": m.checkpoint_id, **m.metrics}
                ) + "\n")
            f.flush()
            os.fsync(f.fileno())
        for m in expired:
            os.unlink(os.path.join(
                self.lake_dir, MANIFEST_DIR,
                f"manifest-{m.checkpoint_id:06d}.json",
            ))
        return {"expired": len(expired), "audit_rows": len(expired)}

    def audit_history(self) -> list[dict[str, Any]]:
        """Per-checkpoint audit rows: expired checkpoints from the
        audit log + live ones from manifest lineage, deduped by
        checkpoint id (live manifest wins), ascending."""
        rows: dict[int, dict[str, Any]] = {}
        audit_path = os.path.join(self.lake_dir, MANIFEST_DIR, AUDIT_LOG)
        if os.path.exists(audit_path):
            with open(audit_path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        r = json.loads(line)
                        rows[int(r["checkpoint_id"])] = r
        for m in self.history():
            rows[m.checkpoint_id] = {"checkpoint_id": m.checkpoint_id, **m.metrics}
        return [rows[k] for k in sorted(rows)]

    def rollback(self, to_checkpoint: int) -> Manifest:
        """Point the lake back at an earlier committed checkpoint.

        Reference analog: ``dipaal_rollback(dateids[])`` — erase a loaded
        delta so it can be re-delivered
        (``etl/init/single_statement_sql/98_rollback.sql``). Because every
        manifest is a full snapshot, rollback is one atomic pointer swap;
        later checkpoints' files simply become unreferenced (a
        re-replay overwrites their deterministic staged names).
        """
        p = os.path.join(
            self.lake_dir, MANIFEST_DIR, f"manifest-{to_checkpoint:06d}.json"
        )
        if not os.path.exists(p):
            raise ValueError(f"no committed manifest for checkpoint {to_checkpoint}")
        with open(p) as f:
            m = Manifest.from_json(f.read())
        # gc() may have reclaimed files referenced only by checkpoints
        # outside the retention window; refuse to swap the pointer to a
        # snapshot whose files are gone (would leave the lake unreadable)
        missing = [
            rel
            for rel in (
                [info["file"] for info in m.partitions.values()]
                + [
                    d
                    for info in m.partitions.values()
                    for d in info.get("deltas", [])
                ]
                + list(m.summaries.values())
                + [
                    f
                    for d in (m.rejects, m.changes)
                    for info in d.values()
                    for f in info.get("files", [])
                ]
            )
            if not os.path.exists(self.abs_path(rel))
        ]
        if missing:
            raise ValueError(
                f"checkpoint {to_checkpoint} is outside the gc retention "
                f"window: {len(missing)} referenced file(s) no longer exist "
                f"(first: {missing[0]}); rollback refused"
            )
        _atomic_write(os.path.join(self.lake_dir, CURRENT_POINTER), m.to_json())
        return m

    def gc(self, keep_checkpoints: int = 2) -> list[str]:
        """Delete staged files no manifest within the retention window
        references. Retention = the current manifest plus the last
        ``keep_checkpoints`` numbered manifests (so ``rollback`` to any
        retained checkpoint stays possible). Returns deleted paths.

        Reference analog: month-partition retention + rollback scripts —
        storage hygiene is explicit, never implicit.
        """
        keep: set[str] = set()
        manifests = self.history()[-keep_checkpoints:] if keep_checkpoints else []
        current = self.current()
        if current is not None:
            manifests.append(current)
        for m in manifests:
            for info in m.partitions.values():
                keep.add(os.path.normpath(self.abs_path(info["file"])))
                for d in info.get("deltas", []):
                    keep.add(os.path.normpath(self.abs_path(d)))
            for rel in m.summaries.values():
                keep.add(os.path.normpath(self.abs_path(rel)))
            for d in (m.rejects, m.changes):
                for info in d.values():
                    for rel in info.get("files", []):
                        keep.add(os.path.normpath(self.abs_path(rel)))
        deleted = []
        staging_root = os.path.join(self.lake_dir, STAGING_DIR)
        if os.path.isdir(staging_root):
            for dirpath, _dirs, files in os.walk(staging_root):
                for f in files:
                    p = os.path.normpath(os.path.join(dirpath, f))
                    if p not in keep:
                        os.unlink(p)
                        deleted.append(p)
            # drop now-empty ckpt dirs
            for d in sorted(os.listdir(staging_root)):
                full = os.path.join(staging_root, d)
                if os.path.isdir(full) and not os.listdir(full):
                    os.rmdir(full)
        return deleted

    def abs_path(self, rel: str) -> str:
        return rel if os.path.isabs(rel) else os.path.join(self.lake_dir, rel)

    def rel_path(self, p: str) -> str:
        return os.path.relpath(p, self.lake_dir) if os.path.isabs(p) else p
