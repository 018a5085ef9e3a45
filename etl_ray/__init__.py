"""etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

Re-expresses the semantics of the reference warehouse loader (DIPAAL/etl,
see SURVEY.md) as a change-event replay system over Parquet tables of
source-code repositories:

- change events ``(seq, op, commit_seq, repo, path, commit, lang, content)``
  are validated + hash-partitioned by ``(repo, path)`` in stateless
  ``map_batches`` over zero-copy Arrow batches,
- applied per partition with last-writer-wins merge keyed on
  ``(commit_seq, seq)`` (delete tombstones retained so stale out-of-order
  events can never resurrect a deleted key),
- committed to a partitioned Parquet lake through a two-phase manifest
  sink (staged files + atomic manifest swap → exactly-once, resumable,
  per-partition lineage + metrics),
- with per-repo / per-lang summary tables maintained incrementally
  (delta-by-delta, never recomputed from scratch).

All execution is Ray Data: ``ray.data.Dataset`` pipelines, Arrow batches,
``groupby(part).map_groups`` for the single required shuffle. Nothing in
this package calls ``ray.init`` / ``ray.shutdown``.
"""

from etl_ray.schema import EVENT_SCHEMA, STATE_COLUMNS
from etl_ray.pipelines.replay import ReplayEngine

__all__ = ["EVENT_SCHEMA", "STATE_COLUMNS", "ReplayEngine"]
__version__ = "0.1.0"
