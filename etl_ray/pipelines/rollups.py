"""Incremental summary-table maintenance (delta-by-delta, never recomputed).

Reference analog: the heatmap / cell-fact rollup cascade that DIPAAL
maintains per loaded day rather than recomputing
(``etl/rollup/apply_rollups.py:59-135``, level-1 groupby
``etl/rollup/sql/heatmaps/01_count.sql:44-50``, level-2 regroup to parent
cells). Our cascade:

  base table  ``summary_repo_lang``  (repo, lang) -> file_count,
      total_bytes, last_commit_seq — maintained ADDITIVELY from the
      per-(repo,lang) delta rows the merge stage emits each window,
  level 2     ``summary_by_repo``   (groupby repo over the base),
  level 2     ``summary_by_lang``   (groupby lang over live rows).

``last_commit_seq`` has watermark semantics: the max commit_seq of any
event applied to the group (deletes included) — see oracle.summary_by_repo.

The window's delta set is tiny (O(touched repo×lang pairs)), and the base
table is O(#repos × #langs) — orders of magnitude below the data. Up to
``RAY_THRESHOLD`` base rows the update runs as a driver-side pyarrow
``group_by`` (sub-millisecond, no Ray round-trip); above it the identical
aggregation runs as a ``ray.data`` groupby so no single node must hold
the base table. Both paths produce identical tables.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_ray.stages.merge import write_atomic_parquet

RAY_THRESHOLD = 2_000_000

BASE_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("lang", pa.string()),
        ("file_count", pa.int64()),
        ("total_bytes", pa.int64()),
        ("last_commit_seq", pa.int64()),
    ]
)


def _empty_base() -> pa.Table:
    return BASE_SCHEMA.empty_table()


def update_base(prior_base: pa.Table | None, deltas: pa.Table) -> pa.Table:
    """Fold one window's (repo, lang, d_files, d_bytes, w_cs) deltas into
    the base table. Pure Arrow group_by — vectorized, no row loop."""
    prior = prior_base if prior_base is not None else _empty_base()
    as_delta = pa.table(
        {
            "repo": prior.column("repo"),
            "lang": prior.column("lang"),
            "d_files": prior.column("file_count"),
            "d_bytes": prior.column("total_bytes"),
            "w_cs": prior.column("last_commit_seq"),
        }
    )
    dl = pa.table(
        {
            "repo": deltas.column("repo"),
            "lang": deltas.column("lang"),
            "d_files": pc.fill_null(deltas.column("d_files"), 0),
            "d_bytes": pc.fill_null(deltas.column("d_bytes"), 0),
            "w_cs": pc.fill_null(deltas.column("w_cs"), -1),
        }
    )
    both = pa.concat_tables([as_delta, dl])
    g = both.group_by(["repo", "lang"]).aggregate(
        [("d_files", "sum"), ("d_bytes", "sum"), ("w_cs", "max")]
    )
    g = g.rename_columns(["repo", "lang", "file_count", "total_bytes", "last_commit_seq"])
    return g.cast(BASE_SCHEMA)


def derive_by_repo(base: pa.Table) -> pa.Table:
    """repo -> (file_count, total_bytes, distinct_langs, last_commit_seq)."""
    live_lang = pc.cast(pc.greater(base.column("file_count"), 0), pa.int64())
    t = pa.table(
        {
            "repo": base.column("repo"),
            "file_count": base.column("file_count"),
            "total_bytes": base.column("total_bytes"),
            "live_lang": live_lang,
            "last_commit_seq": base.column("last_commit_seq"),
        }
    )
    g = t.group_by(["repo"]).aggregate(
        [
            ("file_count", "sum"),
            ("total_bytes", "sum"),
            ("live_lang", "sum"),
            ("last_commit_seq", "max"),
        ]
    )
    return g.rename_columns(
        ["repo", "file_count", "total_bytes", "distinct_langs", "last_commit_seq"]
    )


def derive_by_lang(base: pa.Table) -> pa.Table:
    """lang -> (file_count, total_bytes) over live rows only."""
    live = base.filter(pc.greater(base.column("file_count"), 0))
    g = live.group_by(["lang"]).aggregate([("file_count", "sum"), ("total_bytes", "sum")])
    return g.rename_columns(["lang", "file_count", "total_bytes"])


def update_base_ray(
    prior_base_path: str | None, deltas: pa.Table, out_path: str
) -> str:
    """The scale path: the same fold as :func:`update_base` expressed as
    a ``ray.data`` union + distributed groupby-aggregate, used when the
    base table outgrows comfortable driver-side processing
    (O(#repos × #langs) rows). The aggregation runs distributed; the
    result is collected once for atomic staging — at extreme
    cardinalities swap that tail (and the by_repo/by_lang derivations)
    for ``ds.write_parquet(dir)`` + directory manifest refs; the fold
    itself already scales. Identical output to the driver-side path
    (tests/test_rollups_ray.py)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    dl = pa.table(
        {
            "repo": deltas.column("repo"),
            "lang": deltas.column("lang"),
            "d_files": pc.fill_null(deltas.column("d_files"), 0).cast(pa.int64()),
            "d_bytes": pc.fill_null(deltas.column("d_bytes"), 0).cast(pa.int64()),
            "w_cs": pc.fill_null(deltas.column("w_cs"), -1).cast(pa.int64()),
        }
    )
    ds = rd.from_arrow(dl)
    if prior_base_path and os.path.exists(prior_base_path):
        prior_ds = rd.read_parquet(prior_base_path).map_batches(
            lambda t: pa.table(
                {
                    "repo": t.column("repo"),
                    "lang": t.column("lang"),
                    "d_files": t.column("file_count"),
                    "d_bytes": t.column("total_bytes"),
                    "w_cs": t.column("last_commit_seq"),
                }
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        ds = ds.union(prior_ds)
    agg = ds.groupby(["repo", "lang"]).aggregate(
        Sum("d_files", alias_name="file_count"),
        Sum("d_bytes", alias_name="total_bytes"),
        Max("w_cs", alias_name="last_commit_seq"),
    )
    # small result per partition; collect as arrow and write atomically so
    # the manifest points at exactly one deterministic file
    import ray as _ray

    blocks = [t for t in _ray.get(agg.to_arrow_refs()) if t.num_rows]
    new_base = (
        pa.concat_tables(blocks).cast(BASE_SCHEMA)
        if blocks
        else _empty_base()
    )
    new_base = new_base.sort_by([("repo", "ascending"), ("lang", "ascending")])
    write_atomic_parquet(new_base, out_path)
    return out_path


def load_base(path: str | None) -> pa.Table | None:
    if path and os.path.exists(path):
        return pq.read_table(path)
    return None


def stage_summaries(base: pa.Table, staging_dir: str) -> dict[str, str]:
    """Write the three summary tables into the window's staging dir."""
    out = {}
    for name, tbl in (
        ("summary_repo_lang", base),
        ("summary_by_repo", derive_by_repo(base)),
        ("summary_by_lang", derive_by_lang(base)),
    ):
        p = os.path.join(staging_dir, f"{name}.parquet")
        write_atomic_parquet(tbl, p)
        out[name] = p
    return out
