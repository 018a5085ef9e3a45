"""Cross-window ensure/apply actors — the per-partition key→state index.

Reference analog (SURVEY S10/J3/D1, north star): the dedup/bulk-ensure
stage that keeps a per-partition ``key → (commit_seq, sha256)``
dictionary so upserts are idempotent without re-reading the warehouse
(``etl/insert/bulk_inserter.py:59-113`` keeps that state in the DB's
unique indexes; we keep it in actor memory, rebuilt from the lake).

This is the ONE place the engine drops below the Dataset API: a shared
mutable index held across checkpoint windows is exactly the case raw
actors exist for. Each ``EnsureActor`` owns the partitions with
``part % num_actors == actor_id`` and caches their full state tables
between windows, so steady-state windows skip the prior-state parquet
read entirely. Correctness does not depend on the cache: every call
carries the manifest's authoritative ``(prior_ckpt, prior_file)`` and
the actor reloads from the lake whenever its cached checkpoint doesn't
match (crash/rollback/resume safe).

The window pipeline still routes deltas with the same
``groupby('part')`` exchange; the ``map_groups`` body forwards each
partition's delta to its owning actor instead of merging inline.
"""

from __future__ import annotations

import pyarrow as pa
import ray

from etl_ray.stages import merge as merge_mod

ACTOR_NAMESPACE = "etl_ray_ensure"


@ray.remote(num_cpus=0)
class EnsureActor:
    """Owns a subset of lake partitions; caches their state across windows.

    ``num_cpus=0``: every ``merge_window`` call is issued by a routing
    ``map_groups`` task that is itself holding one CPU while it blocks on
    the result, so the actor works inside that task's budget. A nonzero
    reservation would let a pool of idle detached actors starve the
    cluster (and deadlock small ones).
    """

    def __init__(self, actor_id: int):
        self.actor_id = actor_id
        #: part -> (ckpt_id_of_cached_state, state pa.Table)
        self.cache: dict[int, tuple[int, pa.Table]] = {}

    def merge_window(
        self,
        part: int,
        delta: pa.Table,
        prior_ckpt: int,
        prior_file: str | None,
        staging_dir: str,
        payload_types: dict[str, str],
        ckpt_id: int,
        counts: tuple[int, int] | None = None,
    ) -> pa.Table:
        """Apply one window's delta for one partition; returns stats table.

        ``counts=(events_in, invalid)`` marks ``delta`` as already
        validated + per-key combined (the cascaded streaming exchange);
        ``None`` means a raw routed group carrying ``_valid``."""
        import pyarrow.parquet as pq

        cached = self.cache.get(part)
        if cached is not None and cached[0] == prior_ckpt:
            prior = cached[1]
        elif prior_file is not None:
            prior = pq.read_table(prior_file)
        else:
            prior = merge_mod._empty_state()

        fn = merge_mod.make_merge_fn(
            staging_dir, {}, payload_types, ckpt_id,
            prior_override=prior, prior_override_path=prior_file,
        )
        if counts is not None:
            stats = fn.delta_fn(part, delta, counts[0], counts[1])
        else:
            stats = fn(delta)
        # refresh the cache from the staged file we just wrote (or keep
        # prior when unchanged)
        # cache key = the checkpoint the manifest will record for this
        # partition: ckpt_id when changed, else the unchanged prior_ckpt.
        # A crashed (uncommitted) window leaves a cache entry whose key
        # can't match the next run's manifest prior_ckpt → safe reload.
        met = stats.slice(0, 1).to_pylist()[0]
        if met["changed"]:
            self.cache[part] = (ckpt_id, pq.read_table(met["staged_file"]))
        else:
            self.cache[part] = (prior_ckpt, prior)
        return stats

    def cached_parts(self) -> list[int]:
        return sorted(self.cache)


def get_or_create_actors(num_actors: int, lake_tag: str) -> list:
    """Named detached actors keyed by (lake, index).

    Detached lifetime: the index must outlive any single replay driver
    (a restarted driver resumes against warm caches) — a non-detached
    named actor would be garbage-collected the moment the creating
    handles go out of scope. They die with the Ray instance, or call
    :func:`stop_actors` explicitly.
    """
    actors = []
    for i in range(num_actors):
        name = f"ensure-{lake_tag}-{i}"
        try:
            actors.append(ray.get_actor(name, namespace=ACTOR_NAMESPACE))
        except ValueError:
            actors.append(
                EnsureActor.options(
                    name=name, namespace=ACTOR_NAMESPACE, lifetime="detached",
                    get_if_exists=True, max_restarts=4,
                ).remote(i)
            )
    return actors


def stop_actors(num_actors: int, lake_tag: str) -> int:
    """Kill this lake's ensure actors (cache is disposable; state lives
    in the lake). Returns how many were found and killed."""
    killed = 0
    for i in range(num_actors):
        try:
            a = ray.get_actor(f"ensure-{lake_tag}-{i}", namespace=ACTOR_NAMESPACE)
            ray.kill(a)
            killed += 1
        except ValueError:
            pass
    return killed


def make_actor_merge_fn(
    actors: list,
    staging_dir: str,
    prior_files: dict[int, str],
    prior_ckpts: dict[int, int],
    payload_types: dict[str, str],
    ckpt_id: int,
):
    """map_groups body: forward the partition's delta to its owner actor."""

    num_actors = len(actors)

    def _call_owner(part: int, delta: pa.Table, counts) -> pa.Table:
        """ONE retry discipline for both entry points: transient actor
        restarts (max_restarts=4) come back with an empty cache and
        reload from the manifest — correctness unaffected; retry with
        backoff on the SAME handle (Ray re-binds it to the restarted
        instance automatically)."""
        actor = actors[part % num_actors]
        last_err: Exception | None = None
        for attempt in range(4):
            try:
                return ray.get(
                    actor.merge_window.remote(
                        part, delta, prior_ckpts.get(part, -1),
                        prior_files.get(part), staging_dir, payload_types,
                        ckpt_id, counts=counts,
                    )
                )
            except (ray.exceptions.ActorUnavailableError,
                    ray.exceptions.ActorDiedError) as e:
                last_err = e
                import time as _t

                _t.sleep(0.5 * (attempt + 1))
        raise last_err

    def route(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return merge_mod.STATS_SCHEMA.empty_table()
        part = int(group.column("part")[0].as_py())
        return _call_owner(part, group, None)

    def delta_fn(
        part: int, delta: pa.Table, events_in: int, invalid: int
    ) -> pa.Table:
        """Precombined-delta entry (cascaded exchange)."""
        return _call_owner(part, delta, (events_in, invalid))

    route.delta_fn = delta_fn
    return route
