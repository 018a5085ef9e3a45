"""Pluggable stage registry — the engine's user-extension surface.

Reference analog (SURVEY §2.11): pluggable dimension inserters
(subclass ``BulkInserter``, override ``ensure`` —
``etl/insert/bulk_inserter.py:10-57``) and the ``@benchmark_class``
decorator registry (``benchmarks/decorators/benchmark.py:11-47``).

A Stage is either a plain batch fn (stateless tasks) or a callable
class (actor pool). ``apply_stage`` wires it into a Dataset with the
declared batch format / concurrency so pipelines can be assembled
declaratively:

    @register_stage("sha256", batch_format="pyarrow")
    def add_sha(batch): ...

    ds = apply_stage(ds, "sha256")
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

import ray.data as rd


@dataclass
class StageDef:
    name: str
    fn: Callable | type
    batch_format: str = "pyarrow"
    batch_size: int | None = None
    concurrency: int | tuple[int, int] | None = None
    num_cpus: float | None = None
    kwargs: dict[str, Any] = field(default_factory=dict)

    @property
    def is_actor(self) -> bool:
        return inspect.isclass(self.fn)


_REGISTRY: dict[str, StageDef] = {}


def register_stage(
    name: str,
    *,
    batch_format: str = "pyarrow",
    batch_size: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    num_cpus: float | None = None,
    **kwargs: Any,
):
    """Decorator registering a batch fn or actor class as a named stage."""

    def deco(fn):
        if name in _REGISTRY:
            raise ValueError(f"stage {name!r} already registered")
        _REGISTRY[name] = StageDef(
            name, fn, batch_format=batch_format, batch_size=batch_size,
            concurrency=concurrency, num_cpus=num_cpus, kwargs=dict(kwargs),
        )
        return fn

    return deco


def get_stage(name: str) -> StageDef:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}")


def list_stages() -> list[str]:
    return sorted(_REGISTRY)


def apply_stage(ds: rd.Dataset, name: str, **overrides: Any) -> rd.Dataset:
    """Wire a registered stage into a Dataset pipeline."""
    s = get_stage(name)
    kw: dict[str, Any] = dict(batch_format=s.batch_format)
    if s.batch_size is not None:
        kw["batch_size"] = s.batch_size
    if s.is_actor:
        kw["concurrency"] = s.concurrency or 2
    if s.num_cpus is not None:
        kw["num_cpus"] = s.num_cpus
    kw.update(s.kwargs)
    kw.update(overrides)
    return ds.map_batches(s.fn, **kw)


# --- built-in stages ---------------------------------------------------------

from etl_ray.functions.dedup import add_sha256  # noqa: E402
from etl_ray.functions.text import LangIdStage, add_token_count, quality_metrics  # noqa: E402

register_stage("sha256")(add_sha256)
register_stage("token_count")(add_token_count)
register_stage("quality_metrics")(quality_metrics)
register_stage("lang_id", batch_format="pandas", concurrency=None, batch_size=2048)(LangIdStage)
