"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in etl_ray) calls ``ray.init`` / ``ray.shutdown``.

- ``entry()``   — flagship CDC replay over /root/testdata/sf0.001
- ``queries()`` — one entry per implemented operator/pipeline
                  (SURVEY.md §2 inventory; see etl_ray/pipelines/queries.py)
- ``oracle_sql()`` — matching DuckDB SQL per query where expressible
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# make `etl_ray` importable regardless of the caller's cwd (driver side;
# Ray workers inherit the driver's cwd, which the harness sets to this
# repo)
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)


def entry() -> Any:
    """Flagship pipeline: full CDC replay (validate → hash-partition →
    LWW merge → exactly-once manifest lake → incremental summaries) over
    a change log derived from sf0.001 documents; returns the lake's
    final state as a Dataset."""
    from etl_ray.pipelines.queries import _run_doc_replay

    eng = _run_doc_replay("/root/testdata/sf0.001")
    return eng.final_state(
        columns=["repo", "path", "commit_seq", "lang", "content_sha256"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from etl_ray.pipelines.queries import QUERIES

    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from etl_ray.pipelines.queries import QUERIES

    return {name: q.sql for name, q in QUERIES.items() if q.sql is not None}
