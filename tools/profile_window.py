"""Profile one replay window: phase wall times + Ray Data stats.

Usage: python tools/profile_window.py [num_cpus] [n_keys]
Prints driver-phase timings (init, plan, pipeline, rollup+commit) and —
because ds.stats() only exists for Ray Data operators — forces the
AllToAll window path (ETL_RAY_SHUFFLE=sort + ETL_RAY_PROFILE=1) so the
per-stage stats table actually prints. The default direct-exchange path
has no Dataset stats; its phase split is exec_sec (pipeline) vs
wall_sec (driver) in the window metrics.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    # stats require the Ray Data AllToAll path (the direct exchange is
    # raw tasks — no Dataset operator to report on)
    os.environ.setdefault("ETL_RAY_SHUFFLE", "sort")
    os.environ.setdefault("ETL_RAY_PROFILE", "1")

    import ray

    t_init0 = time.perf_counter()
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    t_init = time.perf_counter() - t_init0

    os.environ.setdefault("GRAFT_BENCH_EVENTS", str(n_keys))
    from bench import ensure_event_log

    log_dir, n_events = ensure_event_log(0.1)

    import pyarrow.parquet as pq
    for f in os.listdir(log_dir):
        if f.endswith(".parquet"):
            pq.read_table(os.path.join(log_dir, f))

    # warm workers
    @ray.remote
    def _warm():
        import numpy, pandas, pyarrow  # noqa: F401
        return 1

    ray.get([_warm.remote() for _ in range(num_cpus)])

    from etl_ray.pipelines.replay import ReplayEngine
    from etl_ray.sources.events import list_segments, plan_windows, unified_schema

    lake = f"/tmp/etl_ray_bench/profile_lake_{num_cpus}"
    shutil.rmtree(lake, ignore_errors=True)
    eng = ReplayEngine(lake, num_partitions=64)

    t0 = time.perf_counter()
    files = list_segments(log_dir)
    schema = unified_schema(files)
    windows = plan_windows(files, 10**9)
    t_plan = time.perf_counter() - t0

    w = windows[0]
    t0 = time.perf_counter()
    out = eng.run_window(w, schema)
    t_window = time.perf_counter() - t0

    print(f"init={t_init:.2f}s plan={t_plan:.2f}s window={t_window:.2f}s "
          f"events={n_events} cpus={num_cpus}")
    print("window metrics:", {k: out[k] for k in ("wall_sec", "exec_sec", "events_in", "applied")})
    ray.shutdown()


if __name__ == "__main__":
    main()
