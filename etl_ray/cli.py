"""Command-line entry points.

    python -m etl_ray.cli replay --events DIR --lake DIR [--window-events N]
                                 [--num-partitions P] [--num-cpus C]
    python -m etl_ray.cli generate --out DIR --n-keys N [--scenario mixed]
    python -m etl_ray.cli status --lake DIR

On a real cluster the same module runs under ``ray job submit`` — the
only difference is ``ray.init(address="auto")`` picking up the cluster
instead of local mode. These CLIs own their Ray session (init+shutdown);
the library itself never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(num_cpus: int | None) -> bool:
    """Init Ray if nobody has; returns True when WE own the session (and
    should shut it down) — never tear down a caller's session."""
    import ray

    if ray.is_initialized():
        return False
    kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                  logging_level="ERROR", log_to_driver=False)
    addr = os.environ.get("RAY_ADDRESS", "local")
    if addr == "local" and num_cpus:
        ray.init(address="local", num_cpus=num_cpus, **kwargs)
    else:
        ray.init(address=addr, **kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return True


def cmd_replay(args) -> int:
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    eng = ReplayEngine(args.lake, num_partitions=args.num_partitions)
    out = eng.replay(args.events, window_events=args.window_events)
    print(json.dumps(out, default=str))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_generate(args) -> int:
    from etl_ray.generator import generate_events, write_event_log

    log = generate_events(n_keys=args.n_keys, seed=args.seed, scenario=args.scenario)
    paths = write_event_log(log, args.out, n_files=args.n_files)
    print(json.dumps({"files": len(paths), "events": log.table.num_rows, "out": args.out}))
    return 0


def cmd_compact(args) -> int:
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    print(json.dumps(ReplayEngine(args.lake).compact()))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_repartition(args) -> int:
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    print(json.dumps(ReplayEngine(args.lake).repartition(args.partitions)))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_plan(args) -> int:
    """Partition-plan advisor: detect density skew from manifest lineage,
    exactly simulate candidate layouts, print the recommendation; with
    --apply, execute it via the online repartition when it differs from
    the current layout."""
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    eng = ReplayEngine(args.lake)
    plan = eng.plan_partitions(
        target_rows_per_partition=args.target_rows,
        tolerance=args.tolerance,
    )
    if args.apply and plan["recommended_p"] != plan["current"]["num_partitions"]:
        plan["applied"] = eng.repartition(plan["recommended_p"])
    print(json.dumps(plan))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_maintain(args) -> int:
    """Lake autopilot: compact delta chains, run the partition-plan
    advisor, execute its recommendation (with --apply), reclaim
    unreferenced files — the full maintenance loop in one command."""
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    print(json.dumps(ReplayEngine(args.lake).maintain(
        apply=args.apply,
        tolerance=args.tolerance,
        target_rows_per_partition=args.target_rows,
        gc_keep=args.gc_keep,
    )))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_changes(args) -> int:
    """Print the change data feed (optionally a checkpoint range) as
    JSON lines — the incremental-consumer surface of changefeed_read."""
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    eng = ReplayEngine(args.lake)
    if args.prune_up_to is not None:
        print(json.dumps(eng.changefeed_prune(args.prune_up_to)))
    else:
        for row in eng.changefeed_read(
            since=args.since, until=args.until
        ).iter_rows():
            print(json.dumps(row, default=str))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_rejects(args) -> int:
    """Print the dead-letter queue as JSON lines."""
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    eng = ReplayEngine(args.lake)
    if args.prune_up_to is not None:
        print(json.dumps(eng.rejects_prune(args.prune_up_to)))
    else:
        for row in eng.rejects().iter_rows():
            print(json.dumps(row, default=str))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_diff(args) -> int:
    """Print the snapshot diff between two checkpoints as JSON lines
    (added / removed / changed per key) — `ReplayEngine.diff`."""
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    ds = ReplayEngine(args.lake).diff(args.since, to_ckpt=args.until)
    for row in ds.iter_rows():
        print(json.dumps(row, default=str))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_get(args) -> int:
    """Point-lookup one key's live row (no Ray session needed — the
    routing hash locates the single partition file)."""
    from etl_ray.pipelines.replay import ReplayEngine

    t = ReplayEngine(args.lake).lookup(args.repo, args.path, as_of=args.as_of,
                                       as_of_seq=args.as_of_seq)
    for row in t.to_pylist():
        print(json.dumps(row, default=str))
    return 0 if t.num_rows else 1


def cmd_export(args) -> int:
    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    out = ReplayEngine(args.lake).export(
        args.out,
        partition_cols=args.by.split(",") if args.by else None,
        as_of=args.as_of,
    )
    print(json.dumps(out))
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_fsck(args) -> int:
    from etl_ray.pipelines.replay import ReplayEngine

    out = ReplayEngine(args.lake).fsck(deep=args.deep)
    print(json.dumps(out))
    return 0 if out["ok"] else 1


def cmd_tail(args) -> int:
    """The change-log TAILER loop (north-star shape): poll the log dir,
    replay whatever new segments appeared (the file-based resume cursor
    makes each pass incremental and idempotent), sleep, repeat. Exits
    cleanly after ``--max-idle-polls`` consecutive polls with nothing
    new — or runs forever with ``--max-idle-polls 0`` under a real
    ``ray job submit`` deployment."""
    import time

    owned = _init_ray(args.num_cpus)
    from etl_ray.pipelines.replay import ReplayEngine

    eng = ReplayEngine(args.lake, num_partitions=args.num_partitions)
    idle = 0
    passes = 0
    applied_passes = 0
    while True:
        out = eng.replay(args.events, window_events=args.window_events)
        passes += 1
        ran = out.get("windows_run", 0)
        line = {"pass": passes, "windows_run": ran,
                "windows_skipped": out.get("windows_skipped", 0)}
        if ran:
            applied_passes += 1
            # the autopilot pass a separate cron job would otherwise run:
            # compact chains, rebalance when the advisor says so, bound
            # storage + lineage to the gc retention
            if args.maintain_every and applied_passes % args.maintain_every == 0:
                rep = eng.maintain(apply=True, gc_keep=args.gc_keep)
                line["maintain"] = {
                    "repartitioned": bool(rep.get("repartitioned")),
                    "gc_deleted": rep["gc_deleted"],
                    "manifests_expired": rep["manifests_expired"],
                }
        print(json.dumps(line), flush=True)
        idle = 0 if ran else idle + 1
        if args.max_idle_polls and idle >= args.max_idle_polls:
            break
        time.sleep(args.poll_sec)
    if owned:
        import ray

        ray.shutdown()
    return 0


def cmd_gc(args) -> int:
    from etl_ray.state.manifest import ManifestStore

    store = ManifestStore(args.lake)
    removed = store.gc(keep_checkpoints=args.keep)
    expired = (store.expire(keep_checkpoints=args.keep)["expired"]
               if args.expire_manifests else 0)
    print(json.dumps({"lake": args.lake, "removed": len(removed),
                      "manifests_expired": expired,
                      "keep_checkpoints": args.keep}))
    return 0


def cmd_rollback(args) -> int:
    from etl_ray.state.manifest import ManifestStore

    store = ManifestStore(args.lake)
    m = store.rollback(args.to)
    print(json.dumps({"lake": args.lake, "checkpoint_id": m.checkpoint_id,
                      "windows_done": m.windows_done}))
    return 0


def cmd_status(args) -> int:
    from etl_ray.state.manifest import ManifestStore

    store = ManifestStore(args.lake)
    m = store.current()
    if m is None:
        print(json.dumps({"lake": args.lake, "status": "empty"}))
        return 1
    out = {
        "lake": args.lake,
        "checkpoint_id": m.checkpoint_id,
        "windows_done": m.windows_done,
        "partitions": len(m.partitions),
        "rows": sum(p["rows"] for p in m.partitions.values()),
        "tombstones": sum(p["tombstones"] for p in m.partitions.values()),
        "watermark": max((p["watermark"] for p in m.partitions.values()), default=-1),
        "chained_partitions": sum(
            1 for p in m.partitions.values() if p.get("deltas")
        ),
        "rejects_quarantined": sum(
            info.get("rows", 0) for info in m.rejects.values()
        ),
        "metrics": m.metrics,
    }
    if getattr(args, "events", None):
        # replay lag vs the change log: how far behind the committed
        # cursor is (parquet footer counts only — no data read)
        import pyarrow.parquet as pq

        from etl_ray.sources.events import list_segments

        files = list_segments(args.events)
        behind = files[m.log_files_done:]
        out["lag_files"] = len(behind)
        out["lag_events"] = sum(pq.read_metadata(f).num_rows for f in behind)
    print(json.dumps(out))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="etl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("replay", help="replay a change log into a lake")
    r.add_argument("--events", required=True)
    r.add_argument("--lake", required=True)
    r.add_argument("--window-events", type=int, default=250_000)
    r.add_argument("--num-partitions", type=int, default=64)
    r.add_argument("--num-cpus", type=int, default=None)
    r.set_defaults(fn=cmd_replay)

    g = sub.add_parser("generate", help="generate a synthetic change log")
    g.add_argument("--out", required=True)
    g.add_argument("--n-keys", type=int, default=10_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--scenario", default="mixed")
    g.add_argument("--n-files", type=int, default=8)
    g.set_defaults(fn=cmd_generate)

    c = sub.add_parser("compact", help="fold all delta chains into base files")
    c.add_argument("--lake", required=True)
    c.add_argument("--num-cpus", type=int, default=None)
    c.set_defaults(fn=cmd_compact)

    rp = sub.add_parser("repartition",
                        help="re-shard the lake to a new partition count")
    rp.add_argument("--lake", required=True)
    rp.add_argument("--partitions", type=int, required=True)
    rp.add_argument("--num-cpus", type=int, default=None)
    rp.set_defaults(fn=cmd_repartition)

    pl = sub.add_parser("plan", help="partition-plan advisor: detect "
                                     "skew, recommend a new layout")
    pl.add_argument("--lake", required=True)
    pl.add_argument("--target-rows", type=int, default=None,
                    help="max mean rows per partition before a grow is "
                         "recommended")
    pl.add_argument("--tolerance", type=float, default=2.0,
                    help="max/mean imbalance considered balanced")
    pl.add_argument("--apply", action="store_true",
                    help="execute the recommendation via online "
                         "repartition when it differs from current")
    pl.add_argument("--num-cpus", type=int, default=None)
    pl.set_defaults(fn=cmd_plan)

    mt = sub.add_parser("maintain", help="lake autopilot: compact chains, "
                                         "plan partitions, repartition "
                                         "(--apply), gc")
    mt.add_argument("--lake", required=True)
    mt.add_argument("--apply", action="store_true",
                    help="execute the repartition recommendation (default: "
                         "dry-run report)")
    mt.add_argument("--tolerance", type=float, default=2.0)
    mt.add_argument("--target-rows", type=int, default=None)
    mt.add_argument("--gc-keep", type=int, default=2,
                    help="rollback checkpoints retained by gc")
    mt.add_argument("--num-cpus", type=int, default=None)
    mt.set_defaults(fn=cmd_maintain)

    s = sub.add_parser("status", help="show lake manifest status")
    s.add_argument("--lake", required=True)
    s.add_argument("--events", default=None,
                   help="change-log dir: also report replay lag "
                        "(lag_files / lag_events vs the committed cursor)")
    s.set_defaults(fn=cmd_status)

    t = sub.add_parser("tail", help="poll the change log and replay "
                                    "new segments incrementally")
    t.add_argument("--events", required=True)
    t.add_argument("--lake", required=True)
    t.add_argument("--window-events", type=int, default=250_000)
    t.add_argument("--num-partitions", type=int, default=64)
    t.add_argument("--num-cpus", type=int, default=None)
    t.add_argument("--poll-sec", type=float, default=2.0)
    t.add_argument("--max-idle-polls", type=int, default=3,
                   help="exit after this many consecutive empty polls "
                        "(0 = run forever)")
    t.add_argument("--maintain-every", type=int, default=0,
                   dest="maintain_every",
                   help="run maintain(apply=True) after every N applied "
                        "passes (0 = never): compact, rebalance on "
                        "advisor recommendation, gc + manifest expiry")
    t.add_argument("--gc-keep", type=int, default=2, dest="gc_keep",
                   help="rollback checkpoints retained by the autopilot")
    t.set_defaults(fn=cmd_tail)

    gcp = sub.add_parser("gc", help="reclaim files of old checkpoints")
    gcp.add_argument("--lake", required=True)
    gcp.add_argument("--keep", type=int, default=2)
    gcp.add_argument("--expire-manifests", action="store_true",
                     help="also fold manifests beyond the retention into "
                          "the audit log and delete them (bounds lineage; "
                          "ends time travel past --keep)")
    gcp.set_defaults(fn=cmd_gc)

    rb = sub.add_parser("rollback", help="point the lake back at an "
                                         "earlier committed checkpoint")
    rb.add_argument("--lake", required=True)
    rb.add_argument("--to", type=int, required=True)
    rb.set_defaults(fn=cmd_rollback)

    ch = sub.add_parser("changes", help="print the change data feed "
                                        "(JSON lines; requires replays "
                                        "run with ETL_RAY_CHANGEFEED=1)")
    ch.add_argument("--lake", required=True)
    ch.add_argument("--since", type=int, default=None,
                    help="first checkpoint id (inclusive)")
    ch.add_argument("--until", type=int, default=None,
                    help="last checkpoint id (inclusive)")
    ch.add_argument("--prune-up-to", type=int, default=None,
                    dest="prune_up_to",
                    help="drop feed entries for checkpoints <= N "
                         "(consumer-acknowledged retention; files "
                         "reclaimed by the next gc)")
    ch.add_argument("--num-cpus", type=int, default=None)
    ch.set_defaults(fn=cmd_changes)

    df = sub.add_parser("diff", help="snapshot diff between two "
                        "checkpoints (added/removed/changed per key)")
    df.add_argument("--lake", required=True)
    df.add_argument("--since", type=int, required=True,
                    help="FROM checkpoint id")
    df.add_argument("--until", type=int, default=None,
                    help="TO checkpoint id (default: current)")
    df.add_argument("--num-cpus", type=int, default=None)
    df.set_defaults(fn=cmd_diff)

    rj = sub.add_parser("rejects", help="print the dead-letter queue "
                                        "(JSON lines)")
    rj.add_argument("--lake", required=True)
    rj.add_argument("--prune-up-to", type=int, default=None,
                    dest="prune_up_to",
                    help="drain dead-letter entries for checkpoints <= N")
    rj.add_argument("--num-cpus", type=int, default=None)
    rj.set_defaults(fn=cmd_rejects)

    gt = sub.add_parser("get", help="point-lookup one key's live row "
                                    "(exit 1 when absent/tombstoned)")
    gt.add_argument("--lake", required=True)
    gt.add_argument("--repo", required=True)
    gt.add_argument("--path", required=True)
    gt.add_argument("--as-of-seq", type=int, default=None, dest="as_of_seq",
                    help="time-travel to the latest checkpoint with "
                         "watermark <= this commit_seq (LSN anchor)")
    gt.add_argument("--as-of", type=int, default=None, dest="as_of",
                    help="time-travel checkpoint id")
    gt.set_defaults(fn=cmd_get)

    fs = sub.add_parser("fsck", help="verify manifest<->storage invariants "
                                     "(exit 1 on any violation)")
    fs.add_argument("--lake", required=True)
    fs.add_argument("--deep", action="store_true",
                    help="also chain-fold MOR partitions and recount")
    fs.set_defaults(fn=cmd_fsck)

    ex = sub.add_parser("export", help="bulk-export the live state to a "
                                       "user-facing parquet dataset")
    ex.add_argument("--lake", required=True)
    ex.add_argument("--out", required=True)
    ex.add_argument("--by", default=None,
                    help="comma-separated hive partition columns, e.g. lang")
    ex.add_argument("--as-of", type=int, default=None, dest="as_of")
    ex.add_argument("--num-cpus", type=int, default=None)
    ex.set_defaults(fn=cmd_export)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
