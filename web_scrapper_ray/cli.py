"""CLI entry points (reference surface: `/root/reference/src/webscraper/
cli/main.py:30-334` — scrape / export-data, with dot-path config
overrides).

The cron scheduler layer (`schedulers/job_scheduler.py`) is out of the
dataplane by design (north rule): each scheduled run is a
``ray job submit`` of this CLI.  This module owns its Ray session
(guarded init), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray(num_cpus: int | None) -> None:
    import ray

    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass


def cmd_scrape(args: argparse.Namespace) -> int:
    from .config import ConfigManager, get_pipeline

    cm = ConfigManager(args.config)
    for override in args.set or []:
        key, _, value = override.partition("=")
        try:
            value = json.loads(value)
        except ValueError:
            pass
        cm.set(key, value)
    cm.validate()
    sc = cm.get("scraper")
    # pre-flight the output sink BEFORE any scraping happens — a sink
    # error after a completed crawl wastes the whole run. Only the
    # non-content pipelines write the sink (the content pipeline writes
    # its own parquet layout), so the check is scoped to them; a missing
    # path keeps the historical "skip writing" semantics with a warning.
    out_pre = (sc.get("output") or {}) if sc.get("type") != "content" else {}
    if out_pre.get("format") and out_pre.get("path"):
        from .sources.io import sink_preflight_error

        err = sink_preflight_error(out_pre["format"], out_pre["path"])
        if err:
            print(f"error: {err}", file=sys.stderr)
            return 2
    elif out_pre.get("format"):
        print("warning: output.format set but output.path missing — "
              "skipping the sink write", file=sys.stderr)
    _ensure_ray(args.num_cpus)
    pipeline = get_pipeline(sc["type"])
    world = cm.get("scraper.world_dir") or args.world_dir
    if not world:
        print("error: scraper.world_dir (content store) required in this "
              "sandbox build", file=sys.stderr)
        return 2
    if sc["type"] == "content":
        # crawl knobs are part of the declarative surface (dot-path
        # overridable via --set, e.g. --set scraper.frontier_policy=priority)
        crawl_kwargs = {
            k: sc[k] for k in ("fetch_backend", "frontier_policy",
                               "seed_priorities", "max_urls_per_wave",
                               "dedup_scope", "speculative_decode",
                               "politeness")
            if k in sc
        }
        if "seed_priorities" in crawl_kwargs and isinstance(
                crawl_kwargs["seed_priorities"], dict):
            crawl_kwargs["seed_priorities"] = {
                int(k): int(v) for k, v in crawl_kwargs["seed_priorities"].items()
            }
        res = pipeline(world, sc["urls"], sc.get("selectors"),
                       out_dir=args.out_dir or "/tmp/wsr_cli_crawl",
                       opts={k: sc[k] for k in ("max_pages", "follow_next_page",
                                                "respect_disallow")
                             if k in sc},
                       **crawl_kwargs)
        print(json.dumps({k: v for k, v in res.items() if isinstance(v, (str, int, dict))},
                         default=str))
    else:
        records = pipeline(world, sc["urls"], sc.get("selectors"),
                           fetch_backend=sc.get("fetch_backend"))
        out = sc.get("output") or {}
        if out.get("format") and out.get("path"):
            import ray.data as rd

            from .sources.io import save_dataset

            flat = [{k: json.dumps(v) if isinstance(v, (dict, list)) else v
                     for k, v in r.items()} for r in records]
            save_dataset(rd.from_items(flat), out["path"], out["format"])
        print(json.dumps({"records": len(records)}))
    return 0


def cmd_export_data(args: argparse.Namespace) -> int:
    from .sources.io import export_data

    _ensure_ray(args.num_cpus)
    export_data(args.input, args.output, args.input_format, args.format,
                single_file=args.single_file)
    print(json.dumps({"exported": args.output}))
    return 0


def cmd_schedule(args: argparse.Namespace) -> int:
    """Reference `webscraper schedule` surface (cli/main.py:179-224):
    cron/interval jobs persisted to a store, fired as CLI subprocesses
    (the `ray job submit` analog). No Ray session needed here."""
    from .schedulers import JobScheduler

    s = JobScheduler(args.store)
    if args.action == "add":
        if not (args.name and args.config):
            print("error: --name and --config required for add", file=sys.stderr)
            return 2
        trigger = args.cron or args.trigger
        if not trigger:
            print("error: --cron or --trigger required", file=sys.stderr)
            return 2
        try:
            jid = s.schedule_job(args.name, args.config, trigger,
                                 email=args.email, webhook=args.webhook)
        except ValueError as e:
            print(f"error: invalid trigger: {e}", file=sys.stderr)
            return 2
        print(json.dumps({"job_id": jid, "next_run": s.get_job(jid)["next_run"]}))
    elif args.action == "list":
        print(json.dumps(s.list_jobs(), default=str))
    elif args.action == "remove":
        ok = s.remove_job(args.job_id or "")
        print(json.dumps({"removed": bool(ok)}))
        return 0 if ok else 1
    elif args.action == "run-due":
        ran = s.run_due()
        print(json.dumps({"ran": ran}))
    elif args.action == "daemon":
        stats = s.run_daemon(poll_s=args.poll_s,
                             max_instances=args.max_instances,
                             max_ticks=args.max_ticks)
        print(json.dumps(stats))
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    """Run any registered analytics/dedup/similarity pipeline from the
    ``queries()`` registry over a parquet table directory — the batch
    query surface next to `scrape` (crawl) and `export-data` (codec).
    `wsr query list` enumerates; results print a one-line JSON summary
    and optionally land in csv/parquet/json picked by --output suffix."""
    import importlib
    import os

    try:
        entry = importlib.import_module("__ray_entry__")
    except ModuleNotFoundError:
        # installed-package layout: the registry module lives at the
        # repo root next to the package
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        entry = importlib.import_module("__ray_entry__")
    qs = entry.queries()
    if args.name == "list":
        for name in qs:
            print(name)
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r} (see `wsr query list`)",
              file=sys.stderr)
        return 2
    _ensure_ray(args.num_cpus)
    res = qs[args.name](args.sf_dir)
    import pandas as pd

    if not isinstance(res, pd.DataFrame):
        res = res.to_pandas()
    out = {"query": args.name, "rows": int(len(res)),
           "columns": list(map(str, res.columns))}
    if args.output:
        if args.output.endswith(".parquet"):
            res.to_parquet(args.output, index=False)
        elif args.output.endswith(".json"):
            res.to_json(args.output, orient="records")
        else:
            res.to_csv(args.output, index=False)
        out["output"] = args.output
    print(json.dumps(out))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="wsr", description="Ray-Data crawl engine CLI")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("scrape", help="run a configured scrape/crawl")
    ps.add_argument("--config", required=True)
    ps.add_argument("--set", action="append", metavar="dot.path=value",
                    help="config override (repeatable)")
    ps.add_argument("--world-dir", default=None)
    ps.add_argument("--out-dir", default=None)
    ps.set_defaults(fn=cmd_scrape)

    pe = sub.add_parser("export-data", help="convert between storage formats")
    pe.add_argument("-i", "--input", required=True)
    pe.add_argument("-o", "--output", required=True)
    pe.add_argument("-f", "--format", default=None)
    pe.add_argument("--input-format", default=None)
    pe.add_argument("--single-file", action="store_true",
                    help="write one reference-compatible json/csv file "
                         "instead of a streaming part directory")
    pe.set_defaults(fn=cmd_export_data)

    pq = sub.add_parser("query",
                        help="run a registered pipeline over parquet "
                             "tables (or `list` to enumerate)")
    pq.add_argument("name")
    pq.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    dest="sf_dir")
    pq.add_argument("--output", default=None,
                    help="write result (.csv/.parquet/.json by suffix)")
    pq.set_defaults(fn=cmd_query)

    pj = sub.add_parser("schedule", help="manage scheduled jobs (cron/interval)")
    pj.add_argument("action", choices=["add", "list", "remove", "run-due",
                                       "daemon"])
    pj.add_argument("--poll-s", type=float, default=1.0, dest="poll_s")
    pj.add_argument("--max-instances", type=int, default=3)
    pj.add_argument("--max-ticks", type=int, default=None,
                    help="stop after N polls (default: run forever)")
    pj.add_argument("--store", default="/tmp/wsr_jobs/jobs.json")
    pj.add_argument("--name", default=None)
    pj.add_argument("--config", default=None)
    pj.add_argument("--cron", default=None, metavar='"0 3 * * *"')
    pj.add_argument("--trigger", default=None, metavar='"every 1h"')
    pj.add_argument("--email", default=None)
    pj.add_argument("--webhook", default=None)
    pj.add_argument("--job-id", default=None)
    pj.set_defaults(fn=cmd_schedule)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
