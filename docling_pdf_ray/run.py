"""CLI entry point — the analog of the reference's service entry
(`python main.py`, main.py:364-381) and its ops endpoints
(/tasks, /health, /result — main.py:153-340), reshaped for batch:

    python -m docling_pdf_ray.run extract --input DIR_OR_GLOB --output DIR
        [--no-resume] [--dedup] [--max-mb N] [--concurrency K]
    python -m docling_pdf_ray.run status --output DIR
    python -m docling_pdf_ray.run lookup --output DIR --url URL
    python -m docling_pdf_ray.run health --output DIR
    python -m docling_pdf_ray.run delete --output DIR --partition ID... [--dry-run]
    python -m docling_pdf_ray.run gc --output DIR --older-than SECS [--dry-run]
    python -m docling_pdf_ray.run compact --input DIR --output DIR

Also usable under `ray job submit -- python -m docling_pdf_ray.run …`
on a real cluster. This is the only module that may own a Ray session
(guarded init, per the driver contract).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _resolve_inputs(spec: str) -> list[str]:
    if os.path.isdir(spec):
        return sorted(glob.glob(os.path.join(spec, "*.parquet")))
    return sorted(glob.glob(spec))


def cmd_extract(args) -> int:
    from .config import DEFAULT_CONFIG
    from .pipelines.extract import run_partitioned

    inputs = _resolve_inputs(args.input)
    if not inputs:
        print(f"error: no parquet inputs match {args.input!r}", file=sys.stderr)
        return 2
    cfg = DEFAULT_CONFIG
    if args.max_mb:
        cfg = cfg.with_(max_payload_bytes=int(args.max_mb * 1024 * 1024))
    if args.dedup:
        cfg = cfg.with_(dedup_urls=True)
    if args.concurrency:
        cfg = cfg.with_(partition_concurrency=args.concurrency)
    if args.mode:
        cfg = cfg.with_(execution_mode=args.mode)
    _ray_init()
    summary = run_partitioned(inputs, args.output, cfg, resume=not args.no_resume)
    print(json.dumps(summary))
    return 0


def cmd_status(args) -> int:
    """Job status from the lineage sidecar (analog of GET /tasks +
    /health, main.py:252-340) — no Ray session needed."""
    from .state import lineage

    t = lineage.read_lineage(args.output)
    roll = lineage.rollup_counters(args.output)
    roll["by_partition"] = [
        {"partition_id": p, "status": s, "n_ok": ok, "n_failed": nf,
         "wall_s": round(w, 2)}
        for p, s, ok, nf, w in zip(t.column("partition_id").to_pylist(),
                                   t.column("status").to_pylist(),
                                   t.column("n_ok").to_pylist(),
                                   t.column("n_failed").to_pylist(),
                                   t.column("wall_s").to_pylist())]
    print(json.dumps(roll, indent=2))
    return 0


def cmd_lookup(args) -> int:
    """Point lookup by url (analog of GET /result/{id},
    main.py:195-250) via parquet predicate pushdown."""
    from .pipelines.extract import lookup_url

    t = lookup_url(args.output, args.url)
    if t.num_rows == 0:
        print(json.dumps({"found": False, "url": args.url}))
        return 1
    row = {k: v for k, v in t.to_pylist()[0].items()
           if k not in ("pages", "spans", "tables", "images")}
    row["found"] = True
    print(json.dumps(row, default=str))
    return 0


def cmd_health(args) -> int:
    """Output-dir integrity check (the /health analog, main.py:311-340,
    reshaped for batch): every done sidecar must have its data dir, and
    orphan data dirs (data without a sidecar — a crash between rename
    and lineage write, or a mid-GC interruption) are reported as
    reprocessable. Exit 0 = healthy, 1 = findings. No Ray session."""
    import re

    from .state import lineage

    t = lineage.read_lineage(args.output)
    pids = set(t.column("partition_id").to_pylist())
    missing_data = [p for p in sorted(pids)
                    if not os.path.isdir(lineage.partition_dir(args.output, p))]
    on_disk = {int(m.group(1))
               for d in os.listdir(args.output)
               if (m := re.fullmatch(r"partition_id=(\d+)", d))
               and os.path.isdir(os.path.join(args.output, d))}
    orphans = sorted(on_disk - pids)
    report = {
        "healthy": not missing_data,
        "partitions": len(pids),
        **lineage.rollup_counters(args.output),
        "sidecar_without_data": missing_data,   # broken commit invariant
        "data_without_sidecar": orphans,        # reprocessable on resume
    }
    print(json.dumps(report))
    return 0 if report["healthy"] else 1


def cmd_delete(args) -> int:
    """Targeted partition delete (the DELETE /task/{id} analog,
    main.py:275-309) — sidecar-first, so resume semantics stay safe.
    Exit 0 if every requested id existed, 1 if any was not found (the
    reference's 404 arm). No Ray session needed."""
    from .state import lineage

    audit = lineage.delete_partitions(args.output, args.partition,
                                      dry_run=args.dry_run)
    print(json.dumps(audit))
    return 0 if not audit["not_found"] else 1


def cmd_gc(args) -> int:
    """Age-based output retention (the reference's result-TTL analog,
    redis_manager.py:64-68): prune partitions completed more than
    --older-than seconds ago, sidecar-first so resume semantics stay
    safe. No Ray session needed."""
    from .state import lineage

    audit = lineage.gc_partitions(args.output, args.older_than,
                                  dry_run=args.dry_run)
    print(json.dumps(audit))
    return 0


def cmd_compact(args) -> int:
    _ray_init()
    from .pipelines.compact import compact_parquet

    audit = compact_parquet(args.input, args.output,
                            target_rows_per_file=args.target_rows)
    print(json.dumps(audit))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="docling_pdf_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run the extraction pipeline")
    pe.add_argument("--input", required=True, help="parquet dir or glob")
    pe.add_argument("--output", required=True, help="output root dir")
    pe.add_argument("--no-resume", action="store_true",
                    help="reprocess completed partitions")
    pe.add_argument("--dedup", action="store_true",
                    help="defensive exact dedup by url (keep latest crawl)")
    pe.add_argument("--max-mb", type=float, default=None,
                    help="payload size cap in MiB (default 50)")
    pe.add_argument("--concurrency", type=int, default=None,
                    help="partitions in flight")
    pe.add_argument("--mode", choices=["actor_pool", "tasks"], default=None,
                    help="execution mode (default actor_pool; 'tasks' = "
                         "warm worker-global converter, byte-identical)")
    pe.set_defaults(fn=cmd_extract)

    ps = sub.add_parser("status", help="lineage/counters for an output dir")
    ps.add_argument("--output", required=True)
    ps.set_defaults(fn=cmd_status)

    pl = sub.add_parser("lookup", help="point lookup of one url's result")
    pl.add_argument("--output", required=True)
    pl.add_argument("--url", required=True)
    pl.set_defaults(fn=cmd_lookup)

    ph = sub.add_parser(
        "health", help="output-dir integrity check (sidecar vs data dirs)")
    ph.add_argument("--output", required=True)
    ph.set_defaults(fn=cmd_health)

    pd_ = sub.add_parser(
        "delete", help="delete specific output partitions by id "
                       "(lineage-aware; sidecar removed before data)")
    pd_.add_argument("--output", required=True)
    pd_.add_argument("--partition", type=int, nargs="+", required=True,
                     help="partition id(s) to delete")
    pd_.add_argument("--dry-run", action="store_true",
                     help="report what would be deleted, delete nothing")
    pd_.set_defaults(fn=cmd_delete)

    pg = sub.add_parser(
        "gc", help="prune output partitions older than a retention age "
                   "(lineage-aware; sidecar removed before data)")
    pg.add_argument("--output", required=True)
    pg.add_argument("--older-than", type=float, required=True,
                    help="retention age in seconds")
    pg.add_argument("--dry-run", action="store_true",
                    help="report what would be pruned, delete nothing")
    pg.set_defaults(fn=cmd_gc)

    pc_ = sub.add_parser(
        "compact", help="rewrite a parquet dir into fewer, larger files "
                        "(content-preserving, streaming)")
    pc_.add_argument("--input", required=True, help="parquet dir to compact")
    pc_.add_argument("--output", required=True, help="fresh output dir")
    pc_.add_argument("--target-rows", type=int, default=250_000,
                     help="rows per output file (default 250k)")
    pc_.set_defaults(fn=cmd_compact)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
