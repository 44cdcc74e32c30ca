#!/usr/bin/env python
"""Benchmark: end-to-end extraction throughput + representative query
timings over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

Prints ONE SHORT JSON line (the driver captures a bounded stdout tail
— r4's full sweep outgrew it):
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {10 slowest}, "queries_n": N, "queries_total_sec": ...,
   "sweep_path": <full per-query sweep JSON file>, "sf": ...,
   "num_cpus": N, "docs_per_s": ..., "mb_per_s": ...,
   "actor_pool_sec": ...}

The headline is the 'tasks' execution mode (byte-identical output to
the default actor-pool structure, tested in test_pipeline.py); the
actor-pool median is reported alongside. --scaling: runs the headline
pipeline at 4/8/16/32 CPUs, each level as GRAFT_BENCH_SCALING_SESSIONS
(default 3) fresh processes of 3 reps, and reports the 4→16 and 8→32
N-vs-4N efficiencies from median sessions (the sandbox stand-in for
the north rule's two-cluster-size criterion).

Input: pages parquet synthesized deterministically from the sf dir's
documents table (sources/pages_from_documents.py), replicated
GRAFT_BENCH_REPL× (default 16) with distinct urls so the corpus is
large enough that fixed startup cost doesn't mask scaling; cached
under /tmp/graft_bench and page-cache-warmed before timing.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPL = int(os.environ.get("GRAFT_BENCH_REPL", "16"))
CACHE_ROOT = "/tmp/graft_bench"


def _pages_cache_dir() -> str:
    # the synthesis source is part of the key: a future round changing
    # pages_from_documents.py must not silently benchmark a stale corpus
    import docling_pdf_ray.sources.pages_from_documents as _pfd

    with open(_pfd.__file__, "rb") as f:
        src_h = hashlib.md5(f.read()).hexdigest()[:8]
    key = hashlib.md5(f"{SF_DIR}|{REPL}|v3|{src_h}".encode()).hexdigest()[:10]
    return os.path.join(CACHE_ROOT, f"pages-{key}")


def prepare_pages() -> list[str]:
    """Materialize the replicated pages corpus once (cached)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = _pages_cache_dir()
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return sorted(glob.glob(os.path.join(out, "*.parquet")))
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)

    from docling_pdf_ray.sources.pages_from_documents import (
        pages_batch_from_documents)

    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text", "lang", "source"])
    base = pages_batch_from_documents(docs)
    rows_per_file = 2500
    for r in range(REPL):
        t = base
        if r:
            import pyarrow.compute as pc

            t = t.set_column(0, "url", pc.binary_join_element_wise(
                t.column("url"), pa.array([f"?rep={r}"] * t.num_rows), ""))
        for k in range((t.num_rows + rows_per_file - 1) // rows_per_file):
            chunk = t.slice(k * rows_per_file, rows_per_file)
            if chunk.num_rows:
                pq.write_table(chunk, os.path.join(out, f"pages-{r:03d}-{k:04d}.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return sorted(glob.glob(os.path.join(out, "*.parquet")))


def _warmup(shards, cfg, actor_pool_too: bool = True) -> None:
    """Untimed: spin up the Ray worker pool and import the package in
    every worker (first-execution cost is once-per-session in
    production, ~15s here — it would otherwise dominate a seconds-scale
    benchmark), and exercise the measured extract path(s) once on one
    shard (the tasks path warms the worker-global converters; the actor
    path — only when it will be timed — warms pool spin-up and the
    parquet write)."""
    import ray.data as rd

    def _imp(b):
        import docling_pdf_ray.oracle  # noqa: F401

        return b

    rd.range(100_000, override_num_blocks=NUM_CPUS * 2).map_batches(
        _imp, batch_format="pyarrow").count()
    from docling_pdf_ray.pipelines.extract import extract_dataset

    # exercise the FULL path including the parquet write — the first
    # write execution in a session pays a large one-time cost
    modes = ("tasks", "actor_pool") if actor_pool_too else ("tasks",)
    for mode in modes:
        wout = os.path.join(CACHE_ROOT, f"warmup-out-{mode}")
        shutil.rmtree(wout, ignore_errors=True)
        extract_dataset(shards[:1], cfg.with_(execution_mode=mode)) \
            .write_parquet(wout)
        shutil.rmtree(wout, ignore_errors=True)


def _timed_extract(shards, cfg, tag: str, reps: int = 3) -> list[float]:
    from docling_pdf_ray.pipelines.extract import extract_dataset

    out = []
    for _rep in range(reps):
        out_dir = os.path.join(CACHE_ROOT, f"extract-out-{tag}-{NUM_CPUS}")
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.monotonic()
        # cpus×2 blocks: measured sweep (256/128/64/32 blocks at 32
        # cpus → 2.03/1.72/1.39/1.03 s) — per-task overhead dominates
        # above cpus×2, while cpus×1 leaves no pipelining or skew
        # headroom (benchmark-overfitting); ×2 is the honest setting
        ds = extract_dataset(shards, cfg, override_num_blocks=NUM_CPUS * 2)
        ds.write_parquet(out_dir)
        out.append(time.monotonic() - t0)
        shutil.rmtree(out_dir, ignore_errors=True)
    return out


def _measure(actor_pool_too: bool = True) -> dict:
    """Shared headline measurement (Ray session must be initialised):
    prepare + page-cache warm + worker warmup + 3-rep medians.

    HEADLINE = 'tasks' execution mode (byte-identical output to the
    actor-pool mode, tested): stateless task stage with worker-global
    warm converters. On this single node it is consistently ~2-4×
    faster than the actor-pool structure (pool scheduling + block
    handoff overhead; unfusing the sniff stage does not close the gap —
    measured), so the headline reports the faster of two correct
    implementations with the actor-pool number alongside."""
    import pyarrow.parquet as pq

    from docling_pdf_ray.config import DEFAULT_CONFIG

    shards = prepare_pages()
    n_docs = sum(pq.read_metadata(s).num_rows for s in shards)
    n_bytes = sum(os.path.getsize(s) for s in shards)

    # warm OS page cache so we measure compute+shuffle, not cold reads
    for s in shards:
        with open(s, "rb") as f:
            while f.read(1 << 22):
                pass

    pool = NUM_CPUS - max(1, NUM_CPUS // 8)
    cfg = DEFAULT_CONFIG.with_(pdf_pool_min=pool, pdf_pool_max=pool)
    _warmup(shards, cfg, actor_pool_too=actor_pool_too)

    reps = _timed_extract(shards, cfg.with_(execution_mode="tasks"), "tasks")
    headline = sorted(reps)[1]   # median of 3 (noisy shared host)
    result = {
        "metric": "end-to-end extraction throughput (mixed HTML+PDF pages, "
                  "tasks mode)",
        "value": round(headline, 3),
        "reps": [round(r, 2) for r in reps],
        "unit": "sec",
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "input_mb": round(n_bytes / 1e6, 1),
        "docs_per_s": round(n_docs / headline, 1),
        "mb_per_s": round(n_bytes / 1e6 / headline, 1),
    }
    if actor_pool_too:
        areps = _timed_extract(shards, cfg, "pool")
        a_med = sorted(areps)[1]
        result["actor_pool_sec"] = round(a_med, 3)
        result["actor_pool_reps"] = [round(r, 2) for r in areps]
        result["actor_pool_docs_per_s"] = round(n_docs / a_med, 1)
    return result


def _bench_ray_init() -> None:
    """Session owner for the benchmark. GRAFT_BENCH_ADDRESS (set by
    --scaling-multinode) connects to an already-started multi-raylet
    cluster instead of booting a local one."""
    import ray

    addr = os.environ.get("GRAFT_BENCH_ADDRESS")
    if addr:
        ray.init(address=addr, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    else:
        ray.init(address="local", num_cpus=NUM_CPUS,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def run_bench() -> dict:
    import ray

    _bench_ray_init()

    result = _measure()

    # representative operator timings (consumed to small results)
    import pandas as pd

    from docling_pdf_ray import queries as Q

    def timed(name):
        t = time.monotonic()
        r = Q.QUERIES[name](SF_DIR)
        if not isinstance(r, pd.DataFrame):
            r = r.to_pandas()        # consume the lazy Dataset
        assert len(r) >= 0
        return round(time.monotonic() - t, 3)

    # the sweep IS the registry — derived, not hand-maintained, so a
    # newly registered query can never silently fall out (the drift
    # mode that had left 28 early entries unswept until r5 session 5)
    sweep = {name: timed(name) for name in sorted(Q.QUERIES)}
    # the full per-query sweep outgrew the driver's bounded stdout-tail
    # capture in r4 (BENCH_r04.json parsed: null) — stream it to a side
    # file and keep the final stdout line SHORT: headline + the 10
    # slowest sweep entries + aggregates + the sweep file path
    sweep_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_SWEEP.json")
    with open(sweep_path, "w") as f:
        json.dump({"sf": SF_DIR, "num_cpus": NUM_CPUS, "queries": sweep},
                  f, indent=1, sort_keys=True)
    slowest = dict(sorted(sweep.items(), key=lambda kv: -kv[1])[:10])
    result["queries"] = slowest
    result["queries_n"] = len(sweep)
    result["queries_total_sec"] = round(sum(sweep.values()), 2)
    result["sweep_path"] = sweep_path
    ray.shutdown()
    return result


def run_scaling() -> dict:
    import subprocess

    # the scaling corpus must be big enough that fixed pipeline latency
    # is negligible at the HIGH parallelism level. Measured (BASELINE
    # runs F vs H): at 64× (320k docs) the 32-CPU level runs ~3.3 s and
    # session noise dominates; at 128× (640k docs) every session lands
    # within ±3 % and the 8→32 efficiency is reproducibly ≥0.8 — so
    # 128× is the default methodology.
    repl = os.environ.get("GRAFT_BENCH_REPL_SCALING", "128")
    # host noise is ±25% run-to-run: each level runs N_SESSIONS fresh
    # PROCESSES (each itself a 3-rep median) and the pair efficiency is
    # computed from the median SESSION — a single lucky/unlucky session
    # cannot move the headline claim
    n_sessions = int(os.environ.get("GRAFT_BENCH_SCALING_SESSIONS", "3"))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_HEADLINE_ONLY="1", GRAFT_BENCH_REPL=repl)
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    def level(ncpu: int) -> dict:
        sessions = [one(ncpu) for _ in range(n_sessions)]
        secs = sorted(s["value"] for s in sessions)
        med = secs[len(secs) // 2]
        rep = next(s for s in sessions if s["value"] == med)
        return {"sec": med, "docs_per_s": rep["docs_per_s"],
                "session_secs": [round(s, 3) for s in sorted(
                    x["value"] for x in sessions)]}

    # Two N-vs-4N pairs, both reported. 4→16 models a real cluster's
    # N→4N node scale-out most faithfully on this one-node sandbox
    # (modest per-raylet worker counts at both levels); 8→32 pushes the
    # high level past the single raylet+object-store coordination knee,
    # a purely single-node artifact (BASELINE.md has the multiprocessing
    # control experiment quantifying that ceiling).
    levels = {n: level(n) for n in (4, 8, 16, 32)}
    pairs = {}
    for lo, hi in ((4, 16), (8, 32)):
        r_lo, r_hi = levels[lo], levels[hi]
        eff = (r_lo["sec"] / r_hi["sec"]) / (hi / lo)
        pairs[f"{lo}to{hi}"] = {
            "sec_lo": r_lo["sec"], "sec_hi": r_hi["sec"],
            "docs_per_s_lo": r_lo["docs_per_s"],
            "docs_per_s_hi": r_hi["docs_per_s"],
            "session_secs_lo": r_lo["session_secs"],
            "session_secs_hi": r_hi["session_secs"],
            "scaling_efficiency": round(eff, 3),
        }
    return {
        "metric": "scaling efficiency (same input, fresh sessions, N vs 4N "
                  f"cpus; median of {n_sessions} sessions × 3 reps per level)",
        "pairs": pairs,
        "scaling_efficiency": pairs["4to16"]["scaling_efficiency"],
        "scaling_efficiency_8to32": pairs["8to32"]["scaling_efficiency"],
        "sf": SF_DIR,
    }


def run_scaling_multinode() -> dict:
    """--scaling-multinode (the r4 verdict's stretch #9): the two-RAYLET
    variant of --scaling. Each level boots a head raylet PLUS a second
    worker raylet on localhost (`ray start --head` / `ray start
    --address=...`), and the headline child connects by address — so
    every exchange path crosses a REAL inter-raylet object-store
    boundary instead of staying inside one plasma store. Levels are
    N=8 (4+4 cpus) vs 4N=32 (16+16 cpus): both levels have the same
    two-node topology, so the pair isolates scale-out, not the
    one-vs-two-raylet constant. Requires exclusive use of Ray on the
    host (`ray stop --force` between levels)."""
    import subprocess

    repl = os.environ.get("GRAFT_BENCH_REPL_SCALING", "128")
    n_sessions = int(os.environ.get("GRAFT_BENCH_SCALING_SESSIONS", "3"))
    port = int(os.environ.get("GRAFT_BENCH_RAY_PORT", "6380"))

    def ray_cli(*args) -> None:
        subprocess.run(["ray", *args], check=True, capture_output=True,
                       text=True)

    def one(total: int) -> dict:
        per = total // 2
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
        ray_cli("start", "--head", f"--num-cpus={per}", f"--port={port}",
                "--include-dashboard=false")
        ray_cli("start", f"--address=127.0.0.1:{port}", f"--num-cpus={per}")
        try:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(total),
                       GRAFT_BENCH_HEADLINE_ONLY="1",
                       GRAFT_BENCH_ADDRESS=f"127.0.0.1:{port}",
                       GRAFT_BENCH_REPL=repl)
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            return json.loads(out.stdout.strip().splitlines()[-1])
        finally:
            subprocess.run(["ray", "stop", "--force"], capture_output=True)

    def level(total: int) -> dict:
        sessions = [one(total) for _ in range(n_sessions)]
        secs = sorted(s["value"] for s in sessions)
        med = secs[len(secs) // 2]
        rep = next(s for s in sessions if s["value"] == med)
        return {"sec": med, "docs_per_s": rep["docs_per_s"],
                "session_secs": secs}

    levels = {n: level(n) for n in (4, 8, 16, 32)}
    pairs = {}
    for lo_n, hi_n in ((4, 16), (8, 32)):
        lo, hi = levels[lo_n], levels[hi_n]
        pairs[f"{lo_n}to{hi_n}"] = {
            "sec_lo": lo["sec"], "sec_hi": hi["sec"],
            "docs_per_s_lo": lo["docs_per_s"],
            "docs_per_s_hi": hi["docs_per_s"],
            "session_secs_lo": lo["session_secs"],
            "session_secs_hi": hi["session_secs"],
            "scaling_efficiency": round(
                (lo["sec"] / hi["sec"]) / (hi_n / lo_n), 3),
        }
    return {
        "metric": "two-raylet scaling efficiency (head+worker raylets on "
                  "localhost, every exchange crosses a real object-store "
                  f"boundary; N vs 4N cpus split evenly across the two "
                  f"raylets, median of {n_sessions} sessions x 3 reps)",
        "topology": "2 raylets per level",
        "pairs": pairs,
        "scaling_efficiency": pairs["4to16"]["scaling_efficiency"],
        "scaling_efficiency_8to32": pairs["8to32"]["scaling_efficiency"],
        "sf": SF_DIR,
    }


def main() -> None:
    if "--scaling-multinode" in sys.argv:
        print(json.dumps(run_scaling_multinode(), separators=(",", ":")))
        return
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(), separators=(",", ":")))
        return
    if os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        # child of --scaling: skip the query sweep, headline only
        result = run_bench_headline_only()
        print(json.dumps(result, separators=(",", ":")))
        return
    print(json.dumps(run_bench(), separators=(",", ":")))


def run_bench_headline_only() -> dict:
    """--scaling child: the same headline measurement as run_bench
    minus the query sweep and the actor-pool comparison run."""
    import ray

    _bench_ray_init()
    result = _measure(actor_pool_too=False)
    result["metric"] = "extraction headline"
    result["queries"] = {}
    ray.shutdown()
    return result


if __name__ == "__main__":
    main()
