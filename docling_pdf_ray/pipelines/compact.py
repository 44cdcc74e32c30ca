"""Small-file compaction — the maintenance pass behind resumable
partitioned output.

The resume-atomic write path (extract.py: one parquet file per input
partition, finished partitions skipped on re-run) deliberately trades
file count for restartability; a long 100-TB run with many small
shards leaves thousands of KB-scale files that make every later scan
pay per-file open/footer costs. `compact_parquet` rewrites a parquet
directory into ~`target_rows_per_file`-row files, CONTENT-PRESERVING
(the row multiset is byte-identical — pinned by test) and fully
streaming: blocks flow read → coalesce → write through the object
store with backpressure; nothing materializes on the driver.

The coalesce is `repartition(shuffle=False)` — a split/merge of
existing blocks with NO all-to-all exchange (row order inside blocks
is preserved; only block boundaries move). Output is TWO-PHASE: blocks
write into a sibling `.inprogress` tree, the output row count is
verified against the input footers, `_SUCCESS` is stamped, and only
then is the tree atomically renamed to the requested path (same
discipline as the extract writer's partition tmp-dirs) — a crashed
compaction never leaves a half-written tree masquerading as the real
one, and a retry over a non-empty target is refused loudly (Ray's
write_parquet would otherwise append into it, merging two runs).

The reference has no storage layer at all (results live in Redis with
a TTL, redis_manager.py:64-68) — compaction is part of the
beyond-reference engine surface a persistent corpus needs.
"""

from __future__ import annotations

import math
import os


def compact_parquet(in_dir: str, out_dir: str,
                    target_rows_per_file: int = 250_000,
                    columns: list[str] | None = None) -> dict:
    """Rewrite the parquet tree at ``in_dir`` into ``out_dir`` with
    ~``target_rows_per_file`` rows per file. Returns a small audit
    dict (files before/after, rows MEASURED on both sides). Raises if
    ``out_dir`` is non-empty (explicit overwrite = delete first —
    never silently clobber or merge)."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    import ray.data as rd

    if os.path.exists(out_dir) and os.listdir(out_dir):
        # refuse ANY non-empty target — with or without _SUCCESS: Ray's
        # write_parquet appends uuid-named files into an existing dir,
        # so a retry over stale partial output would silently merge two
        # runs' rows and then mark the union _SUCCESS
        raise FileExistsError(
            f"{out_dir} is not empty; remove it explicitly to (re)run")

    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(in_dir)
        for f in fs if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {in_dir}")
    # footer row counts in parallel — the motivating case is thousands
    # of small files, where a serial driver scan would dominate startup
    with ThreadPoolExecutor(max_workers=16) as ex:
        n_rows = sum(m.num_rows
                     for m in ex.map(pq.read_metadata, files))
    n_blocks = max(1, math.ceil(n_rows / target_rows_per_file))

    # two-phase: write into a sibling tmp tree, verify, atomically
    # rename — a crash never leaves a half tree at the real path
    tmp = out_dir.rstrip("/") + ".inprogress"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    ds = rd.read_parquet(files, columns=columns)
    ds.repartition(n_blocks, shuffle=False).write_parquet(tmp)
    out_files = [os.path.join(tmp, f) for f in os.listdir(tmp)
                 if f.endswith(".parquet")]
    out_rows = sum(pq.read_metadata(f).num_rows for f in out_files)
    if out_rows != n_rows:
        raise RuntimeError(
            f"compaction row-count mismatch: in={n_rows} out={out_rows}")
    with open(os.path.join(tmp, "_SUCCESS"), "w") as f:
        f.write("ok")
    if os.path.isdir(out_dir):
        os.rmdir(out_dir)                   # empty by the guard above
    os.rename(tmp, out_dir)
    return {"in_files": len(files), "in_rows": n_rows,
            "out_files": len(out_files), "out_rows": out_rows,
            "target_rows_per_file": target_rows_per_file}
