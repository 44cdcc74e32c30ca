"""Per-partition lineage sidecar — the durable replacement for the
reference's Redis task store (redis_manager.py:40-139).

Where the reference tracked one TTL'd JSON record per document
(create → progress updates → complete), this engine tracks one durable
sidecar row per PARTITION (= input shard): status, ok/failed counters,
url range, wall time. Commit ordering is strict (SURVEY.md §7 hard
part (e)): a partition's output parquet is fully written and atomically
renamed into place BEFORE its sidecar row is written, so a sidecar row
is proof the data is complete — the resume filter trusts it.

Layout under the output root:
    out/partition_id=<k>/part-*.parquet      (the extracted rows)
    out/_lineage/part-<k>.parquet            (one LINEAGE_SCHEMA row)
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import LINEAGE_SCHEMA

LINEAGE_DIR = "_lineage"
STATUS_DONE = "done"
STATUS_FAILED = "failed"


def lineage_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, LINEAGE_DIR, f"part-{partition_id:05d}.parquet")


def partition_dir(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, f"partition_id={partition_id}")


def write_lineage(out_dir: str, partition_id: int, status: str, n_ok: int,
                  n_failed: int, first_url: str | None, last_url: str | None,
                  wall_s: float, shard: str | None = None) -> None:
    os.makedirs(os.path.join(out_dir, LINEAGE_DIR), exist_ok=True)
    t = pa.Table.from_pydict({
        "partition_id": [partition_id], "shard": [shard], "status": [status],
        "n_ok": [n_ok], "n_failed": [n_failed],
        "first_url": [first_url], "last_url": [last_url],
        "wall_s": [wall_s],
    }, schema=LINEAGE_SCHEMA)
    path = lineage_path(out_dir, partition_id)
    tmp = path + ".tmp"
    pq.write_table(t, tmp)
    os.replace(tmp, path)    # atomic on POSIX


def read_lineage(out_dir: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(out_dir, LINEAGE_DIR, "part-*.parquet")))
    if not files:
        return LINEAGE_SCHEMA.empty_table()

    def _upgrade(t: pa.Table) -> pa.Table:
        # sidecars written before the 'shard' column existed get a null
        # shard so mixed-version output dirs still concat/resume
        for f in LINEAGE_SCHEMA:
            if f.name not in t.column_names:
                t = t.append_column(f.name, pa.nulls(t.num_rows, f.type))
        return t.select(LINEAGE_SCHEMA.names)

    return pa.concat_tables(_upgrade(pq.read_table(f)) for f in files)


def completed_partitions(out_dir: str,
                         shards: list[str] | None = None) -> set[int]:
    """Partitions safe to skip on resume: sidecar says done AND the
    renamed data directory exists (defends against a sidecar written
    for a since-deleted output). When ``shards`` (the current sorted
    input list) is given, a partition also only counts done if its
    recorded shard basename matches the shard now assigned that id —
    adding/removing input files re-maps ids, and an index-only check
    would silently skip never-processed shards."""
    done: set[int] = set()
    t = read_lineage(out_dir)
    shard_names = t.column("shard").to_pylist() if "shard" in t.column_names \
        else [None] * t.num_rows
    for pid, status, shard in zip(t.column("partition_id").to_pylist(),
                                  t.column("status").to_pylist(),
                                  shard_names):
        if status != STATUS_DONE or not os.path.isdir(partition_dir(out_dir, pid)):
            continue
        if shards is not None:
            if pid >= len(shards):
                continue
            # an unknown (pre-upgrade) shard identity cannot prove the
            # mapping still holds — reprocess conservatively rather
            # than risk skipping a never-processed shard
            if shard is None or shard != os.path.basename(shards[pid]):
                continue
        done.add(pid)
    return done


def rollup_counters_for(out_dir: str, pids: set[int]) -> dict:
    """Counter rollup restricted to the given partition ids — the
    runner uses this so sidecars left by shards since REMOVED from the
    input set don't inflate the summary."""
    import pyarrow.compute as pc

    t = read_lineage(out_dir)
    mask = pa.array([p in pids for p in t.column("partition_id").to_pylist()],
                    pa.bool_())
    t = t.filter(mask)
    return {
        "partitions": t.num_rows,
        "n_ok": pc.sum(t.column("n_ok")).as_py() or 0,
        "n_failed": pc.sum(t.column("n_failed")).as_py() or 0,
        "wall_s_total": pc.sum(t.column("wall_s")).as_py() or 0.0,
    }


def rollup_counters(out_dir: str) -> dict:
    """Global success/failure rollup (north-rule counters; the analog
    of the reference's GET /tasks scan, main.py:252-273) — a driver-side
    sum over the tiny sidecar, not a data scan."""
    t = read_lineage(out_dir)
    import pyarrow.compute as pc

    return {
        "partitions": t.num_rows,
        "n_ok": pc.sum(t.column("n_ok")).as_py() or 0,
        "n_failed": pc.sum(t.column("n_failed")).as_py() or 0,
        "wall_s_total": pc.sum(t.column("wall_s")).as_py() or 0.0,
    }


def delete_partitions(out_dir: str, pids: list[int],
                      dry_run: bool = False) -> dict:
    """Targeted partition delete (r5 — the batch analog of the
    reference's ``DELETE /task/{id}``, main.py:275-309, which removed
    one task's record + result; here a "task" is an input shard =
    output partition). Same inverse-commit-order discipline as
    :func:`gc_partitions`: the sidecar row is deleted FIRST (resume
    immediately stops trusting the partition), then the data directory
    — a crash in between leaves only reprocessable data-without-sidecar
    state. Ids with neither sidecar nor data dir are reported as
    ``not_found`` (the reference's 404 arm). Returns an audit dict;
    ``dry_run`` reports without deleting."""
    import shutil

    removed, not_found = [], []
    for pid in sorted(set(int(p) for p in pids)):
        side = lineage_path(out_dir, pid)
        data = partition_dir(out_dir, pid)
        has_side, has_data = os.path.isfile(side), os.path.isdir(data)
        if not (has_side or has_data):
            not_found.append(pid)
            continue
        removed.append(pid)
        if dry_run:
            continue
        if has_side:
            os.remove(side)              # 1) un-commit (resume-safe)
        if has_data:
            shutil.rmtree(data, ignore_errors=True)   # 2) data
    return {"out_dir": out_dir, "dry_run": dry_run, "removed": removed,
            "not_found": not_found, "n_removed": len(removed)}


def gc_partitions(out_dir: str, older_than_s: float,
                  now: float | None = None,
                  dry_run: bool = False) -> dict:
    """Age-based output retention (r5 — the batch analog of the
    reference's result TTL, redis_manager.py:64-68, which expired
    results after 3600 s; durable parquet needs an explicit GC verb
    instead). A partition's AGE is its sidecar's mtime — the moment
    the commit protocol declared it complete. Partitions older than
    ``older_than_s`` are pruned ATOMICALLY per partition in the
    INVERSE of the commit order: the sidecar row is deleted FIRST
    (resume immediately stops trusting the partition), then the data
    directory — a crash in between leaves data without a sidecar,
    which a resume simply reprocesses/overwrites; the unsafe state
    (sidecar without data) can never occur. Returns an audit dict;
    ``dry_run`` reports without deleting."""
    import shutil
    import time as _time

    now = _time.time() if now is None else now
    cutoff = now - older_than_s
    removed, kept = [], []
    for path in sorted(glob.glob(
            os.path.join(out_dir, LINEAGE_DIR, "part-*.parquet"))):
        pid = int(os.path.basename(path)[len("part-"):-len(".parquet")])
        if os.path.getmtime(path) >= cutoff:
            kept.append(pid)
            continue
        removed.append(pid)
        if dry_run:
            continue
        os.remove(path)                      # 1) un-commit (resume-safe)
        shutil.rmtree(partition_dir(out_dir, pid), ignore_errors=True)  # 2) data
    return {"out_dir": out_dir, "older_than_s": older_than_s,
            "dry_run": dry_run, "removed": removed, "kept": kept,
            "n_removed": len(removed), "n_kept": len(kept)}
