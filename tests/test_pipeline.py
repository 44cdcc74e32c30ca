"""End-to-end Ray pipeline vs single-threaded oracle: the byte-identity
gate (SURVEY.md §5.2 item 1), plus resume and determinism."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from docling_pdf_ray.config import DEFAULT_CONFIG
from docling_pdf_ray.oracle import extract_rows
from docling_pdf_ray.schema import EXTRACTED_SCHEMA, result_to_arrow
from docling_pdf_ray.sources.fixtures import TEST_MAX_BYTES

CFG = DEFAULT_CONFIG.with_(max_payload_bytes=TEST_MAX_BYTES,
                           pdf_pool_min=1, pdf_pool_max=2,
                           partition_concurrency=2)


# dup_url fixture rows tie on url → always break sort ties on content
SORT_KEY = [("url", "ascending"), ("full_text", "ascending"),
            ("error", "ascending")]


def _oracle_table(pages_dir: str) -> pa.Table:
    t = pq.read_table(pages_dir)
    rows = extract_rows(t.column("url").to_pylist(),
                        t.column("html").to_pylist(), CFG)
    out = result_to_arrow(rows)
    return out.sort_by(SORT_KEY)


def _assert_equal_per_url(ray_t: pa.Table, oracle_t: pa.Table):
    ray_t = ray_t.select(EXTRACTED_SCHEMA.names).sort_by(SORT_KEY).combine_chunks()
    oracle_t = oracle_t.combine_chunks()
    assert ray_t.num_rows == oracle_t.num_rows
    assert ray_t.schema.equals(oracle_t.schema), (
        f"{ray_t.schema}\n!=\n{oracle_t.schema}")
    # byte-identity on full_text per url, then full-column equality
    assert ray_t.column("url").equals(oracle_t.column("url"))
    assert ray_t.column("full_text").equals(oracle_t.column("full_text")), \
        "full_text not byte-identical"
    for name in EXTRACTED_SCHEMA.names:
        assert ray_t.column(name).equals(oracle_t.column(name)), f"column {name} differs"


@pytest.fixture(scope="module")
def extracted_run(ray_session, fixture_pages_dir, tmp_path_factory):
    from docling_pdf_ray.pipelines.extract import run_partitioned

    out = str(tmp_path_factory.mktemp("extract_out"))
    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))
    summary = run_partitioned(shards, out, CFG)
    return out, shards, summary


def test_pipeline_matches_oracle_byte_identically(extracted_run, fixture_pages_dir):
    from docling_pdf_ray.pipelines.extract import extracted_files

    out, shards, summary = extracted_run
    # the engine's real output surface is the written parquet
    ray_t = pa.concat_tables(pq.read_table(f) for f in extracted_files(out))
    oracle_t = _oracle_table(fixture_pages_dir)
    _assert_equal_per_url(ray_t, oracle_t)


def test_row_count_preserved(extracted_run):
    out, shards, summary = extracted_run
    n_in = sum(pq.read_metadata(s).num_rows for s in shards)
    assert summary["n_ok"] + summary["n_failed"] == n_in


def test_lineage_sidecar(extracted_run):
    from docling_pdf_ray.state import lineage

    out, shards, summary = extracted_run
    t = lineage.read_lineage(out)
    assert t.num_rows == len(shards)
    assert set(t.column("status").to_pylist()) == {"done"}
    assert all(w > 0 for w in t.column("wall_s").to_pylist())
    assert lineage.completed_partitions(out) == set(range(len(shards)))
    roll = lineage.rollup_counters(out)
    assert roll["n_ok"] == summary["n_ok"] and roll["n_failed"] == summary["n_failed"]


def test_gc_retention_prunes_old_partitions(extracted_run):
    """run.py gc (r5 — the reference's result-TTL analog): partitions
    whose sidecar mtime is older than the retention age are pruned
    sidecar-FIRST (the inverse of the commit order, so a crash mid-GC
    can only leave reprocessable data, never a sidecar without data);
    dry-run deletes nothing; young partitions and counters survive."""
    import os
    import time

    from docling_pdf_ray.state import lineage

    out, shards, summary = extracted_run
    n = len(shards)
    # backdate partition 0's sidecar: completed "two hours ago"
    old = time.time() - 7200
    os.utime(lineage.lineage_path(out, 0), (old, old))

    audit = lineage.gc_partitions(out, older_than_s=3600, dry_run=True)
    assert audit["removed"] == [0] and audit["n_kept"] == n - 1
    assert os.path.exists(lineage.lineage_path(out, 0))      # dry run

    audit = lineage.gc_partitions(out, older_than_s=3600)
    assert audit["removed"] == [0]
    assert not os.path.exists(lineage.lineage_path(out, 0))
    assert not os.path.isdir(lineage.partition_dir(out, 0))
    # the survivors are intact and resume no longer trusts partition 0
    assert lineage.completed_partitions(out) == set(range(1, n))
    assert os.path.isdir(lineage.partition_dir(out, 1))
    # idempotent: nothing old remains
    again = lineage.gc_partitions(out, older_than_s=3600)
    assert again["removed"] == [] and again["n_kept"] == n - 1

    # restore for sibling tests that share the session-scoped fixture
    from docling_pdf_ray.pipelines.extract import run_partitioned

    run_partitioned(shards, out, CFG, resume=True)
    assert lineage.completed_partitions(out) == set(range(n))


def test_health_verb_reports_integrity(extracted_run, capsys):
    """run.py health (r5 — the /health analog): clean output is
    healthy; an orphan data dir (reprocessable) is reported without
    failing; a done sidecar whose data dir is gone breaks the commit
    invariant and exits non-zero."""
    import json
    import os
    import shutil

    from docling_pdf_ray import run as cli
    from docling_pdf_ray.state import lineage

    out, shards, summary = extracted_run

    assert cli.main(["health", "--output", out]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["healthy"] and rep["partitions"] == len(shards)

    os.makedirs(os.path.join(out, "partition_id=999"), exist_ok=True)
    assert cli.main(["health", "--output", out]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["data_without_sidecar"] == [999]

    shutil.rmtree(lineage.partition_dir(out, 0))
    assert cli.main(["health", "--output", out]) == 1
    rep = json.loads(capsys.readouterr().out)
    assert rep["sidecar_without_data"] == [0] and not rep["healthy"]

    # restore the module-scoped fixture for sibling tests: drop the
    # orphan, delete the stale sidecar, and resume-reprocess partition 0
    shutil.rmtree(os.path.join(out, "partition_id=999"))
    os.remove(lineage.lineage_path(out, 0))
    from docling_pdf_ray.pipelines.extract import run_partitioned

    run_partitioned(shards, out, CFG, resume=True)
    assert cli.main(["health", "--output", out]) == 0
    capsys.readouterr()


def test_delete_verb_removes_target_partition(extracted_run, capsys):
    """run.py delete (r5 — the DELETE /task/{id} analog): the targeted
    partition is removed sidecar-FIRST (inverse commit order — resume
    stops trusting it before any data disappears); dry-run deletes
    nothing; an unknown id is the reference's 404 arm (exit 1)."""
    import json
    import os

    from docling_pdf_ray import run as cli
    from docling_pdf_ray.state import lineage

    out, shards, summary = extracted_run
    n = len(shards)

    assert cli.main(["delete", "--output", out, "--partition", "1",
                     "--dry-run"]) == 0
    audit = json.loads(capsys.readouterr().out)
    assert audit["removed"] == [1] and audit["dry_run"]
    assert os.path.exists(lineage.lineage_path(out, 1))       # dry run

    assert cli.main(["delete", "--output", out, "--partition", "1"]) == 0
    audit = json.loads(capsys.readouterr().out)
    assert audit["removed"] == [1] and audit["not_found"] == []
    assert not os.path.exists(lineage.lineage_path(out, 1))
    assert not os.path.isdir(lineage.partition_dir(out, 1))
    # survivors intact; resume no longer trusts partition 1
    assert lineage.completed_partitions(out) == set(range(n)) - {1}

    # the 404 arm: the id no longer exists anywhere
    assert cli.main(["delete", "--output", out, "--partition", "1"]) == 1
    audit = json.loads(capsys.readouterr().out)
    assert audit["not_found"] == [1] and audit["removed"] == []

    # restore the shared fixture: resume-reprocess the deleted partition
    from docling_pdf_ray.pipelines.extract import run_partitioned

    run_partitioned(shards, out, CFG, resume=True)
    assert lineage.completed_partitions(out) == set(range(n))


def test_resume_skips_completed_partitions(ray_session, fixture_pages_dir, tmp_path):
    from docling_pdf_ray.pipelines.extract import read_extracted, run_partitioned
    from docling_pdf_ray.state import lineage

    out = str(tmp_path / "resume_out")
    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))

    # simulate a killed job: only the first two partitions completed
    s1 = run_partitioned(shards[:2], out, CFG)
    assert s1["partitions_processed"] == 2

    # full re-run resumes: 0 and 1 skipped, 2 and 3 processed
    s2 = run_partitioned(shards, out, CFG, resume=True)
    assert s2["partitions_skipped"] == 2
    assert s2["partitions_processed"] == 2

    # output identical to a clean run
    from docling_pdf_ray.pipelines.extract import extracted_files

    clean = str(tmp_path / "clean_out")
    run_partitioned(shards, clean, CFG)
    a = pa.concat_tables(pq.read_table(f) for f in extracted_files(out)).sort_by("url")
    b = pa.concat_tables(pq.read_table(f) for f in extracted_files(clean)).sort_by("url")
    assert a.column("url").equals(b.column("url"))
    assert a.column("full_text").equals(b.column("full_text"))

    # a third run is a no-op
    s3 = run_partitioned(shards, out, CFG, resume=True)
    assert s3["partitions_processed"] == 0
    assert lineage.rollup_counters(out) == lineage.rollup_counters(clean) | {
        "wall_s_total": lineage.rollup_counters(out)["wall_s_total"]}


def test_point_lookup(extracted_run):
    from docling_pdf_ray.pipelines.extract import lookup_url

    out, shards, _ = extracted_run
    some_url = pq.read_table(shards[0], columns=["url"]).column("url")[0].as_py()
    t = lookup_url(out, some_url)
    assert t.num_rows >= 1
    assert t.column("url")[0].as_py() == some_url


def test_dedup_broadcast(ray_session, fixture_pages_dir, tmp_path):
    from docling_pdf_ray.pipelines.extract import (extracted_files,
                                                   find_duplicate_urls,
                                                   run_partitioned)

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))
    dups = find_duplicate_urls(shards)
    assert dups, "fixture should contain dup_url rows"

    out = str(tmp_path / "dedup_out")
    run_partitioned(shards, out, CFG.with_(dedup_urls=True))
    t = pa.concat_tables(
        pq.read_table(f, columns=["url"]) for f in extracted_files(out)).to_pandas()
    assert t["url"].is_unique
    # winner = latest crawl: for each dup url the kept warc_ts is the max —
    # verified against the raw input
    raw = pq.read_table(shards, columns=["url", "warc_ts"]).to_pandas()
    for url, max_ts in list(dups.items())[:5]:
        # dup map is µs (timestamp[us] → int64); pandas .value is ns
        assert raw[raw.url == url].warc_ts.max().value == max_ts * 1000


def test_stage1_meta_columns(ray_session, fixture_pages_dir):
    from docling_pdf_ray.pipelines.extract import extract_dataset

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))
    ds = extract_dataset(shards[:1], CFG, keep_meta=True)
    t = pa.concat_tables(b for b in ds.iter_batches(batch_format="pyarrow"))
    assert "content_kind" in t.column_names and "payload_bytes" in t.column_names
    kinds = set(pc.unique(t.column("content_kind")).to_pylist())
    assert kinds <= {"pdf", "html", "other"}
    assert pc.min(t.column("payload_bytes")).as_py() >= 0


def test_tasks_mode_byte_identical_to_actor_mode(ray_session, fixture_pages_dir):
    """cfg.execution_mode='tasks' (warm worker-global converter) must
    produce exactly the same rows as the actor-pool structure."""
    import ray.data as rd

    from docling_pdf_ray.pipelines.extract import build_extract_ds

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))
    pages = lambda: rd.read_parquet(shards, columns=["url", "warc_ts", "html"])  # noqa: E731
    a = build_extract_ds(pages(), CFG)
    b = build_extract_ds(pages(), CFG.with_(execution_mode="tasks"))
    # fixture contains dup_url rows → break sort ties on content too
    key = [("url", "ascending"), ("full_text", "ascending")]
    ta = pa.concat_tables(a.iter_batches(batch_format="pyarrow")) \
        .sort_by(key).combine_chunks()
    tb = pa.concat_tables(b.iter_batches(batch_format="pyarrow")) \
        .sort_by(key).combine_chunks()
    assert ta.column("url").equals(tb.column("url"))
    assert ta.column("full_text").equals(tb.column("full_text"))
    for name in EXTRACTED_SCHEMA.names:
        assert ta.column(name).equals(tb.column(name)), name


def test_resume_detects_changed_input_set(ray_session, fixture_pages_dir, tmp_path):
    """Review finding: adding a shard re-maps partition ids; resume
    must reprocess re-mapped ids, never skip a never-seen shard."""
    from docling_pdf_ray.pipelines.extract import run_partitioned
    from docling_pdf_ray.state import lineage

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))
    out = str(tmp_path / "remap_out")
    # first run over shards[1:3] only (they get pids 0,1)
    run_partitioned(shards[1:3], out, CFG)
    assert lineage.completed_partitions(out, sorted(shards[1:3])) == {0, 1}

    # now the full set: shards[0] becomes pid0 — the old pid0 sidecar
    # (recorded for shards[1]) must NOT let it be skipped
    s = run_partitioned(shards, out, CFG, resume=True)
    assert s["partitions_processed"] == len(shards)  # all re-mapped ids rerun
    n_in = sum(pq.read_metadata(x).num_rows for x in shards)
    assert s["n_ok"] + s["n_failed"] == n_in


def test_tasks_mode_worker_cache_keyed_by_cfg(ray_session, fixture_pages_dir):
    """Review finding: two tasks-mode runs with different configs in
    one session must not share a stale converter."""
    import ray.data as rd

    from docling_pdf_ray.pipelines.extract import build_extract_ds

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))[:1]
    pages = lambda: rd.read_parquet(shards, columns=["url", "warc_ts", "html"])  # noqa: E731
    c1 = CFG.with_(execution_mode="tasks")
    c2 = CFG.with_(execution_mode="tasks", lines_per_page=10)
    t1 = pa.concat_tables(build_extract_ds(pages(), c1)
                          .iter_batches(batch_format="pyarrow"))
    t2 = pa.concat_tables(build_extract_ds(pages(), c2)
                          .iter_batches(batch_format="pyarrow"))
    # same workers, different config: pagination must differ for pdf rows
    import pyarrow.compute as _pc

    pdf1 = t1.filter(_pc.equal(t1.column("extraction_method"), "pdf_parse"))
    pdf2 = t2.filter(_pc.equal(t2.column("extraction_method"), "pdf_parse"))
    assert pdf1.num_rows and pdf2.num_rows
    tp1 = dict(zip(pdf1.column("url").to_pylist(), pdf1.column("total_pages").to_pylist()))
    tp2 = dict(zip(pdf2.column("url").to_pylist(), pdf2.column("total_pages").to_pylist()))
    assert any(tp2[u] > tp1[u] for u in tp1), "lines_per_page=10 must repaginate"


def test_lineage_mixed_schema_and_conservative_resume(tmp_path):
    """Second-review findings: pre-'shard'-column sidecars must read
    (no ArrowInvalid) and must NOT satisfy the shard-identity check."""
    import pyarrow as pa

    from docling_pdf_ray.state import lineage

    d = str(tmp_path)
    os.makedirs(os.path.join(d, "_lineage"))
    old = pa.Table.from_pydict({
        "partition_id": pa.array([0], pa.int32()), "status": ["done"],
        "n_ok": [5], "n_failed": [0], "first_url": ["a"],
        "last_url": ["z"], "wall_s": [1.0]})
    pq.write_table(old, os.path.join(d, "_lineage", "part-00000.parquet"))
    lineage.write_lineage(d, 1, "done", 3, 1, "a", "z", 2.0, shard="s1.parquet")

    t = lineage.read_lineage(d)
    assert t.num_rows == 2 and "shard" in t.column_names
    assert lineage.rollup_counters(d)["n_ok"] == 8

    os.makedirs(os.path.join(d, "partition_id=0"))
    os.makedirs(os.path.join(d, "partition_id=1"))
    # no shard list: both count (back-compat)
    assert lineage.completed_partitions(d) == {0, 1}
    # with a shard list: the unknown-identity old sidecar is NOT trusted
    assert lineage.completed_partitions(d, ["NEW.parquet", "s1.parquet"]) == {1}
    # restricted rollup excludes out-of-range pids
    assert lineage.rollup_counters_for(d, {1})["n_ok"] == 3


def test_output_identical_across_partitioning_levels(ray_session,
                                                     fixture_pages_dir):
    """SURVEY §5.2 item 5 stated directly: the same corpus through
    DIFFERENT physical parallelism (block counts and batch sizes — the
    intra-session parallelism knobs) yields byte-identical sorted
    output. (The oracle gate implies this transitively; this pins it
    without the oracle in the loop.)"""
    import ray.data as rd

    from docling_pdf_ray.pipelines.extract import build_extract_ds

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))

    def run(n_blocks, batch_size):
        ds = rd.read_parquet(shards, columns=["url", "warc_ts", "html"],
                             override_num_blocks=n_blocks)
        out = build_extract_ds(ds, CFG.with_(sniff_batch_size=batch_size,
                                             pdf_batch_size=batch_size))
        return pa.concat_tables(out.iter_batches(batch_format="pyarrow")) \
            .select(EXTRACTED_SCHEMA.names).sort_by(SORT_KEY).combine_chunks()

    a = run(1, 64)
    b = run(7, 16)
    assert a.num_rows == b.num_rows
    for name in EXTRACTED_SCHEMA.names:
        assert a.column(name).equals(b.column(name)), f"column {name} differs"
