"""Size-bucket skew split (SURVEY §4.3) and the composed training-prep
pipeline."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc

from docling_pdf_ray.config import DEFAULT_CONFIG
from docling_pdf_ray.sources.fixtures import TEST_MAX_BYTES

CFG = DEFAULT_CONFIG.with_(max_payload_bytes=TEST_MAX_BYTES,
                           pdf_pool_min=1, pdf_pool_max=2)


def test_split_by_size_partitions_completely(ray_session, fixture_pages_dir):
    import ray.data as rd

    from docling_pdf_ray.pipelines.extract import split_by_size
    from docling_pdf_ray.stages.sniff import sniff_and_extract_html

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))
    cfg = CFG.with_(big_payload_bytes=20_000)
    sniffed = rd.read_parquet(shards, columns=["url", "warc_ts", "html"]) \
        .map_batches(lambda b: sniff_and_extract_html(b, cfg),
                     batch_format="pyarrow")
    small, big = split_by_size(sniffed, cfg)
    small_t = pa.concat_tables(small.iter_batches(batch_format="pyarrow"))
    big_t = pa.concat_tables(big.iter_batches(batch_format="pyarrow"))

    import pyarrow.parquet as pq

    n_in = sum(pq.read_metadata(s).num_rows for s in shards)
    # complete, disjoint partition of the row set
    assert small_t.num_rows + big_t.num_rows == n_in
    assert set(small_t.column("url").to_pylist()).isdisjoint(
        big_t.column("url").to_pylist())
    assert pc.max(small_t.column("payload_bytes")).as_py() < 20_000
    assert pc.min(big_t.column("payload_bytes")).as_py() >= 20_000
    assert big_t.num_rows > 0, "fixture should contain big payloads"


def test_training_prep_pipeline(ray_session, fixture_pages_dir):
    import ray.data as rd

    from docling_pdf_ray.pipelines.prep import build_training_prep

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))
    pages = rd.read_parquet(shards, columns=["url", "warc_ts", "html"])
    out = build_training_prep(pages, CFG)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow"))
    assert t.num_rows > 0
    # deduped on content hash
    hashes = t.column("text_hash").to_pylist()
    assert len(hashes) == len(set(hashes))
    # quality gate: all survivors meet the floors
    assert pc.min(t.column("n_chars")).as_py() >= 80
    assert pc.min(t.column("alpha_ratio")).as_py() >= 0.5
    langs = set(t.column("pred_lang").to_pylist())
    assert langs <= {"en", "fr", "es", "de", "zh", "unknown"}


def test_training_prep_summary_deterministic(ray_session):
    from docling_pdf_ray.pipelines.prep import training_prep_summary

    a = training_prep_summary("/root/testdata/sf0.001")
    b = training_prep_summary("/root/testdata/sf0.001")
    assert a.equals(b)
    assert (a["n_docs"] > 0).any()


def test_bucketed_pipeline_identical_to_linear(ray_session, fixture_pages_dir):
    """The size-bucketed variant (§4.3) must produce exactly the same
    row set as the linear pipeline."""
    import pyarrow.parquet as pq

    from docling_pdf_ray.pipelines.extract import (extract_dataset,
                                                   extract_dataset_bucketed)

    shards = sorted(glob.glob(os.path.join(fixture_pages_dir, "*.parquet")))
    cfg = CFG.with_(big_payload_bytes=20_000)
    key = [("url", "ascending"), ("full_text", "ascending"),
           ("error", "ascending")]
    a = pa.concat_tables(extract_dataset(shards, cfg)
                         .iter_batches(batch_format="pyarrow")) \
        .sort_by(key).combine_chunks()
    b = pa.concat_tables(extract_dataset_bucketed(shards, cfg)
                         .iter_batches(batch_format="pyarrow")) \
        .sort_by(key).combine_chunks()
    assert a.num_rows == b.num_rows
    for name in a.column_names:
        assert a.column(name).equals(b.column(name)), name


def test_large_payload_flows_through(ray_session, tmp_path):
    """Memory-awareness smoke: a multi-MB payload rides the pipeline
    (its own small batch in the bucketed path) and extracts fully."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from docling_pdf_ray.payload import build
    from docling_pdf_ray.pipelines.extract import extract_dataset_bucketed
    from docling_pdf_ray.schema import PAGES_SCHEMA
    import datetime as dt

    # ~6 MB synthetic PDF: 400 pages x 30 lines
    line = "word " * 50
    big = build([(612.0, 792.0, [line] * 30) for _ in range(800)])
    assert len(big) > 5_000_000, len(big)
    small = build([(612.0, 792.0, ["tiny page"])])
    t = pa.Table.from_arrays([
        pa.array(["https://x/big", "https://x/small"], pa.string()),
        pa.array([dt.datetime(2024, 1, 1)] * 2, pa.timestamp("us")),
        pa.array([big, small], pa.binary()),
        pa.array([None, None], pa.string()),
        pa.array(["en", "en"], pa.string()),
    ], schema=PAGES_SCHEMA)
    p = str(tmp_path / "big.parquet")
    pq.write_table(t, p)
    out = pa.concat_tables(
        extract_dataset_bucketed([p], CFG.with_(big_payload_bytes=1_000_000,
                                                max_payload_bytes=50 * 1024 * 1024))
        .iter_batches(batch_format="pyarrow")).sort_by("url")
    assert out.num_rows == 2
    assert out.column("extraction_successful").to_pylist() == [True, True]
    big_row = out.filter(pc.equal(out.column("url"), "https://x/big"))
    assert big_row.column("character_count")[0].as_py() > 2_000_000
    assert big_row.column("total_pages")[0].as_py() > 200  # repaginated


def test_compact_parquet_preserves_rows_and_reduces_files(ray_session, tmp_path):
    """Compaction is content-preserving (row multiset identical) and
    actually reduces file count; the _SUCCESS marker guards reruns."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from docling_pdf_ray.pipelines.compact import compact_parquet

    src = tmp_path / "many"
    src.mkdir()
    rng = np.random.RandomState(4)
    for i in range(40):                      # 40 tiny shards
        t = pa.table({"k": pa.array(rng.randint(0, 1000, 50), pa.int64()),
                      "s": pa.array([f"r{i}-{j}" for j in range(50)],
                                    pa.string())})
        pq.write_table(t, src / f"part-{i:03d}.parquet")

    out = tmp_path / "compacted"
    audit = compact_parquet(str(src), str(out), target_rows_per_file=500)
    assert audit["in_files"] == 40 and audit["in_rows"] == 2000
    assert audit["out_files"] <= 5          # ~2000/500 + block rounding

    def multiset(d):
        fs = sorted(str(p) for p in d.glob("*.parquet"))
        df = pd.concat([pq.read_table(f).to_pandas() for f in fs])
        return df.sort_values(["k", "s"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(multiset(src), multiset(out))

    with pytest.raises(FileExistsError):    # completed output guarded
        compact_parquet(str(src), str(out))


def test_compact_refuses_stale_partial_output(ray_session, tmp_path):
    """A crashed run's partial tree (no _SUCCESS) must be refused, not
    merged — Ray's write_parquet appends into existing dirs."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from docling_pdf_ray.pipelines.compact import compact_parquet

    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64())}),
                   src / "a.parquet")
    out = tmp_path / "out"
    out.mkdir()
    pq.write_table(pa.table({"k": pa.array([9], pa.int64())}),
                   out / "stale-partial.parquet")   # no _SUCCESS
    with pytest.raises(FileExistsError):
        compact_parquet(str(src), str(out))
    # an EMPTY pre-existing dir is fine (two-phase rename replaces it)
    out2 = tmp_path / "out2"
    out2.mkdir()
    audit = compact_parquet(str(src), str(out2))
    assert audit["out_rows"] == 2 and (out2 / "_SUCCESS").exists()
