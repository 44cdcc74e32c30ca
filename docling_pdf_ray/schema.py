"""Arrow schemas for the engine's three logical tables (SURVEY.md §1.2).

The reference's dynamic dict shapes (three result variants at
pdf_extractor.py:265-277, :295-307, :334-345 plus the failure record at
:359-364) are unified into ONE nullable Arrow schema: failure rows carry
nulls in the data columns and a non-null ``error`` — never dropped rows
(row count in == row count out).
"""

from __future__ import annotations

import pyarrow as pa

# input (authoritative shape: BASELINE.json input_hint)
PAGES_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("warc_ts", pa.timestamp("us")),
    pa.field("html", pa.binary()),
    pa.field("text", pa.string()),
    pa.field("lang", pa.string()),
])

PAGE_STRUCT = pa.struct([
    pa.field("page_number", pa.int32()),
    pa.field("content", pa.large_string()),
    pa.field("line_count", pa.int32()),
    # fallback-only per-page counters (pdf_extractor.py:531-532);
    # null on the happy/HTML paths, which never compute them
    pa.field("word_count", pa.int64()),
    pa.field("character_count", pa.int64()),
])
SPAN_STRUCT = pa.struct([
    pa.field("start", pa.int64()),
    pa.field("end", pa.int64()),
    pa.field("kind", pa.string()),
])
TABLE_STRUCT = pa.struct([
    pa.field("content", pa.large_string()),
    pa.field("page", pa.int32()),
])
IMAGE_STRUCT = pa.struct([
    pa.field("description", pa.string()),
    pa.field("page", pa.int32()),
    # fallback-only per-page image ordinal (pdf_extractor.py:519-524);
    # null on the happy path (docling elements carry no index)
    pa.field("image_index", pa.int32()),
])

EXTRACTED_SCHEMA = pa.schema([
    pa.field("url", pa.string()),
    pa.field("extraction_successful", pa.bool_()),      # pdf_extractor.py:336/361
    pa.field("extraction_method", pa.string()),         # 'html_heuristic'|'pdf_parse'|'fallback'|null
    pa.field("full_text", pa.large_string()),           # byte-identity target
    pa.field("pages", pa.list_(PAGE_STRUCT)),           # pdf_extractor.py:428-442
    pa.field("spans", pa.list_(SPAN_STRUCT)),           # north-star span offsets
    pa.field("tables", pa.list_(TABLE_STRUCT)),         # pdf_extractor.py:395-401
    pa.field("images", pa.list_(IMAGE_STRUCT)),         # pdf_extractor.py:404-410
    # absolute out-links from NON-boilerplate subtrees (HTML branch
    # only; [] on the PDF paths, null on failure rows) — the anchor
    # spans the north-star's link/graph consumers read (htmlx.py
    # collect_links; feeds the host_links edge table + link_pagerank)
    pa.field("links", pa.list_(pa.string())),
    pa.field("word_count", pa.int64()),                 # pdf_extractor.py:456
    pa.field("character_count", pa.int64()),            # pdf_extractor.py:457
    pa.field("total_pages", pa.int32()),                # pdf_extractor.py:340
    pa.field("has_tables", pa.bool_()),                 # pdf_extractor.py:342
    pa.field("has_images", pa.bool_()),                 # pdf_extractor.py:343
    pa.field("error", pa.string()),                     # pdf_extractor.py:362
    pa.field("warning", pa.string()),                   # pdf_extractor.py:276/306
])

# per-partition lineage sidecar (replaces Redis task records,
# redis_manager.py:51-68; FIXTURES.md §3)
LINEAGE_SCHEMA = pa.schema([
    pa.field("partition_id", pa.int32()),
    pa.field("shard", pa.string()),       # input shard basename — resume
                                          # identity (an index alone would
                                          # mis-map when the input set changes)
    pa.field("status", pa.string()),
    pa.field("n_ok", pa.int64()),
    pa.field("n_failed", pa.int64()),
    pa.field("first_url", pa.string()),
    pa.field("last_url", pa.string()),
    pa.field("wall_s", pa.float64()),
])


def result_to_arrow(results: list[dict]) -> pa.Table:
    """Build an EXTRACTED_SCHEMA table from oracle result dicts."""
    cols = {name: [] for name in EXTRACTED_SCHEMA.names}
    for r in results:
        for name in EXTRACTED_SCHEMA.names:
            cols[name].append(r.get(name))
    arrays = [pa.array(cols[f.name], type=f.type) for f in EXTRACTED_SCHEMA]
    return pa.Table.from_arrays(arrays, schema=EXTRACTED_SCHEMA)
