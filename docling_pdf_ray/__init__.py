"""docling_pdf_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild (NOT a port) of the capabilities of
``andreantama/docling-pdf`` (reference at /root/reference, cited by
file:line throughout) re-expressed as streaming ``ray.data.Dataset``
pipelines over Parquet tables of Common-Crawl-style web pages:

    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)

Layout:
  payload.py   — the deterministic synthetic "SPDF" payload format this
                 sandbox uses in place of real PDFs (no pdf libs here)
  oracle.py    — single-threaded pure-Python reference semantics
                 (the byte-identity target; SURVEY.md §2.2 M1–M16)
  htmlx.py     — DOM-heuristic HTML boilerplate stripping (M17)
  schema.py    — Arrow schemas for input/extracted/lineage tables
  stages/      — map_batches stages (sniff+html tasks, PDF actor pool)
  pipelines/   — pipeline composition, partitioned resumable runner
  state/       — per-partition lineage sidecar (replaces Redis task store)
  sources/     — deterministic fixture generation, pages synthesis
  functions/   — text analysis, dedup (exact/minhash/simhash/embedding),
                 similarity search, multimodal stubs
"""

__version__ = "0.1.0"
