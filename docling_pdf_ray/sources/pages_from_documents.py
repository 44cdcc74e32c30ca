"""Synthesize a Common-Crawl-style `pages` table from the driver's
`documents` table (/root/testdata/sf*/documents.parquet — TESTDATA.md).

Deterministic with NO random state: every choice is a pure function of
``doc_id``, so the same sf dir always yields the same bytes — the
flagship pipeline, the DuckDB conformance checks and the benchmark all
run over identical input regardless of process or parallelism.

Payload class by ``doc_id % 10``:
    0-5 → html   (document text wrapped in boilerplate-laden HTML)
    6-8 → pdf    (SPDF payload, text split into 40-line pages)
    9   → stress (doc_id%100==99 → corrupt pdf; %100==19 → not-a-doc;
                  else bad-dimension pdf — exercises the error ladder)
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..functions.dedup import split_ws
from ..payload import build
from ..schema import PAGES_SCHEMA

EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in µs

N_HOSTS = 64        # synthetic host space: page url host = h{doc_id % 64}
LINKS_PER_DOC = 3   # absolute out-links embedded per html page (r4)


def _wrap_html(doc_id: int, text: str) -> bytes:
    esc = _html.escape(text)
    # paragraphs of ~40 words, deterministic. ASCII-ws split (split_ws)
    # so the chunk boundaries are expressible in the RE2/DuckDB mirrors
    # (str.split is Unicode-ws; identical on this ASCII corpus, and the
    # explicit class makes the equivalence structural, not coincidental)
    words = split_ws(esc)
    paras = [" ".join(words[i:i + 40]) for i in range(0, len(words), 40)] or [""]
    body = "\n".join(f"<p>{p}</p>" for p in paras)
    nav = "".join(f'<a href="/s{i}">sec {i}</a> ' for i in range(6))
    # deterministic cross-host references: the REAL link evidence the
    # extractor's collect_links harvests (absolute hrefs in the main
    # content). The block itself is boilerplate-shaped (pure links,
    # 17 chars) so the keep rules drop it from full_text — link
    # evidence and text evidence stay independent signals.
    refs = " ".join(
        f'<a href="https://h{(doc_id * 7 + 13 * k + 1) % N_HOSTS}.example'
        f'/ref/{doc_id}-{k}">ref {k}</a>' for k in range(LINKS_PER_DOC))
    return (f"<!DOCTYPE html><html><head><title>doc {doc_id}</title>"
            f"<style>body{{margin:0}}</style></head><body>"
            f"<nav>{nav}</nav><article><h1>Document {doc_id}</h1>{body}"
            f'<p class="refs">{refs}</p></article>'
            f"<footer><p>footer {nav}</p></footer></body></html>").encode()


def _wrap_pdf(doc_id: int, text: str) -> bytes:
    words = text.split()
    lines = [" ".join(words[i:i + 12]) for i in range(0, len(words), 12)] or [""]
    pages = [(612.0, 792.0, lines[i:i + 40]) for i in range(0, len(lines), 40)]
    if not pages:
        pages = [(612.0, 792.0, [""])]
    return build(pages, meta={"producer": "FPDF" if doc_id % 3 == 0 else "Synth"})


def _payload(doc_id: int, text: str) -> bytes:
    m = doc_id % 10
    if m <= 5:
        return _wrap_html(doc_id, text)
    if m <= 8:
        return _wrap_pdf(doc_id, text)
    h = doc_id % 100
    if h == 99:
        return b"%PDF-1.4\ngarbage " + text[:40].encode("utf-8", "ignore") + b"\n"
    if h == 19:
        # leading non-doc magic so the sniff can never read it as html/pdf
        return b"\x89BIN" + text[:200].encode("utf-8", "ignore")
    bad = build([(0.0, 0.0, [text[:80]])])
    return bad


def pages_batch_from_documents(batch: pa.Table) -> pa.Table:
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    langs = batch.column("lang").to_pylist()
    srcs = batch.column("source").to_pylist()
    # host varies with doc_id (a crawl spans many hosts — degenerate
    # single-host urls would make every host-level operator trivial)
    urls = [f"https://h{i % N_HOSTS}.example/{s}/{i}" for s, i in zip(srcs, ids)]
    tss = np.asarray(ids, dtype=np.int64) * 1_000_000 + EPOCH_US
    payloads = [_payload(i, t or "") for i, t in zip(ids, texts)]
    return pa.Table.from_arrays([
        pa.array(urls, pa.string()),
        pa.array(tss).cast(pa.timestamp("us")),
        pa.array(payloads, pa.binary()),
        pa.array(texts, pa.string()),
        pa.array(langs, pa.string()),
    ], schema=PAGES_SCHEMA)


def pages_dataset(sf_dir: str) -> "rd.Dataset":
    """documents.parquet → pages Dataset, synthesized in-stream (no
    intermediate materialization)."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text", "lang", "source"])
    return docs.map_batches(pages_batch_from_documents, batch_format="pyarrow")


def write_pages_parquet(sf_dir: str, out_dir: str, n_files: int = 8) -> list[str]:
    """Materialize the synthesized pages table to parquet shards (used
    by the benchmark and the partitioned-runner demos so reads are
    measured from columnar storage like production)."""
    import glob
    import os

    os.makedirs(out_dir, exist_ok=True)
    existing = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    if existing:
        return existing
    ds = pages_dataset(sf_dir).repartition(n_files)
    ds.write_parquet(out_dir)
    return sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
