"""Stage 1 — sniff + ingress predicates + HTML branch (stateless tasks).

The north-star's "first map_batches stage sniffs content type and
strips HTML boilerplate". One pass, zero-copy Arrow in/out:

* adds ``content_kind`` (M3 router; reference main.py:117) and
  ``payload_bytes`` (vectorized ``pc.binary_length``, M2);
* completes every non-PDF row right here (HTML extraction M17,
  too-large / not-a-document rejection rows M1/M2);
* PDF rows pass through with the payload intact in ``_pdf_payload``
  for the actor-pool stage (stage 2) — the binary column stays an
  Arrow buffer end-to-end, no temp files (the reference's temp-file
  hop at pdf_extractor.py:107-109 is eliminated).

Output = EXTRACTED_SCHEMA columns + ``content_kind`` + ``payload_bytes``
+ ``_pdf_payload`` (null except for rows stage 2 must process).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .. import oracle
from ..config import PipelineConfig
from ..schema import EXTRACTED_SCHEMA


def _null_row() -> dict:
    return {name: None for name in EXTRACTED_SCHEMA.names}


def sniff_and_extract_html(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    payloads = batch.column("html")
    urls = batch.column("url").to_pylist()
    sizes = pc.fill_null(pc.binary_length(payloads), 0)

    py_payloads = payloads.to_pylist()
    kinds: list[str] = []
    results: list[dict] = []
    pdf_pass: list[bytes | None] = []
    for url, data, size in zip(urls, py_payloads, sizes.to_pylist()):
        if data is not None and size > cfg.max_payload_bytes:
            # M2 — rejected, never dropped (reference returns HTTP 413,
            # main.py:110-114)
            kinds.append(oracle.sniff_kind(data))
            results.append(oracle.extract_row(url, data, cfg))
            pdf_pass.append(None)
            continue
        kind = oracle.sniff_kind(data)
        kinds.append(kind)
        if kind == oracle.KIND_PDF:
            r = _null_row()
            r["url"] = url
            results.append(r)
            pdf_pass.append(data)
        elif kind == oracle.KIND_HTML:
            results.append(oracle.extract_html(url, data, cfg))
            pdf_pass.append(None)
        else:
            results.append(oracle.extract_row(url, data, cfg))
            pdf_pass.append(None)

    from ..schema import result_to_arrow

    out = result_to_arrow(results)
    out = out.append_column("content_kind", pa.array(kinds, pa.string()))
    out = out.append_column("payload_bytes", sizes.cast(pa.int64()))
    out = out.append_column("_pdf_payload", pa.array(pdf_pass, pa.binary()))
    return out


class SniffHtmlStage:
    """Callable wrapper so the stage can also run as an actor pool when
    the caller wants warm state; the default pipeline uses the plain
    function (stateless tasks are cheaper and this stage holds no
    model state)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return sniff_and_extract_html(batch, self.cfg)
