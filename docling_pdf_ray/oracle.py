"""Reference transform semantics, re-specified as pure functions.

This module is the byte-identity ground truth (SURVEY.md §5.2): it
implements, single-threaded and dependency-free, exactly the routing /
normalize / parse / fallback / paginate / count semantics of the
reference (``/root/reference``, cited by file:line below) over the SPDF
synthetic payload format (:mod:`docling_pdf_ray.payload`) and HTML
payloads (:mod:`docling_pdf_ray.htmlx`). The Ray pipeline stages call
THESE SAME functions per batch, so pipeline-vs-oracle equality checks
the Arrow round-trip, ordering, dedup and partitioning — not two
divergent implementations.

Flattening notes (dict → Arrow, SURVEY.md §1.2):

* ``extraction_method`` values: ``html_heuristic`` (M17 branch, no
  reference analog), ``pdf_parse`` (reference ``"docling"``,
  pdf_extractor.py:337), ``fallback`` (reference
  ``"fallback_pymupdf"``, pdf_extractor.py:268/298).
* ``total_pages`` is ``len(result pages)`` — for the happy path that is
  the RE-PAGINATED page count, not the physical page count, preserving
  the reference's quirk at pdf_extractor.py:340.
* fallback ``word_count``/``character_count`` are computed on the
  UN-stripped accumulated text while ``full_text`` is stripped —
  pdf_extractor.py:556-561, preserved.
* the reference's nested ``parsing_error`` / ``extraction_error`` keys
  (pdf_extractor.py:470,575) have no column of their own; they are
  folded into ``warning``.
* the reference's retry-on-"conversionstatus.success" arm
  (pdf_extractor.py:204-213) is omitted: in the reference, even a
  successful retry falls through to the :216 if/else and its result is
  discarded — the arm has no observable effect on output.
"""

from __future__ import annotations

from typing import Any

from . import payload as spdf
from .config import DEFAULT_CONFIG, PipelineConfig
from .htmlx import extract_main_content
from .payload import (
    IMAGE_PREFIX,
    PAGE_PREFIX,
    TABLE_PREFIX,
    SpdfCorruptError,
    SpdfDimensionError,
    SpdfDoc,
    SpdfError,
)

METHOD_HTML = "html_heuristic"
METHOD_PDF = "pdf_parse"
METHOD_FALLBACK = "fallback"

KIND_PDF = "pdf"
KIND_HTML = "html"
KIND_OTHER = "other"


# ---------------------------------------------------------------- M1–M3

def sniff_kind(data: bytes | None) -> str:
    """Content sniff (reference magic check main.py:117 generalized:
    crawl payloads carry no filename, so the extension predicate
    main.py:102 is subsumed by sniffing)."""
    if not data:
        return KIND_OTHER
    if data.startswith(spdf.PDF_MAGIC):
        return KIND_PDF
    head = data[:256].lstrip()
    if head[:1] == b"<":
        return KIND_HTML
    if b"<html" in data[:256].lower() or b"<!doctype" in data[:256].lower():
        return KIND_HTML
    return KIND_OTHER


# ---------------------------------------------------------------- M4

def fix_pdf(data: bytes) -> bytes:
    """Analog of reference ``fix_pdf`` (pdf_extractor.py:73-82):
    normalize every page box (set cropbox=mediabox → canonical header
    serialization), line-preserving otherwise. Raises
    :class:`SpdfCorruptError` on undecodable bytes — exactly where
    ``fitz.open`` on binary garbage raises, sending the row to the
    outer failure record (pdf_extractor.py:357-369)."""
    lines = spdf._decode(data)
    out = []
    for line in lines:
        if line.startswith(PAGE_PREFIX):
            parts = line[len(PAGE_PREFIX):].split()
            if len(parts) == 2:
                try:
                    w, h = float(parts[0]), float(parts[1])
                    out.append(f"{PAGE_PREFIX}{w!r} {h!r}")
                    continue
                except ValueError:
                    pass
        out.append(line)
    return ("\n".join(out) + "\n").encode("utf-8")


# ---------------------------------------------------------------- M5

def validate_payload(data: bytes) -> dict[str, Any]:
    """Analog of ``_validate_pdf_file`` (pdf_extractor.py:578-640):
    lenient open, page count, encryption flag, per-page positive-box
    count."""
    try:
        doc = spdf.parse_lenient(data, skip_bad_pages=True)
        pages_ok = sum(1 for p in doc.pages if p.width > 0 and p.height > 0)
        return {
            "is_valid": True,
            "page_count": doc.page_count,
            "is_encrypted": doc.meta.get("encrypted") == "1",
            "needs_password": doc.meta.get("encrypted") == "1",
            "metadata": dict(doc.meta),
            "pages_with_valid_dimensions": pages_ok,
            "has_page_dimensions": pages_ok > 0,
        }
    except Exception as e:  # pdf_extractor.py:630-640
        return {
            "is_valid": False,
            "error": str(e),
            "page_count": 0,
            "is_encrypted": False,
            "needs_password": False,
            "metadata": {},
            "has_page_dimensions": False,
            "pages_with_valid_dimensions": 0,
        }


# ---------------------------------------------------------------- M15

def fix_page_dimensions(data: bytes) -> bytes:
    """Analog of ``_fix_pdf_page_dimensions`` (pdf_extractor.py:642-692):
    rebuild the document page-by-page; non-positive boxes get A4
    (595×842 pt, pdf_extractor.py:671). Structural flags (terminator)
    are preserved — this is a page-box repair, not a structure repair."""
    doc = spdf.parse_lenient(data, skip_bad_pages=True)
    for p in doc.pages:
        if p.width <= 0 or p.height <= 0:
            p.width, p.height = spdf.A4_WIDTH, spdf.A4_HEIGHT
    return spdf.serialize(doc)


# ---------------------------------------------------------------- M7/M8 cascade

def _parse_tolerant(data: bytes) -> SpdfDoc:
    """The ``dlparse_v2`` analog backend: tolerates a missing
    terminator but still demands pages, well-formed headers and
    positive boxes."""
    doc = spdf.parse_lenient(data, skip_bad_pages=False)
    if doc.page_count == 0:
        raise SpdfCorruptError("corrupt document structure: no pages found")
    bad = [i for i, p in enumerate(doc.pages) if p.width <= 0 or p.height <= 0]
    if bad:
        raise SpdfDimensionError(
            f"Stage preprocess failed: page-dimensions invalid for pages {bad}"
        )
    return doc


BACKENDS: list[tuple[str, Any]] = [
    # (name, parser) — ordered cascade, reference pdf_extractor.py:702-706
    ("pypdfium2", spdf.parse_strict),
    ("dlparse_v1", spdf.parse_strict),
    ("dlparse_v2", _parse_tolerant),
]


def try_different_backends(data: bytes) -> tuple[SpdfDoc, str]:
    """Analog of ``_try_different_backends`` (pdf_extractor.py:694-739)."""
    for name, parser in BACKENDS:
        try:
            return parser(data), name
        except Exception:
            continue
    raise SpdfCorruptError("All PDF backends failed to process this file")  # :739


# ---------------------------------------------------------------- M9–M13

def _doc_elements(doc: SpdfDoc) -> list[tuple[str, str, int, str]]:
    """(label, markdown, page_number, payload_text) per element in
    reading order; blank lines are skipped (docling emits no empty
    elements)."""
    elements: list[tuple[str, str, int, str]] = []
    for pnum, page in enumerate(doc.pages, start=1):
        for line in page.lines:
            if not line.strip():
                continue
            if line.startswith(TABLE_PREFIX):
                content = line[len(TABLE_PREFIX):]
                elements.append(("table", f"| {content} |", pnum, content))
            elif line.startswith(IMAGE_PREFIX):
                content = line[len(IMAGE_PREFIX):]
                elements.append(("picture", "<!-- image -->", pnum, content))
            else:
                elements.append(("text", line, pnum, line))
    return elements


def paginate(full_text: str, lines_per_page: int = 50) -> list[dict]:
    """M12 — exact re-implementation of pdf_extractor.py:413-442:
    split on '\\n', fixed 50-line chunks, 1-based numbering, remainder
    page. NOTE: even an empty string yields one page of one empty line
    (''.split('\\n') == [''])."""
    text_lines = full_text.split("\n")
    pages: list[dict] = []
    current_page = 1
    current: list[str] = []
    for line in text_lines:
        current.append(line)
        if len(current) >= lines_per_page:
            pages.append({"page_number": current_page,
                          "content": "\n".join(current),
                          "line_count": len(current)})
            current_page += 1
            current = []
    if current:
        pages.append({"page_number": current_page,
                      "content": "\n".join(current),
                      "line_count": len(current)})
    return pages


def parse_docling_result(doc: SpdfDoc, cfg: PipelineConfig) -> dict[str, Any]:
    """Analog of ``_parse_docling_result`` (pdf_extractor.py:371-471):
    markdown export (elements joined with '\\n\\n'), table/picture
    element filters, 50-line re-pagination, whitespace word count.
    Spans (north-star addition): one per element, offsets into
    ``full_text``, kind = element label."""
    try:
        elements = _doc_elements(doc)
        parts = [md for _, md, _, _ in elements]
        full_text = "\n\n".join(parts)

        spans = []
        pos = 0
        for i, (label, md, _, _) in enumerate(elements):
            if i:
                pos += 2
            spans.append({"start": pos, "end": pos + len(md), "kind": label})
            pos += len(md)

        tables = [{"content": txt, "page": pnum}
                  for label, _, pnum, txt in elements if "table" in label]
        images = [{"description": txt, "page": pnum}
                  for label, _, pnum, txt in elements if "picture" in label]
        pages = paginate(full_text, cfg.lines_per_page)
        return {
            "full_text": full_text,
            "pages": pages,
            "spans": spans,
            "tables": tables,
            "images": images,
            "word_count": len(full_text.split()),        # :456
            "character_count": len(full_text),           # :457
        }
    except Exception as e:  # M16 absorber, pdf_extractor.py:460-471
        return {
            "full_text": "Error parsing document content",
            "pages": [],
            "spans": [],
            "tables": [],
            "images": [],
            "word_count": 0,
            "character_count": 0,
            "parsing_error": str(e),
        }


# ---------------------------------------------------------------- M14

def fallback_extraction(data: bytes) -> dict[str, Any]:
    """Analog of ``_fallback_extraction`` (pdf_extractor.py:473-576):
    raw per-page text (every line verbatim, '\\n'-terminated, like
    ``page.get_text()``), accumulated with an extra '\\n' per page then
    stripped; image markers become {page, image_index, description};
    ``tables`` is always [] (:558). The malformed-page-header hard
    failure returns the sentinel dict (:566-576) — it does NOT raise."""
    try:
        doc = spdf.parse_lenient(data, skip_bad_pages=False)
        pages = []
        full_text = ""
        images_info = []
        raw_spans = []                                  # page offsets, unstripped
        for page_num, page in enumerate(doc.pages):
            page_text = "\n".join(page.lines) + "\n"    # get_text() analog (:514)
            raw_spans.append((len(full_text), len(full_text) + len(page_text)))
            full_text += page_text + "\n"               # :515
            img_idx = 0
            for line in page.lines:
                if line.startswith(IMAGE_PREFIX):
                    images_info.append({
                        "page": page_num + 1,
                        "image_index": img_idx,
                        "description": f"Image {img_idx + 1} on page {page_num + 1}",  # :523
                    })
                    img_idx += 1
            pages.append({
                "page_number": page_num + 1,
                "content": page_text,
                "line_count": len(page_text.split("\n")),       # :530
                "word_count": len(page_text.split()),           # :531 (dropped in flattening)
                "character_count": len(page_text),              # :532 (dropped in flattening)
            })
        stripped = full_text.strip()
        # span offsets into the STRIPPED full_text (north-star span
        # requirement on the degraded path): shift by the leading strip,
        # clip to the stripped bounds, drop pages stripped away entirely
        lead = len(full_text) - len(full_text.lstrip())
        spans = []
        for s, e in raw_spans:
            s2, e2 = max(0, s - lead), min(len(stripped), e - lead)
            if e2 > s2:
                spans.append({"start": s2, "end": e2, "kind": "page"})
        return {
            "full_text": stripped,                      # :556
            "pages": pages,
            "spans": spans,
            "tables": [],                               # :558
            "images": images_info,
            "word_count": len(full_text.split()),       # :560 — UNstripped, preserved quirk
            "character_count": len(full_text),          # :561 — UNstripped, preserved quirk
        }
    except Exception as e:  # :566-576
        return {
            "full_text": "Fallback extraction failed",
            "pages": [],
            "tables": [],
            "images": [],
            "word_count": 0,
            "character_count": 0,
            "extraction_error": f"Fallback extraction failed: {str(e)}",
        }


# ---------------------------------------------------------------- result assembly

def _flatten(url: str, method: str | None, data: dict[str, Any],
             successful: bool, warning: str | None = None,
             error: str | None = None) -> dict[str, Any]:
    """Final-result assembly, analog of pdf_extractor.py:334-345 (and
    the fallback variants :265-277/:295-307); nested dict → flat
    Arrow-ready row."""
    extra = []
    if data.get("parsing_error"):
        extra.append(f"parsing_error: {data['parsing_error']}")
    if data.get("extraction_error"):
        extra.append(data["extraction_error"])
    if extra:
        warning = "; ".join(([warning] if warning else []) + extra)
    # word_count/character_count/image_index exist only on the fallback
    # path (pdf_extractor.py:519-533) — nullable struct members, null
    # elsewhere (reference fidelity: the fallback output carries them)
    pages = [{"page_number": p["page_number"], "content": p["content"],
              "line_count": p["line_count"],
              "word_count": p.get("word_count"),
              "character_count": p.get("character_count")}
             for p in data.get("pages", [])]
    images = [{"description": i["description"], "page": i.get("page", -1),
               "image_index": i.get("image_index")}
              for i in data.get("images", [])]
    return {
        "url": url,
        "extraction_successful": successful,
        "extraction_method": method,
        "full_text": data.get("full_text"),
        "pages": pages,
        "spans": data.get("spans", []),
        "tables": data.get("tables", []),
        "images": images,
        # absolute out-links (HTML branch; [] on the PDF/fallback
        # paths — SPDF payloads carry no hyperlinks)
        "links": data.get("links", []),
        "word_count": data.get("word_count"),
        "character_count": data.get("character_count"),
        "total_pages": len(data.get("pages", [])),      # :340 — quirk preserved
        "has_tables": len(data.get("tables", [])) > 0,  # :342
        "has_images": len(data.get("images", [])) > 0,  # :343
        "error": error,
        "warning": warning,
    }


def _fail(url: str, error: str) -> dict[str, Any]:
    """Failure record analog (pdf_extractor.py:359-364): data is null."""
    return {
        "url": url, "extraction_successful": False, "extraction_method": None,
        "full_text": None, "pages": None, "spans": None, "tables": None,
        "images": None, "links": None,
        "word_count": None, "character_count": None,
        "total_pages": None, "has_tables": None, "has_images": None,
        "error": error, "warning": None,
    }


# ---------------------------------------------------------------- branch: PDF

def extract_pdf(url: str, data: bytes, cfg: PipelineConfig) -> dict[str, Any]:
    """The reference's full extraction lifecycle for one document
    (pdf_extractor.py:84-369) minus the control-plane (Redis/progress):

    fix boxes (:104) → validate (:120) → strict parse (:197) → on
    error, route by message substring (:216): 'page-dimensions' →
    box repair (:229) → retry (:234) → backend cascade (:241) →
    fallback (:262); any other error → fallback (:292). Fallback
    results are SUCCESSFUL rows with a warning (:267/:297 — preserved
    quirk, even when the fallback itself returned its failure
    sentinel)."""
    try:
        fixed = fix_pdf(data)                                   # :104
        validation = validate_payload(fixed)                    # :120
        if not validation["is_valid"]:
            raise SpdfError(
                f"Invalid PDF file: {validation.get('error', 'Unknown error')}")  # :124
        try:
            doc = spdf.parse_strict(fixed)                      # :197
        except SpdfError as err:
            emsg = str(err).lower()
            if "page-dimensions" in emsg or "preprocess failed" in emsg:   # :216
                try:
                    repaired = fix_page_dimensions(fixed)       # :229
                    try:
                        doc = spdf.parse_strict(repaired)       # :234
                    except SpdfError:
                        doc, _backend = try_different_backends(repaired)   # :241
                except Exception:
                    fb = fallback_extraction(fixed)             # :262
                    return _flatten(url, METHOD_FALLBACK, fb, True,
                                    warning=f"Used PyMuPDF fallback due to all backends failing: {err}")  # :276
                data_out = parse_docling_result(doc, cfg)
                return _flatten(url, METHOD_PDF, data_out, True)
            fb = fallback_extraction(fixed)                     # :292
            return _flatten(url, METHOD_FALLBACK, fb, True,
                            warning=f"Used fallback extraction due to: {err}")  # :306
        data_out = parse_docling_result(doc, cfg)               # :324
        return _flatten(url, METHOD_PDF, data_out, True)        # :334-345
    except Exception as e:                                      # :357
        return _fail(url, str(e))


# ---------------------------------------------------------------- branch: HTML

def extract_html(url: str, data: bytes, cfg: PipelineConfig) -> dict[str, Any]:
    """M17 branch: boilerplate strip → markdown-ish full_text + spans,
    then the same re-pagination / counting semantics as the reference's
    happy path (M12/M13)."""
    try:
        ex = extract_main_content(data, cfg)
        out = {
            "full_text": ex.full_text,
            "pages": paginate(ex.full_text, cfg.lines_per_page),
            "spans": ex.spans,
            "tables": ex.tables,
            "images": ex.images,
            "links": ex.links,
            "word_count": len(ex.full_text.split()),
            "character_count": len(ex.full_text),
        }
        return _flatten(url, METHOD_HTML, out, True)
    except Exception as e:
        return _fail(url, str(e))


# ---------------------------------------------------------------- row router

def extract_row(url: str, data: bytes | None,
                cfg: PipelineConfig = DEFAULT_CONFIG) -> dict[str, Any]:
    """M1–M3 ingress predicates (size cap then content sniff, reference
    main.py:102-121 — messages mirrored) + branch dispatch. Total:
    every input row yields exactly one output row."""
    if data is not None and len(data) > cfg.max_payload_bytes:
        return _fail(url, "File size too large. Maximum size is "
                          f"{cfg.max_payload_bytes / 1024 / 1024:.1f}MB")   # main.py:113
    kind = sniff_kind(data)
    if kind == KIND_PDF:
        return extract_pdf(url, data, cfg)
    if kind == KIND_HTML:
        return extract_html(url, data, cfg)
    return _fail(url, "Invalid PDF file. File does not appear to be a valid PDF")  # main.py:120


def extract_rows(urls, payloads, cfg: PipelineConfig = DEFAULT_CONFIG) -> list[dict]:
    return [extract_row(u, p, cfg) for u, p in zip(urls, payloads)]
