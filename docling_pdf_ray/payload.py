"""SPDF — the deterministic synthetic PDF-like payload format.

This sandbox has no PDF stack (no docling, no PyMuPDF/fitz, no
pypdfium2 — see SURVEY.md preamble), so the reference's *transform
semantics* are re-specified over a deterministic text-structured payload
that begins with the same ``b'%PDF'`` magic the reference sniffs
(reference ``main.py:117``). The format:

    %PDF-1.4\\n
    %%META key=value key=value\\n          (optional, one line; e.g.
                                            producer=FPDF encrypted=1)
    %%PAGE <width> <height>\\n             (one per page)
    <content line>\\n                      (0..n lines per page; special:)
      %%TABLE <text>                       (a table element)
      %%IMAGE <text>                       (a picture element)
    %%EOF\\n                               (terminator)

Two parsers mirror the reference's two engines:

* :func:`parse_strict` — the "docling" analog (reference
  ``pdf_extractor.py:197``): demands a decodable, well-formed document
  (terminated, >=1 page, numeric page boxes, positive dimensions) and
  raises errors whose messages drive the reference's error-routing
  ladder (``pdf_extractor.py:200-311``) — dimension errors contain
  ``"page-dimensions"`` exactly as docling's do.
* :func:`parse_lenient` — the "PyMuPDF" analog (reference
  ``pdf_extractor.py:503``): tolerates a missing terminator and trailing
  garbage, but still fails on undecodable bytes or (when
  ``skip_bad_pages=False``) malformed page headers — mirroring that
  fitz opens damaged files yet hard-fails on true garbage.
"""

from __future__ import annotations

from dataclasses import dataclass, field

PDF_MAGIC = b"%PDF"
A4_WIDTH = 595.0   # reference pdf_extractor.py:671 — A4 in points
A4_HEIGHT = 842.0

TABLE_PREFIX = "%%TABLE "
IMAGE_PREFIX = "%%IMAGE "
PAGE_PREFIX = "%%PAGE "
META_PREFIX = "%%META "
EOF_LINE = "%%EOF"


class SpdfError(Exception):
    """Base payload error."""


class SpdfCorruptError(SpdfError):
    """Structurally corrupt payload (routes to the reference's
    'other error' arm, pdf_extractor.py:282-311)."""


class SpdfDimensionError(SpdfError):
    """Invalid page dimensions. The message contains 'page-dimensions'
    so the error ladder's substring routing (pdf_extractor.py:216)
    takes the dimension-fix arm."""


@dataclass
class SpdfPage:
    width: float
    height: float
    lines: list[str] = field(default_factory=list)


@dataclass
class SpdfDoc:
    pages: list[SpdfPage]
    meta: dict[str, str] = field(default_factory=dict)
    terminated: bool = True

    @property
    def page_count(self) -> int:
        return len(self.pages)


def build(pages: list[SpdfPage] | list[tuple[float, float, list[str]]],
          meta: dict[str, str] | None = None,
          terminated: bool = True) -> bytes:
    """Serialize an SPDF payload (used by fixtures and the dimension
    fixer). Deterministic: canonical float formatting via ``repr`` of
    Python floats (e.g. ``595.0``)."""
    out = ["%PDF-1.4"]
    if meta:
        out.append(META_PREFIX + " ".join(f"{k}={v}" for k, v in sorted(meta.items())))
    for p in pages:
        if not isinstance(p, SpdfPage):
            p = SpdfPage(p[0], p[1], list(p[2]))
        out.append(f"{PAGE_PREFIX}{p.width!r} {p.height!r}")
        out.extend(p.lines)
    if terminated:
        out.append(EOF_LINE)
    return ("\n".join(out) + "\n").encode("utf-8")


def _decode(data: bytes) -> list[str]:
    if not data.startswith(PDF_MAGIC):
        raise SpdfCorruptError("not a PDF payload: missing %PDF header")
    try:
        text = data.decode("utf-8")
    except UnicodeDecodeError as e:
        # the analog of fitz/pdfium failing to open binary garbage
        raise SpdfCorruptError(f"cannot open document: undecodable bytes ({e})") from None
    # a payload ends with a final "\n" terminator; don't let it become a
    # phantom empty content line
    if text.endswith("\n"):
        text = text[:-1]
    return text.split("\n")


def _parse_meta(line: str) -> dict[str, str]:
    meta: dict[str, str] = {}
    for tok in line[len(META_PREFIX):].split():
        if "=" in tok:
            k, _, v = tok.partition("=")
            meta[k] = v
    return meta


def parse_lenient(data: bytes, skip_bad_pages: bool = False) -> SpdfDoc:
    """Tolerant parse (the PyMuPDF analog).

    Collects every ``%%PAGE`` section found, with or without the
    ``%%EOF`` terminator; lines before the first page are ignored.
    A malformed page header (non-numeric box) raises unless
    ``skip_bad_pages`` — the dimension fixer (oracle M4/M15) passes
    ``skip_bad_pages=True`` because fitz tolerates more than it
    re-serializes; the fallback extractor keeps the strict default so
    a damaged page table still hard-fails (exercising the reference's
    fallback-failure sentinel, pdf_extractor.py:566-576).
    """
    lines = _decode(data)
    meta: dict[str, str] = {}
    pages: list[SpdfPage] = []
    cur: SpdfPage | None = None
    terminated = False
    for line in lines[1:]:  # skip the %PDF-1.x header line
        if line == EOF_LINE:
            terminated = True
            cur = None
            continue
        if line.startswith(META_PREFIX):
            meta.update(_parse_meta(line))
            continue
        if line.startswith(PAGE_PREFIX):
            parts = line[len(PAGE_PREFIX):].split()
            try:
                if len(parts) != 2:
                    raise ValueError(f"expected 2 box values, got {len(parts)}")
                w, h = float(parts[0]), float(parts[1])
            except ValueError as e:
                if skip_bad_pages:
                    cur = None
                    continue
                raise SpdfCorruptError(f"malformed page header {line!r}: {e}") from None
            cur = SpdfPage(w, h)
            pages.append(cur)
            continue
        if cur is not None:
            cur.lines.append(line)
    return SpdfDoc(pages=pages, meta=meta, terminated=terminated)


def parse_strict(data: bytes) -> SpdfDoc:
    """Strict parse (the docling/pypdfium2 analog, reference
    pdf_extractor.py:197).

    Raises :class:`SpdfDimensionError` (message contains
    ``page-dimensions``) when any page box is non-positive, mirroring
    docling's ``Stage preprocess failed`` / page-dimension errors the
    reference routes on (pdf_extractor.py:216), and
    :class:`SpdfCorruptError` for untermination / zero pages /
    malformed headers.
    """
    doc = parse_lenient(data, skip_bad_pages=False)
    # dimension errors surface FIRST (per-page preprocessing precedes
    # trailer validation in the engines the reference cascades over) —
    # this makes the dimension-repair arm of the error ladder reachable
    # for payloads that are both unterminated and badly-boxed.
    bad = [i for i, p in enumerate(doc.pages) if p.width <= 0 or p.height <= 0]
    if bad:
        raise SpdfDimensionError(
            f"Stage preprocess failed: page-dimensions invalid for pages {bad}"
        )
    if doc.page_count == 0:
        raise SpdfCorruptError("corrupt document structure: no pages found")
    if not doc.terminated:
        raise SpdfCorruptError("corrupt document structure: missing %%EOF terminator")
    return doc


def serialize(doc: SpdfDoc) -> bytes:
    return build(doc.pages, meta=doc.meta or None, terminated=doc.terminated)
