"""Oracle semantics: routing, error ladder, pagination, counters,
fallback quirks — each pinned to the reference behavior it re-specifies
(file:line cites in docling_pdf_ray/oracle.py)."""

import pytest

from docling_pdf_ray import oracle
from docling_pdf_ray import payload as spdf
from docling_pdf_ray.config import DEFAULT_CONFIG as CFG
from docling_pdf_ray.sources import fixtures


# --------------------------------------------------------------- M1–M3 routing

def test_sniff():
    assert oracle.sniff_kind(b"%PDF-1.4\n...") == "pdf"
    assert oracle.sniff_kind(b"<!DOCTYPE html><html>") == "html"
    assert oracle.sniff_kind(b"  \n <html>") == "html"
    assert oracle.sniff_kind(b"plain text") == "other"
    assert oracle.sniff_kind(b"") == "other"
    assert oracle.sniff_kind(None) == "other"


def test_too_large_rejected_not_dropped():
    cfg = CFG.with_(max_payload_bytes=10)
    r = oracle.extract_row("u", b"%PDF-1.4\n0123456789012345\n", cfg)
    assert r["extraction_successful"] is False
    assert "File size too large" in r["error"]
    assert r["full_text"] is None


def test_not_pdf_rejected_with_reference_message():
    r = oracle.extract_row("u", b"just some text")
    assert r["extraction_successful"] is False
    # mirrors main.py:120
    assert r["error"] == "Invalid PDF file. File does not appear to be a valid PDF"


# --------------------------------------------------------------- happy PDF path

def _pdf(lines_pages, **kw):
    return spdf.build(lines_pages, **kw)


def test_pdf_happy_path():
    data = _pdf([(612.0, 792.0, ["# Title", "hello world", "%%TABLE a | b",
                                 "%%IMAGE fig one", ""])])
    r = oracle.extract_row("u", data)
    assert r["extraction_successful"] is True
    assert r["extraction_method"] == "pdf_parse"
    # markdown: elements joined with \n\n; blank line skipped; image marker
    assert r["full_text"] == "# Title\n\nhello world\n\n| a | b |\n\n<!-- image -->"
    assert r["tables"] == [{"content": "a | b", "page": 1}]
    assert r["images"] == [{"description": "fig one", "page": 1,
                            "image_index": None}]
    assert r["has_tables"] and r["has_images"]
    assert r["word_count"] == len(r["full_text"].split())
    assert r["character_count"] == len(r["full_text"])
    # spans cover the elements exactly
    ft = r["full_text"]
    for s in r["spans"]:
        assert 0 <= s["start"] <= s["end"] <= len(ft)
    assert [ft[s["start"]:s["end"]] for s in r["spans"]] == [
        "# Title", "hello world", "| a | b |", "<!-- image -->"]
    assert [s["kind"] for s in r["spans"]] == ["text", "text", "table", "picture"]


def test_total_pages_is_repaginated_count():
    # 120 elements → full_text has 239 lines (element + blank interleave)
    data = _pdf([(612.0, 792.0, [f"line {i}" for i in range(120)])])
    r = oracle.extract_row("u", data)
    n_lines = len(r["full_text"].split("\n"))
    assert n_lines == 239
    # reference quirk (pdf_extractor.py:340): total_pages == len(repaginated)
    assert r["total_pages"] == len(r["pages"]) == (239 + 49) // 50


# --------------------------------------------------------------- M12 pagination

@pytest.mark.parametrize("n_lines,expect", [
    (0, [(1, 1)]),          # ''.split('\n') == [''] → one page, one empty line
    (1, [(1, 1)]),
    (49, [(1, 49)]),
    (50, [(1, 50)]),
    (51, [(1, 50), (2, 1)]),
    (100, [(1, 50), (2, 50)]),
    (101, [(1, 50), (2, 50), (3, 1)]),
])
def test_paginate_reference_chunking(n_lines, expect):
    text = "\n".join(f"l{i}" for i in range(n_lines))
    pages = oracle.paginate(text, 50)
    got = [(p["page_number"], p["line_count"]) for p in pages]
    assert got == expect
    # contents reassemble the text exactly
    assert "\n".join(p["content"] for p in pages) == text


# --------------------------------------------------------------- error ladder

def test_baddims_repaired_to_pdf_parse_no_warning():
    data = _pdf([(0.0, 0.0, ["fixed page text here"])])
    r = oracle.extract_row("u", data)
    assert r["extraction_method"] == "pdf_parse"
    assert r["warning"] is None
    assert r["full_text"] == "fixed page text here"


def test_baddims_unterminated_goes_through_cascade():
    # dims error → box repair (preserves untermination) → strict retry
    # fails → cascade: dlparse_v2 tolerates untermination → pdf_parse
    data = _pdf([(0.0, -1.0, ["salvaged by cascade"])], terminated=False)
    r = oracle.extract_row("u", data)
    assert r["extraction_method"] == "pdf_parse"
    assert r["full_text"] == "salvaged by cascade"
    assert r["warning"] is None


def test_corrupt_text_falls_back_with_warning():
    data = b"%PDF-1.4\nsome garbage\nno structure\n"
    r = oracle.extract_row("u", data)
    assert r["extraction_successful"] is True          # quirk: fallback = success
    assert r["extraction_method"] == "fallback"
    assert r["warning"].startswith("Used fallback extraction due to: ")
    assert r["full_text"] == ""                        # lenient finds no pages
    assert r["total_pages"] == 0 and r["pages"] == []


def test_corrupt_binary_fails_at_fix_stage():
    data = b"%PDF-1.4\n\xff\xfe\x80garbage"
    r = oracle.extract_row("u", data)
    assert r["extraction_successful"] is False
    assert "undecodable" in r["error"]
    assert r["full_text"] is None


def test_badpage_header_fallback_sentinel():
    data = b"%PDF-1.4\n%%PAGE 612.0 792.0\nok line\n%%PAGE not numeric\nx\n%%EOF\n"
    r = oracle.extract_row("u", data)
    assert r["extraction_successful"] is True          # quirk preserved
    assert r["extraction_method"] == "fallback"
    assert r["full_text"] == "Fallback extraction failed"
    assert "Fallback extraction failed:" in r["warning"]
    assert r["word_count"] == 0 and r["character_count"] == 0


def test_cascade_all_fail_warning_string(monkeypatch):
    # unreachable via natural payloads (the tolerant backend salvages
    # them) — force it to pin the :276 warning format
    def boom(data):
        raise spdf.SpdfCorruptError("All PDF backends failed to process this file")

    monkeypatch.setattr(oracle, "try_different_backends", boom)
    data = _pdf([(0.0, -1.0, ["text"])], terminated=False)
    r = oracle.extract_row("u", data)
    assert r["extraction_method"] == "fallback"
    assert r["warning"].startswith("Used PyMuPDF fallback due to all backends failing: ")


# --------------------------------------------------------------- M14 fallback quirks

def test_fallback_counts_on_unstripped_text():
    fb = oracle.fallback_extraction(
        spdf.build([(612.0, 792.0, ["a b", "c"]), (612.0, 792.0, ["d"])],
                   terminated=False))
    # accumulated: 'a b\nc\n' + '\n' + 'd\n' + '\n' = 'a b\nc\n\nd\n\n'
    assert fb["full_text"] == "a b\nc\n\nd"            # stripped
    assert fb["character_count"] == len("a b\nc\n\nd\n\n")  # UNstripped (ref :561)
    assert fb["word_count"] == 4
    assert fb["pages"][0]["line_count"] == 3           # 'a b\nc\n'.split('\n')
    assert fb["tables"] == []


def test_fallback_image_naming():
    fb = oracle.fallback_extraction(
        spdf.build([(612.0, 792.0, ["%%IMAGE x", "t", "%%IMAGE y"])]))
    assert fb["images"] == [
        {"page": 1, "image_index": 0, "description": "Image 1 on page 1"},
        {"page": 1, "image_index": 1, "description": "Image 2 on page 1"},
    ]


# --------------------------------------------------------------- M16 absorber

def test_parse_absorber_sentinel():
    class Broken:
        pages = property(lambda self: (_ for _ in ()).throw(RuntimeError("boom")))

    out = oracle.parse_docling_result(Broken(), CFG)
    assert out["full_text"] == "Error parsing document content"
    assert out["parsing_error"] == "boom"
    # and the flattened row folds it into warning
    r = oracle._flatten("u", "pdf_parse", out, True)
    assert "parsing_error: boom" in r["warning"]


# --------------------------------------------------------------- M5 validation

def test_validate_counts_dimensions():
    data = spdf.build([(612.0, 792.0, []), (0.0, 0.0, []), (10.0, 10.0, [])],
                      meta={"encrypted": "1", "producer": "FPDF"})
    v = oracle.validate_payload(data)
    assert v["is_valid"] and v["page_count"] == 3
    assert v["pages_with_valid_dimensions"] == 2
    assert v["has_page_dimensions"] and v["is_encrypted"]


# --------------------------------------------------------------- totality

def test_every_fixture_class_yields_exactly_one_row():
    t = fixtures.generate_pages_table(200, seed=7)
    classes_seen = set(t.column("row_class").to_pylist())
    assert {c for c, _ in fixtures.CLASS_WEIGHTS} <= classes_seen
    cfg = CFG.with_(max_payload_bytes=fixtures.TEST_MAX_BYTES)
    urls = t.column("url").to_pylist()
    payloads = t.column("html").to_pylist()
    rows = oracle.extract_rows(urls, payloads, cfg)
    assert len(rows) == 200
    for row, cls in zip(rows, t.column("row_class").to_pylist()):
        if cls.startswith("html") or cls in ("pdf_ok", "pdf_big"):
            assert row["extraction_successful"] is True, (cls, row["error"])
        if cls in ("not_pdf", "too_large", "pdf_corrupt_binary"):
            assert row["extraction_successful"] is False, cls


def test_determinism():
    a = fixtures.generate_pages_table(100, seed=7)
    b = fixtures.generate_pages_table(100, seed=7)
    assert a.equals(b)


def test_fallback_spans_cover_pages_in_stripped_text():
    data = spdf.build([(612.0, 792.0, ["", "alpha beta"]),
                       (612.0, 792.0, ["gamma"])], terminated=False)
    fb = oracle.fallback_extraction(data)
    ft = fb["full_text"]
    assert ft == "alpha beta\n\ngamma"
    # each span indexes the stripped text and contains its page's words
    assert [s["kind"] for s in fb["spans"]] == ["page", "page"]
    assert "alpha beta" in ft[fb["spans"][0]["start"]:fb["spans"][0]["end"]]
    assert "gamma" in ft[fb["spans"][1]["start"]:fb["spans"][1]["end"]]
    for s in fb["spans"]:
        assert 0 <= s["start"] < s["end"] <= len(ft)


def test_fallback_struct_fidelity_through_arrow():
    """Reference fidelity (pdf_extractor.py:519-533): fallback output
    carries per-page word_count/character_count and per-image
    image_index; the Arrow structs keep them (nullable — null on the
    happy/HTML paths, which never compute them)."""
    from docling_pdf_ray import schema

    probe = spdf.build([(612.0, 792.0, ["a b", "c", "%%IMAGE fig"])],
                       terminated=False)      # strict fails → generic fallback
    r = oracle.extract_row("u", probe)
    assert r["extraction_method"] == "fallback"
    t = schema.result_to_arrow([r])
    row = t.to_pylist()[0]
    (page,) = row["pages"]
    assert page["word_count"] == len(page["content"].split())
    assert page["character_count"] == len(page["content"])
    assert row["images"] == [{"description": "Image 1 on page 1",
                              "page": 1, "image_index": 0}]

    happy = oracle.extract_row("u", spdf.build([(612.0, 792.0,
                                                 ["t", "%%IMAGE fig"])]))
    assert happy["extraction_method"] == "pdf_parse"
    hrow = schema.result_to_arrow([happy]).to_pylist()[0]
    assert all(p["word_count"] is None and p["character_count"] is None
               for p in hrow["pages"])
    assert all(i["image_index"] is None for i in hrow["images"])
