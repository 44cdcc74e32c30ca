"""SPDF payload format: build/parse round-trips and error taxonomy."""

import pytest

from docling_pdf_ray import payload as spdf


def test_roundtrip():
    data = spdf.build([(612.0, 792.0, ["hello", "world"]), (595.0, 842.0, ["p2"])],
                      meta={"producer": "FPDF"})
    doc = spdf.parse_strict(data)
    assert doc.page_count == 2
    assert doc.pages[0].lines == ["hello", "world"]
    assert doc.pages[1].lines == ["p2"]
    assert doc.meta == {"producer": "FPDF"}
    assert spdf.serialize(doc) == data


def test_strict_rejects_unterminated():
    data = spdf.build([(612.0, 792.0, ["x"])], terminated=False)
    with pytest.raises(spdf.SpdfCorruptError, match="EOF"):
        spdf.parse_strict(data)
    # lenient tolerates it
    doc = spdf.parse_lenient(data)
    assert doc.page_count == 1 and not doc.terminated


def test_strict_rejects_zero_pages():
    with pytest.raises(spdf.SpdfCorruptError, match="no pages"):
        spdf.parse_strict(b"%PDF-1.4\ngarbage\n%%EOF\n")


def test_dimension_error_message_routes():
    data = spdf.build([(0.0, 0.0, ["x"])])
    with pytest.raises(spdf.SpdfDimensionError, match="page-dimensions"):
        spdf.parse_strict(data)


def test_dimension_error_precedes_structure_error():
    # bad dims AND unterminated → dimension error first (ladder reachability)
    data = spdf.build([(0.0, -1.0, ["x"])], terminated=False)
    with pytest.raises(spdf.SpdfDimensionError):
        spdf.parse_strict(data)


def test_undecodable_raises_corrupt():
    with pytest.raises(spdf.SpdfCorruptError, match="undecodable"):
        spdf.parse_lenient(b"%PDF-1.4\n\xff\xfe\x80\n")


def test_malformed_header_strict_vs_skip():
    data = b"%PDF-1.4\n%%PAGE not numeric\nline\n%%EOF\n"
    with pytest.raises(spdf.SpdfCorruptError, match="malformed page header"):
        spdf.parse_lenient(data, skip_bad_pages=False)
    doc = spdf.parse_lenient(data, skip_bad_pages=True)
    assert doc.page_count == 0


def test_not_pdf_magic():
    with pytest.raises(spdf.SpdfCorruptError, match="missing %PDF header"):
        spdf.parse_lenient(b"<html></html>")


def test_no_phantom_trailing_line():
    data = spdf.build([(612.0, 792.0, ["a", "b"])], terminated=False)
    doc = spdf.parse_lenient(data)
    assert doc.pages[0].lines == ["a", "b"]
