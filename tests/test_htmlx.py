"""M17 HTML boilerplate strip: density scoring, link pruning, spans."""

from docling_pdf_ray.config import DEFAULT_CONFIG as CFG
from docling_pdf_ray.htmlx import extract_main_content
from docling_pdf_ray.oracle import extract_html

LOREM = ("the quick brown fox jumps over the lazy dog and keeps on "
         "running through the forest for a while")


def test_basic_article_kept_boilerplate_stripped():
    html = f"""<!DOCTYPE html><html><head><title>T</title>
    <style>p {{ color: red }}</style><script>var x=1;</script></head>
    <body><nav><a href="/a">home</a> <a href="/b">about</a></nav>
    <article><h1>A Proper Headline</h1>
    <p>{LOREM}</p><p>{LOREM} again and again.</p></article>
    <footer><p>copyright 2024 somebody — all rights reserved legal text</p></footer>
    </body></html>""".encode()
    ex = extract_main_content(html, CFG)
    assert ex.full_text.startswith("# A Proper Headline")
    assert LOREM in ex.full_text
    assert "color: red" not in ex.full_text
    assert "var x=1" not in ex.full_text
    assert "home" not in ex.full_text          # nav stripped
    assert "copyright" not in ex.full_text     # footer stripped
    assert [s["kind"] for s in ex.spans] == ["heading", "paragraph", "paragraph"]


def test_spans_index_full_text_exactly():
    html = f"<html><body><h2>Head Here</h2><p>{LOREM}</p></body></html>".encode()
    ex = extract_main_content(html, CFG)
    for s in ex.spans:
        assert ex.full_text[s["start"]:s["end"]] in ("## Head Here", LOREM)
    assert ex.full_text == "## Head Here\n\n" + LOREM


def test_link_density_pruning():
    links = " ".join(f'<a href="/{i}">useful looking link text {i}</a>' for i in range(10))
    html = (f"<html><body><p>{links}</p>"
            f"<p>{LOREM}</p></body></html>").encode()
    ex = extract_main_content(html, CFG)
    assert "useful looking link" not in ex.full_text
    assert LOREM in ex.full_text


def test_short_blocks_pruned_headings_kept():
    html = f"<html><body><p>ok</p><h3>Hi!</h3><p>{LOREM}</p></body></html>".encode()
    ex = extract_main_content(html, CFG)
    assert "ok" not in ex.full_text.split("\n\n")
    assert "### Hi!" in ex.full_text


def test_listitems_rendered_and_linkfarm_pruned():
    items = "".join(f"<li>{LOREM} item {i}</li>" for i in range(3))
    farm = "".join(f'<li><a href="/{i}">{LOREM} {i}</a></li>' for i in range(3))
    html = f"<html><body><ul>{items}</ul><ul>{farm}</ul></body></html>".encode()
    ex = extract_main_content(html, CFG)
    kept = ex.full_text.split("\n\n")
    assert all(k.startswith("- ") for k in kept)
    assert len(kept) == 3


def test_tables_and_images_collected():
    html = (f"<html><body><table><tr><td>{LOREM}</td><td>{LOREM}</td></tr></table>"
            f'<img src="x.png" alt="a nice chart"><img src="y.png">'
            f"<p>{LOREM}</p></body></html>").encode()
    ex = extract_main_content(html, CFG)
    assert len(ex.tables) == 1
    assert ex.tables[0]["page"] == -1
    assert LOREM in ex.tables[0]["content"]
    assert [i["description"] for i in ex.images] == ["a nice chart", "y.png"]
    # td cells big enough are also text blocks
    assert ex.full_text.count(LOREM) >= 3


def test_empty_and_malformed_html_total():
    for payload in (b"<html></html>", b"<html><body>   </body></html>",
                    b"<p>unclosed <div><b>messy", b"<"):
        ex = extract_main_content(payload, CFG)
        assert isinstance(ex.full_text, str)


def test_extract_html_row_empty_has_one_empty_page():
    r = extract_html("u", b"<html><body> </body></html>", CFG)
    assert r["extraction_successful"] is True
    assert r["full_text"] == ""
    assert r["word_count"] == 0 and r["character_count"] == 0
    # reference pagination quirk: '' → one page with one empty line
    assert r["total_pages"] == 1
    assert r["pages"] == [{"page_number": 1, "content": "", "line_count": 1,
                           "word_count": None, "character_count": None}]


def test_pseudo_text_blocks_in_divs():
    html = f"<html><body><div>{LOREM} directly in a div with no p tag</div></body></html>".encode()
    ex = extract_main_content(html, CFG)
    assert LOREM in ex.full_text
    assert ex.spans[0]["kind"] == "text"


def test_deterministic():
    from docling_pdf_ray.sources.fixtures import generate_pages_table

    t = generate_pages_table(60, seed=3)
    payloads = [p for p, c in zip(t.column("html").to_pylist(),
                                  t.column("row_class").to_pylist())
                if c.startswith("html")]
    for p in payloads:
        assert extract_main_content(p, CFG).full_text == extract_main_content(p, CFG).full_text


def test_entities_decoded_and_comments_ignored():
    html = ("<html><body><!-- boilerplate comment with words words words -->"
            "<p>Tom &amp; Jerry say &quot;hello&quot; &lt;sometimes&gt; "
            "and keep talking for quite a while longer here</p></body></html>").encode()
    ex = extract_main_content(html, CFG)
    assert 'Tom & Jerry say "hello" <sometimes>' in ex.full_text
    assert "boilerplate comment" not in ex.full_text


def test_nested_table_cells_not_double_counted():
    cell = LOREM + " cell content long enough to keep"
    html = (f"<html><body><table><tr><td><p>{cell}</p></td></tr></table>"
            f"</body></html>").encode()
    ex = extract_main_content(html, CFG)
    # the <p> inside <td>: td is a leaf block consuming its subtree, so
    # the text appears exactly once in full_text
    assert ex.full_text.count("cell content long enough") == 1


def test_numeric_charrefs():
    html = "<html><body><p>caf&#233; and &#x2014; dashes with plenty of text around them</p></body></html>".encode()
    ex = extract_main_content(html, CFG)
    assert "café and — dashes" in ex.full_text


def test_deeply_nested_does_not_recurse_error():
    html = ("<html><body>" + "<div>" * 150 +
            f"<p>{LOREM}</p>" + "</div>" * 150 + "</body></html>").encode()
    ex = extract_main_content(html, CFG)
    assert LOREM in ex.full_text


def test_inline_elements_join_pseudo_blocks():
    # review finding: prose in divs with inline markup must stay one
    # block and lose no words
    html = ("<html><body><div>This is a fairly long sentence with "
            "<b>important</b> words in the middle of it all.</div>"
            "</body></html>").encode()
    ex = extract_main_content(html, CFG)
    assert ex.full_text == ("This is a fairly long sentence with important "
                            "words in the middle of it all.")
    assert len(ex.spans) == 1


def test_inline_link_density_still_prunes_pseudo_blocks():
    links = " ".join(f'<a href="/{i}">linky text piece {i}</a>' for i in range(12))
    html = f"<html><body><div>{links}</div><div>{LOREM} plain prose here</div></body></html>".encode()
    ex = extract_main_content(html, CFG)
    assert "linky text" not in ex.full_text
    assert LOREM in ex.full_text


def test_table_inside_leaf_block_is_reported():
    # review finding: tables nested in blockquote/li/etc must appear in
    # the tables inventory
    cell = LOREM + " inner table cell"
    html = (f"<html><body><blockquote><table><tr><td>{cell}</td></tr></table>"
            f"</blockquote></body></html>").encode()
    ex = extract_main_content(html, CFG)
    assert len(ex.tables) == 1
    assert "inner table cell" in ex.tables[0]["content"]


def test_image_inside_inline_element_reported():
    # second-review regression: <img> wrapped in <a> inside a div run
    html = ('<html><body><div>Some prose around here that is long enough '
            '<a href="/x"><img src="pic.png" alt="a chart"></a> '
            'and more prose following it</div></body></html>').encode()
    ex = extract_main_content(html, CFG)
    assert [i["description"] for i in ex.images] == ["a chart"]


def test_collect_links_contract():
    """r4 link harvest: absolute http(s) hrefs only, document order,
    duplicates preserved, stripped subtrees (nav/footer/script)
    excluded, nested anchors both collected, keep-rule independence
    (a pruned link-only block still contributes its anchors)."""
    html = (
        '<html><head><script>var x="<a href=https://ghost.example/x>"'
        '</script></head><body>'
        '<nav><a href="https://navhost.example/a">nav</a>'
        '<a href="/rel">rel</a></nav>'
        '<article>'
        f'<p>{LOREM}<a href="https://one.example/p1">one</a></p>'
        '<p><a href="https://two.example/x">x</a> '
        '<a href="https://two.example/x">x again</a></p>'
        '<div><a href="https://outer.example/o">'
        '<a href="https://inner.example/i">i</a></a></div>'
        '<a href="ftp://no.example/f">ftp</a>'
        '</article>'
        '<footer><a href="https://foothost.example/f">foot</a></footer>'
        '</body></html>').encode()
    ex = extract_main_content(html, CFG)
    assert ex.links == [
        "https://one.example/p1",
        "https://two.example/x", "https://two.example/x",
        "https://outer.example/o", "https://inner.example/i"]
    # the link-only <p> was pruned from full_text yet contributed links
    assert "x again" not in ex.full_text


def test_collect_anchors_rules_and_text():
    """collect_anchors: collect_links' harvesting rules (absolute
    http(s) only, boilerplate subtrees excluded, duplicates kept,
    document order) plus ws-normalized visible anchor text."""
    from docling_pdf_ray.htmlx import collect_anchors, parse_dom

    root = parse_dom(
        '<html><body>'
        '<nav><a href="https://spam.example/x">chrome link</a></nav>'
        '<article>'
        '<a href="https://a.example/1">read   <b>the\n docs</b></a>'
        '<a href="/relative">rel</a>'
        '<a href="https://a.example/1">read   <b>the\n docs</b></a>'
        '<a href="http://b.example/2"></a>'
        '</article>'
        '<footer><a href="http://spam.example/y">more chrome</a></footer>'
        '</body></html>')
    assert collect_anchors(root) == [
        ("https://a.example/1", "read the docs"),
        ("https://a.example/1", "read the docs"),
        ("http://b.example/2", ""),
    ]
