"""URL canonicalizer: rule-by-rule pins + structural DuckDB parity.

The operator contract is that `urlnorm.canonicalize` (Arrow/RE2) and
`urlnorm.sql_canonical` (DuckDB/RE2, composed from the SAME rule
strings) are the same function; `q_canonical_url_dedup`'s driver gate
checks that end-to-end, these tests pin the individual rules and the
hostile edges (nulls, non-urls, utm runs, ports on uppercase hosts).
"""

import duckdb
import pyarrow as pa
import pytest

from docling_pdf_ray.functions import urlnorm


def canon1(u):
    return urlnorm.canonicalize(pa.array([u], pa.string()))[0].as_py()


@pytest.mark.parametrize("raw,want", [
    # each rule alone
    ("https://a.example/p#frag", "https://a.example/p"),
    ("https://a.example/p?utm_source=x", "https://a.example/p"),
    ("HTTPS://A.EXAMPLE/p", "https://a.example/p"),
    ("https://a.example:443/p", "https://a.example/p"),
    ("http://a.example:80/p", "http://a.example/p"),
    ("https://a.example/p/", "https://a.example/p"),
    ("https://a.example/", "https://a.example"),
    # non-default port survives
    ("https://a.example:8080/p", "https://a.example:8080/p"),
    # CROSS-scheme "default" ports are different origins and survive
    # (ADVICE r4: the scheme-blind strip falsely merged these)
    ("http://a.example:443/p", "http://a.example:443/p"),
    ("https://a.example:80/p", "https://a.example:80/p"),
    # path/query case is preserved — only scheme://host lowercases
    ("HTTP://A.EXAMPLE/PaTh?Q=V", "http://a.example/PaTh?Q=V"),
    # utm runs: leading, interior, trailing, sole, mixed
    ("https://a.example/p?utm_a=1&utm_b=2", "https://a.example/p"),
    ("https://a.example/p?utm_a=1&b=2", "https://a.example/p?b=2"),
    ("https://a.example/p?a=1&utm_b=2&c=3", "https://a.example/p?a=1&c=3"),
    ("https://a.example/p?a=1&utm_b=2", "https://a.example/p?a=1"),
    # trailing slash before a kept query
    ("https://a.example/p/?a=1", "https://a.example/p?a=1"),
    # fragment strips before anything else ('#' terminates utm values)
    ("https://a.example/p?utm_a=1#f", "https://a.example/p"),
    # everything at once
    ("HTTPS://A.EXAMPLE:443/p/?utm_a=1&b=2#f", "https://a.example/p?b=2"),
    # non-urls pass through (minus trailing slash; no scheme to case)
    ("not a url", "not a url"),
    ("relative/path/", "relative/path"),
])
def test_rules(raw, want):
    assert canon1(raw) == want


def test_null_passthrough():
    out = urlnorm.canonicalize(pa.array([None, "https://a.example/"],
                                        pa.string()))
    assert out.to_pylist() == [None, "https://a.example"]


def test_duckdb_parity_on_hostile_corpus():
    """The SQL mirror is the same automaton: byte-equal output on a
    corpus covering every rule interaction."""
    urls = [
        "https://h5.example/p/3?utm_source=f&utm_campaign=c#s",
        "HTTPS://H5.EXAMPLE:443/p/3", "https://h5.example/p/3/",
        "https://h5.example/p/3?a=1&utm_b=2&c=3",
        "http://x.org:80/", "http://x.org:443/", "https://x.org:80/",
        "ftp://Mixed.Case.Host/File.TXT",
        "https://a.example/p//?utm_a=#x", "not a url/", None, "",
        "https://a.example/p?utm_=1&utm_=2&utm_=3",
    ]
    got = urlnorm.canonicalize(pa.array(urls, pa.string())).to_pylist()
    con = duckdb.connect()
    want = [r[0] for r in con.execute(
        f"SELECT {urlnorm.sql_canonical('u')} "
        f"FROM (SELECT unnest($u::VARCHAR[]) AS u)", {"u": urls}).fetchall()]
    assert got == want


def test_canonicalize_is_idempotent():
    """THE normalizer property: canonicalize ∘ canonicalize ==
    canonicalize — a second pass must find nothing left to strip.
    Hypothesis drives url-shaped and garbage inputs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scheme = st.sampled_from(["http", "HTTPS", "ftp", "ExOtIc"])
    host = st.from_regex(r"[A-Za-z0-9.-]{1,20}", fullmatch=True)
    port = st.sampled_from(["", ":80", ":443", ":8080"])
    path = st.from_regex(r"(/[A-Za-z0-9._~%-]{0,8}){0,4}/{0,3}",
                         fullmatch=True)
    query = st.sampled_from(
        ["", "?a=1", "?utm_source=x", "?utm_a=1&b=2", "?a=1&utm_b=2&c=3",
         "?utm_a=1&utm_b=2", "?utm_=&utm_="])
    frag = st.sampled_from(["", "#f", "#a#b"])
    urlish = st.builds(lambda s, h, po, pa_, q, f: f"{s}://{h}{po}{pa_}{q}{f}",
                       scheme, host, port, path, query, frag)
    anything = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126),
        max_size=40)

    @settings(max_examples=300, deadline=None)
    @given(st.one_of(urlish, anything))
    def check(u):
        once = canon1(u)
        assert canon1(once) == once, (u, once, canon1(once))

    check()
