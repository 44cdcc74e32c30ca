"""URL canonicalization — the crawl-frontier / web-dedup normalizer.

Every large crawl sees the same page under many spellings: tracking
query params (``utm_*``), uppercase scheme/host, explicit default
ports, trailing slashes, fragments. Canonicalizing BEFORE content
dedup collapses those spellings so the exact-dedup pass (one narrow
hash shuffle) sees one key per page; the reference engine has no URL
layer at all (it is handed already-fetched payloads, main.py upload
path), so this is part of the beyond-reference web-pipeline surface.

Rules (applied in this order; each is a single RE2 pass, vectorized
via ``pyarrow.compute`` — both pyarrow and DuckDB run RE2, so the SQL
mirror below is the SAME automaton, not a reimplementation):

1. strip the fragment (``#...``),
2. drop ``utm_*`` tracking params (three passes cover interior /
   leading / sole positions — RE2 global replace scans past its own
   replacement, so a single pass cannot catch ``?utm_a=..&utm_b=..``),
3. lowercase ``scheme://host`` (never the path or query),
4. strip an explicit DEFAULT port for the scheme — ``:80`` only on
   ``http://``, ``:443`` only on ``https://`` (ADVICE r4: a
   scheme-blind strip canonicalized ``http://h:443`` and ``http://h``
   — two different origins — to the same key),
5. strip trailing slashes from the path (``/+$`` and ``/+?`` → ``?``).

All classes are explicit ASCII (the RE2-vs-Unicode parity discipline,
CLAUDE.md). Rows that do not look like ``scheme://...`` pass through
steps 1-2 and 5 unchanged by construction of the anchored prefix
regexes (step 3/4 leave them intact because the prefix regex matches
an empty prefix — see ``_PREFIX``: it requires ``://`` so a bare path
never matches and ``rest`` stays the whole string).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://host[:port] — host stops at the first /, ?, or #
_PREFIX = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
_UTM = r"utm_[A-Za-z0-9_]*=[^&#]*"

# (pattern, replacement, first_match_only) — applied in order on the
# whole url string; the prefix/rest split happens after these.
_PRE_RULES = [
    (r"#.*$", "", False),                 # 1. fragment
    (rf"&{_UTM}", "", False),             # 2a. interior/trailing utm
    (rf"\?{_UTM}&", "?", False),          # 2b. leading utm, more follow
    (rf"\?{_UTM}$", "", False),           # 2c. sole utm param
]
_PREFIX_RULES = [
    # 4. scheme-aware default port (applied to the LOWERCASED prefix)
    (r"^(http://[^/?#]*):80$", r"\1", False),
    (r"^(https://[^/?#]*):443$", r"\1", False),
]
_REST_RULES = [
    (r"/+\?", "?", False),                # 5a. trailing slash before query
    (r"/+$", "", False),                  # 5b. trailing slash at end
]


def canonicalize(urls: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized canonical form of a string column of URLs.

    Null in → null out. Pure Arrow kernels — no per-row Python."""
    s = urls
    for pat, rep, first in _PRE_RULES:
        s = pc.replace_substring_regex(
            s, pattern=pat, replacement=rep,
            max_replacements=1 if first else None)
    # split: prefix = scheme://host[:port] (lowercased), rest = the tail
    pre = pc.replace_substring_regex(
        s, pattern=rf"(?s)^({_PREFIX.lstrip('^')}).*$", replacement=r"\1")
    rest = pc.replace_substring_regex(
        s, pattern=_PREFIX, replacement="", max_replacements=1)
    # a non-url row never matches _PREFIX: the (?s)^(...).*$ rewrite
    # leaves it whole in `pre` AND in `rest`; blank `pre` there so the
    # join does not double it
    has_scheme = pc.match_substring_regex(s, _PREFIX)
    pre = pc.if_else(has_scheme, pre, pa.scalar("", pa.string()))
    pre = pc.utf8_lower(pre)
    for pat, rep, _ in _PREFIX_RULES:
        pre = pc.replace_substring_regex(pre, pattern=pat, replacement=rep)
    for pat, rep, _ in _REST_RULES:
        rest = pc.replace_substring_regex(rest, pattern=pat, replacement=rep)
    return pc.binary_join_element_wise(pre, rest, "")


def sql_canonical(expr: str) -> str:
    """DuckDB expression computing the identical canonical form of
    ``expr`` — composed from the SAME rule strings as the Arrow path
    (both are RE2), so the two engines cannot drift independently."""
    s = expr
    for pat, rep, first in _PRE_RULES:
        flag = "''" if first else "'g'"
        s = f"regexp_replace({s}, '{pat}', '{rep}', {flag})"
    pre_pat = rf"(?s)^({_PREFIX.lstrip('^')}).*$"
    pre = f"regexp_replace({s}, '{pre_pat}', '\\1')"
    pre = (f"CASE WHEN regexp_matches({s}, '{_PREFIX}') "
           f"THEN {pre} ELSE '' END")
    pre = f"lower({pre})"
    for pat, rep, _ in _PREFIX_RULES:
        pre = f"regexp_replace({pre}, '{pat}', '{rep}', 'g')"
    rest = f"regexp_replace({s}, '{_PREFIX}', '')"
    for pat, rep, _ in _REST_RULES:
        rest = f"regexp_replace({rest}, '{pat}', '{rep}', 'g')"
    return f"({pre} || {rest})"
