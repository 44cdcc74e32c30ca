"""Property-based tests (hypothesis): totality and invariants that
must hold for ARBITRARY inputs, not just fixture classes."""

import hypothesis.strategies as st
from hypothesis import HealthCheck, given, settings

from docling_pdf_ray import oracle
from docling_pdf_ray.config import DEFAULT_CONFIG as CFG
from docling_pdf_ray.functions import dedup as dd
from docling_pdf_ray.htmlx import extract_main_content
from docling_pdf_ray.schema import EXTRACTED_SCHEMA, result_to_arrow

FAST = settings(max_examples=60, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])


@FAST
@given(st.binary(max_size=2000))
def test_extract_row_total_on_arbitrary_bytes(payload):
    """Any bytes → exactly one well-formed row, never an exception."""
    r = oracle.extract_row("u", payload, CFG)
    assert set(r) == set(EXTRACTED_SCHEMA.names)
    assert isinstance(r["extraction_successful"], bool)
    if r["extraction_successful"]:
        assert r["full_text"] is not None
        assert r["word_count"] == len(r["full_text"].split()) or \
            r["extraction_method"] == "fallback"  # fallback counts unstripped
    else:
        assert r["error"]
    # arrow-buildable
    result_to_arrow([r])


@FAST
@given(st.binary(max_size=2000).map(lambda b: b"%PDF-1.4\n" + b))
def test_pdf_branch_total(payload):
    r = oracle.extract_row("u", payload, CFG)
    assert set(r) == set(EXTRACTED_SCHEMA.names)
    result_to_arrow([r])


@FAST
@given(st.text(max_size=2000))
def test_html_extractor_total_on_arbitrary_text(text):
    ex = extract_main_content(("<html><body>" + text).encode("utf-8", "replace"), CFG)
    assert isinstance(ex.full_text, str)
    for s in ex.spans:
        assert ex.full_text[s["start"]:s["end"]]


@FAST
@given(st.lists(st.text(alphabet=st.characters(blacklist_characters="\n"),
                        max_size=30), max_size=200),
       st.integers(min_value=1, max_value=60))
def test_paginate_reassembles_exactly(lines, per_page):
    text = "\n".join(lines)
    pages = oracle.paginate(text, per_page)
    assert "\n".join(p["content"] for p in pages) == text
    assert [p["page_number"] for p in pages] == list(range(1, len(pages) + 1))
    assert all(p["line_count"] <= per_page for p in pages)
    assert sum(p["line_count"] for p in pages) == len(text.split("\n"))


@FAST
@given(st.text(max_size=500), st.text(max_size=500))
def test_jaccard_bounds_and_symmetry(a, b):
    j = dd.ngram_jaccard(a, b)
    assert 0.0 <= j <= 1.0
    assert j == dd.ngram_jaccard(b, a)
    assert dd.ngram_jaccard(a, a) == 1.0


@FAST
@given(st.text(max_size=300))
def test_minhash_signature_shape_and_determinism(text):
    s1 = dd.minhash_signature(text)
    s2 = dd.minhash_signature(text)
    assert s1.shape == (dd.NUM_PERM,)
    assert (s1 == s2).all()
    assert dd.minhash_estimate(s1, s2) == 1.0


@FAST
@given(st.text(max_size=300))
def test_simhash_range(text):
    fp = dd.simhash64(text)
    assert 0 <= fp < (1 << 64)
    assert len(dd.simhash_bands(fp)) == 4


@FAST
@given(st.text(max_size=400))
def test_language_detect_total(text):
    lang = __import__("docling_pdf_ray.functions.text", fromlist=["detect_language"]) \
        .detect_language(text)
    assert lang in {"en", "fr", "es", "de", "zh", "unknown"}


@FAST
@given(st.text(max_size=300), st.text(max_size=300))
def test_jaccard_counts_consistent_with_float_jaccard(a, b):
    """(num, den) integer Jaccard must agree with the float kernel and
    obey set-theoretic bounds for arbitrary unicode text."""
    num, den = dd.jaccard_counts(a, b)
    assert 0 <= num <= den
    j = dd.ngram_jaccard(a, b)
    if den == 0:
        assert j == 1.0        # both shingle sets empty
    else:
        assert j == num / den
    # symmetry
    assert dd.jaccard_counts(b, a) == (num, den)


@FAST
@given(st.lists(st.one_of(st.integers(min_value=-2**62, max_value=2**62),
                          st.none()), max_size=50),
       st.integers(min_value=1, max_value=64))
def test_join_bucket_of_total_and_deterministic(keys, n_buckets):
    """Bucket assignment: total (nulls → 0), in range, deterministic,
    and equal-keys → equal buckets (the join correctness invariant)."""
    import pyarrow as pa

    from docling_pdf_ray.functions.joins import _bucket_of

    col = pa.chunked_array([pa.array(keys, pa.int64())])
    b1 = _bucket_of(col, n_buckets).to_pylist()
    b2 = _bucket_of(col, n_buckets).to_pylist()
    assert b1 == b2
    assert all(0 <= x < n_buckets for x in b1)
    seen = {}
    for k, x in zip(keys, b1):
        if k is None:
            assert x == 0
        else:
            assert seen.setdefault(k, x) == x


@FAST
@given(st.lists(st.integers(min_value=0, max_value=30), min_size=0,
                max_size=120))
def test_hot_bucket_pairs_covers_all_duplicated_keys(key_ids):
    """Every doc sharing a key with another doc appears in >=1 pair;
    no pair links docs that share no key; a < b always."""
    import pandas as pd

    from docling_pdf_ray.queries import _hot_bucket_pairs

    g = pd.DataFrame({"band_key": key_ids,
                      "doc_id": list(range(len(key_ids)))})
    pairs = _hot_bucket_pairs(g, ["band_key"])
    by_key = {}
    for k, d in zip(key_ids, g["doc_id"]):
        by_key.setdefault(k, set()).add(d)
    linked = set()
    for a, b in pairs:
        assert a < b
        assert any({a, b} <= m for m in by_key.values())
        linked.update((a, b))
    for m in by_key.values():
        if len(m) > 1:
            assert m <= linked


@settings(max_examples=300, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.text(alphabet="abcx", max_size=8),
       st.text(alphabet="abcx", max_size=8))
def test_edit_distance_le1_matches_dp_and_blocking_complete(a, b):
    """The banded check equals full DP Levenshtein on the <=1 domain
    (None above it), and the SymSpell blocking guarantee holds: any
    pair at distance <=1 shares a deletion variant (recall 1)."""
    def dp(x, y):
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i]
            for j, cy in enumerate(y, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cx != cy)))
            prev = cur
        return prev[-1]

    d = dp(a, b)
    assert dd.edit_distance_le1(a, b) == (d if d <= 1 else None)
    if d <= 1:
        assert dd.deletion_variants(a) & dd.deletion_variants(b)


@FAST
@given(st.lists(st.tuples(st.integers(0, 50), st.integers(1, 30)),
                min_size=1, max_size=40),
       st.integers(2, 12))
def test_range_enum_cuts_match_brute_force(hist, p):
    """_range_enum_cuts (curriculum_order's partition/offset math) vs
    brute force for ARBITRARY histograms incl. all-ties and heavy
    skew: every partition's offset must equal the count of rows
    strictly below its lower bound, and offsets+per-partition counts
    must reconstruct 0..N-1 exactly."""
    import numpy as np

    from docling_pdf_ray.queries import _range_enum_cuts

    agg: dict[int, int] = {}
    for v, c in hist:
        agg[v] = agg.get(v, 0) + c
    xs = np.array(sorted(agg), dtype=np.int64)
    cum = np.array([agg[v] for v in xs], dtype=np.int64).cumsum()
    values = np.repeat(xs, np.diff(np.concatenate([[0], cum])))
    bounds, offsets = _range_enum_cuts(xs, cum, p)
    part = np.searchsorted(bounds, values, side="right")
    # offsets exact: #rows strictly below each partition's range
    for i in range(p):
        in_p = part == i
        assert offsets[i] == int((part < i).sum())
        # rows inside a partition occupy a contiguous global range:
        # offset + partition size = count of rows in partitions ≤ i,
        # so offset[part] + rank-within-partition enumerates 0..N-1
        if in_p.any():
            assert offsets[i] + int(in_p.sum()) == int((part <= i).sum())


@FAST
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 120)),
                min_size=1, max_size=60),
       st.integers(1, 40))
def test_merge_fixed_intervals_matches_set_union(rows, length):
    """_merge_fixed_intervals (substring_dup_apply's island merge) vs
    a brute-force per-doc char-set union: per-doc island count and
    removed-char totals must match exactly, for arbitrary (doc, pos)
    multisets — duplicates, touching spans, single anchors."""
    import numpy as np

    from docling_pdf_ray.queries import _merge_fixed_intervals

    doc = np.array([d for d, _ in rows], dtype=np.int64)
    pos = np.array([p for _, p in rows], dtype=np.int64)
    idoc, starts, ends = _merge_fixed_intervals(doc, pos, length)
    assert (ends - starts > 0).all()
    got = {}
    for d, s, e in zip(idoc, starts, ends):
        n, tot = got.get(int(d), (0, 0))
        got[int(d)] = (n + 1, tot + int(e - s))
    want = {}
    for d in set(doc.tolist()):
        cover = set()
        for p in pos[doc == d]:
            cover.update(range(int(p), int(p) + length))
        # islands = maximal runs of consecutive covered chars, PLUS a
        # break between touching-but-disjoint spans never happens (a
        # gap of exactly `length` coalesces) — the covered-set union
        # IS the contract
        cs = sorted(cover)
        n_isl = 1 + sum(1 for a, b in zip(cs, cs[1:]) if b - a > 1)
        want[d] = (n_isl, len(cover))
    assert got == want
