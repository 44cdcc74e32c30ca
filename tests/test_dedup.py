"""Dedup primitives: MinHash math, LSH banding recall, SimHash,
hyperplane LSH, exact jaccard edge cases."""

import random

import numpy as np
import pytest

from docling_pdf_ray.functions import dedup as dd

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _text(rng, n):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def test_minhash_modular_arithmetic_exact():
    rng = random.Random(1)
    x = np.array([rng.randrange(0, dd._MERSENNE) for _ in range(40)], dtype=np.uint64)
    m = np.uint64(dd._MERSENNE)
    lo = x & np.uint64((1 << 30) - 1)
    hi = x >> np.uint64(30)
    a = dd._A % m
    a_lo = (a & np.uint64((1 << 30) - 1))[:, None]
    a_hi = (a >> np.uint64(30))[:, None]
    t0 = (a_lo * lo[None, :]) % m
    t1 = (a_hi * lo[None, :] + a_lo * hi[None, :]) % m
    t2 = (a_hi * hi[None, :]) % m
    v = (t0 + dd._shl_mod(t1, 30) + dd._shl_mod(t2, 60)) % m
    v = (v + (dd._B % m)[:, None]) % m
    expect = np.array([[(int(dd._A[i]) * int(xx) + int(dd._B[i])) % dd._MERSENNE
                        for xx in x] for i in range(dd.NUM_PERM)], dtype=np.uint64)
    assert (v == expect).all()


def test_minhash_estimates_jaccard():
    rng = random.Random(7)
    base = _text(rng, 500)
    near = " ".join(base.split()[:-25])
    far = _text(rng, 500)
    j_near = dd.ngram_jaccard(base, near)
    j_far = dd.ngram_jaccard(base, far)
    e_near = dd.minhash_estimate(dd.minhash_signature(base), dd.minhash_signature(near))
    e_far = dd.minhash_estimate(dd.minhash_signature(base), dd.minhash_signature(far))
    assert abs(e_near - j_near) < 0.15
    assert abs(e_far - j_far) < 0.15
    assert e_near > 0.7 > e_far


def test_lsh_banding_recall_and_precision():
    rng = random.Random(11)
    hits = 0
    for _ in range(20):
        base = _text(rng, 400)
        near = " ".join(base.split()[10:])     # J ≈ 0.95
        b1 = set(dd.band_hashes(dd.minhash_signature(base)))
        b2 = set(dd.band_hashes(dd.minhash_signature(near)))
        hits += bool(b1 & b2)
    assert hits >= 19                           # near-certain recall at J≈0.95
    misses = 0
    for _ in range(20):
        a = _text(rng, 200)
        b = _text(rng, 200)
        if dd.ngram_jaccard(a, b) < 0.2:
            sa = set(dd.band_hashes(dd.minhash_signature(a)))
            sb = set(dd.band_hashes(dd.minhash_signature(b)))
            misses += not (sa & sb)
    assert misses >= 18                         # low false-candidate rate


def test_jaccard_edges():
    assert dd.ngram_jaccard("", "") == 1.0
    assert dd.ngram_jaccard("a b c", "") == 0.0
    assert dd.ngram_jaccard("a b c d", "a b c d") == 1.0
    assert dd.word_shingles("a b", 3) == {"a b"}
    assert dd.word_shingles("", 3) == set()


def test_simhash_properties():
    rng = random.Random(3)
    base = _text(rng, 400)
    near = " ".join(base.split()[:-8])
    far = _text(rng, 400)
    fp = dd.simhash64(base)
    assert 0 <= fp < (1 << 64)
    assert dd.simhash64(base) == fp            # deterministic
    assert dd.hamming64(fp, dd.simhash64(near)) <= 6
    assert dd.hamming64(fp, dd.simhash64(far)) > dd.hamming64(fp, dd.simhash64(near))
    assert dd.simhash64("") == 0


def test_simhash_band_pigeonhole():
    # hamming < 4 ⇒ at least one of 4 bands identical
    rng = random.Random(5)
    for _ in range(30):
        fp = rng.randrange(0, 1 << 64)
        flipped = fp
        for bit in rng.sample(range(64), 3):
            flipped ^= 1 << bit
        assert set(dd.simhash_bands(fp)) & set(dd.simhash_bands(flipped))


def test_hyperplane_signs_deterministic_and_bucketing():
    rng = np.random.RandomState(0)
    m = rng.standard_normal((100, 64))
    b1 = dd.hyperplane_signs(m, seed=42)
    b2 = dd.hyperplane_signs(m, seed=42)
    assert (b1 == b2).all()
    # identical vectors share buckets
    m2 = np.vstack([m, m[:5]])
    b3 = dd.hyperplane_signs(m2, seed=42)
    assert (b3[100:] == b3[:5]).all()


def test_rolling_fingerprint_stable():
    from docling_pdf_ray.functions.text import rolling_fingerprint

    t = "one two three four five six seven eight nine ten eleven twelve"
    assert rolling_fingerprint(t) == rolling_fingerprint(t)
    # robustness property: a min-window fingerprint survives a small
    # trailing append (that is the point of winnowing)…
    assert rolling_fingerprint(t) == rolling_fingerprint(t + " extra")
    # …but a different document fingerprints differently
    other = "totally different words that share nothing with the original text"
    assert rolling_fingerprint(t) != rolling_fingerprint(other)
    assert rolling_fingerprint("") == 0
    assert rolling_fingerprint("short") != 0


def test_lsh_topk_finds_true_near_neighbors(ray_session):
    """LSH's job is finding NEAR neighbors. The sf corpus has none
    (max cosine ≈ 0.51 — verified at survey time), so recall is
    measured on planted noisy copies of the queries (cos ≈ 0.99),
    which LSH must recover near-perfectly; global top-k recall over
    the quasi-orthogonal background is reported loose (it is low for
    ANY LSH at these similarities — use brute_force_topk there)."""
    import ray
    import ray.data as rd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.functions.ann import brute_force_topk, lsh_topk

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = t.slice(0, 8)
    qids = qt.column("vec_id").to_pylist()
    qmat = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
    ref = ray.put((qids, qmat))

    # plant a noisy copy of each query at vec_id+5000 (cos ≈ 0.99+)
    rng = np.random.RandomState(3)
    noisy = qmat + 0.02 * rng.standard_normal(qmat.shape) * \
        np.linalg.norm(qmat, axis=1, keepdims=True) / qmat.shape[1] ** 0.5
    base_ids = t.column("vec_id").to_pylist() + [q + 5000 for q in qids]
    base_emb = t.column("embedding").to_pylist() + [r.astype(np.float32).tolist()
                                                    for r in noisy]
    corpus = pa.table({"vec_id": pa.array(base_ids, pa.int64()),
                       "embedding": pa.array(base_emb, pa.list_(pa.float32()))})

    approx = lsh_topk(rd.from_arrow(corpus), ref, k=5, n_planes=8)
    found = 0
    for q in qids:
        hits = approx[approx.query_id == q]
        if (q + 5000) in set(hits.vec_id):
            found += 1
    assert found >= 7, f"planted near-neighbor recall {found}/8"

    # determinism
    approx2 = lsh_topk(rd.from_arrow(corpus), ref, k=5, n_planes=8)
    assert approx.equals(approx2)

    # exact baseline agrees the planted copy is rank 1
    exact = brute_force_topk(rd.from_arrow(corpus), ref, k=1)
    for q in qids:
        assert exact[exact.query_id == q].vec_id.iloc[0] == q + 5000



def test_hot_bucket_pairs_star_links_oversized_buckets():
    """Mass duplication (a 150-copy boilerplate page) must star-link to
    the min doc_id, never be silently dropped — shared by the minhash
    and simhash blocking paths."""
    import pandas as pd

    from docling_pdf_ray.queries import _hot_bucket_pairs

    g = pd.DataFrame({"band_key": [7] * 150, "doc_id": list(range(150))})
    pairs = _hot_bucket_pairs(g, ["band_key"])
    assert pairs == [(0, b) for b in range(1, 150)]

    small = pd.DataFrame({"band_key": [7, 7, 7, 9], "doc_id": [3, 1, 2, 5]})
    assert _hot_bucket_pairs(small, ["band_key"]) == [(1, 2), (1, 3), (2, 3)]

    # the fingerprint family's raised bound (FP_STAR_LIMIT): full
    # pairing up to the bound, star-link strictly above it
    from docling_pdf_ray.queries import FP_STAR_LIMIT

    n = FP_STAR_LIMIT + 1
    big = pd.DataFrame({"band_key": [3] * n, "doc_id": list(range(n))})
    starred = _hot_bucket_pairs(big, ["band_key"], star_limit=FP_STAR_LIMIT)
    assert starred == [(0, b) for b in range(1, n)]
    at_bound = pd.DataFrame({"band_key": [3] * FP_STAR_LIMIT,
                             "doc_id": list(range(FP_STAR_LIMIT))})
    assert len(_hot_bucket_pairs(at_bound, ["band_key"],
                                 star_limit=FP_STAR_LIMIT)) \
        == FP_STAR_LIMIT * (FP_STAR_LIMIT - 1) // 2


def test_near_dup_queries_mass_duplicate_corpus(ray_session, tmp_path):
    """End-to-end: a corpus that is one page duplicated 150× must come
    back fully linked (149 star pairs) from BOTH near-dup operators —
    the round-1 simhash implementation dropped >100-member buckets."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.queries import q_minhash_near_dups, q_simhash_near_dups

    text = ("the same boilerplate navigation footer page text repeated "
            "verbatim across the whole crawl " * 4)
    # doc_ids chosen to avoid the %25 plant (which would add near-copies)
    ids = [i * 25 + 1 for i in range(150)]
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "text": pa.array([text] * 150, pa.string())}),
                   tmp_path / "documents.parquet")

    mh = q_minhash_near_dups(str(tmp_path))
    assert len(mh) == 149
    assert set(mh["doc_id_a"]) == {ids[0]}
    assert (mh["jacc_num"] == mh["jacc_den"]).all()   # exact copies: J = 1

    # simhash (r5 s5): 150 < FP_STAR_LIMIT, so the fp family
    # full-pairs — the COMPLETE C(150,2) pair list its exact SQL
    # oracle enumerates (the old 100-doc guard truncated real pairs
    # at sf0.1); the star guard itself is pinned separately below
    sh = q_simhash_near_dups(str(tmp_path))
    assert len(sh) == 150 * 149 // 2
    assert (sh["hamming"] == 0).all()

    # the dedup decision: one component, every member → min doc_id
    from docling_pdf_ray.queries import q_minhash_dedup_groups

    groups = q_minhash_dedup_groups(str(tmp_path))
    assert len(groups) == 150
    assert set(groups["rep_id"]) == {ids[0]}
    assert groups["doc_id"].tolist() == ids


def test_simhash_near_dups_regression_sf0001(ray_session):
    """Pin the distributed simhash blocking output (rows-only query):
    deterministic, int64 schema, all pairs within the hamming budget,
    and the known pair count on the fixed sf0.001 corpus."""
    from docling_pdf_ray.queries import q_simhash_near_dups

    out = q_simhash_near_dups("/root/testdata/sf0.001")
    assert list(out.columns) == ["doc_id_a", "doc_id_b", "hamming"]
    assert [str(t) for t in out.dtypes] == ["int64", "int64", "int64"]
    # 31 pairs with the r3 md5-prefix word hash (independently
    # confirmed by SQL_SIMHASH_NEAR_DUPS in test_query_matches_duckdb)
    assert len(out) == 31
    assert (out["hamming"] <= 3).all()
    assert (out["doc_id_a"] < out["doc_id_b"]).all()


def test_ivf_topk_recall_and_determinism(ray_session):
    """IVF-Flat scale path: planted near-copies (cos ≈ 0.99) quantize
    to the same/nearby cells as their queries, so with a reasonable
    n_probe they must be recovered; output is deterministic (seeded
    k-means, fixed sample)."""
    import ray
    import ray.data as rd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.functions.ann import ivf_topk

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    qt = t.slice(0, 8)
    qids = qt.column("vec_id").to_pylist()
    qmat = np.asarray(qt.column("embedding").to_pylist(), dtype=np.float64)
    ref = ray.put((qids, qmat))

    rng = np.random.RandomState(3)
    noisy = qmat + 0.02 * rng.standard_normal(qmat.shape) * \
        np.linalg.norm(qmat, axis=1, keepdims=True) / qmat.shape[1] ** 0.5
    base_ids = t.column("vec_id").to_pylist() + [q + 5000 for q in qids]
    base_emb = t.column("embedding").to_pylist() + [r.astype(np.float32).tolist()
                                                    for r in noisy]
    corpus = pa.table({"vec_id": pa.array(base_ids, pa.int64()),
                       "embedding": pa.array(base_emb, pa.list_(pa.float32()))})

    approx = ivf_topk(rd.from_arrow(corpus), ref, k=5,
                      n_centroids=16, n_probe=4)
    found = sum(1 for q in qids
                if (q + 5000) in set(approx[approx.query_id == q].vec_id))
    assert found >= 7, f"planted near-neighbor recall {found}/8"

    approx2 = ivf_topk(rd.from_arrow(corpus), ref, k=5,
                       n_centroids=16, n_probe=4)
    import pandas as pd
    pd.testing.assert_frame_equal(approx.reset_index(drop=True),
                                  approx2.reset_index(drop=True))

    # full-probe IVF degenerates to exact: every cell probed
    from docling_pdf_ray.functions.ann import brute_force_topk
    exact = brute_force_topk(rd.from_arrow(corpus), ref, k=5)
    full = ivf_topk(rd.from_arrow(corpus), ref, k=5,
                    n_centroids=8, n_probe=8)
    pd.testing.assert_frame_equal(full.reset_index(drop=True),
                                  exact.reset_index(drop=True))


def test_minhash_signatures_batch_identical_to_per_doc():
    """The batched shingle-hash-cached variant must be byte-identical
    to per-doc minhash_signature (None for empty shingle sets)."""
    rng = random.Random(7)
    texts = [_text(rng, rng.randint(0, 60)) for _ in range(40)] + ["", None]
    batched = dd.minhash_signatures(texts)
    for t, sig in zip(texts, batched):
        sh = dd.word_shingles(t or "")
        if not sh:
            assert sig is None
        else:
            assert np.array_equal(sig, dd.minhash_signature(t))


def test_shingle_pairs_vec_matches_word_shingles():
    """The vectorized batch shingler must reproduce word_shingles()
    per-row DISTINCT semantics on hostile inputs: nulls, empties,
    whitespace-only, 1..k-1-word docs, repeated shingles, unicode
    whitespace (which the ASCII WS_PATTERN must NOT split on)."""
    import pyarrow as pa

    texts = ["a b c d e", "x", "", None, "   ", "\t\n p \x0b q \r",
             "a b c a b c a b c", "one two", "nb sp word tail more",
             "w " * 200]
    for k in (2, 3, 5):
        rows, sh = dd.shingle_pairs_vec(pa.array(texts, pa.string()), k)
        got = {}
        for r, s in zip(rows, sh):
            got.setdefault(int(r), []).append(s)
        for i, t in enumerate(texts):
            want = dd.word_shingles(t, k) if t is not None else set()
            assert sorted(got.get(i, [])) == sorted(want), (k, i)
            # distinct per row: no duplicates emitted
            assert len(got.get(i, [])) == len(want)


def test_ngram_stream_vec_matches_naive():
    """The multiplicity n-gram stream must match a per-row reference
    on hostile inputs: nulls, empties, whitespace-only, <k-word rows
    (emit NOTHING — unlike shingle_pairs_vec's whole-join), repeated
    n-grams kept with multiplicity, stream order preserved."""
    import pyarrow as pa

    texts = ["a b c d e", "x", "", None, "   ", "\t\n p \x0b q \r r",
             "a b c a b c a b c", "one two", "w " * 200]
    for k in (2, 3, 5):
        got = list(dd.ngram_stream_vec(pa.array(texts, pa.string()), k))
        want = []
        for t in texts:
            if not t:
                continue
            ws = [w for w in dd._WS_RE.split(t) if w]
            want.extend(" ".join(ws[i:i + k])
                        for i in range(len(ws) - k + 1))
        assert got == want, k


def test_best_per_key_packing_is_order_independent_argmax():
    """The (n_chars, -doc_id) int64 packing used by title_dedup_best:
    max() over ANY order must pick (max n_chars, then min doc_id)."""
    import itertools

    SHIFT, BASE = 1 << 41, 1 << 40
    groups = [
        [(100, 5), (100, 3), (90, 1)],      # tie on n_chars → min doc_id
        [(0, 0), (0, 1)],                    # zeros
        [(2**22 - 1, 2**40 - 1), (1, 0)],    # boundary values
    ]
    for g in groups:
        want = max(g, key=lambda p: (p[0], -p[1]))
        for perm in itertools.permutations(g):
            v = max(n * SHIFT + (BASE - d) for n, d in perm)
            assert (v // SHIFT, BASE - (v % SHIFT)) == want


def _winnow_naive(texts, k, w):
    """Per-doc reference winnowing: rightmost-min per window, distinct
    selected positions, stream order."""
    import hashlib

    out = {}
    for i, t in enumerate(texts):
        if not t:
            continue
        ws = [x for x in dd._WS_RE.split(t) if x]
        grams = [" ".join(ws[j:j + k]) for j in range(len(ws) - k + 1)]
        hs = [int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
              for g in grams]
        sel = set()
        for j in range(len(hs) - w + 1):
            win = hs[j:j + w]
            m = min(win)
            sel.add(j + max(p for p in range(w) if win[p] == m))
        if sel:
            out[i] = [hs[p] for p in sorted(sel)]
    return out


def test_winnow_select_matches_naive_reference():
    """Vectorized cross-doc winnowing == per-doc reference on hostile
    inputs: repeated grams (hash ties -> rightmost wins), docs shorter
    than k or w, nulls, single-window docs."""
    import pyarrow as pa

    k, w = 3, 4
    texts = ["a b c d e f g h i j",
             "x y z " * 30,                  # heavy repetition: many ties
             "p q r",                        # exactly one gram: no window
             "p q r s t u",                  # exactly one window
             None, "", "one two",
             " ".join(f"t{i%7}" for i in range(50))]
    grams, parents = dd.ngram_stream_vec(
        pa.array(texts, pa.string()), k, return_parents=True)
    h = dd.md5_u64(grams)
    mask = dd.winnow_select(h, parents, w)
    got = {}
    for p, fp in zip(parents[mask], h[mask]):
        got.setdefault(int(p), []).append(int(fp))
    assert got == _winnow_naive(texts, k, w)


def test_winnow_guarantees_density_and_shared_passage():
    """The two SIGMOD-2003 winnowing guarantees: (1) within a doc, the
    gap between consecutive selected gram positions is at most w
    (every window selects something); (2) two docs sharing a passage
    of >= w+k-1 words share at least one fingerprint."""
    import numpy as np
    import pyarrow as pa

    k, w = 3, 4
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(500)]
    passage = " ".join(vocab[i] for i in rng.randint(0, 500, w + k - 1))
    a = " ".join(vocab[i] for i in rng.randint(0, 500, 80)) + " " + passage
    b = passage + " " + " ".join(vocab[i] for i in rng.randint(0, 500, 80))
    grams, parents = dd.ngram_stream_vec(
        pa.array([a, b], pa.string()), k, return_parents=True)
    h = dd.md5_u64(grams)
    mask = dd.winnow_select(h, parents, w)
    pos = np.arange(len(h))
    for doc in (0, 1):
        sel = pos[mask & (parents == doc)] - pos[parents == doc][0]
        assert sel[0] < w and np.all(np.diff(sel) <= w)
    fps_a = set(h[mask & (parents == 0)])
    fps_b = set(h[mask & (parents == 1)])
    assert fps_a & fps_b


def test_passage_dup_pairs_catches_planted_and_respects_threshold(ray_session):
    """passage_dup_pairs on sf0.001: every planted near-copy
    (original minus last 5 words, sharing nearly all passages) must
    pair with its original with a high shared-fingerprint count, and
    every reported pair must satisfy the >= PASSAGE_MIN_SHARED
    threshold."""
    from docling_pdf_ray import queries as q

    out = q.q_passage_dup_pairs("/root/testdata/sf0.001")
    assert (out["shared_fps"] >= q.PASSAGE_MIN_SHARED).all()
    got_pairs = set(zip(out["doc_id_a"], out["doc_id_b"]))
    import duckdb
    planted = duckdb.sql(
        "SELECT doc_id FROM read_parquet('/root/testdata/sf0.001/documents.parquet') "
        f"WHERE doc_id % {q.PLANT_EVERY} = 0 AND text IS NOT NULL "
        "AND len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\r\\f\\v]+'), w -> w <> '')) >= 40"
    ).df()["doc_id"]
    assert len(planted) > 0
    for d in planted:
        assert (int(d), int(d) + q.PLANT_OFFSET) in got_pairs, d


def test_incremental_dedup_exact_under_degenerate_bloom(ray_session):
    """The Bloom-anti prefilter is a traffic optimization, never a
    correctness input: a 64-bit bitmap (nearly every probe a false
    positive -> almost everything takes the exact-verify co-shuffle)
    must produce the IDENTICAL per-lang audit as the full-size
    bitmap."""
    import pandas as pd

    from docling_pdf_ray import queries as q

    full = q.q_incremental_dedup("/root/testdata/sf0.001")
    tiny = q.q_incremental_dedup("/root/testdata/sf0.001", bloom_bits=64)
    pd.testing.assert_frame_equal(full, tiny)
    assert (full["n_dup"] > 0).any() and (full["n_new"] > 0).all()
