"""Driver-style conformance: every queries() entry with an oracle_sql()
entry is executed at sf0.001 and compared against DuckDB (sorted
columns, sorted rows, exact values)."""

import glob

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def registry(ray_session):
    import __ray_entry__

    return __ray_entry__.queries(), __ray_entry__.oracle_sql()


def test_all_oracle_keys_have_queries():
    import __ray_entry__

    q, o = __ray_entry__.queries(), __ray_entry__.oracle_sql()
    assert set(o) <= set(q)


PARITY_NAMES = [
    "extract_method_counts", "doc_stats_by_lang", "doc_token_stats",
    "doc_quality_by_lang", "doc_fingerprints", "dedup_exact",
    "size_histogram", "pricing_summary", "segment_revenue",
    "events_hourly", "user_sessions", "embedding_dup_pairs", "ann_topk",
    "sniff_counts", "order_priority_revenue", "top_orders",
    "distinct_segments", "events_sliding", "region_order_counts",
    "quality_gate_counts", "order_asof_event",
    "order_coverage", "minhash_near_dups", "minhash_dedup_groups",
    "ship_window_counts", "balanced_sample",
    "lang_detect", "embedding_dup_pairs_lsh",
    "top_terms", "chars_quantiles", "top_docs_per_lang",
    "jaccard_pairs_exact", "distinct_tokens", "events_hourly_users",
    "bloom_semi_join", "pii_counts", "customer_order_full",
    "simhash_near_dups", "repetition_stats", "tfidf_top_terms",
    "decontaminate", "title_dedup_best", "vocab_oov_stats",
    "ann_topk_filtered", "stratified_fixed_sample", "running_totals",
    "heavy_hitter_ngrams", "dedup_groups_cc", "winnow_fingerprints",
    "source_lang_rollup", "corpus_split_counts", "doc_cume_dist",
    "passage_dup_pairs", "incremental_dedup",
    "sequence_packing", "domain_cap", "link_pagerank", "range_sort_audit",
    "late_event_counts", "funnel_counts", "label_centroids",
    "term_cooccurrence", "schema_union_stats", "length_outliers",
    "order_asof_next", "view_purchase_conversion",
    "host_links", "extract_audit", "paragraph_dedup",
    "paragraph_dedup_apply", "bigram_coverage", "domain_split_counts",
    "event_gaps", "user_retention", "host_reciprocal", "zipf_slope",
    "local_supplier_volume", "event_transitions", "rolling_user_spend",
    "vocab_overlap", "lang_source_pivot", "length_gini", "table_profile",
    "unigram_entropy", "order_size_histogram", "rollup_counts",
    "source_dup_rate", "vocab_growth", "order_cohorts",
    "length_top_decile", "dup_degree_histogram",
    "source_mixture_weights", "canonical_url_dedup",
    "crawl_snapshot_diff", "ngram_diversity", "length_word_corr",
    "bm25_topk", "mixture_resample", "part_association",
    "pii_spans", "event_dedup_window", "host_two_hop",
    "embedding_quantize_audit", "jsonl_roundtrip_stats",
    "csv_roundtrip_stats", "corpus_build",
    "extract_pages", "training_prep",
    "host_triangles", "lang_doc_digest",
    "knn_graph", "nfc_audit", "near_dup_apply",
    "pii_redact_stats", "bpe_pair_counts",
    "containment_pairs", "fuzzy_title_pairs", "rare_word_score",
    "substring_dup_spans", "hash_classifier_score", "dsir_weights",
    "shard_manifest", "chunk_windows", "blocklist_gate",
    "curriculum_order", "anchor_text_stats", "substring_dup_apply",
    "span_stats", "page_stats",
]


def test_parity_list_covers_every_oracle():
    """Every ORACLE_SQL entry must be in PARITY_NAMES — a registered
    oracle that CI never executes is an unverified 'SQL-checked'
    claim (r4 review: 8 entries had silently fallen out)."""
    from docling_pdf_ray import queries as Q

    missing = set(Q.ORACLE_SQL) - set(PARITY_NAMES)
    assert not missing, sorted(missing)


@pytest.mark.parametrize("name", PARITY_NAMES)
def test_query_matches_duckdb(registry, name):
    queries, oracles = registry
    got = _normalize(_to_pandas(queries[name](SF)))
    want = _normalize(_duck(oracles[name]))
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    # driver-hash parity guard: the driver hashes VALUES, so an int64
    # engine column vs a float64 oracle column (DuckDB sum → HUGEINT →
    # float64 in fetchdf) hash-mismatches even when values are equal —
    # the round-1 failure mode. Numeric columns must agree on
    # integer-vs-float on both sides.
    for c in got.columns:
        a, b = got[c].dtype, want[c].dtype
        if pd.api.types.is_numeric_dtype(a) or pd.api.types.is_numeric_dtype(b):
            assert pd.api.types.is_float_dtype(a) == pd.api.types.is_float_dtype(b), \
                (name, c, a, b)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_rows_only_queries_run(registry):
    queries, oracles = registry
    for name in set(queries) - set(oracles):
        out = _to_pandas(queries[name](SF))
        assert len(out) > 0, name


def test_extract_pages_deterministic(registry):
    queries, _ = registry
    a = _to_pandas(queries["extract_pages"](SF))
    b = _to_pandas(queries["extract_pages"](SF))
    pd.testing.assert_frame_equal(a, b)


def test_curriculum_order_permutation_and_partition_invariance(
        ray_session, monkeypatch):
    """The global enumeration is a bijection onto 0..N-1, monotone
    under (n_chars, doc_id), and IDENTICAL at a degenerate partition
    count (p=3 exercises the [b_{i-1}, b_i) boundary-offset arithmetic
    — a row equal to its partition's lower bound must not be counted
    into the preceding partition's prefix)."""
    import numpy as np
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    out = Q.q_curriculum_order(SF)
    n = len(out)
    assert sorted(out["curriculum_pos"]) == list(range(n))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    m = docs.merge(out, on="doc_id").sort_values(["n_chars", "doc_id"])
    assert (m["curriculum_pos"].to_numpy() == np.arange(n)).all()

    monkeypatch.setattr(Q, "_exchange_blocks", lambda *a, **k: 3)
    monkeypatch.setattr(Q, "SORT_PARTS", 3)
    again = Q.q_curriculum_order(SF)
    pd.testing.assert_frame_equal(out, again)


def test_bucketed_hash_join_string_key_and_outer(ray_session):
    """joins.bucketed_hash_join: string keys, left-outer rows, and the
    disjoint-columns guard."""
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from docling_pdf_ray.functions.joins import bucketed_hash_join

    left = rd.from_arrow(pa.table({"k": ["a", "b", "c", "a"],
                                   "lv": [1, 2, 3, 4]}))
    right = rd.from_arrow(pa.table({"k": ["a", "b", "d"],
                                    "rv": [10, 20, 40]}))
    inner = bucketed_hash_join(left, right, "k", n_buckets=4).to_pandas()
    inner = inner.sort_values(["k", "lv"]).reset_index(drop=True)
    assert inner.to_dict("list") == {
        "k": ["a", "a", "b"], "lv": [1, 4, 2], "rv": [10, 10, 20]}

    outer = bucketed_hash_join(left, right, "k", n_buckets=4,
                               how="left").to_pandas()
    assert len(outer) == 4
    assert outer[outer.k == "c"]["rv"].isna().all()

    with _pytest.raises(ValueError, match="disjoint"):
        bucketed_hash_join(
            rd.from_arrow(pa.table({"k": [1], "x": [1]})),
            rd.from_arrow(pa.table({"k": [1], "x": [2]})), "k")


def test_bucketed_hash_join_right_and_full(ray_session):
    """r3 outer variants: unmatched-right emission, full-outer union,
    SQL null-key semantics (null keys never match but SURVIVE as
    unmatched rows on the kept side), DuckDB agreement, and the
    salt-incompatibility guard."""
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import pytest as _pytest
    import ray.data as rd

    from docling_pdf_ray.functions.joins import bucketed_hash_join

    lt = pa.table({"k": pa.array([1, 2, None, 2], pa.int64()),
                   "lv": pa.array([1, 2, 3, 4], pa.int64())})
    rt = pa.table({"k": pa.array([2, 3, None], pa.int64()),
                   "rv": pa.array([20, 30, 40], pa.int64())})

    for how, sql_how in [("right", "RIGHT"), ("full", "FULL OUTER")]:
        got = bucketed_hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                                 "k", n_buckets=4, how=how).to_pandas()
        con = duckdb.connect()
        con.register("l", lt.to_pandas())
        con.register("r", rt.to_pandas())
        want = con.execute(
            f"SELECT coalesce(l.k, r.k) AS k, lv, rv FROM l "
            f"{sql_how} JOIN r ON l.k = r.k").df()
        # coalesce() collapses the two key columns like the engine's
        # single-key output... EXCEPT null-key rows, where both engines
        # agree the key stays null
        norm = lambda df: df.sort_values(["k", "lv", "rv"], na_position="first") \
            .reset_index(drop=True).astype("float64")
        pd.testing.assert_frame_equal(norm(got), norm(want), check_exact=True)

    full = bucketed_hash_join(rd.from_arrow(lt), rd.from_arrow(rt),
                              "k", n_buckets=4, how="full").to_pandas()
    # 2 matches (lv 2,4 × rv 20) + left-only lv1 + null-key lv3
    # + right-only rv30 + null-key rv40
    assert len(full) == 6
    assert full[full["lv"].isna()]["rv"].dropna().tolist() == [30, 40] or \
        sorted(full[full["lv"].isna()]["rv"].dropna().tolist()) == [30, 40]

    with _pytest.raises(ValueError, match="salt"):
        bucketed_hash_join(rd.from_arrow(lt), rd.from_arrow(rt), "k",
                           how="full", salt={2: 4})


def test_bucketed_asof_join_semantics(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from docling_pdf_ray.functions.joins import bucketed_asof_join

    left = rd.from_arrow(pa.table({
        "k": [1, 1, 2, 3], "lt": [10, 25, 5, 7], "lv": ["a", "b", "c", "d"]}))
    right = rd.from_arrow(pa.table({
        "k": [1, 1, 2], "rt": [8, 20, 9], "rv": [100, 200, 300]}))
    out = bucketed_asof_join(left, right, key="k", ts_left="lt",
                             ts_right="rt", n_buckets=4).to_pandas()
    out = out.sort_values(["k", "lt"]).reset_index(drop=True)
    # k=1,lt=10 → rt=8; k=1,lt=25 → rt=20; k=2,lt=5 → no rt≤5 → null;
    # k=3 → no right rows at all → null
    assert out["rt"].tolist()[0] == 8 and out["rv"].tolist()[0] == 100
    assert out["rt"].tolist()[1] == 20 and out["rv"].tolist()[1] == 200
    assert pd.isna(out["rt"].tolist()[2]) and pd.isna(out["rt"].tolist()[3])
    assert len(out) == 4


def test_bucketed_hash_join_matches_pandas_merge_on_random_tables(ray_session):
    """Randomized oracle: the distributed join must equal a plain
    pandas merge for arbitrary key distributions (dups, misses, skew)."""
    import random

    import pyarrow as pa
    import ray.data as rd

    from docling_pdf_ray.functions.joins import bucketed_hash_join

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        lk = [rng.randrange(0, 12) for _ in range(60)]
        rk = [rng.randrange(0, 12) for _ in range(25)]
        left = pd.DataFrame({"k": lk, "lv": range(60)})
        right = pd.DataFrame({"k": rk, "rv": range(1000, 1025)})
        got = bucketed_hash_join(
            rd.from_arrow(pa.Table.from_pandas(left)),
            rd.from_arrow(pa.Table.from_pandas(right)),
            "k", n_buckets=5).to_pandas()
        want = left.merge(right, on="k", how="inner")
        key = ["k", "lv", "rv"]
        got = got[key].sort_values(key).reset_index(drop=True)
        want = want[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      obj=f'seed-{seed}')


def test_bucketed_range_join_semantics(ray_session):
    """Interval join: inclusive bounds, null key/ts never match,
    per-key cross within the window only."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from docling_pdf_ray.functions.joins import bucketed_range_join

    left = rd.from_arrow(pa.table({
        "k": [1, 1, 2, None], "lt": [10, 50, 10, 10], "lv": ["a", "b", "c", "d"]}))
    right = rd.from_arrow(pa.table({
        "k": [1, 1, 1, 2, 2], "rt": [8, 10, 13, 30, None],
        "rv": [100, 200, 300, 400, 500]}))
    # window: rt in [lt - 2, lt + 3]
    out = bucketed_range_join(left, right, key="k", ts_left="lt",
                              ts_right="rt", lower=-2, upper=3,
                              n_buckets=4).to_pandas()
    got = sorted(zip(out["lv"], out["rv"]))
    # k=1,lt=10 → rt 8,10,13; k=1,lt=50 → none; k=2,lt=10 → none
    # (rt=30 outside, rt=None never matches); null-key left row never matches
    assert got == [("a", 100), ("a", 200), ("a", 300)]
    assert out["lt"].dtype.kind == "i" and out["rv"].dtype.kind == "i"


def test_range_join_skew_salt_and_chunking_identical_output(ray_session):
    """r4 skew defense for the range join: a hostile celebrity key
    (one key carrying most of both sides) must produce IDENTICAL
    output (a) unsalted, (b) salted via the detect_hot_keys plan, and
    (c) with a tiny max_chunk_rows forcing many per-bucket cross-
    product slices — against a plain pandas reference."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from docling_pdf_ray.functions.joins import (bucketed_range_join,
                                                 detect_hot_keys)

    rng = np.random.RandomState(3)
    n_l, n_r = 400, 120
    # key 7 is the celebrity: ~70% of left rows, ~half the right rows
    lk = np.where(rng.rand(n_l) < 0.7, 7, rng.randint(0, 12, n_l))
    rk = np.where(rng.rand(n_r) < 0.5, 7, rng.randint(0, 12, n_r))
    lt = rng.randint(0, 1000, n_l)
    rt = rng.randint(0, 1000, n_r)
    left = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()), "lt": pa.array(lt, pa.int64()),
        "lid": pa.array(np.arange(n_l), pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(rk, pa.int64()), "rt": pa.array(rt, pa.int64()),
        "rid": pa.array(np.arange(n_r), pa.int64())}))

    ldf = pd.DataFrame({"k": lk, "lt": lt, "lid": np.arange(n_l)})
    rdf = pd.DataFrame({"k": rk, "rt": rt, "rid": np.arange(n_r)})
    m = ldf.merge(rdf, on="k")
    want = m[(m["rt"] >= m["lt"] - 25) & (m["rt"] <= m["lt"] + 25)]
    want = want.sort_values(["lid", "rid"]).reset_index(drop=True)

    def run(**kw):
        out = bucketed_range_join(left, right, key="k", ts_left="lt",
                                  ts_right="rt", lower=-25, upper=25,
                                  n_buckets=8, **kw).to_pandas()
        return out[["k", "lt", "lid", "rt", "rid"]].astype("int64") \
            .sort_values(["lid", "rid"]).reset_index(drop=True)

    plain = run()
    assert len(plain) == len(want) > 500
    pd.testing.assert_frame_equal(plain, want[plain.columns],
                                  check_dtype=False)
    hot = detect_hot_keys(left, "k", min_rows=50, n_subbuckets=4)
    assert 7 in hot, "celebrity key must be detected"
    pd.testing.assert_frame_equal(run(salt=hot), plain)
    # chunked cross product: worst case forces ~per-row slices
    pd.testing.assert_frame_equal(run(max_chunk_rows=64), plain)
    pd.testing.assert_frame_equal(run(salt=hot, max_chunk_rows=64), plain)


def test_join_int64_above_2_53_survives_na_padding(ray_session):
    """Regression (advice r2): a left/asof join whose NA-padding used to
    upcast int64 payloads to float64 corrupted values above 2^53
    (snowflake-style ids). _protect_ints keeps them exact via pandas
    nullable Int64."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from docling_pdf_ray.functions.joins import (bucketed_asof_join,
                                                 bucketed_hash_join)

    big = (1 << 53) + 1          # not representable in float64
    big2 = (1 << 60) + 7
    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "lv": pa.array([big, big + 2, big + 4], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rv": pa.array([big2], pa.int64())}))
    out = bucketed_hash_join(left, right, "k", n_buckets=4,
                             how="left").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["lv"].tolist() == [big, big + 2, big + 4]
    assert out["rv"][0] == big2 and pd.isna(out["rv"][1])

    aleft = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "lt": pa.array([10, 3, 10], pa.int64()),
        "lv": pa.array([big, big + 1, big + 2], pa.int64())}))
    aright = rd.from_arrow(pa.table({
        "k": pa.array([1], pa.int64()),
        "rt": pa.array([5], pa.int64()),
        "rv": pa.array([big2], pa.int64())}))
    aout = bucketed_asof_join(aleft, aright, key="k", ts_left="lt",
                              ts_right="rt", n_buckets=4).to_pandas()
    aout = aout.sort_values(["k", "lt"]).reset_index(drop=True)
    assert aout["lv"].tolist() == [big + 1, big, big + 2]
    assert aout["rv"][1] == big2
    assert pd.isna(aout["rv"][0]) and pd.isna(aout["rv"][2])


def test_chars_quantiles_rule_matches_duckdb_on_random_histograms(ray_session):
    """Pins the integer percentile rule (smallest v with 100·cum ≥ p·n)
    to DuckDB's percentile_disc on randomized skewed tables — including
    n values where q·n is an exact integer (the float-rounding corner:
    0.99·100 = 99.00000000000001 in IEEE double)."""
    import os
    import random
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.queries import SQL_CHARS_QUANTILES, q_chars_quantiles

    for seed, n in ((0, 100), (1, 200), (2, 173), (3, 400)):
        rng = random.Random(seed)
        langs = [rng.choice(["aa", "bb", "cc"]) for _ in range(n)]
        # heavy ties: values from a tiny domain so cum boundaries land
        # exactly on the p·n thresholds often
        chars = [rng.choice([10, 20, 20, 30, 1000]) for _ in range(n)]
        with tempfile.TemporaryDirectory(dir="/tmp") as d:
            pq.write_table(pa.table({
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "n_chars": pa.array(chars, pa.int64())}),
                os.path.join(d, "documents.parquet"))
            got = q_chars_quantiles(d)
            con = duckdb.connect()
            con.execute("CREATE VIEW documents AS SELECT * FROM "
                        f"read_parquet('{d}/documents.parquet')")
            want = con.execute(SQL_CHARS_QUANTILES).fetchdf()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=True), (seed, n)


def test_top_terms_df_is_document_frequency(ray_session):
    """A term repeated many times inside one doc counts once (df, not
    tf); case folds; ties break lexicographically."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.queries import q_top_terms

    docs = ["Apple apple APPLE banana", "apple cherry", "banana cherry",
            None, ""]
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string())}),
            os.path.join(d, "documents.parquet"))
        got = q_top_terms(d, k=2)
    assert list(got["term"]) == ["apple", "banana"]      # df 2,2 — lex tiebreak
    assert list(got["df"]) == [2, 2]
    assert got["df"].dtype.kind == "i"


def test_balanced_sample_hash_agrees_with_sql_on_hostile_doc_ids(ray_session):
    """Negative and huge doc_ids: the engine's uint64 wrap used to
    diverge from SQL's signed BIGINT arithmetic (opposite keep/drop at
    doc_id=-1; DuckDB overflow error at doc_id>3.47e9). Both sides now
    reduce mod 2^32 first."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.queries import SQL_BALANCED_SAMPLE, q_balanced_sample

    ids = [-1, -25, -(2**40), 0, 7, 4_000_000_000, 2**62, -(2**62)]
    langs = ["en", "de", "es", "fr", "zh", "en", "de", "zh"]
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs, pa.string())}),
            os.path.join(d, "documents.parquet"))
        got = _to_pandas(q_balanced_sample(d))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        want = con.execute(SQL_BALANCED_SAMPLE).fetchdf()
    got = got.sort_values(["doc_id"]).reset_index(drop=True)
    want = want.sort_values(["doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["doc_id", "lang"]],
                                  want[["doc_id", "lang"]], check_dtype=True)


def test_link_free_corpus_pagerank_and_audit(ray_session):
    """A corpus with NO html-routed docs (every doc_id % 10 > 5) has an
    empty extracted link graph: link_pagerank must return a typed
    empty frame (not KeyError: 'node') and extract_audit must agree
    with its SQL mirror (engine 0s vs SQL NULL-sum was a live
    divergence — both confirmed by review repro, r4)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.queries import (
        SQL_EXTRACT_AUDIT, q_extract_audit, q_link_pagerank)

    ids = [6, 7, 8, 9, 16, 17]          # all PDF/fallback-routed
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        texts = [f"word stream {i}" for i in ids]
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(ids), pa.string()),
            "source": pa.array(["s"] * len(ids), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64())}),
            os.path.join(d, "documents.parquet"))
        pr = _to_pandas(q_link_pagerank(d))
        assert list(pr.columns) == ["node", "r"] and len(pr) == 0
        got = _normalize(_to_pandas(q_extract_audit(d)))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        want = _normalize(con.execute(SQL_EXTRACT_AUDIT).fetchdf())
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


def test_paragraph_dedup_hostile_corpus_matches_duckdb(ray_session):
    """First-occurrence semantics on a corpus built to break it:
    duplicate paragraphs shared across docs in REVERSED id order (the
    global min must win, not encounter order), intra-doc repeats (the
    doc's own earlier copy wins), chunk-boundary sizes (exactly 20/21/
    40 words), null/empty/whitespace-only texts (zero paragraphs —
    absent from the count result, rewritten to '' in apply), NBSP
    inside words (ASCII split must NOT break on it), and a paragraph
    duplicated at different in-doc positions."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.queries import (
        SQL_PARAGRAPH_DEDUP, SQL_PARAGRAPH_DEDUP_APPLY, q_paragraph_dedup,
        q_paragraph_dedup_apply)

    para_a = " ".join(f"a{i}" for i in range(20))
    para_b = " ".join(f"b{i}" for i in range(20))
    texts = [
        para_b + " " + para_a,            # doc 0: two full chunks
        para_a + " tail words here",      # doc 1: a-dup + short tail
        None,                             # doc 2: null
        "",                               # doc 3: empty
        " \t\n ",                         # doc 4: whitespace only
        "solo",                           # doc 5: single word
        para_a + " " + para_a,            # doc 6: intra-doc repeat
        "x y " + para_b,             # doc 7: NBSP word + b-dup
        " ".join(f"c{i}" for i in range(21)),  # doc 8: 21 words
    ]
    # reversed ids: the SMALLEST doc_id is the LAST row written, so a
    # reader that confuses encounter order with corpus order fails
    ids = list(range(len(texts) - 1, -1, -1))
    texts = list(reversed(texts))
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        pq.write_table(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string())}),
            os.path.join(d, "documents.parquet"))
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        for q, sql in ((q_paragraph_dedup, SQL_PARAGRAPH_DEDUP),
                       (q_paragraph_dedup_apply, SQL_PARAGRAPH_DEDUP_APPLY)):
            got = _normalize(_to_pandas(q(d)))
            want = _normalize(con.execute(sql).fetchdf())
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)


def test_dedup_tokenizer_agrees_with_re2_on_unicode_whitespace():
    """split_ws (the shared dedup tokenizer) must agree with DuckDB's
    RE2 on NON-ASCII whitespace: Python str.split() breaks on
    U+00A0/U+3000 while RE2 '\\s' does not — both sides now use the
    same explicit ASCII class (structural, not corpus-coincidental)."""
    from docling_pdf_ray.functions.dedup import WS_PATTERN, split_ws

    cases = [
        "alpha beta gamma",        # NBSP inside a "word"
        "a　b c\td",                # ideographic space
        "x y\nz",                  # line separator
        " leading trailing ",
        "tab\tand\x0bvt\x0cff",
    ]
    con = duckdb.connect()
    for s in cases:
        want = con.execute(
            "SELECT list_filter(regexp_split_to_array(?, ?), w -> w <> '')",
            [s, WS_PATTERN]).fetchone()[0]
        assert split_ws(s) == want, s


def test_driver_entry_contract(ray_session):
    """entry() is the driver's smoke check: runs the flagship pipeline
    at sf0.001, returns >0 rows with a stable schema, and never calls
    ray.init itself (the session fixture owns Ray here, as the driver
    does in production). Checked via count()/schema(), not to_pandas —
    the nested list<struct> pages column is not pandas-convertible
    under Ray's tensor-extension casting, and the driver does not
    require it to be."""
    import __ray_entry__

    out = __ray_entry__.entry()
    n, names = out.count(), out.schema().names
    assert n > 0
    assert "url" in names and "extraction_successful" in names
    again = __ray_entry__.entry()
    assert again.schema().names == names


def test_jaccard_pairs_exact_complete_on_tiny_corpus(ray_session):
    """Completeness contract: every pair with J >= 0.7 is found, with
    exact integer (num, den), including a pair that shares only a few
    shingles — no sketch probability involved."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.queries import q_jaccard_pairs_exact

    # doc 1 and 2: identical 6-word texts -> 4 shingles each, J = 1
    # doc 3: disjoint text -> no pair
    t = "a b c d e f"
    docs = [t, t, "x y z w v u"]
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(docs, pa.string())}),
            os.path.join(d, "documents.parquet"))
        got = q_jaccard_pairs_exact(d)
    assert got[["doc_id_a", "doc_id_b"]].values.tolist() == [[1, 2]]
    assert got["jacc_num"].tolist() == [4] and got["jacc_den"].tolist() == [4]


def test_hll_error_bound_and_merge_associativity():
    """HyperLogLog at sketch-relevant cardinalities: estimate within
    5% (4096 registers → ~1.6% std error) at 10k/100k/500k distinct
    hashes, and the merge is exactly associative/commutative (the
    property that makes ANY Ray merge tree give the identical
    sketch)."""
    import numpy as np

    from docling_pdf_ray.functions import sketch as sk

    rng = np.random.RandomState(7)
    for n in (10_000, 100_000, 500_000):
        hashes = rng.randint(0, 2**63, size=n, dtype=np.int64).astype(np.uint64) * np.uint64(2654435761)
        hashes = np.unique(hashes)
        est = sk.hll_count(sk.hll_add_hashes(sk.hll_new(), hashes))
        assert abs(est - len(hashes)) / len(hashes) < 0.05, (n, est)

    h = rng.randint(0, 2**63, size=30_000, dtype=np.int64).astype(np.uint64)
    a, b, c = h[:10_000], h[10_000:17_000], h[17_000:]
    def sk_of(x):
        return sk.hll_add_hashes(sk.hll_new(), x)
    whole = sk_of(h)
    merged = sk.hll_merge(sk.hll_merge(sk_of(a), sk_of(b)), sk_of(c))
    merged2 = sk.hll_merge(sk_of(c), sk.hll_merge(sk_of(b), sk_of(a)))
    assert np.array_equal(whole, merged) and np.array_equal(merged, merged2)


def test_hll_small_range_is_near_exact_and_query_agrees(ray_session):
    """Linear-counting regime: at corpus cardinalities far below the
    register count the sketch is exact-or-nearly; the two distinct
    count queries agree on the gate corpus."""
    import __ray_entry__

    q = __ray_entry__.queries()
    exact = q["distinct_tokens"](SF)["n_distinct_tokens"][0]
    est = q["distinct_tokens_hll"](SF)["n_distinct_est"][0]
    assert exact > 0
    assert abs(int(est) - int(exact)) <= max(1, int(0.02 * exact))


def test_bottomk_merge_associativity_and_rank_error_bound():
    """Bottom-k sample sketch (Cohen & Kaplan 2007): (1) ANY merge
    tree over ANY partitioning of the items yields the byte-identical
    sketch — the property that makes per-block partials independent of
    batch order and parallelism; (2) quantiles read off the k-sample
    land within the O(sqrt(p(1-p)/k)) rank-error band on a 100k-item
    stream."""
    import numpy as np

    from docling_pdf_ray.functions import sketch as sk

    rng = np.random.RandomState(11)
    n = 100_000
    keys = rng.permutation(n).astype(np.int64)
    vals = rng.randint(0, 10_000, size=n).astype(np.int64)
    whole = sk.bottomk_add(sk.bottomk_new(), keys, vals)
    cuts = [0, 13_337, 61_001, n]
    parts = [sk.bottomk_add(sk.bottomk_new(), keys[a:b], vals[a:b])
             for a, b in zip(cuts, cuts[1:])]
    m1 = sk.bottomk_merge(sk.bottomk_merge(parts[0], parts[1]), parts[2])
    m2 = sk.bottomk_merge(parts[2], sk.bottomk_merge(parts[1], parts[0]))
    for i in range(3):
        assert np.array_equal(whole[i], m1[i])
        assert np.array_equal(m1[i], m2[i])
    assert len(whole[0]) == sk.BOTTOMK_K

    est = sk.bottomk_quantiles(whole, [50, 90, 99])
    svals = np.sort(vals)
    for p, e in zip((50, 90, 99), est):
        rank = np.searchsorted(svals, e, side="right") / n
        se = np.sqrt(p / 100 * (1 - p / 100) / sk.BOTTOMK_K)
        assert abs(rank - p / 100) < 4 * se + 1 / sk.BOTTOMK_K, (p, rank, e)


def test_bottomk_exact_when_group_fits_and_query_degenerates(ray_session):
    """n ≤ k degeneracy: the sketch holds EVERY item, so its quantiles
    are exactly percentile_disc — and therefore at gate scale (every
    lang ≤ ~220 docs ≪ k=2048) chars_quantiles_approx must equal its
    SQL-checked exact sibling row-for-row."""
    import numpy as np

    import __ray_entry__
    from docling_pdf_ray.functions import sketch as sk

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1000, size=500).astype(np.int64)
    st = sk.bottomk_add(sk.bottomk_new(),
                        np.arange(500, dtype=np.int64), vals)
    got = sk.bottomk_quantiles(st, [50, 90, 99])
    sv = np.sort(vals)
    exact = [int(sv[int(np.ceil(p / 100 * len(sv))) - 1])
             for p in (50, 90, 99)]
    assert got == exact

    q = __ray_entry__.queries()
    approx = q["chars_quantiles_approx"](SF).reset_index(drop=True)
    exact_df = _to_pandas(q["chars_quantiles"](SF)).reset_index(drop=True)
    pd.testing.assert_frame_equal(approx, exact_df)


def test_misra_gries_superset_guarantee_and_partition_invariance():
    """MG prune-to-k (Misra-Gries 1982 / Agarwal et al. 2012): on a
    skewed 100k-item stream, (1) under several hostile partitionings
    every item with true frequency > n/(k+1) survives the per-chunk
    prune + driver merge with undercount ≤ n/(k+1) and no overcount;
    (2) the candidates → exact-verify composition returns the
    IDENTICAL exact heavy-hitter table for every partitioning — the
    property that makes heavy_hitter_ngrams independent of Ray block
    layout."""
    import numpy as np
    import pandas as pd

    from docling_pdf_ray.functions import sketch as sk

    K, PHI_DEN = 64, 50
    rng = np.random.RandomState(17)
    # 30 heavy items (freq ~ 1k-4k), 60k-item uniform tail
    heavy = np.repeat(np.arange(30), rng.randint(1000, 4000, size=30))
    tail = rng.randint(1000, 1_000_000, size=60_000)
    stream = np.concatenate([heavy, tail])
    rng.shuffle(stream)
    n = len(stream)
    true = pd.Series(stream).value_counts()
    want_hh = true[true * PHI_DEN > n].sort_index()

    partitionings = [
        np.array_split(stream, 7),
        np.array_split(stream, 64),
        np.array_split(np.sort(stream), 13),          # sorted: max skew
        [stream[:100], stream[100:101], stream[101:]],  # degenerate sizes
    ]
    results = []
    for chunks in partitionings:
        parts = []
        for ch in chunks:
            if len(ch) == 0:
                continue
            vc = pd.Series(ch).value_counts(sort=False)
            it, ct = sk.mg_prune(vc.index.to_numpy(),
                                 vc.to_numpy(np.int64), K)
            parts.append(pd.Series(ct, index=it))
        items, counts = sk.mg_combine(
            [(p.index.to_numpy(), p.to_numpy(np.int64)) for p in parts], K)
        assert len(items) <= K
        est = pd.Series(counts, index=items)
        bound = n / (K + 1)
        for item, c in true.items():
            if c > bound:
                assert item in est.index, item
                assert est[item] >= c - bound and est[item] <= c, item
        # exact verify pass over the candidates
        exact = true[true.index.isin(items)]
        got_hh = exact[exact * PHI_DEN > n].sort_index()
        results.append(got_hh)
    for got_hh in results:
        pd.testing.assert_series_equal(got_hh, want_hh)


def test_salted_hash_join_identical_output_on_skewed_tables(ray_session):
    """Hot-key salting must not change the join result: a celebrity
    key holding 60% of left rows, salted across 4 sub-buckets, yields
    exactly the pandas merge — for inner and left joins, int and
    string keys, including null keys and unmatched rows."""
    import random

    import pyarrow as pa
    import ray.data as rd

    from docling_pdf_ray.functions.joins import bucketed_hash_join

    rng = random.Random(3)
    lk = [5 if rng.random() < 0.6 else rng.randrange(0, 10) for _ in range(80)]
    lk[0] = None
    rk = [5, 5, 5] + [rng.randrange(0, 12) for _ in range(12)]
    left = pd.DataFrame({"k": pd.array(lk, dtype="Int64"), "lv": range(80)})
    right = pd.DataFrame({"k": pd.array(rk, dtype="Int64"),
                          "rv": range(1000, 1015)})

    for how in ("inner", "left"):
        got = bucketed_hash_join(
            rd.from_arrow(pa.Table.from_pandas(left)),
            rd.from_arrow(pa.Table.from_pandas(right)),
            "k", n_buckets=5, how=how, salt={5: 4}).to_pandas()
        plain = bucketed_hash_join(
            rd.from_arrow(pa.Table.from_pandas(left)),
            rd.from_arrow(pa.Table.from_pandas(right)),
            "k", n_buckets=5, how=how).to_pandas()
        key_cols = ["k", "lv", "rv"]
        got = got[key_cols].sort_values(key_cols).reset_index(drop=True)
        plain = plain[key_cols].sort_values(key_cols).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, plain, check_dtype=False,
                                      obj=f'salted-{how}')

    # string keys through the salted path
    sl = pd.DataFrame({"k": ["hot"] * 20 + ["a", "b"], "lv": range(22)})
    sr = pd.DataFrame({"k": ["hot", "b", "z"], "rv": [1, 2, 3]})
    got = bucketed_hash_join(
        rd.from_arrow(pa.Table.from_pandas(sl)),
        rd.from_arrow(pa.Table.from_pandas(sr)),
        "k", n_buckets=4, salt={"hot": 3}).to_pandas()
    want = sl.merge(sr, on="k", how="inner")
    key_cols = ["k", "lv", "rv"]
    got = got[key_cols].sort_values(key_cols).reset_index(drop=True)
    want = want[key_cols].sort_values(key_cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_apply_salt_spreads_left_and_replicates_right():
    """White-box: left hot rows actually occupy all n sub-buckets
    (the skew defense regressing to a no-op would still pass the
    output-equality test) and right hot rows replicate once per
    sub-bucket."""
    import pyarrow as pa

    from docling_pdf_ray.functions.joins import _apply_salt

    t = pa.table({"k": [5] * 8 + [1], "v": list(range(9)),
                  "_bucket": pa.array([0] * 9, pa.int32()),
                  "_side": ["l"] * 9})
    out = _apply_salt(t, "k", "l", {5: (64, 4)})
    hot = out.filter(pa.compute.equal(out.column("k"), 5))
    buckets = sorted(set(hot.column("_bucket").to_pylist()))
    assert len(buckets) == 4                     # all 4 sub-buckets occupied
    assert min(buckets) >= 64                    # past the hash-bucket range
    assert out.num_rows == 9                     # left: no replication

    r = pa.table({"k": [5, 2], "v": [0, 1],
                  "_bucket": pa.array([0, 0], pa.int32()),
                  "_side": ["r", "r"]})
    rout = _apply_salt(r, "k", "r", {5: (64, 4)})
    assert rout.num_rows == 5                    # 1 cold + 4 replicas
    hotb = rout.filter(pa.compute.equal(rout.column("k"), 5)) \
        .column("_bucket").to_pylist()
    assert len(set(hotb)) == 4


def test_detect_hot_keys_feeds_salted_join(ray_session):
    """The skew workflow end-to-end: detect_hot_keys finds the
    celebrity key (and only it), its output plugs into salt=, and the
    salted join still equals the plain merge."""
    import pyarrow as pa
    import ray.data as rd

    from docling_pdf_ray.functions.joins import (bucketed_hash_join,
                                                 detect_hot_keys)

    left = pd.DataFrame({"k": [7] * 500 + list(range(100)),
                         "lv": range(600)})
    right = pd.DataFrame({"k": [7, 3, 99], "rv": [10, 20, 30]})
    lds = rd.from_arrow(pa.Table.from_pandas(left))

    salt = detect_hot_keys(lds, "k", min_rows=200, n_subbuckets=4)
    assert salt == {7: 4}

    got = bucketed_hash_join(
        lds, rd.from_arrow(pa.Table.from_pandas(right)),
        "k", n_buckets=8, salt=salt).to_pandas()
    want = left.merge(right, on="k", how="inner")
    cols = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False)


def test_events_hourly_users_excludes_null_users(ray_session):
    """count(DISTINCT user_id) semantics: a NULL user is not a user —
    the engine must agree with DuckDB when nulls are present (the gate
    corpus has none; this pins the semantics anyway)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.queries import (SQL_EVENTS_HOURLY_USERS,
                                         q_events_hourly_users)

    ts = pd.to_datetime(["2026-01-01 10:05", "2026-01-01 10:20",
                         "2026-01-01 10:40", "2026-01-01 11:10"])
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        pq.write_table(pa.table({
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([1, None, 1, None], pa.int64())}),
            os.path.join(d, "events.parquet"))
        got = q_events_hourly_users(d)
        con = duckdb.connect()
        con.execute("CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{d}/events.parquet')")
        want = con.execute(SQL_EVENTS_HOURLY_USERS).fetchdf()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=True)
    assert got["n_users"].tolist() == [1, 0]   # hour 11: group kept, 0 users


def test_join_bucketing_spreads_null_keys():
    """Null-key skew: with spread_nulls=True (the join paths), null
    keys round-robin across buckets instead of funneling into bucket
    0 — and the join result with many null keys still matches pandas
    (nulls match nothing; left rows survive under how='left')."""
    import pyarrow as pa

    from docling_pdf_ray.functions.joins import _bucket_of

    col = pa.chunked_array([pa.array([None] * 40 + [1, 2], pa.int64())])
    spread = _bucket_of(col, 8, spread_nulls=True).to_pylist()[:40]
    assert len(set(spread)) == 8               # all buckets used
    legacy = _bucket_of(col, 8).to_pylist()[:40]
    assert set(legacy) == {0}                  # dedup callers: co-located


def test_left_join_with_null_keys_spread(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from docling_pdf_ray.functions.joins import bucketed_hash_join

    left = pd.DataFrame({"k": pd.array([None] * 30 + [1, 2], dtype="Int64"),
                         "lv": range(32)})
    right = pd.DataFrame({"k": pd.array([1], dtype="Int64"), "rv": [10]})
    out = bucketed_hash_join(
        rd.from_arrow(pa.Table.from_pandas(left)),
        rd.from_arrow(pa.Table.from_pandas(right)),
        "k", n_buckets=8, how="left").to_pandas()
    assert len(out) == 32                       # every left row survives once
    assert out[out["k"].isna()]["rv"].isna().all()
    assert out[out["k"] == 1]["rv"].tolist() == [10]


def test_bloom_filter_properties():
    """No false negatives ever; false-positive rate near the design
    point (~1% at 10 bits/key); OR-merge equals single-shot build."""
    import numpy as np

    from docling_pdf_ray.functions import sketch as sk

    rng = np.random.RandomState(11)
    keys = rng.choice(np.arange(10_000_000, dtype=np.int64), size=12_000,
                      replace=False)
    members, probes = keys[:10_000], keys[10_000:]   # probes are NON-members
    bits = sk.bloom_bits_for(len(members))
    bm = sk.bloom_add_hashes(sk.bloom_new(bits),
                             sk.mix64(members.astype(np.uint64)))
    assert sk.bloom_might_contain(bm, sk.mix64(members.astype(np.uint64))).all()
    fpr = sk.bloom_might_contain(bm, sk.mix64(probes.astype(np.uint64))).mean()
    assert fpr < 0.03, fpr

    a = sk.bloom_add_hashes(sk.bloom_new(bits),
                            sk.mix64(members[:5000].astype(np.uint64)))
    b = sk.bloom_add_hashes(sk.bloom_new(bits),
                            sk.mix64(members[5000:].astype(np.uint64)))
    assert np.array_equal(sk.bloom_merge(a, b), bm)


def test_dedup_groups_from_pairs_shared_entry():
    """The composition entry point must close pair graphs into
    min-labeled components WITHOUT re-running detection: chain,
    triangle, and an isolated pair, plus transitivity across shared
    members."""
    import pandas as pd

    from docling_pdf_ray.queries import dedup_groups_from_pairs

    pairs = pd.DataFrame({
        # chain 5-3, 3-9 (one component rep 3); triangle 10-11-12
        # expressed as two edges; isolated pair 20-21
        "doc_id_a": pd.Series([5, 3, 10, 11, 20], dtype="int64"),
        "doc_id_b": pd.Series([3, 9, 11, 12, 21], dtype="int64")})
    out = dedup_groups_from_pairs(pairs)
    got = dict(zip(out["doc_id"], out["rep_id"]))
    assert got == {3: 3, 5: 3, 9: 3, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
    assert list(out["doc_id"]) == sorted(out["doc_id"])
    empty = dedup_groups_from_pairs(
        pd.DataFrame({"doc_id_a": pd.Series([], dtype="int64"),
                      "doc_id_b": pd.Series([], dtype="int64")}))
    assert empty.empty and list(empty.columns) == ["doc_id", "rep_id"]


def test_bloom_semi_join_driver_is_survivor_bounded(ray_session, monkeypatch):
    """The r3 co-shuffle contract: the ONLY driver-side broadcast is
    the fixed-size Bloom bitmap — the qualifying build keys must never
    be ray.put as an exact-verify set (that was the r2 test-scale
    stand-in). Asserted by intercepting every ray.put the query makes
    and checking each payload is exactly the bitmap ndarray."""
    import numpy as np
    import pyarrow as pa
    import ray

    from docling_pdf_ray import queries as Q

    puts = []
    real_put = ray.put

    def spy_put(obj, **kw):
        puts.append(obj)
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    out = Q.q_bloom_semi_join("/root/testdata/sf0.001")
    assert len(out) > 0
    # Ray Data internals also ray.put (ReadTask closures etc.); the
    # query's OWN puts are ndarrays/arrow values — among those, only
    # the fixed-size uint8 bitmap is allowed. An int64 ndarray or an
    # Arrow array put would be an exact key set leaking to the driver.
    own = [o for o in puts
           if isinstance(o, (np.ndarray, pa.Array, pa.ChunkedArray, tuple))]
    assert own, "expected the bitmap broadcast to be captured"
    for obj in own:
        assert isinstance(obj, np.ndarray) and obj.dtype == np.uint8, \
            f"non-bitmap broadcast: {type(obj)}"
        assert obj.nbytes == Q._BLOOM_BITS // 8      # bitmap, not a key set


def test_verify_stage_driver_holds_no_texts(ray_session, monkeypatch):
    """The r5 Dataset-native contract for the near-dup exact-verify
    stage: candidate TEXTS and the candidate PAIR SET both flow
    worker-to-worker through the two bucket exchanges; the driver's
    only broadcast is the fixed-size uint8 Bloom bitmap — never a text,
    a pair frame, or an int routing map. Asserted by planting a
    sentinel string in the candidate docs' texts, intercepting every
    ray.put the verify makes, walking each payload for the sentinel,
    and pinning the put TYPES: no tuple (the retired r4 CSR routing
    triple) and no non-uint8 ndarray (a pair/route id array). Output
    correctness is checked against the scalar jaccard_counts
    definition."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data as rd

    from docling_pdf_ray import queries as Q
    from docling_pdf_ray.functions import dedup as dd

    sent = "XQZV7F3A_sentinel_token"
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 3
    texts = {1: base + sent, 2: base + sent + " coda",
             3: "totally different words here " * 10}
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[i] for i in sorted(texts)],
                         pa.large_string())}))
    cand = rd.from_arrow(pa.table({"a": pa.array([1, 1], pa.int64()),
                                   "b": pa.array([2, 3], pa.int64())}))

    puts = []
    real_put = ray.put

    def spy_put(obj, **kw):
        puts.append(obj)
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    out = Q._verify_jaccard_pairs(docs, cand, 0.7)

    # type pin: the verify's own driver puts are ONLY the bloom bitmap
    # (Ray Data internals put closures/blocks — those are not ndarrays
    # or tuples). A tuple put would be the retired CSR routing map; an
    # int64 ndarray put would be a pair/route id set on the driver.
    assert not any(isinstance(o, tuple) for o in puts), \
        "routing-map tuple broadcast has been retired"
    own_nd = [o for o in puts if isinstance(o, np.ndarray)]
    assert own_nd, "expected the bloom bitmap broadcast to be captured"
    for o in own_nd:
        assert o.dtype == np.uint8 and o.nbytes == Q._BLOOM_BITS // 8, \
            f"non-bitmap ndarray broadcast: dtype={o.dtype} nbytes={o.nbytes}"

    # (1,2) is a true near-dup; (1,3) shares nothing
    assert list(zip(out["doc_id_a"], out["doc_id_b"])) == [(1, 2)]
    num, den = dd.jaccard_counts(texts[1], texts[2])
    assert (int(out["jacc_num"][0]), int(out["jacc_den"][0])) == (num, den)

    def walk(obj, depth=0):
        if depth > 6:
            return
        if isinstance(obj, str):
            assert sent not in obj, "candidate text leaked to the driver"
        elif isinstance(obj, bytes):
            assert sent.encode() not in obj
        elif isinstance(obj, dict):
            for k, v in obj.items():
                walk(k, depth + 1)
                walk(v, depth + 1)
        elif isinstance(obj, (list, tuple, set)):
            for v in obj:
                walk(v, depth + 1)
        elif isinstance(obj, np.ndarray) and obj.dtype == object:
            for v in obj.ravel():
                walk(v, depth + 1)
        elif isinstance(obj, (pa.Array, pa.ChunkedArray)):
            if pa.types.is_string(obj.type) or pa.types.is_large_string(obj.type):
                for v in obj.to_pylist():
                    walk(v, depth + 1)
        elif isinstance(obj, pa.Table):
            for col in obj.columns:
                walk(col, depth + 1)
        elif isinstance(obj, pd.DataFrame):
            for c in obj.columns:
                for v in obj[c]:
                    walk(v, depth + 1)

    assert puts, "expected the routing-map broadcast to be captured"
    for obj in puts:
        walk(obj)


def test_md5_hex_col_matches_scalar_md5_hex():
    """The vectorized unique-inverse md5 (r4) must be byte-identical to
    the scalar path, including nulls, empties, repeats and non-ASCII."""
    import pyarrow as pa

    from docling_pdf_ray.functions import text as ftext

    vals = ["a", None, "", "a", "héllo world", "a b c", None, ""]
    col = pa.chunked_array([pa.array(vals[:3], pa.string()),
                            pa.array(vals[3:], pa.string())])
    assert ftext.md5_hex_col(col).to_pylist() == ftext.md5_hex(vals)


def test_order_coverage_driver_is_bitmap_bounded(ray_session, monkeypatch):
    """r4 rebuild contract: the only driver-side broadcast is the
    fixed-size Bloom bitmap — never the orders key set (the r3 verdict's
    weak item #2). Same put-spy discipline as the bloom_semi_join test."""
    import numpy as np
    import pyarrow as pa
    import ray

    from docling_pdf_ray import queries as Q

    puts = []
    real_put = ray.put

    def spy_put(obj, **kw):
        puts.append(obj)
        return real_put(obj, **kw)

    monkeypatch.setattr(ray, "put", spy_put)
    out = Q.q_order_coverage("/root/testdata/sf0.001")
    assert len(out) == 1
    own = [o for o in puts
           if isinstance(o, (np.ndarray, pa.Array, pa.ChunkedArray, tuple))]
    assert own, "expected the bitmap broadcast to be captured"
    for obj in own:
        assert isinstance(obj, np.ndarray) and obj.dtype == np.uint8, \
            f"non-bitmap broadcast: {type(obj)}"
        assert obj.nbytes == Q._BLOOM_BITS // 8


def test_pii_counts_on_planted_corpus(ray_session):
    """The PII patterns must agree with RE2 on REAL matches (the gate
    corpus has none): emails with +/., IPv4, international phones,
    null text — plus the redaction map."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray.functions.text import redact_pii
    from docling_pdf_ray.queries import SQL_PII_COUNTS, q_pii_counts

    # Rows 6-7 pin the \b semantics: Python's \b is Unicode-aware (本
    # and á are word chars → no boundary before '1'), RE2's is ASCII
    # (boundary present). _PII_RES compiles with re.ASCII so both
    # engines count these IPs; without it the DuckDB compare fails.
    texts = ["mail me at a.b+c@ex-ample.co.uk now",
             "server at 10.0.255.1 and 1.2.3.4",
             "call +1 555 0100 1234 or +44 20-7946-0958",
             None, "no pii here", "x@y.io 8.8.8.8 x@y.io",
             "版本1.2.3.4 im log", "á1.2.3.4 und 5.6.7.8é"]
    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string())}),
            os.path.join(d, "documents.parquet"))
        got = q_pii_counts(d)
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        want = con.execute(SQL_PII_COUNTS).fetchdf()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)].reset_index(drop=True),
        want[sorted(want.columns)].reset_index(drop=True), check_dtype=True)
    assert got[["n_emails", "n_ipv4", "n_phones"]].values.tolist() == [[3, 6, 2]]
    assert redact_pii("版本1.2.3.4 ok") == "版本[REDACTED] ok"
    assert redact_pii("mail a@b.co from 1.2.3.4") == \
        "mail [REDACTED] from [REDACTED]"
    assert redact_pii(None) is None


def test_running_totals_hostile_events_and_block_invariance(ray_session, tmp_path):
    """The distributed prefix scan must agree with DuckDB's window sum
    on a HOSTILE arrival sequence (event_id gaps crossing bucket
    boundaries, types absent from whole buckets, negative values,
    checkpoint ids landing in every bucket) and be invariant to block
    partitioning (the scan's carry must not depend on how Ray splits
    the input)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(3)
    # sparse ids across ~7 range buckets, shuffled row order on disk
    ids = np.sort(rng.choice(np.arange(0, 7000), size=3000, replace=False))
    perm = rng.permutation(len(ids))
    types = np.array(["a", "b", "c"])[rng.randint(0, 3, len(ids))]
    # type "c" vanishes from the middle buckets entirely
    types[(ids >= 2000) & (ids < 4000) & (types == "c")] = "a"
    vals = np.round(rng.standard_normal(len(ids)) * 50, 2)  # negatives too
    t = pa.table({"event_id": pa.array(ids[perm], pa.int64()),
                  "event_type": pa.array(types[perm], pa.string()),
                  "value": pa.array(vals[perm], pa.float64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    want = duckdb.connect().execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet');"
        + Q.SQL_RUNNING_TOTALS).fetchdf()
    assert len(want) > 10

    import pandas as pd
    got = Q.q_running_totals(str(d))
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, check_exact=True)

    # block-partitioning invariance: force a different input split
    import ray.data as rd
    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 4 * 1024
        got2 = Q.q_running_totals(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_null_lang_and_source_parity(ray_session, tmp_path):
    """r3 review fix: NULL lang / NULL source are groups like any
    other. The four late-r3 queries that groupby lang/source must
    match DuckDB on a corpus WITH nulls (the gate corpus has none, so
    only this test exercises the dropna=False discipline)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__

    rng = np.random.RandomState(11)
    n = 300
    langs = np.array(["en", "de", None, "fr"], dtype=object)[
        rng.randint(0, 4, n)]
    srcs = np.array(["web", None, "news"], dtype=object)[
        rng.randint(0, 3, n)]
    words = [" ".join(f"w{rng.randint(0, 200)}" for _ in range(
        rng.randint(6, 40))) for _ in range(n)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(words, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(srcs, pa.string()),
        "n_chars": pa.array([len(w) for w in words], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")

    queries, oracles = __ray_entry__.queries(), __ray_entry__.oracle_sql()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path / 'documents.parquet'}')")
    for name in ["doc_cume_dist", "corpus_split_counts",
                 "source_lang_rollup", "incremental_dedup"]:
        got = _normalize(_to_pandas(queries[name](str(tmp_path))))
        want = _normalize(con.execute(oracles[name]).fetchdf())
        assert len(got) == len(want), (name, len(got), len(want))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)


def test_events_hourly_users_hll_tracks_exact_sibling(registry):
    """Grouped HLL (rows-only): same hour set as the SQL-checked exact
    sibling, every per-hour estimate within the HLL error band (P=12
    std err ~1.6%; small hours near-exact via linear counting — allow
    6% or +/-2 absolute), and deterministic across runs."""
    queries, _ = registry
    approx = _to_pandas(queries["events_hourly_users_hll"](SF))
    exact = _to_pandas(queries["events_hourly_users"](SF))
    m = exact.merge(approx, on="hour_ts", how="outer")
    assert not m["n_users"].isna().any() and not m["n_users_est"].isna().any()
    err = (m["n_users_est"] - m["n_users"]).abs()
    assert ((err <= 2) | (err <= 0.06 * m["n_users"])).all(), \
        m[~((err <= 2) | (err <= 0.06 * m["n_users"]))]
    again = _to_pandas(queries["events_hourly_users_hll"](SF))
    pd.testing.assert_frame_equal(approx, again)


def test_sequence_packing_hostile_ids_and_block_invariance(ray_session, tmp_path):
    """The global (unpartitioned) prefix scan behind sequence packing
    must agree with DuckDB's window sum on HOSTILE doc_ids (sparse ids
    with gaps crossing PACK_SCAN_RANGE bucket boundaries, whole empty
    buckets, shuffled on-disk row order, zero-length docs) and be
    invariant to block partitioning."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(7)
    ids = np.sort(rng.choice(np.arange(0, 2000), size=700, replace=False))
    perm = rng.permutation(len(ids))
    nch = rng.randint(0, 900, len(ids)).astype(np.int64)
    nch[rng.rand(len(ids)) < 0.05] = 0          # zero-length docs
    t = pa.table({"doc_id": pa.array(ids[perm], pa.int64()),
                  "n_chars": pa.array(nch[perm], pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    want = duckdb.connect().execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet');"
        + Q.SQL_SEQUENCE_PACKING).fetchdf()
    assert len(want) == 700 and want["pack_id"].nunique() > 5

    def run():
        # lazy O(corpus) Dataset result (ADVICE r3): order locally here
        return Q.q_sequence_packing(str(d)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)

    got = run()
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True),
                                  check_dtype=False, check_exact=True)

    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 4 * 1024
        got2 = run()
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_domain_cap_enforced_and_block_invariant(ray_session, tmp_path):
    """Per-domain cap: never more than DOMAIN_CAP docs per domain, the
    kept set is exactly DuckDB's row_number()<=cap set on hostile
    sparse ids (partial domains, singleton domains), and the choice is
    invariant to block partitioning (the rank must come from the
    deterministic hash, not arrival order)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(13)
    ids = np.sort(rng.choice(np.arange(0, 3000), size=900, replace=False))
    perm = rng.permutation(len(ids))
    t = pa.table({"doc_id": pa.array(ids[perm], pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    want = duckdb.connect().execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet');"
        + Q.SQL_DOMAIN_CAP).fetchdf()
    got = Q.q_domain_cap(str(d))
    assert got.groupby("domain").size().max() <= Q.DOMAIN_CAP
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, check_exact=True)

    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 4 * 1024
        got2 = Q.q_domain_cap(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_top_terms_approx_equals_exact_at_gate_scale(registry):
    """Zero-shuffle MG+CMS top terms (rows-only): at gate scale the
    vocabulary fits MG exactly and CMS is collision-free, so the
    result must EQUAL the SQL-checked exact sibling; and it must be
    deterministic across runs."""
    queries, _ = registry
    approx = _to_pandas(queries["top_terms_approx"](SF))
    exact = _to_pandas(queries["top_terms"](SF))
    assert approx["term"].tolist() == exact["term"].tolist()
    assert approx["df_est"].tolist() == exact["df"].tolist()
    again = _to_pandas(queries["top_terms_approx"](SF))
    pd.testing.assert_frame_equal(approx, again)


def test_cms_never_underestimates_and_mg_superset_on_hostile_stream():
    """Sketch bounds on a stream that actually stresses them: a
    zipfian vocabulary far above the (shrunk) capacities. CMS point
    estimates never underestimate; MG retains every phi-heavy item;
    both sketches are merge-order invariant."""
    import numpy as np
    import pandas as pd

    from docling_pdf_ray.functions import sketch as sk

    rng = np.random.RandomState(42)
    items = np.array([f"t{i}" for i in rng.zipf(1.3, 20000)], dtype=object)
    u, c = np.unique(items, return_counts=True)
    h = pd.util.hash_array(u, categorize=False)

    small = sk.cms_add_hashes(sk.cms_new(4, 128), h, c)
    est = sk.cms_query_hashes(small, h)
    assert (est >= c).all()

    # MG with tiny k: every item with freq > N/(k+1) must survive any
    # split + combine
    k = 15
    n = int(c.sum())
    mid = len(u) // 2
    parts = [sk.mg_prune(u[:mid], c[:mid], k), sk.mg_prune(u[mid:], c[mid:], k)]
    items2, _ = sk.mg_combine(parts, k)
    heavy = set(u[c > n // (k + 1)])
    assert heavy and heavy <= set(items2)

    # merge-order invariance (CMS sum + MG value-prune are both
    # order-free): reversed partials give the identical result
    items3, counts3 = sk.mg_combine(parts[::-1], k)
    i2, c2 = sk.mg_combine(parts, k)
    assert sorted(zip(items3, counts3)) == sorted(zip(i2, c2))


def test_link_pagerank_hostile_graph_and_block_invariance(ray_session, tmp_path):
    """Integer fixed-point PageRank over the REAL extracted link graph
    (r4) must agree with the unrolled SQL on a HOSTILE corpus (sparse
    doc_ids → hosts of wildly different sizes; non-html docs make some
    hosts dst-only danglers or zero-indegree; empty/short texts) and be
    invariant to block partitioning (integer flows are associative —
    any layout must produce bit-identical ranks). The engine side
    genuinely synthesizes pages and PARSES them for anchors."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(23)
    ids = np.sort(rng.choice(np.arange(0, 4000), size=800, replace=False))
    perm = rng.permutation(len(ids))
    texts = ["lorem ipsum " * (int(i) % 30) for i in ids]   # some empty
    t = pa.table({
        "doc_id": pa.array(ids[perm], pa.int64()),
        "text": pa.array([texts[j] for j in perm], pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["cc"] * len(ids), pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    want = duckdb.connect().execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet');"
        + Q.SQL_LINK_PAGERANK).fetchdf()
    got = Q.q_link_pagerank(str(d))
    assert len(got) == len(want) and got["r"].min() >= Q.PR_BASE
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, check_exact=True)

    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 4 * 1024
        got2 = Q.q_link_pagerank(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_bottom_cap_semilattice_and_skewed_source_parity(ray_session, tmp_path):
    """The r5 skew defense for the per-source/per-domain caps: the
    shared rank cut `_bottom_cap` is a semilattice
    (cap(cap(A) ∪ cap(B)) == cap(A ∪ B) for ANY partition), so the cap
    stages may pre-combine per batch/bucket — pinned directly on random
    partitions, then end-to-end: a corpus where ONE source holds 90% of
    rows stays value-exact vs SQL for corpus_build (and domain_cap,
    whose synthetic domain is dense here), including under a tiny block
    size that forces many pre-cap parts."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    # (1) semilattice property on random frames and random partitions
    rng = np.random.RandomState(11)
    for trial in range(5):
        n = 400
        df = pd.DataFrame({
            "doc_id": rng.permutation(n).astype(np.int64),
            "source": rng.choice(["a", "b", "mega"], size=n,
                                 p=[0.05, 0.05, 0.9]),
            "k": rng.randint(0, 50, size=n).astype(np.int64)})
        whole = Q._bottom_cap(df, "source", ["k", "doc_id"], 7)
        cuts = np.sort(rng.choice(np.arange(1, n), size=3, replace=False))
        parts = np.split(df, cuts)
        pre = pd.concat([Q._bottom_cap(p, "source", ["k", "doc_id"], 7)
                         for p in parts])
        again = Q._bottom_cap(pre, "source", ["k", "doc_id"], 7)
        pd.testing.assert_frame_equal(
            whole.sort_values("doc_id").reset_index(drop=True),
            again.sort_values("doc_id").reset_index(drop=True))
        assert again.groupby("source").size().max() <= 7

    # (2) 90%-one-source corpus, value-exact end-to-end
    n = 1000
    src = np.where(np.arange(n) % 10 == 0,
                   np.char.add("s", (np.arange(n) % 7).astype(str)),
                   "megacrawl")
    t = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array([f"unique document body {i} " * 4
                          for i in range(n)], pa.string()),
        "lang": pa.array(["en", "de", "fr", "es", "pt"] * (n // 5),
                         pa.string()),
        "source": pa.array(src.astype(object), pa.string()),
        "n_chars": pa.array([len(f"unique document body {i} " * 4)
                             for i in range(n)], pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{d}/documents.parquet')")

    from ray.data.context import DataContext

    for name, fn in (("corpus_build", Q.q_corpus_build),
                     ("domain_cap", Q.q_domain_cap)):
        want = con.execute(Q.ORACLE_SQL[name]).fetchdf()
        got = fn(str(d))
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want.reset_index(drop=True),
            check_dtype=False, check_exact=True)
        old = DataContext.get_current().target_max_block_size
        try:        # many tiny blocks → many pre-cap parts
            DataContext.get_current().target_max_block_size = 4 * 1024
            got2 = fn(str(d))
        finally:
            DataContext.get_current().target_max_block_size = old
        pd.testing.assert_frame_equal(got2.reset_index(drop=True),
                                      got.reset_index(drop=True))


def test_lang_doc_digest_null_lang_and_block_invariance(ray_session,
                                                        tmp_path):
    """The digest's NULL-group arm: the sf corpora carry no null langs,
    so pin the sentinel fill/restore path on a corpus where 1/3 of rows
    have lang NULL — value-exact vs DuckDB (string_agg + count per
    group, NULL group included), and invariant under tiny blocks (the
    per-batch count-on-first-kept-row partial must never lose a group's
    count, whatever the blocking)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    n = 300
    langs = [None if i % 3 == 0 else ("en" if i % 3 == 1 else "de")
             for i in range(n)]
    t = pa.table({
        "doc_id": pa.array(np.arange(n)[::-1].copy(), pa.int64()),
        "text": pa.array(["x"] * n, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * n, pa.string()),
        "n_chars": pa.array(np.ones(n, np.int64))})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{d}/documents.parquet')")
    want = con.execute(Q.ORACLE_SQL["lang_doc_digest"]).fetchdf()
    got = Q.q_lang_doc_digest(str(d))
    norm = lambda f: f.sort_values(list(f.columns), na_position="first") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(norm(got), norm(want),
                                  check_dtype=False, check_exact=True)
    assert got["lang"].isna().sum() == 1   # the NULL group survived

    from ray.data.context import DataContext
    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 2 * 1024
        got2 = Q.q_lang_doc_digest(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(norm(got2), norm(got))


def test_two_hop_join_is_cap_bounded(ray_session, tmp_path):
    """The r5 hub defense for two-hop reachability: the edge set is
    degree-capped BEFORE the edges⋈edges self-join, so a planted hub
    host (in/out degree ~0.4·docs by construction) can never explode
    the join — output is bounded by |capped edges| × cap, and no host
    keeps more than `cap` out-edges. Also pins SQL value-exactness on
    this hub-heavy corpus (the capped-graph semantics are mirrored in
    the oracle's row_number window)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q
    from docling_pdf_ray.functions.joins import bucketed_hash_join

    rng = np.random.RandomState(7)
    ids = np.sort(rng.choice(np.arange(0, 3000), size=300, replace=False))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["alpha beta gamma " * 5] * len(ids), pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string()),
        "source": pa.array(["cc"] * len(ids), pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    edges = Q._two_hop_capped_edges(str(d))
    pdf = edges.to_pandas()
    # every host's out-adjacency is capped
    assert pdf.groupby("src").size().max() <= Q._TWO_HOP_CAP
    # the hub is genuinely hot on the UNCAPPED axis (in-degree: every
    # spoke's single out-edge survives the cap)
    n_spokes = int((ids % 10 > 5).sum())
    assert n_spokes >= 100
    assert int((pdf["dst"] == Q._TWO_HOP_HUB).sum()) == n_spokes

    # the self-join output can never exceed |capped edges| × cap
    left = edges.map_batches(
        lambda b: pa.table({"src": b.column("src"), "mid": b.column("dst")}),
        batch_format="pyarrow")
    right = edges.map_batches(
        lambda b: pa.table({"mid": b.column("src"), "dst2": b.column("dst")}),
        batch_format="pyarrow")
    joined = bucketed_hash_join(left, right, "mid", n_buckets=32, how="left",
                                salt={Q._TWO_HOP_HUB: 8})
    assert joined.count() <= len(pdf) * Q._TWO_HOP_CAP

    # SQL parity holds ON the hub-heavy corpus
    want = duckdb.connect().execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet');"
        + Q.SQL_HOST_TWO_HOP).fetchdf()
    got = Q.q_host_two_hop(str(d))
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, check_exact=True)


def test_range_sort_audit_invariant_and_hostile_duplicates(ray_session, tmp_path):
    """Range-partitioned sort audit: the range invariant
    max(part i) <= min(part i+1) must hold (so per-partition local
    sorts concatenate into the global sort), DuckDB must agree on a
    HOSTILE value distribution (one value holding 40% of rows straddles
    a cutpoint; sparse extremes), and the audit must be block-layout
    invariant."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(31)
    vals = np.concatenate([
        np.full(400, 77, dtype=np.int64),            # 40% duplicates
        rng.randint(0, 5000, 580).astype(np.int64),
        np.array([0, 0, 10**7], dtype=np.int64),     # sparse extremes
        np.full(17, 77, dtype=np.int64)])
    t = pa.table({"doc_id": pa.array(np.arange(len(vals)), pa.int64()),
                  "n_chars": pa.array(vals[rng.permutation(len(vals))],
                                      pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    want = duckdb.connect().execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet');"
        + Q.SQL_RANGE_SORT_AUDIT).fetchdf()
    got = Q.q_range_sort_audit(str(d))
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, check_exact=True)
    # the concatenation invariant of range partitioning
    assert (got["max_chars"].to_numpy()[:-1]
            <= got["min_chars"].to_numpy()[1:]).all()
    assert got["n_rows"].sum() == len(vals)

    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 4 * 1024
        got2 = Q.q_range_sort_audit(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_late_event_counts_hostile_arrivals(ray_session, tmp_path):
    """Watermark lateness must agree with DuckDB's window-max on a
    HOSTILE stream: arrival jitter crossing day-bucket boundaries,
    NULL event types (a group like any other), duplicate timestamps,
    and sparse event_ids; and be block-layout invariant."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(17)
    n = 1200
    ids = np.sort(rng.choice(np.arange(0, 10_000), size=n, replace=False))
    base = np.datetime64("2024-03-01T00:00:00", "us")
    # bursty event times incl. exact duplicates, spanning ~5 days
    offs = np.sort(rng.randint(0, 5 * 86_400, n)) * 1_000_000
    offs[::7] = offs[1::7][: len(offs[::7])]          # duplicate ts runs
    types = np.array(["a", "b", None, "c"], dtype=object)[
        rng.randint(0, 4, n)]
    perm = rng.permutation(n)
    t = pa.table({
        "event_id": pa.array(ids[perm], pa.int64()),
        "ts": pa.array((base + offs).astype("datetime64[us]")[perm]),
        "event_type": pa.array(types[perm], pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    want = duckdb.connect().execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet');"
        + Q.SQL_LATE_EVENT_COUNTS).fetchdf()
    got = Q.q_late_event_counts(str(d))
    assert got["n_late"].sum() > 0          # non-degenerate scenario
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, check_exact=True)

    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 4 * 1024
        got2 = Q.q_late_event_counts(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_funnel_counts_hostile_sequences(ray_session, tmp_path):
    """Funnel semantics on adversarial user histories: stages out of
    order (purchase before view must NOT count), repeated stages,
    ties at identical timestamps (broken by event_id on both engines),
    null users excluded, users spread across many buckets — and the
    greedy earliest-match chain must agree with DuckDB's min-idx SQL
    exactly, under any block layout."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(29)
    n = 3000
    users = rng.randint(0, 300, n).astype(np.int64)
    types = np.array(["view", "click", "purchase", "error", "signup"],
                     dtype=object)[rng.randint(0, 5, n)]
    base = np.datetime64("2024-05-01T00:00:00", "us")
    offs = rng.randint(0, 10 * 86_400, n).astype("int64") * 1_000_000
    offs[1::3] = offs[::3][: len(offs[1::3])]       # heavy ts ties
    users_obj = users.astype(object)
    users_obj[rng.rand(n) < 0.05] = None            # null users
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(users_obj, pa.int64()),
        "ts": pa.array((base + offs).astype("datetime64[us]")),
        "event_type": pa.array(types, pa.string())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    want = duckdb.connect().execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet');"
        + Q.SQL_FUNNEL_COUNTS).fetchdf()
    got = Q.q_funnel_counts(str(d))
    # the funnel must narrow monotonically and be non-degenerate
    nu = got["n_users"].to_numpy()
    assert nu[0] >= nu[1] >= nu[2] and nu[2] > 0
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False, check_exact=True)

    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 4 * 1024
        got2 = Q.q_funnel_counts(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_read_parquet_union_semantics(ray_session, tmp_path):
    """union_read: footer-only union schema (first-seen order),
    per-shard column pruning, typed-null padding for absent columns,
    strict type-conflict rejection, and exact agreement with DuckDB's
    union_by_name read."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from docling_pdf_ray.sources.union_read import (
        read_parquet_union, union_schema)

    a = tmp_path / "a.parquet"
    b = tmp_path / "b.parquet"
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64()),
                             "x": pa.array(["p", "q"], pa.string())}), a)
    pq.write_table(pa.table({"k": pa.array([3], pa.int64()),
                             "y": pa.array([9.5], pa.float64())}), b)

    got = read_parquet_union([str(a), str(b)]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = duckdb.connect().execute(
        f"SELECT k, x, y FROM read_parquet(['{a}', '{b}'], "
        f"union_by_name=true) ORDER BY k").fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert list(got.columns) == ["k", "x", "y"]      # first-seen order
    assert got["y"].isna().tolist() == [True, True, False]

    pruned = read_parquet_union([str(a), str(b)], columns=["k", "y"])
    assert pruned.schema().names == ["k", "y"]

    # review fix: a shard having NONE of the requested columns still
    # contributes its rows as all-null (union_by_name semantics) —
    # selecting only the late-era column must not drop early shards
    only_y = read_parquet_union([str(a), str(b)], columns=["y"]).to_pandas()
    assert len(only_y) == 3 and only_y["y"].isna().sum() == 2

    c = tmp_path / "c.parquet"
    pq.write_table(pa.table({"k": pa.array(["s"], pa.string())}), c)
    with _pytest.raises(ValueError, match="conflicting types"):
        union_schema([pq.read_schema(str(a)), pq.read_schema(str(c))])
    with _pytest.raises(ValueError, match="not present"):
        read_parquet_union([str(a)], columns=["nope"])


def test_length_outliers_hostile_distribution(ray_session, tmp_path):
    """Median+MAD outlier gate on a distribution built to break a
    mean/stddev gate: a huge planted tail that must NOT move the
    median, NULL langs (grouped, and the oracle joins with IS NOT
    DISTINCT FROM so they survive), even-count median ties — exact
    agreement with DuckDB's percentile_disc, block-layout invariant."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(41)
    n = 1000
    langs = np.array(["en", "de", None], dtype=object)[rng.randint(0, 3, n)]
    chars = rng.randint(200, 400, n).astype(np.int64)
    chars[rng.rand(n) < 0.03] = 10 ** 7          # monster outliers
    chars[rng.rand(n) < 0.03] = 0                # and empty docs
    t = pa.table({"doc_id": pa.array(np.arange(n), pa.int64()),
                  "lang": pa.array(langs, pa.string()),
                  "n_chars": pa.array(chars, pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    want = duckdb.connect().execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet');"
        + Q.SQL_LENGTH_OUTLIERS).fetchdf()
    got = Q.q_length_outliers(str(d))
    assert got["n_outliers"].sum() > 0 and len(got) == 3
    assert (got["med_chars"] < 1000).all()       # tail didn't move medians
    nrm = lambda df: df.sort_values("lang", na_position="first") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(nrm(got), nrm(want),
                                  check_dtype=False, check_exact=True)

    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 4 * 1024
        got2 = Q.q_length_outliers(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_view_purchase_conversion_hostile_windows(ray_session, tmp_path):
    """Exists-pair window semantics where greedy earliest-match would
    be WRONG: a user whose first view ages out but a later view
    converts must count; purchases before any view must not; exact
    boundary (purchase at view + exactly 7d) counts on both engines;
    null users excluded; block-layout invariant."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    day = np.timedelta64(1, "D")
    base = np.datetime64("2024-06-01T00:00:00", "us")
    rows = [
        # u1: early view ages out, later view converts (greedy trap)
        (1, "view", base), (1, "purchase", base + 10 * day),
        (1, "view", base + 5 * day),
        # u2: purchase BEFORE any view → no conversion
        (2, "purchase", base), (2, "view", base + 1 * day),
        # u3: exact boundary — purchase at view + 7d exactly → counts
        (3, "view", base), (3, "purchase", base + 7 * day),
        # u4: view only
        (4, "view", base),
        # null user noise
        (None, "view", base), (None, "purchase", base + 1 * day),
    ]
    t = pa.table({
        "event_id": pa.array(np.arange(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows], pa.string()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us"))})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")

    got = Q.q_view_purchase_conversion(str(d))
    assert got["n_viewers"].tolist() == [4]
    assert got["n_converted"].tolist() == [2]     # u1 (late view) + u3
    want = duckdb.connect().execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet');"
        + Q.SQL_VIEW_PURCHASE_CONVERSION).fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)

    from ray.data.context import DataContext

    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 1024
        got2 = Q.q_view_purchase_conversion(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got2, got)


def test_compression_ratio_signal(ray_session, tmp_path):
    """Repetitive docs deflate hard and trip the <0.3 gate; diverse
    prose does not. Integer partials make the result block-layout
    invariant; nulls and empty texts drop (no raw bytes to ratio)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(9)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz0123456789 "))
    diverse = ["".join(rng.choice(alphabet, 800)) for _ in range(40)]
    spam = ["buy now " * 200 for _ in range(10)]
    texts = diverse + spam + [None, ""]
    langs = (["en"] * 40) + (["zz"] * 10) + ["en", "en"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) if x else 0 for x in texts],
                            pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    out = Q.q_compression_ratio(str(d)).set_index("lang")
    assert out.loc["zz", "n_repetitive"] == 10        # all spam trips
    assert out.loc["en", "n_repetitive"] == 0
    assert out.loc["zz", "ratio_1e6"] < 100_000       # <0.1, crushed
    assert out.loc["en", "ratio_1e6"] > 300_000
    assert out.loc["en", "n_docs"] == 40              # null/empty drop

    # block-layout invariance: 1-row files vs one file
    d2 = tmp_path / "sf2"
    d2.mkdir()
    for i in range(0, len(texts), 7):
        pq.write_table(t.slice(i, 7), d2 / f"documents_{i}.parquet")
    import shutil
    (d2 / "documents.parquet").mkdir()
    for i in range(0, len(texts), 7):
        shutil.move(str(d2 / f"documents_{i}.parquet"),
                    str(d2 / "documents.parquet" / f"part-{i}.parquet"))
    out2 = Q.q_compression_ratio(str(d2)).set_index("lang")
    assert out2.equals(out)


def test_embedding_quantize_partial_hostile_lists(ray_session, tmp_path):
    """Null and empty embedding lists at batch start/middle/end: the
    reduceat segmenting must neither raise (trailing empty) nor borrow
    the next vector's max (mid-batch empty); empty/null vectors drop
    from n_vecs on both engines."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(12)
    vecs = [None, [0.5, -1.0], [], [0.25], list(rng.rand(4)), [], None]
    labels = [0, 0, 0, 1, 1, 2, 2]
    t = pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "embeddings.parquet")

    got = Q.q_embedding_quantize_audit(str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"'{d / 'embeddings.parquet'}'")
    want = con.execute(Q.ORACLE_SQL["embedding_quantize_audit"]).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # label 2 has only empty/null vectors -> absent entirely
    assert 2 not in set(got["label"])
    assert got.set_index("label")["n_vecs"].to_dict() == {0: 1, 1: 2}


def test_part_association_order_spans_blocks(ray_session, tmp_path):
    """An order whose lineitem rows are split across parquet files
    (and carry duplicate (order, part) rows) must still count each
    co-purchase pair once per order — the basket-bucketed exchange,
    not batch luck, is what co-locates it. Exact DuckDB agreement."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(7)
    rows_o, rows_p = [], []
    for o in range(60):
        parts = rng.choice(30, size=rng.randint(2, 6), replace=False)
        for p in parts:
            rows_o.append(o)
            rows_p.append(int(p))
            if p % 3 == 0:              # duplicate (order, part) rows
                rows_o.append(o)
                rows_p.append(int(p))
    t = pa.table({"l_orderkey": pa.array(rows_o, pa.int64()),
                  "l_partkey": pa.array(rows_p, pa.int64())})
    d = tmp_path / "sf"
    (d / "lineitem.parquet").mkdir(parents=True)
    third = t.num_rows // 3                 # orders straddle the files
    for i, sl in enumerate([t.slice(0, third), t.slice(third, third),
                            t.slice(2 * third)]):
        pq.write_table(sl, d / "lineitem.parquet" / f"part-{i}.parquet")

    got = Q.q_part_association(str(d))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"'{d / 'lineitem.parquet'}/*.parquet'")
    want = con.execute(Q.ORACLE_SQL["part_association"]).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_roundtrip_stats_hostile_text(ray_session, tmp_path, monkeypatch):
    """CSV and JSONL sink/source loops survive hostile strings —
    embedded commas, double quotes, newlines, tabs, unicode, null
    text — and still match the parquet oracle."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    texts = ['a,b,"c"', "line1\nline2", "tab\tsep", "quote\"inside",
             "unicode é中文", None, "", "trailing,comma,",
             "'single'", "\\backslash\\",
             # ADVICE r4: Arrow CSV's default null sentinels would turn
             # these literal strings into nulls after the roundtrip
             "NULL", "null", "N/A", "NA", "nan"]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array((["en", "de"] * len(texts))[:len(texts)],
                         pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(x) if x else 0 for x in texts],
                            pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{d / 'documents.parquet'}'")
    want = con.execute(Q.ORACLE_SQL["jsonl_roundtrip_stats"]).df()
    for name in ("jsonl_roundtrip_stats", "csv_roundtrip_stats"):
        got = Q.QUERIES[name](str(d)).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False), name


def test_knn_graph_properties(ray_session):
    """Structural pins beyond SQL equality: exactly k neighbors per
    vector, no self edges, qip non-increasing down each rank list with
    the neighbor-id tiebreak."""
    from docling_pdf_ray import queries as Q

    out = Q.q_knn_graph(SF)
    assert set(out.columns) == {"vec_id", "neighbor_id", "nn_rank", "qip"}
    assert (out["vec_id"] != out["neighbor_id"]).all()
    per = out.groupby("vec_id")
    assert (per.size() == Q._QIP_K).all()
    for _, g in per:
        g = g.sort_values("nn_rank")
        q = g["qip"].to_numpy()
        n = g["neighbor_id"].to_numpy()
        for i in range(len(q) - 1):
            assert q[i] > q[i + 1] or (q[i] == q[i + 1] and n[i] < n[i + 1])


def test_near_dup_apply_keeps_reps_only(ray_session):
    """Every planted near-dup group keeps exactly its min-doc_id rep:
    the planted copy (doc_id + PLANT_OFFSET) is dropped, its source
    kept, and untouched docs pass through."""
    from docling_pdf_ray import queries as Q

    kept = set(Q.q_near_dup_apply(SF)["doc_id"])
    groups = Q.q_minhash_dedup_groups(SF)
    for _, row in groups.iterrows():
        if row["doc_id"] == row["rep_id"]:
            assert row["doc_id"] in kept
        else:
            assert row["doc_id"] not in kept
    assert any(d >= Q.PLANT_OFFSET for d in
               set(groups["doc_id"]))          # plants actually grouped


def test_containment_planted_halves_fully_contained(ray_session):
    """Every planted half-doc pairs with its source at cont_num ==
    cont_den (a word-prefix's 3-shingles are a subset of the full
    text's), pinning the asymmetric semantics symmetric Jaccard at
    t=0.7 cannot see."""
    from docling_pdf_ray import queries as Q

    out = Q.q_containment_pairs(SF)
    probe = out[out["doc_id_b"] >= Q.CONTAIN_OFFSET]
    own = probe[probe["doc_id_b"] - Q.CONTAIN_OFFSET == probe["doc_id_a"]]
    assert len(own) > 0                       # plants actually detected
    assert (own["cont_num"] == own["cont_den"]).all()


def test_fuzzy_title_pairs_planted_and_oriented(ray_session):
    """Every corpus doc matches its own planted probe (the deletion is
    within distance 1 by construction), all dists are <= 1, and sides
    stay oriented (a = corpus ids, b = probe ids)."""
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    out = Q.q_fuzzy_title_pairs(SF)
    assert (out["dist"] <= 1).all()
    assert (out["doc_id_a"] < Q.PLANT_OFFSET).all()
    assert (out["doc_id_b"] >= Q.PLANT_OFFSET).all()
    got = set(zip(out["doc_id_a"], out["doc_id_b"]))
    docs = pq.read_table(SF + "/documents.parquet",
                         columns=["doc_id", "text"])
    for i, t in zip(docs.column("doc_id").to_pylist(),
                    docs.column("text").to_pylist()):
        if t is not None:
            assert (i, i + Q.PLANT_OFFSET) in got


def test_bpe_learn_matches_pure_python_reference(ray_session):
    """The distributed BPE learner must equal an INDEPENDENT in-memory
    reference (own counting loop, own non-overlapping apply) on the
    real corpus — merge order, tie-breaks and pair counts exactly."""
    from collections import Counter

    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q
    from docling_pdf_ray.functions import dedup as dd

    texts = pq.read_table(SF + "/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    types: Counter = Counter()
    for t in texts:
        types.update(dd.split_ws(t or ""))
    state = {w: tuple(w) for w in types}
    expect = []
    for step in range(Q.BPE_MERGES):
        ctr: Counter = Counter()
        for w, toks in state.items():
            c = types[w]
            for x, y in zip(toks, toks[1:]):
                ctr[(x, y)] += c
        if not ctr:
            break
        (left, right), n = min(ctr.items(),
                               key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        expect.append((step, left, right, n))
        nxt = {}
        for w, toks in state.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == left \
                        and toks[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nxt[w] = tuple(out)
        state = nxt

    got = Q.q_bpe_learn_merges(SF)
    assert [tuple(r) for r in got.itertuples(index=False)] == expect


def test_bpe_apply_merge_overlap_rule():
    from docling_pdf_ray.queries import bpe_apply_merge

    assert bpe_apply_merge(list("aaa"), "a", "a") == ["aa", "a"]
    assert bpe_apply_merge(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert bpe_apply_merge(list("abab"), "a", "b") == ["ab", "ab"]
    assert bpe_apply_merge([], "a", "b") == []


def test_substring_dup_spans_planted_cross_doc_copy(ray_session, tmp_path):
    """A mid-text span copied between two docs at an offset that breaks
    word-chunk alignment must surface as dup grams in BOTH docs; an
    unrelated doc must report zero; a doc shorter than one gram is
    absent from the result on BOTH sides. Parity vs the oracle on the
    planted table pins the distinct-doc (not same-doc-repeat) rule."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    span = "the quick brown fox jumps over the lazy dog again and again ok"
    a = "aaa " * 30 + span + " tail of document a " * 5
    b = "prefix that offsets the copy by some chars " + span + " b" * 40
    c = "completely unrelated text " * 10
    d = "short"                      # < SUBSTR_GRAM chars -> absent
    e = ("zz " * 20)[:64]            # self-repeat only -> dup_grams 0
    texts = [a, b, c, d, e]
    t = pa.table({
        "doc_id": pa.array(np.arange(5), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 5, pa.string()),
        "source": pa.array(["s"] * 5, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")

    got = Q.q_substring_dup_spans(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    by = got.set_index("doc_id")
    assert 3 not in by.index                      # too short: absent
    assert by.loc[0, "dup_grams"] > 0 and by.loc[1, "dup_grams"] > 0
    assert by.loc[2, "dup_grams"] == 0
    assert by.loc[4, "dup_grams"] == 0            # same-doc repeats only

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path / 'documents.parquet'}')")
    want = con.execute(Q.SQL_SUBSTRING_DUP_SPANS).fetchdf()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)],
        want[sorted(want.columns)].sort_values("doc_id")
        .reset_index(drop=True), check_dtype=False, check_exact=True)


def test_dsir_weights_all_target_is_exactly_scale(ray_session, tmp_path):
    """When EVERY doc is in the target lang, target_count == raw_count
    per bucket, so every λ = (c+1)·SCALE // (c+1) = SCALE exactly and
    dsir_score == n_tokens · SCALE — an integer-exact invariant that
    pins the smoothing arithmetic end-to-end."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(3)
    texts = [" ".join(f"w{rng.randint(0, 50)}" for _ in range(12))
             for _ in range(60)]
    t = pa.table({
        "doc_id": pa.array(np.arange(60), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([Q.DSIR_TARGET_LANG] * 60, pa.string()),
        "source": pa.array(["s"] * 60, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    pq.write_table(t, tmp_path / "documents.parquet")

    got = Q.q_dsir_weights(str(tmp_path)).to_pandas()
    assert len(got) == 60
    assert (got["dsir_score"] ==
            got["n_tokens"] * Q.DSIR_SCALE).all()


def test_shard_manifest_partition_totals(registry):
    """The manifest (computed from the files the sink actually wrote)
    must partition the corpus exactly: shard ids within range, totals
    equal to the corpus totals, and deterministic across runs."""
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    got = _to_pandas(registry[0]["shard_manifest"](SF))
    assert got["shard"].between(0, Q.N_SHARDS - 1).all()
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "n_chars"]).to_pandas()
    assert got["n_docs"].sum() == len(src)
    assert got["sum_chars"].sum() == src["n_chars"].sum()
    assert got["id_sum"].sum() == src["doc_id"].sum()
    again = _to_pandas(registry[0]["shard_manifest"](SF))
    pd.testing.assert_frame_equal(got, again)


def test_chunk_windows_overlap_contract(registry):
    """Adjacent chunks overlap by exactly CHUNK_WORDS - CHUNK_STRIDE
    words; all but the last chunk of a doc are full; chunk word counts
    reconstruct the doc's word count (sum - overlap double-counts)."""
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q
    from docling_pdf_ray.functions import dedup as dd

    got = _to_pandas(registry[0]["chunk_windows"](SF)) \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    wc = {r.doc_id: len(dd.split_ws(r.text or ""))
          for r in src.itertuples()}
    for doc_id, g in got.groupby("doc_id"):
        n = wc[doc_id]
        assert list(g["chunk_idx"]) == list(range(1, len(g) + 1))
        assert len(g) == -(-n // Q.CHUNK_STRIDE)
        # exact size contract: chunk i spans words
        # [(i-1)·STRIDE, min((i-1)·STRIDE + WORDS, n))
        want = [min(Q.CHUNK_WORDS, n - (i - 1) * Q.CHUNK_STRIDE)
                for i in range(1, len(g) + 1)]
        assert list(g["n_words"]) == want, doc_id
    assert set(got["doc_id"]) == {d for d, c in wc.items() if c > 0}


def test_bpe_encode_stats_matches_driver_replay(registry):
    """The distributed encode must equal a driver-side replay: the
    same learned merges applied per word with bpe_apply_merge (whose
    overlap rule is independently pinned), summed per document."""
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q
    from docling_pdf_ray.functions import dedup as dd

    got = _to_pandas(registry[0]["bpe_encode_stats"](SF)) \
        .sort_values("doc_id").reset_index(drop=True)
    merges = [(str(l), str(r)) for l, r in
              Q.q_bpe_learn_merges(SF)[["left", "right"]]
              .itertuples(index=False)]
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    cache = {}

    def enc_len(w):
        if w not in cache:
            toks = list(w)
            for a, b in merges:
                toks = Q.bpe_apply_merge(toks, a, b)
            cache[w] = len(toks)
        return cache[w]

    for r, (_, s) in zip(got.itertuples(), src.iterrows()):
        words = dd.split_ws(s["text"] or "")
        assert r.doc_id == s["doc_id"]
        assert r.n_words == len(words)
        assert r.n_bpe_tokens == sum(enc_len(w) for w in words)
    assert (got["n_bpe_tokens"] >= got["n_words"]).all()
    assert (got["n_bpe_tokens"] > got["n_words"]).any()  # merges bite


def test_session4_ops_hostile_corpus_and_block_invariance(ray_session,
                                                          tmp_path):
    """All six SQL-checked session-4 operators on a hostile corpus —
    NULL texts, NULL langs, tab/VT/FF separators, multibyte tokens,
    negative and >2^32 doc_ids, a planted offset cross-doc copy, docs
    shorter than one gram — value-exact vs DuckDB AND invariant under
    tiny blocks (the partial/exchange shapes must never depend on the
    blocking)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    span = ("copied span of text that is well over thirty two chars "
            "long for the gram rule")
    rng = np.random.RandomState(13)
    texts, langs = [], []
    for i in range(240):
        if i % 11 == 0:
            texts.append(None)
        elif i % 7 == 0:
            texts.append("prefix offset " * (i % 3 + 1) + span
                         + " tail\tmore\x0btokens\x0chere")
        elif i % 5 == 0:
            texts.append("café naïve " * 4 + f"u{i} dup slow")
        elif i % 13 == 4:
            texts.append("tiny")       # shorter than one gram
        else:
            texts.append(" ".join(
                f"w{rng.randint(0, 80)}" for _ in range(rng.randint(1, 90))))
        langs.append(None if i % 9 == 0
                     else ("en", "de", "zh")[i % 3])
    ids = np.arange(240, dtype=np.int64) * 7919
    ids[::17] = -ids[::17]                       # negative ids
    ids[3] = (1 << 33) + 5                       # past 2^32
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * 240, pa.string()),
        "n_chars": pa.array([len(x or "") for x in texts], pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM read_parquet('{d}/documents.parquet')")
    norm = lambda f: f[sorted(f.columns)] \
        .sort_values(sorted(f.columns), na_position="first") \
        .reset_index(drop=True)
    names = ["substring_dup_spans", "hash_classifier_score",
             "dsir_weights", "blocklist_gate", "chunk_windows",
             "shard_manifest"]

    def run(name):
        r = Q.QUERIES[name](str(d))
        return norm(r if isinstance(r, pd.DataFrame) else r.to_pandas())

    first = {}
    for name in names:
        got = run(name)
        want = norm(con.execute(Q.ORACLE_SQL[name]).fetchdf())
        assert len(got) == len(want), (name, len(got), len(want))
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
        first[name] = got
    # the planted copy must actually fire the substring detector
    assert first["substring_dup_spans"]["dup_grams"].sum() > 0

    from ray.data.context import DataContext
    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 2 * 1024
        for name in names:
            pd.testing.assert_frame_equal(run(name), first[name])
    finally:
        DataContext.get_current().target_max_block_size = old


def _perceptron_replay(docs_df):
    """Pure-driver reference replay of the batch-synchronous integer
    perceptron (whole corpus as one batch — valid because the round
    update is a commutative integer sum, the property under test)."""
    import hashlib

    from docling_pdf_ray import queries as Q
    from docling_pdf_ray.functions import text as ftext_mod

    feats, ys = [], []
    for _, r in docs_df.iterrows():
        if r["text"] is None:
            continue
        toks = [t.lower() for t in
                __import__("re").findall(r"[A-Za-z0-9]+", r["text"])]
        fs = {int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
              % Q.PERCEPTRON_DIM for t in toks}
        feats.append(fs)
        ys.append(1 if r["lang"] == Q.DSIR_TARGET_LANG else -1)
    import numpy as np
    w = np.zeros(Q.PERCEPTRON_DIM, np.int64)
    b = 0
    rows = []
    for rnd in range(Q.PERCEPTRON_ROUNDS):
        dw = np.zeros(Q.PERCEPTRON_DIM, np.int64)
        db = mistakes = 0
        for fs, y in zip(feats, ys):
            s = b + sum(int(w[f]) for f in fs)
            if y * s <= 0:
                mistakes += 1
                db += y
                for f in fs:
                    dw[f] += y
        w += dw
        b += db
        rows.append((rnd, mistakes, int(np.abs(w).sum()), b))
    return rows


def test_perceptron_train_matches_pure_replay(registry):
    import pyarrow.parquet as pq

    got = _to_pandas(registry[0]["perceptron_train"](SF))
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["text", "lang"]).to_pandas()
    want = _perceptron_replay(src)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_perceptron_converges_on_separable_corpus(ray_session, tmp_path):
    """Disjoint vocab per class ⇒ linearly separable ⇒ the perceptron
    must reach zero mistakes within the fixed rounds; the result is
    also invariant under tiny blocks (commutative-integer-sum claim)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(2)
    texts, langs = [], []
    for i in range(120):
        if i % 2 == 0:
            texts.append(" ".join(
                f"en{rng.randint(0, 20)}" for _ in range(10)))
            langs.append(Q.DSIR_TARGET_LANG)
        else:
            texts.append(" ".join(
                f"xx{rng.randint(0, 20)}" for _ in range(10)))
            langs.append("de")
    t = pa.table({
        "doc_id": pa.array(np.arange(120), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(["s"] * 120, pa.string()),
        "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "documents.parquet")

    got = Q.q_perceptron_train(str(d))
    assert int(got["mistakes"].iloc[-1]) == 0, got
    assert int(got["mistakes"].iloc[0]) > 0   # it actually learned

    from ray.data.context import DataContext
    old = DataContext.get_current().target_max_block_size
    try:
        DataContext.get_current().target_max_block_size = 2 * 1024
        again = Q.q_perceptron_train(str(d))
    finally:
        DataContext.get_current().target_max_block_size = old
    pd.testing.assert_frame_equal(got, again)
