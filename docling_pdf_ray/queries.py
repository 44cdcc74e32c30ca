"""The engine's query registry: one entry per operator/pipeline
(SURVEY.md §2 + the large-scale training-data operators), each with a
DuckDB oracle where the semantics are SQL-expressible.

Conventions (driver contract):
* every callable takes ``sf_dir`` and returns a Dataset / DataFrame /
  pyarrow Table;
* computed column names MATCH the oracle SQL exactly (the driver's
  compare sorts columns by name before hashing);
* float-sum traps are avoided by design: money/metric sums go through
  ``CAST(round(x*100) AS BIGINT)`` cents on BOTH sides so results are
  exact integers, order-independent (double summation is not
  associative — a Ray groupby and DuckDB would otherwise disagree in
  the last bits);
* every aggregate pre-aggregates inside ``map_batches`` when the group
  cardinality is small (partials → tiny final groupby), and joins
  whose small side fits broadcast it instead of shuffling (the 100 TB
  discipline, applied at every scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import _compat  # noqa: F401
from .functions import text as ftext

# lazy ray.data import helper (the driver owns ray.init)


def _rd():
    import ray.data as rd

    return rd


def _docs(sf_dir: str, columns):
    return _rd().read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ================================================================ extraction

def q_extract_pages(sf_dir: str):
    """Flagship: synthesized CC-style pages → two-stage extraction →
    scalar result columns (nested columns dropped for the driver's
    hash; full nested output is exercised by pytest). Deterministic,
    not SQL-expressible (rows-only check)."""
    from .pipelines.extract import build_extract_ds
    from .sources.pages_from_documents import pages_dataset

    ds = build_extract_ds(pages_dataset(sf_dir))
    return ds.select_columns([
        "url", "extraction_successful", "extraction_method",
        "word_count", "character_count", "total_pages",
        "has_tables", "has_images"]).sort("url")


def q_extract_method_counts(sf_dir: str):
    """Routing audit: counts by extraction method. SQL-checkable
    because the synthesized payload class — and therefore the method —
    is a pure function of doc_id (sources/pages_from_documents.py)."""
    from .pipelines.extract import build_extract_ds
    from .sources.pages_from_documents import pages_dataset

    ds = build_extract_ds(pages_dataset(sf_dir))
    agg = ds.groupby("extraction_method").count()
    t = agg.to_pandas().rename(columns={"count()": "n"})
    return t.sort_values("extraction_method", na_position="first").reset_index(drop=True)


SQL_EXTRACT_METHOD_COUNTS = """
SELECT CASE
         WHEN doc_id % 10 <= 5 THEN 'html_heuristic'
         WHEN doc_id % 10 <= 8 THEN 'pdf_parse'
         WHEN doc_id % 100 = 99 THEN 'fallback'
         WHEN doc_id % 100 = 19 THEN NULL
         ELSE 'pdf_parse'
       END AS extraction_method,
       count(*) AS n
FROM documents
GROUP BY 1
ORDER BY 1 NULLS FIRST
"""


# ================================================================ relational

def q_doc_stats_by_lang(sf_dir: str):
    """G-style grouped aggregate with batch-level pre-aggregation:
    partials per (lang) per batch, then a tiny final groupby — the
    scale pattern for low-cardinality keys."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang").aggregate([
            ("n_chars", "sum"), ("n_chars", "min"), ("n_chars", "max"),
            ("doc_id", "count")])
        return g.rename_columns(["lang", "p_sum", "p_min", "p_max", "p_n"])

    ds = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Count, Max, Min, Sum

    final = partials.groupby("lang").aggregate(
        Sum("p_n", alias_name="n_docs"),
        Sum("p_sum", alias_name="total_chars"),
        Min("p_min", alias_name="min_chars"),
        Max("p_max", alias_name="max_chars"),
    )
    return final.sort("lang")


SQL_DOC_STATS_BY_LANG = """
SELECT lang, count(*) AS n_docs, sum(n_chars) AS total_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_doc_token_stats(sf_dir: str):
    """Token counting (BPE-ish ASCII regex, functions/text.py) summed
    by lang; the pattern string is shared verbatim with the SQL."""

    def toks(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n = ftext.token_counts(texts)
        t = pa.table({"lang": batch.column("lang"),
                      "n_tokens": pa.array(n, pa.int64())})
        return t.group_by("lang").aggregate([("n_tokens", "sum"), ("lang", "count")]) \
            .rename_columns(["lang", "p_tokens", "p_n"])

    from ray.data.aggregate import Sum

    partials = _docs(sf_dir, ["text", "lang"]).map_batches(toks, batch_format="pyarrow")
    return partials.groupby("lang").aggregate(
        Sum("p_tokens", alias_name="total_tokens"),
        Sum("p_n", alias_name="n_docs")).sort("lang")


SQL_DOC_TOKEN_STATS = f"""
SELECT lang,
       sum(array_length(regexp_extract_all(text, '{ftext.TOKEN_PATTERN}'))) AS total_tokens,
       count(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


def q_doc_quality_by_lang(sf_dir: str):
    """Quality-feature aggregates as exact integer sums (alpha chars /
    total chars per lang) — ratio computation is left to the consumer
    so both sides stay order-independent integers."""

    def feats(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        alpha = ftext.alpha_char_counts(texts)
        t = pa.table({
            "lang": batch.column("lang"),
            "alpha": pa.array(alpha, pa.int64()),
            "chars": pa.array([len(t or "") for t in texts], pa.int64()),
        })
        return t.group_by("lang").aggregate([("alpha", "sum"), ("chars", "sum")]) \
            .rename_columns(["lang", "p_alpha", "p_chars"])

    from ray.data.aggregate import Sum

    partials = _docs(sf_dir, ["text", "lang"]).map_batches(feats, batch_format="pyarrow")
    return partials.groupby("lang").aggregate(
        Sum("p_alpha", alias_name="alpha_chars"),
        Sum("p_chars", alias_name="total_chars")).sort("lang")


SQL_DOC_QUALITY_BY_LANG = """
SELECT lang,
       sum(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))) AS alpha_chars,
       sum(length(text)) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def q_doc_fingerprints(sf_dir: str):
    """Per-document content fingerprint (md5 == DuckDB md5)."""

    def fp(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(ftext.md5_hex(batch.column("text").to_pylist()),
                                    pa.string()),
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pyarrow").sort("doc_id")


SQL_DOC_FINGERPRINTS = """
SELECT doc_id, md5(text) AS fingerprint FROM documents ORDER BY doc_id
"""


def q_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition on content hash, keep min doc_id
    per group (SURVEY §2.7 / training-data dedup #1). The heavy text
    column never shuffles — only (hash, doc_id) pairs do."""

    def hashes(batch: pa.Table) -> pa.Table:
        return pa.table({
            "text_hash": pa.array(ftext.md5_hex(batch.column("text").to_pylist())),
            "doc_id": batch.column("doc_id"),
        })

    from ray.data.aggregate import Count, Min

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(hashes, batch_format="pyarrow")
    return ds.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="keep_doc_id"),
        Count(alias_name="n_copies")).sort("text_hash")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_size_histogram(sf_dir: str):
    """Byte-size bucketing (the skew-analysis primitive behind §4.3)."""

    def bucket(batch: pa.Table) -> pa.Table:
        b = pc.multiply(pc.divide(batch.column("n_chars"), 500), 500)
        t = pa.table({"bucket": pc.cast(b, pa.int64())})
        return t.group_by("bucket").aggregate([("bucket", "count")]) \
            .rename_columns(["bucket", "p_n"])

    from ray.data.aggregate import Sum

    partials = _docs(sf_dir, ["n_chars"]).map_batches(bucket, batch_format="pyarrow")
    return partials.groupby("bucket").aggregate(Sum("p_n", alias_name="n_docs")) \
        .sort("bucket")


SQL_SIZE_HISTOGRAM = """
SELECT (n_chars // 500) * 500 AS bucket, count(*) AS n_docs
FROM documents GROUP BY 1 ORDER BY 1
"""


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style wide aggregate over lineitem with exact cents
    arithmetic; batch partials → 4-group final."""
    cutoff = pa.scalar(np.datetime64("1998-09-01", "us"))

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less(batch.column("l_shipdate"), cutoff))
        if b.num_rows == 0:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "l_linestatus": pa.array([], pa.string()),
                             "p_qty": pa.array([], pa.int64()),
                             "p_base": pa.array([], pa.int64()),
                             "p_disc": pa.array([], pa.int64()),
                             "p_n": pa.array([], pa.int64())})
        qty = pc.cast(pc.round(pc.multiply(b.column("l_quantity"), 100.0),
                               round_mode="half_towards_infinity"), pa.int64())
        base = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0),
                                round_mode="half_towards_infinity"), pa.int64())
        disc_price = pc.multiply(b.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        disc = pc.cast(pc.round(pc.multiply(disc_price, 100.0),
                                round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"l_returnflag": b.column("l_returnflag"),
                      "l_linestatus": b.column("l_linestatus"),
                      "qty": qty, "base": base, "disc": disc})
        return t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("base", "sum"), ("disc", "sum"), ("qty", "count")]) \
            .rename_columns(["l_returnflag", "l_linestatus",
                             "p_qty", "p_base", "p_disc", "p_n"])

    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("p_qty", alias_name="sum_qty_cents"),
        Sum("p_base", alias_name="sum_base_cents"),
        Sum("p_disc", alias_name="sum_disc_cents"),
        Sum("p_n", alias_name="count_order"),
    ).sort(["l_returnflag", "l_linestatus"])


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) AS sum_qty_cents,
       sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sum_base_cents,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_segment_revenue(sf_dir: str):
    """orders ⋈ customer revenue by market segment — the small side
    (customer) is broadcast once via ray.put and looked up per batch;
    no shuffle join (SURVEY §2.4 discipline)."""
    import ray

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    lookup = dict(zip(cust.column("c_custkey").to_pylist(),
                      cust.column("c_mktsegment").to_pylist()))
    ref = ray.put(lookup)

    class SegmentJoin:
        def __init__(self, ref):
            self.lookup = ray.get(ref)   # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column("o_custkey").to_pylist()
            seg = [self.lookup.get(k) for k in keys]
            cents = pc.cast(pc.round(pc.multiply(batch.column("o_totalprice"), 100.0),
                                     round_mode="half_towards_infinity"), pa.int64())
            t = pa.table({"c_mktsegment": pa.array(seg, pa.string()),
                          "cents": cents})
            return t.group_by("c_mktsegment").aggregate(
                [("cents", "sum"), ("cents", "count")]) \
                .rename_columns(["c_mktsegment", "p_cents", "p_n"])

    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])
    partials = ds.map_batches(SegmentJoin, fn_constructor_args=(ref,),
                              batch_format="pyarrow", concurrency=2)
    return partials.groupby("c_mktsegment").aggregate(
        Sum("p_cents", alias_name="revenue_cents"),
        Sum("p_n", alias_name="n_orders")).sort("c_mktsegment")


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS revenue_cents,
       count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate (streaming-shaped, SURVEY §2.9):
    event counts + exact cents sums per (event_type, hour)."""

    def partial(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"), 100.0),
                                 round_mode="half_towards_infinity"), pa.int64())
        t = pa.table({"event_type": batch.column("event_type"),
                      "hour_ts": hour, "cents": cents})
        return t.group_by(["event_type", "hour_ts"]).aggregate(
            [("cents", "sum"), ("cents", "count")]) \
            .rename_columns(["event_type", "hour_ts", "p_cents", "p_n"])

    from ray.data.aggregate import Sum

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(["event_type", "hour_ts"]).aggregate(
        Sum("p_cents", alias_name="value_cents"),
        Sum("p_n", alias_name="n_events")).sort(["event_type", "hour_ts"])


SQL_EVENTS_HOURLY = """
SELECT event_type, date_trunc('hour', ts) AS hour_ts,
       sum(CAST(round(value * 100) AS BIGINT)) AS value_cents,
       count(*) AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_user_sessions(sf_dir: str):
    """Session windowing (30-min gap) per user — the groupby +
    map_groups pattern for ordered per-key state (ray_guide streaming
    shape). Gap sums are order-tie-insensitive (same ts multiset)."""
    import pandas as pd

    GAP = pd.Timedelta(minutes=30)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].sort_values()
        gaps = ts.diff()
        n_sessions = int(1 + (gaps > GAP).sum()) if len(ts) else 0
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]],
                             "n_events": [len(g)],
                             "n_sessions": [n_sessions]})

    ds = _rd().read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas") \
        .sort("user_id")


SQL_USER_SESSIONS = """
SELECT user_id, count(*) AS n_events,
       sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END) AS n_sessions
FROM (SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events)
GROUP BY user_id ORDER BY user_id
"""


def q_lang_detect(sf_dir: str):
    """Language-ID heuristic audit: confusion counts (lang ×
    predicted). Deterministic; no SQL analog (rows-only check)."""

    def pred(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        p = [ftext.detect_language(t) for t in texts]
        t = pa.table({"lang": batch.column("lang"),
                      "predicted": pa.array(p, pa.string())})
        return t.group_by(["lang", "predicted"]).aggregate([("lang", "count")]) \
            .rename_columns(["lang", "predicted", "p_n"])

    from ray.data.aggregate import Sum

    partials = _docs(sf_dir, ["text", "lang"]).map_batches(pred, batch_format="pyarrow")
    return partials.groupby(["lang", "predicted"]).aggregate(
        Sum("p_n", alias_name="n")).sort(["lang", "predicted"])


QUERIES = {
    "extract_pages": q_extract_pages,
    "extract_method_counts": q_extract_method_counts,
    "doc_stats_by_lang": q_doc_stats_by_lang,
    "doc_token_stats": q_doc_token_stats,
    "doc_quality_by_lang": q_doc_quality_by_lang,
    "doc_fingerprints": q_doc_fingerprints,
    "dedup_exact": q_dedup_exact,
    "size_histogram": q_size_histogram,
    "pricing_summary": q_pricing_summary,
    "segment_revenue": q_segment_revenue,
    "events_hourly": q_events_hourly,
    "user_sessions": q_user_sessions,
    "lang_detect": q_lang_detect,
}

ORACLE_SQL = {
    "extract_method_counts": SQL_EXTRACT_METHOD_COUNTS,
    "doc_stats_by_lang": SQL_DOC_STATS_BY_LANG,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "doc_quality_by_lang": SQL_DOC_QUALITY_BY_LANG,
    "doc_fingerprints": SQL_DOC_FINGERPRINTS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "size_histogram": SQL_SIZE_HISTOGRAM,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "segment_revenue": SQL_SEGMENT_REVENUE,
    "events_hourly": SQL_EVENTS_HOURLY,
    "user_sessions": SQL_USER_SESSIONS,
}
