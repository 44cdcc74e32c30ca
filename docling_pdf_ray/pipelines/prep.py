"""Training-data preparation: the composed pipeline a pre-training
corpus build runs on top of extraction.

    pages → extract (sniff/HTML tasks + PDF actor pool)
          → quality features (length / alpha / stopword ratios)
          → keep: successful, non-empty, min quality
          → predicted-language tag (n-gram-free heuristic)
          → exact dedup on content hash (hash shuffle of (hash, url)
            pairs only — text never shuffles)
          → per-language token statistics

Everything before the dedup groupby is one streaming pass; the output
summary is tiny. This is the showcase composition of the engine's
training-data operators (SURVEY.md: beyond-reference ops)."""

from __future__ import annotations

import pyarrow as pa

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..functions import text as ftext


MIN_QUALITY_CHARS = 80
MIN_ALPHA_RATIO = 0.5


def quality_and_lang(batch: pa.Table) -> pa.Table:
    """Per-doc quality features + language guess + content hash over
    extracted full_text; drops rows failing the quality gate."""
    urls = batch.column("url").to_pylist()
    texts = batch.column("full_text").to_pylist()
    ok = batch.column("extraction_successful").to_pylist()

    out = {"url": [], "text_hash": [], "pred_lang": [], "n_chars": [],
           "n_tokens": [], "alpha_ratio": []}
    for u, t, s in zip(urls, texts, ok):
        if not s or not t or len(t) < MIN_QUALITY_CHARS:
            continue
        q = ftext.quality_features(t)
        if q["alpha_ratio"] < MIN_ALPHA_RATIO:
            continue
        out["url"].append(u)
        out["text_hash"].append(ftext.md5_hex([t])[0])
        out["pred_lang"].append(ftext.detect_language(t))
        out["n_chars"].append(q["n_chars"])
        out["n_tokens"].append(int(ftext.token_counts([t])[0]))
        out["alpha_ratio"].append(round(q["alpha_ratio"], 4))
    return pa.table({
        "url": pa.array(out["url"], pa.string()),
        "text_hash": pa.array(out["text_hash"], pa.string()),
        "pred_lang": pa.array(out["pred_lang"], pa.string()),
        "n_chars": pa.array(out["n_chars"], pa.int64()),
        "n_tokens": pa.array(out["n_tokens"], pa.int64()),
        "alpha_ratio": pa.array(out["alpha_ratio"], pa.float64()),
    })


def build_training_prep(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG,
                        n_buckets: int = 64,
                        exchange_blocks: int | None = None):
    """pages Dataset → deduped per-doc quality/lang/token table
    (Dataset). The dedup shuffles only (hash, url, scalars), BUCKETED:
    hashes co-locate in n_buckets groups and each bucket dedups with
    one vectorized sort+drop_duplicates — not one map_groups call per
    unique hash (that is one Python pandas frame per DOCUMENT at
    corpus scale). Winner per hash = min url (deterministic)."""
    import pandas as pd

    from .extract import build_extract_ds
    from ..functions.joins import _bucket_of

    ds = build_extract_ds(pages_ds, cfg)
    feat = ds.map_batches(quality_and_lang, batch_format="pyarrow")

    def bucketize(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket", _bucket_of(batch.column("text_hash"), n_buckets))

    def first_per_hash_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["text_hash", "url"], kind="mergesort") \
            .drop_duplicates("text_hash", keep="first") \
            .drop(columns=["_bucket"])

    bucketed = feat.map_batches(bucketize, batch_format="pyarrow")
    if exchange_blocks:
        # narrow (hash, url, scalars) rows: coalesce before the sort-
        # based exchange (its fixed cost tracks input block count)
        bucketed = bucketed.repartition(exchange_blocks)
    return bucketed.groupby("_bucket").map_groups(first_per_hash_bucket,
                                                  batch_format="pandas")


def training_prep_summary(sf_dir: str):
    """Per-predicted-language rollup of the deduped corpus (the
    queries() entry; deterministic). Pre-aggregated per block inside
    map_batches — only (blocks × languages) partial rows reach the
    driver, never the O(N) per-doc table."""
    from ..queries import _driver_combine, _exchange_blocks
    from ..sources.pages_from_documents import pages_dataset

    deduped = build_training_prep(pages_dataset(sf_dir),
                                  exchange_blocks=_exchange_blocks(sf_dir))

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"pred_lang": batch.column("pred_lang"),
                      "n_tokens": batch.column("n_tokens"),
                      "n_chars": batch.column("n_chars")})
        return t.group_by("pred_lang").aggregate(
            [("n_tokens", "sum"), ("n_chars", "sum"), ([], "count_all")]) \
            .rename_columns(["pred_lang", "p_tokens", "p_chars", "p_n"])

    partials = deduped.map_batches(partial, batch_format="pyarrow")
    return _driver_combine(partials, ["pred_lang"], {
        "n_docs": ("p_n", "sum"), "total_tokens": ("p_tokens", "sum"),
        "total_chars": ("p_chars", "sum")}, sort_by="pred_lang")
