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


def build_training_prep(pages_ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """pages Dataset → deduped per-doc quality/lang/token table
    (Dataset). The dedup shuffles only (hash, url, scalars)."""
    import pandas as pd

    from .extract import build_extract_ds

    ds = build_extract_ds(pages_ds, cfg)
    feat = ds.map_batches(quality_and_lang, batch_format="pyarrow")

    def first_per_hash(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("url").head(1)

    return feat.groupby("text_hash").map_groups(first_per_hash,
                                                batch_format="pandas")


def training_prep_summary(sf_dir: str):
    """Per-predicted-language rollup of the deduped corpus (the
    queries() entry; deterministic)."""
    import pandas as pd

    from ..sources.pages_from_documents import pages_dataset

    deduped = build_training_prep(pages_dataset(sf_dir))
    frames = list(deduped.iter_batches(batch_format="pandas"))
    df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["pred_lang", "n_chars", "n_tokens", "url"])
    g = df.groupby("pred_lang", dropna=False)
    out = pd.DataFrame({
        "n_docs": g["url"].count(),
        "total_tokens": g["n_tokens"].sum(),
        "total_chars": g["n_chars"].sum(),
    }).reset_index()
    return out.sort_values("pred_lang").reset_index(drop=True)
