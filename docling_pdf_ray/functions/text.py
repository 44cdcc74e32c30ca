"""Text-analysis operators for large-scale training-data pipelines:
token counting, quality features, document fingerprinting, language ID.

All are deterministic pure functions designed to run vectorized-ish
inside ``map_batches`` (compiled regexes / hashes per batch, no
per-row task overhead). Where a DuckDB oracle exists, the regex
patterns are restricted to ASCII classes so RE2 and Python ``re``
agree exactly (documented per function).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# BPE-ish word/punct tokenizer. ASCII classes ONLY so the same pattern
# string is valid and equivalent in DuckDB's RE2 (oracle SQL uses it
# verbatim via regexp_extract_all).
TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9 \t\n\r\f]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

_ALPHA_RE = re.compile(r"[^A-Za-z]")
_PUNCT_RE = re.compile(r"[^.,;:!?'\"()\[\]-]")


def token_counts(texts: list[str | None]) -> np.ndarray:
    """Tokens per text under TOKEN_PATTERN; None → 0."""
    return np.fromiter(
        (len(_TOKEN_RE.findall(t)) if t else 0 for t in texts),
        dtype=np.int64, count=len(texts))


def alpha_char_counts(texts: list[str | None]) -> np.ndarray:
    """Count of [A-Za-z] chars (oracle: length(regexp_replace(text,
    '[^A-Za-z]', '', 'g')))."""
    return np.fromiter(
        (len(_ALPHA_RE.sub("", t)) if t else 0 for t in texts),
        dtype=np.int64, count=len(texts))


def punct_char_counts(texts: list[str | None]) -> np.ndarray:
    return np.fromiter(
        (len(_PUNCT_RE.sub("", t)) if t else 0 for t in texts),
        dtype=np.int64, count=len(texts))


def md5_hex_col(col) -> "pa.Array":
    """Vectorized :func:`md5_hex` over an Arrow string column: cast to
    binary (the string's utf-8 buffer — no per-row ``str.encode``),
    hash each DISTINCT payload once (``pd.factorize``, hash-based) and
    reconstruct the row stream by code — the ``dedup.md5_u64``
    unique-inverse pattern (r3 verdict #6). Nulls stay null (SQL
    ``md5(NULL) IS NULL``). Byte-identical to :func:`md5_hex`
    (pinned by test)."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow as pa

    vals = np.asarray(col.cast(pa.large_binary()).to_pylist(), dtype=object)
    codes, uniq = pd.factorize(vals, use_na_sentinel=True)
    hx = np.array([hashlib.md5(u).hexdigest() for u in uniq], dtype=object)
    out = np.empty(len(vals), dtype=object)
    mask = codes >= 0
    out[mask] = hx[codes[mask]]
    out[~mask] = None
    return pa.array(out, pa.string())


def md5_hex(texts: list[str | None]) -> list[str | None]:
    """Content fingerprint == DuckDB md5(text): None → None (SQL
    md5(NULL) IS NULL — hashing None as '' would silently merge
    null-text rows into the empty-string dedup group)."""
    return [None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in texts]


def rolling_fingerprint(text: str, window: int = 8, mod: int = 1 << 61) -> int:
    """Rabin-Karp-style rolling hash over word shingles: the minimum
    window-hash across the document (a 1-permutation MinHash — a
    compact content fingerprint robust to local edits). Deterministic;
    no SQL analog (rows-only check)."""
    words = text.split()
    if not words:
        return 0
    hs = [int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
          for w in words]
    if len(hs) <= window:
        acc = 0
        for h in hs:
            acc = (acc * 1_000_003 + h) % mod
        return acc
    best = None
    acc = 0
    pw = pow(1_000_003, window - 1, mod)
    for i, h in enumerate(hs):
        if i >= window:
            acc = (acc - hs[i - window] * pw) % mod
        acc = (acc * 1_000_003 + h) % mod
        if i >= window - 1:
            best = acc if best is None else min(best, acc)
    return best


# ---------------------------------------------------------------- PII scrub

# ASCII-only patterns shared VERBATIM with the DuckDB oracle (RE2):
# the standard pre-training corpus scrub targets. The character classes
# are explicit ASCII, but \b in Python re is Unicode-aware while RE2's
# is ASCII-only (e.g. '版本1.2.3.4' has a RE2 word boundary between 本
# and 1 but not a Python one) — so compile with re.ASCII to pin Python
# to RE2's semantics. {m,n} repetition is identical in both engines.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{1,3}[ -][0-9]{2,4}[ -][0-9]{3,4}[ -][0-9]{3,4}",
}
_PII_RES = {k: re.compile(p, re.ASCII) for k, p in PII_PATTERNS.items()}


def pii_counts(texts: list[str | None]) -> dict[str, np.ndarray]:
    """Per-text match counts for each PII class; None → 0."""
    out = {}
    for k, rx in _PII_RES.items():
        out[k] = np.fromiter(
            (len(rx.findall(t)) if t else 0 for t in texts),
            dtype=np.int64, count=len(texts))
    return out


def redact_pii(text: str | None, token: str = "[REDACTED]") -> str | None:
    """Replace every PII match with the token (fixed class order:
    email, ipv4, phone — deterministic output)."""
    if text is None:
        return None
    for k in ("email", "ipv4", "phone"):
        text = _PII_RES[k].sub(token, text)
    return text


# ---------------------------------------------------------------- language ID

# n-gram-free heuristic: stopword hit-rate per language + CJK ratio.
# Deterministic; matches the 5 langs in the corpus (TESTDATA.md).
STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with",
           "was", "on", "are", "this", "be", "have", "not", "they", "his", "from"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que",
           "qui", "dans", "pour", "pas", "sur", "avec", "son", "au", "il", "elle"},
    "es": {"el", "la", "los", "las", "de", "y", "que", "en", "un", "una",
           "es", "por", "con", "para", "su", "se", "del", "al", "como", "más"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "den", "des", "ein",
           "eine", "zu", "im", "für", "auf", "nicht", "sich", "auch", "es", "dem"},
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _cjk_ratio(text: str) -> float:
    if not text:
        return 0.0
    cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
    return cjk / len(text)


def detect_language(text: str | None) -> str:
    """Best-guess language ∈ {en,fr,es,de,zh,unknown}."""
    if not text:
        return "unknown"
    if _cjk_ratio(text) > 0.05:
        return "zh"
    words = [w.lower() for w in _WORD_RE.findall(text)[:500]]
    if not words:
        return "unknown"
    best_lang, best_hits = "unknown", 0
    for lang in sorted(STOPWORDS):
        hits = sum(1 for w in words if w in STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits == 0:
        return "unknown"
    return best_lang


def quality_features(text: str | None) -> dict:
    """Quality-scoring features (length / punctuation / stopword /
    alpha ratios) for filter pipelines."""
    t = text or ""
    n = len(t)
    words = t.split()
    en_stop = STOPWORDS["en"]
    stop_hits = sum(1 for w in words if w.lower() in en_stop)
    return {
        "n_chars": n,
        "n_words": len(words),
        "mean_word_len": (sum(len(w) for w in words) / len(words)) if words else 0.0,
        "alpha_ratio": (len(_ALPHA_RE.sub("", t)) / n) if n else 0.0,
        "punct_ratio": (len(_PUNCT_RE.sub("", t)) / n) if n else 0.0,
        "stopword_ratio": (stop_hits / len(words)) if words else 0.0,
    }


def ascii_tokens_flat(text_col):
    """Arrow-vectorized ASCII tokenization shared by every query that
    must match DuckDB's ``regexp_extract_all(text,'[A-Za-z0-9]+') →
    lower`` token stream (the oracle-critical ASCII-class contract —
    CLAUDE.md: share explicit ASCII classes; a drifted copy would
    desynchronize engine vs oracle silently).

    ``text_col``: an Arrow array/chunked array of strings with NO
    nulls (callers filter first). Returns ``(flat, parent)``: the
    lowercased non-empty tokens (numpy object array) and each token's
    row index (int64)."""
    import numpy as np
    import pyarrow.compute as pc

    lowered = pc.ascii_lower(text_col.combine_chunks()
                             if hasattr(text_col, "combine_chunks")
                             else text_col)
    words = pc.split_pattern_regex(lowered, pattern="[^a-z0-9]+")
    flat = pc.list_flatten(words).to_pandas().to_numpy()
    parent = pc.list_parent_indices(words).to_numpy().astype(np.int64)
    keep = flat != ""
    return flat[keep], parent[keep]


def ws_tokens_flat(text_col):
    """Arrow-vectorized ASCII-whitespace tokenization — the flat-array
    twin of :func:`docling_pdf_ray.functions.dedup.split_ws` (same
    ``WS_PATTERN`` contract, so it matches DuckDB
    ``regexp_split_to_array(text, WS_PATTERN)`` with empties dropped).
    ``text_col`` must have no nulls (callers filter first). Returns
    ``(flat, parent)``: non-empty tokens (numpy object array) and each
    token's row index (int64)."""
    import numpy as np
    import pyarrow.compute as pc

    from .dedup import WS_PATTERN

    col = (text_col.combine_chunks()
           if hasattr(text_col, "combine_chunks") else text_col)
    words = pc.split_pattern_regex(col, pattern=WS_PATTERN)
    flat = pc.list_flatten(words).to_pandas().to_numpy()
    parent = pc.list_parent_indices(words).to_numpy().astype(np.int64)
    keep = flat != ""
    return flat[keep], parent[keep]
