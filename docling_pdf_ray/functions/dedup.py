"""Near-duplicate detection operators for training-data pipelines:
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine.

Algorithms follow the published literature: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
1997), banded LSH (Leskovec/Rajaraman/Ullman, Mining of Massive
Datasets ch. 3), SimHash (Charikar, "Similarity estimation techniques
from rounding algorithms", STOC 2002; applied to web dedup in Manku et
al., WWW 2007), and random-hyperplane cosine LSH (Charikar 2002).

All hashing is seeded/deterministic (no process randomness — results
are identical across runs and parallelism levels). The Ray pipelines
follow the sketch-then-shuffle-small discipline: signatures are
computed vectorized inside ``map_batches``; only (band_hash, doc_id)
pairs — never text — enter the groupby; candidate pairs are verified
exactly afterwards.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# ---------------------------------------------------------------- shingling

# ASCII whitespace class shared VERBATIM with the DuckDB oracle regexes
# (RE2). Python str.split() splits on *Unicode* whitespace while RE2's
# \s is ASCII-only — a document containing U+00A0/U+3000 would tokenize
# differently on the two engines, so both sides use this explicit class
# (structural equivalence, not corpus-coincidental). WS_CHARS is the
# canonical character set; every derived form (the split pattern here,
# the word-start anchor rule and SQL IN-list in queries.py) builds
# from it so the class can never fork.
WS_CHARS = " \t\n\r\x0b\x0c"
WS_PATTERN = r"[ \t\n\r\x0b\x0c]+"
_WS_RE = re.compile(WS_PATTERN)
# structural pin: the pattern accepts exactly WS_CHARS, nothing else
assert _WS_RE.fullmatch(WS_CHARS) and not any(
    _WS_RE.fullmatch(chr(c)) for c in range(128) if chr(c) not in WS_CHARS)


def split_ws(text: str) -> list[str]:
    """ASCII-whitespace word split, empty tokens dropped — the shared
    tokenizer for every dedup operator that has a SQL mirror."""
    return [w for w in _WS_RE.split(text) if w]


def word_shingles(text: str, k: int = 3) -> set[str]:
    words = split_ws(text)
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def shingle_pairs_vec(texts, k: int = 3):
    """Fully-vectorized per-row distinct k-word shingling over an Arrow
    string array: returns ``(row_idx, shingles)`` numpy arrays with one
    entry per (row, DISTINCT shingle), matching :func:`word_shingles`
    semantics exactly (ASCII-WS split via ``WS_PATTERN``, empty tokens
    dropped, ``1..k-1`` words → one whole-join shingle, 0 words → no
    rows). No per-row Python in the >= k-word common case; only the
    rare short docs take a per-doc join.

    ``texts`` must be a flat ``pa.StringArray`` (callers
    ``combine_chunks()`` first); nulls yield no rows."""
    import pandas as pd
    import pyarrow.compute as pc

    n = len(texts)
    words = pc.split_pattern_regex(texts, pattern=WS_PATTERN)
    flat = pc.list_flatten(words).to_pandas().to_numpy()
    parent = pc.list_parent_indices(words).to_numpy().astype(np.int64)
    keep = flat != ""
    flat, parent = flat[keep], parent[keep]
    wc = np.bincount(parent, minlength=n)

    if len(flat) >= k:
        m = len(flat) - k + 1
        # window starting at i stays in one doc iff parent[i]==parent[i+k-1]
        # (parents are nondecreasing)
        same = parent[:m] == parent[k - 1:]
        sh = flat[:m].astype(object)
        for j in range(1, k):
            sh = sh + " "
            sh = sh + flat[j:j + m]
        rows, shingles = parent[:m][same], sh[same]
        if len(rows):
            dd = pd.DataFrame({"r": rows, "s": shingles}).drop_duplicates()
            rows, shingles = dd["r"].to_numpy(), dd["s"].to_numpy()
    else:
        rows = np.array([], dtype=np.int64)
        shingles = np.array([], dtype=object)

    short = np.flatnonzero((wc > 0) & (wc < k))
    if len(short):
        starts = np.searchsorted(parent, short, side="left")
        ends = np.searchsorted(parent, short, side="right")
        joins = np.array([" ".join(flat[s:e]) for s, e in zip(starts, ends)],
                         dtype=object)
        rows = np.concatenate([rows, short])
        shingles = np.concatenate([shingles, joins])
    return rows, shingles


def ngram_stream_vec(texts, k: int = 3, return_parents: bool = False):
    """Fully-vectorized k-word n-gram stream WITH MULTIPLICITY over an
    Arrow string array — the frequency-counting sibling of
    :func:`shingle_pairs_vec` (which is per-row DISTINCT, for set
    similarity). Same ASCII ``WS_PATTERN`` word split with empty
    tokens dropped; rows with fewer than k words emit nothing (the
    ``generate_series(1, len(words)-k+1)`` SQL semantics); nulls emit
    nothing. Returns one object-dtype entry per n-gram occurrence, in
    stream order; with ``return_parents`` also the int64 row index of
    each occurrence (nondecreasing — winnowing relies on that)."""
    import pyarrow.compute as pc

    words = pc.split_pattern_regex(texts, pattern=WS_PATTERN)
    flat = pc.list_flatten(words).to_pandas().to_numpy()
    parent = pc.list_parent_indices(words).to_numpy().astype(np.int64)
    keep = flat != ""
    flat, parent = flat[keep], parent[keep]
    if len(flat) < k:
        empty = np.array([], dtype=object)
        return (empty, np.array([], dtype=np.int64)) if return_parents \
            else empty
    m = len(flat) - k + 1
    same = parent[:m] == parent[k - 1:]
    sh = flat[:m].astype(object)
    for j in range(1, k):
        sh = sh + " "
        sh = sh + flat[j:j + m]
    if return_parents:
        return sh[same], parent[:m][same]
    return sh[same]


def md5_u64(grams: np.ndarray) -> np.ndarray:
    """First 8 bytes (big-endian) of md5 per string, as uint64 — the
    cross-engine hash this repo standardizes on (DuckDB computes the
    identical value as ``('0x' || substr(md5(g),1,16))::UBIGINT``; same
    choice as :func:`simhash64`). Hashing loops over the DISTINCT
    grams only (md5 has no numpy kernel); the repeat-heavy stream is
    reconstructed by the unique-inverse."""
    import hashlib

    if len(grams) == 0:
        return np.array([], dtype=np.uint64)
    uniq, inv = np.unique(grams, return_inverse=True)
    hu = np.fromiter(
        (int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "big")
         for g in uniq), dtype=np.uint64, count=len(uniq))
    return hu[inv]


def winnow_select(h: np.ndarray, parents: np.ndarray, w: int) -> np.ndarray:
    """Winnowing fingerprint selection (Schleimer, Wilkerson, Aiken,
    "Winnowing: local algorithms for document fingerprinting", SIGMOD
    2003): over every window of ``w`` consecutive k-gram hashes that
    lies entirely inside one document, select the RIGHTMOST minimum
    hash. Guarantees: at least one fingerprint per window (detection of
    any match of length >= w+k-1 words) and expected density 2/(w+1).

    Vectorized across the whole batch stream: ``h`` uint64 hashes in
    stream order, ``parents`` nondecreasing doc indices (both from
    :func:`ngram_stream_vec`). Returns a boolean SELECTED mask over the
    stream (a position picked by several windows is selected once).
    Docs with fewer than w grams emit no windows, hence no selections
    — mirrored by the SQL oracle's ``generate_series(1, m-w+1)``."""
    n = len(h)
    mask = np.zeros(n, dtype=bool)
    if n < w:
        return mask
    sw = np.lib.stride_tricks.sliding_window_view(h, w)
    valid = parents[:n - w + 1] == parents[w - 1:]
    # argmin of the REVERSED window = rightmost minimum of the window
    sel = np.arange(n - w + 1) + (w - 1 - np.argmin(sw[:, ::-1], axis=1))
    mask[sel[valid]] = True
    return mask


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact n-gram Jaccard similarity (the verifier for MinHash
    candidates and a standalone pairwise operator)."""
    return jaccard(word_shingles(text_a, k), word_shingles(text_b, k))


def jaccard_counts(text_a: str, text_b: str, k: int = 3) -> tuple[int, int]:
    """Exact Jaccard as (|A∩B|, |A∪B|) integer counts — used where the
    result must hash identically across engines (float division and
    rounding rules differ between Python and SQL; the integer pair is
    representation-unambiguous)."""
    a, b = word_shingles(text_a, k), word_shingles(text_b, k)
    inter = len(a & b)
    return inter, len(a) + len(b) - inter


# ---------------------------------------------------------------- MinHash

_MERSENNE = (1 << 61) - 1
NUM_PERM = 64
NUM_BANDS = 16          # 16 bands × 4 rows: catches J≳0.7 reliably
ROWS_PER_BAND = NUM_PERM // NUM_BANDS


def _perm_params(num_perm: int = NUM_PERM, seed: int = 42):
    import random

    rng = random.Random(seed)
    a = np.array([rng.randrange(1, _MERSENNE) for _ in range(num_perm)], dtype=np.uint64)
    b = np.array([rng.randrange(0, _MERSENNE) for _ in range(num_perm)], dtype=np.uint64)
    return a, b


_A, _B = _perm_params()


def _shingle_hashes(shingles: set[str]) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
         for s in shingles),
        dtype=np.uint64, count=len(shingles))


def _sig_from_hashes(x: np.ndarray) -> np.ndarray:
    """Signature from pre-hashed shingles. Universal hashing
    h_i(x) = (a_i·x + b_i) mod p over the Mersenne prime p = 2^61-1,
    exact in uint64 via 30-bit limb split, fully vectorized as one
    (perm × shingle) broadcast + min."""
    m = np.uint64(_MERSENNE)
    x = x % m
    lo = x & np.uint64((1 << 30) - 1)                     # low 30 bits
    hi = x >> np.uint64(30)                               # high 31 bits
    a = _A % m
    a_lo = (a & np.uint64((1 << 30) - 1))[:, None]
    a_hi = (a >> np.uint64(30))[:, None]
    # a·x = (a_hi·x_hi)<<60 + (a_hi·x_lo + a_lo·x_hi)<<30 + a_lo·x_lo,
    # every partial product < 2^62 so uint64 never overflows
    t0 = (a_lo * lo[None, :]) % m
    t1 = (a_hi * lo[None, :] + a_lo * hi[None, :]) % m
    t2 = (a_hi * hi[None, :]) % m
    # (x << s) mod (2^61-1) is a 61-bit rotation (2^61 ≡ 1 mod p)
    v = (t0 + _shl_mod(t1, 30) + _shl_mod(t2, 60)) % m
    v = (v + (_B % m)[:, None]) % m
    return v.min(axis=1)


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64-permutation MinHash signature of the word-k-shingle set."""
    sh = word_shingles(text, k)
    if not sh:
        return np.zeros(NUM_PERM, dtype=np.uint64)
    return _sig_from_hashes(_shingle_hashes(sh))


def _h64(s: str) -> int:
    return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                          "big")


_SHINGLE_CACHE_CAP = 1 << 18     # ≈260k entries; bounds the per-batch
                                 # footprint when a batch is a whole
                                 # block of documents (batch_size=None)


def minhash_signatures(texts, k: int = 3) -> list[np.ndarray]:
    """Batch variant with a shared shingle-hash cache: each DISTINCT
    shingle in the batch is blake2b-hashed once while the cache is
    warm (near-dup corpora share most shingles across documents, so
    the dominant cost — per-shingle hashing — amortizes across the
    batch). The cache is CAPPED: past _SHINGLE_CACHE_CAP distinct
    shingles it resets rather than growing O(block text) in task
    memory. Byte-identical to per-doc :func:`minhash_signature`
    (pinned by test — caching/reset cannot change a hash value).
    Empty shingle sets yield None (caller skips them — no similarity
    evidence)."""
    cache: dict[str, int] = {}
    out: list[np.ndarray | None] = []
    for t in texts:
        sh = word_shingles(t or "", k)
        if not sh:
            out.append(None)
            continue
        if len(cache) > _SHINGLE_CACHE_CAP:
            cache = {}
        hs = np.fromiter((cache[s] if s in cache else cache.setdefault(s, _h64(s))
                          for s in sh), dtype=np.uint64, count=len(sh))
        out.append(_sig_from_hashes(hs))
    return out


def _shl_mod(x: np.ndarray, s: int) -> np.ndarray:
    """(x << s) mod 2^61-1 without overflow: rotate within 61 bits."""
    m = np.uint64(_MERSENNE)
    x = x % m
    hi = x >> np.uint64(61 - s)
    lo = (x << np.uint64(s)) & m
    return (hi + lo) % m


def band_hashes(sig: np.ndarray) -> list[int]:
    """LSH banding: hash each band of ROWS_PER_BAND signature values;
    docs sharing any band hash are candidates."""
    out = []
    for b in range(NUM_BANDS):
        chunk = sig[b * ROWS_PER_BAND:(b + 1) * ROWS_PER_BAND]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
        out.append(int.from_bytes(h, "big") >> 1)  # fit int64
    return out


def minhash_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


# ---------------------------------------------------------------- SimHash

def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (term-frequency
    weighted). The per-word bit expansion is one numpy broadcast over
    the unique-word hash vector (not a Python loop per word per bit) —
    byte-identical output to the scalar definition. Tokenizes with
    split_ws for consistency with the minhash operators.

    Word hash is the first 8 bytes (big-endian) of md5 — r3: chosen
    over blake2b ONLY because DuckDB can compute the identical value
    (``('0x' || substr(md5(w),1,16))::UBIGINT``), which makes the
    whole fingerprint — and therefore the simhash pair query —
    SQL-checkable. Hash quality is equivalent for sketching."""
    words = split_ws(text)
    if not words:
        return 0
    from collections import Counter

    c = Counter(words)
    hs = np.fromiter(
        (int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
         for w in c), dtype=np.uint64, count=len(c))
    cnt = np.fromiter(c.values(), dtype=np.int64, count=len(c))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)) \
        .astype(np.int64)
    acc = (cnt[:, None] * (2 * bits - 1)).sum(axis=0)
    fp = 0
    for i in range(64):
        if acc[i] > 0:
            fp |= 1 << i
    return fp


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_bands(fp: int, n_bands: int = 4) -> list[int]:
    """Split the 64-bit fingerprint into n equal bands; two docs at
    hamming distance < n_bands must agree on at least one band
    (pigeonhole) → exact-match blocking key."""
    w = 64 // n_bands
    mask = (1 << w) - 1
    return [(b << 60) | ((fp >> (b * w)) & mask) for b in range(n_bands)]


# ---------------------------------------------------------------- embeddings

def hyperplane_signs(vectors: np.ndarray, n_planes: int = 16, seed: int = 42,
                     dim: int | None = None) -> np.ndarray:
    """Random-hyperplane LSH bucket ids (cosine-preserving): the
    scale path for embedding near-dup / ANN — bucket by sign pattern,
    compare only within buckets."""
    dim = dim or vectors.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((dim, n_planes))
    signs = (vectors @ planes) > 0
    return signs.dot(1 << np.arange(n_planes)).astype(np.int64)


def cosine_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    an = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    bn = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return an @ bn.T


# ---------------------------------------------------------- fuzzy string join

def deletion_variants(s: str) -> set[str]:
    """SymSpell d=1 blocking keys: the string itself plus every
    single-character deletion. ED(a, b) <= 1 implies
    variants(a) ∩ variants(b) ≠ ∅ — equal strings share themselves, a
    substitution shares the both-sides deletion of the differing
    position, and for an insert/delete the shorter string IS a deletion
    of the longer — so blocking on these keys has recall 1. The
    converse is false ("ab"/"ba" share deletions at distance 2), so
    candidates must be verified with :func:`edit_distance_le1`."""
    return {s} | {s[:k] + s[k + 1:] for k in range(len(s))}


def edit_distance_le1(a: str, b: str) -> int | None:
    """Exact Levenshtein distance when it is <= 1, else None — the
    O(n) banded check (equal length: at most one mismatch; length off
    by one: a single skip alignment). Matches DuckDB ``levenshtein``
    on the verified domain (codepoint-level, which coincides with
    Python str indexing)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return None
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return None
                seen = True
        return 1
    if la > lb:
        a, b, la = b, a, lb
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else None
