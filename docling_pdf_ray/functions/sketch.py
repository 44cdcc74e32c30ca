"""Mergeable distinct-count sketch: HyperLogLog (Flajolet, Fusy,
Gandouet, Meunier, "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm", AofA 2007).

The Ray-Data shape is the MERGEABLE-PARTIAL pattern: each
``map_batches`` task folds its batch into a fixed 2^P-byte register
array; partials merge with an elementwise max (associative and
commutative, so ANY merge tree — per-block, per-node, driver — gives
the identical sketch); the estimate is computed once at the end. The
driver object is blocks × 2^P bytes regardless of corpus size — the
scale path for distinct counts whose exact answer would need a
vocabulary-sized shuffle.

All hashing is blake2b (seeded by content only): the sketch is
deterministic across runs, batch orders and parallelism levels.
"""

from __future__ import annotations

import numpy as np

P = 12                     # 2^12 = 4096 registers → std error ≈ 1.04/√m ≈ 1.6%
M = 1 << P
_ALPHA = 0.7213 / (1.0 + 1.079 / M)          # bias constant for m ≥ 128


def hll_new() -> np.ndarray:
    return np.zeros(M, dtype=np.uint8)


def hll_add_hashes(reg: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Fold 64-bit hashes into the registers, fully vectorized: the
    top P bits pick the register, rho = (leading zeros of the
    remaining 64-P bits) + 1 via exact float64 bit-length (the
    remaining value is < 2^52 ≤ 2^53, so frexp's exponent is exact)."""
    if len(hashes) == 0:
        return reg
    h = hashes.astype(np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = h & np.uint64((1 << (64 - P)) - 1)
    bitlen = np.frexp(rest.astype(np.float64))[1]        # 0 for rest == 0
    rho = ((64 - P) - bitlen + 1).astype(np.uint8)       # rest==0 → max rho
    np.maximum.at(reg, idx, rho)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


# ---------------------------------------------------------------- Bloom filter

# Classic Bloom filter (Bloom, CACM 1970) with Kirsch-Mitzenmacher
# double hashing (g_i = h1 + i·h2 — two hash halves give k independent
# probes, "Less hashing, same performance", ESA 2006). Mergeable by
# bitwise OR: per-batch partial bitmaps OR into the final filter, so
# the build is one map_batches pass + a tiny driver reduce. Use as a
# broadcast SEMI-JOIN PRE-FILTER: drop big-side rows whose key cannot
# be in the small side BEFORE any shuffle; survivors still need the
# exact membership check (false positives are possible, negatives are
# not).

BLOOM_K = 7                      # probes; ~optimal for 10 bits/key


def mix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (Steele/Lea/Flood, OOPSLA 2014),
    vectorized: avalanche sequential integer keys into uniform 64-bit
    hashes so the double-hashing probes are independent. uint64
    arithmetic wraps mod 2^64 by construction."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def bloom_bits_for(n_keys: int, bits_per_key: int = 10) -> int:
    """Bitmap size (bits) for ~1% FPR at 10 bits/key, rounded UP to a
    power of two: the double-hash step relies on gcd(h2, n_bits) = 1
    for full-cycle probes, which an odd h2 guarantees only against a
    power-of-two modulus."""
    need = max(64, n_keys * bits_per_key)
    return 1 << (need - 1).bit_length()


def bloom_new(n_bits: int) -> np.ndarray:
    return np.zeros(n_bits // 8, dtype=np.uint8)


def _bloom_positions(hashes: np.ndarray, n_bits: int) -> np.ndarray:
    """(len(hashes), K) bit positions via double hashing, vectorized."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)          # odd ⇒ full cycle
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None])
            % np.uint64(n_bits)).astype(np.int64)


def bloom_add_hashes(bm: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    if len(hashes) == 0:
        return bm
    pos = _bloom_positions(hashes, len(bm) * 8).ravel()
    np.bitwise_or.at(bm, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bm


def bloom_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def bloom_might_contain(bm: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership test: True where ALL k probed bits are
    set (maybe present); False is definite absence."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(hashes, len(bm) * 8)
    bits = (bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def hll_count(reg: np.ndarray) -> float:
    """The HLL07 estimator with its small-range (linear counting) and
    large-range corrections."""
    est = _ALPHA * M * M / np.sum(np.power(2.0, -reg.astype(np.float64)))
    if est <= 2.5 * M:
        zeros = int(np.count_nonzero(reg == 0))
        if zeros:
            return M * np.log(M / zeros)
    two64 = float(1 << 64)
    if est > two64 / 30.0:
        return -two64 * np.log(1.0 - est / two64)
    return float(est)


# ---------------------------------------------- bottom-k sample sketch
# Deterministic uniform sampling via order statistics of a hash
# (bottom-k / coordinated sampling: Cohen & Kaplan, "Summarizing data
# using bottom-k sketches", PODC 2007): keep the k items whose
# mix64(key) is smallest. Merging two sketches = union, re-take the k
# smallest — associative and commutative, so ANY merge tree gives the
# identical sketch (the HLL discipline), and the result is a uniform
# k-sample of the union fixed across runs, batch orders and
# parallelism. Quantiles read off the sample have rank error
# O(sqrt(p(1-p)/k)) — the scale path when the value domain is
# unbounded and the exact histogram combine (chars_quantiles) would
# not stay small.

BOTTOMK_K = 2048            # p50 std rank error ≈ sqrt(.25/2048) ≈ 1.1%


def bottomk_new() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """State = (h, key, value): parallel arrays sorted by (h, key),
    at most k entries. Keys must be unique item ids (e.g. doc_id) so
    (h, key) is a total order and ties cannot make the sample
    ambiguous."""
    return (np.array([], dtype=np.uint64), np.array([], dtype=np.int64),
            np.array([], dtype=np.int64))


def _bottomk_take(h, keys, vals, k: int):
    order = np.lexsort((keys, h))[:k]
    return h[order], keys[order], vals[order]


def bottomk_add(state, keys: np.ndarray, vals: np.ndarray,
                k: int = BOTTOMK_K):
    """Fold (unique-key, value) items into the sketch."""
    h = mix64(keys.astype(np.int64))
    return _bottomk_take(np.concatenate([state[0], h]),
                         np.concatenate([state[1], keys.astype(np.int64)]),
                         np.concatenate([state[2], vals.astype(np.int64)]), k)


def bottomk_merge(a, b, k: int = BOTTOMK_K):
    return _bottomk_take(np.concatenate([a[0], b[0]]),
                         np.concatenate([a[1], b[1]]),
                         np.concatenate([a[2], b[2]]), k)


def bottomk_quantiles(state, ps) -> list[int]:
    """percentile_disc over the sample values (the same smallest-v-
    with-100·cum ≥ p·n rule as the exact path, applied to the
    sample)."""
    vals = np.sort(state[2], kind="stable")
    n = len(vals)
    if n == 0:
        raise ValueError("empty sketch")
    return [int(vals[min(n - 1, int(np.searchsorted(
        (np.arange(1, n + 1)) * 100, p * n, side="left")))]) for p in ps]


# ---------------------------------------------- Misra-Gries heavy hitters
# Frequent-items summary (Misra & Gries, "Finding repeated elements",
# Sci. Comput. Program. 1982), in the mergeable-summaries formulation
# (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable summaries",
# PODS 2012, §3): a summary is at most k (item, count) pairs; folding
# more items in = add exact counts, then PRUNE — subtract the (k+1)-th
# largest count from every counter and keep the positive ones. The
# prune is purely value-based (no tie-breaking), so a summary is a
# deterministic function of the (item → count) multiset it absorbed.
# Across ANY merge tree the total weight subtracted from any single
# item is at most n/(k+1) (n = total stream length), so every item
# with true frequency > n/(k+1) survives with a positive counter:
# the summary is a GUARANTEED SUPERSET of the phi-heavy hitters for
# any phi >= 1/(k+1). Counts are lower bounds (undercount <= n/(k+1));
# callers that need exact frequencies run a second exact counting
# pass over the <= k candidates (broadcast, zero shuffle) — that
# two-pass composition is exact AND independent of block partitioning
# and merge order, hence SQL-checkable.

MG_K = 8191            # candidate capacity; guarantees phi >= 1/8192


def mg_prune(items: np.ndarray, counts: np.ndarray,
             k: int = MG_K) -> tuple[np.ndarray, np.ndarray]:
    """Prune an exact/partial (item, count) summary down to at most k
    counters. ``items`` is any 1-D array (object/str/int); ``counts``
    int64, all positive."""
    if len(counts) <= k:
        return items, counts
    thresh = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    keep = counts > thresh
    return items[keep], counts[keep] - thresh


def mg_combine(summaries, k: int = MG_K):
    """N-way merge of MG summaries (iterable of (items, counts)
    pairs): exact count addition by item, then ONE prune — the driver
    combine of the per-block partials. A single final prune subtracts
    at most one threshold, so the total undercount over any
    partial-prune + combine composition stays <= n/(k+1)."""
    import pandas as pd

    s = pd.concat([pd.Series(c, index=i) for i, c in summaries])
    s = s.groupby(level=0, sort=False).sum()
    return mg_prune(s.index.to_numpy(), s.to_numpy(np.int64), k)


# ---------------------------------------------- count-min sketch
# Frequency-estimation sketch (Cormode & Muthukrishnan, "An improved
# data stream summary: the count-min sketch and its applications",
# J. Algorithms 2005): a d×w counter matrix; each item adds its count
# to one counter per row (row positions via Kirsch-Mitzenmacher double
# hashing off one 64-bit item hash); the estimate is the MIN over
# rows. Mergeable by elementwise ADDITION — each partial's counters
# are exact sums over its slice, so any merge tree gives the identical
# sketch (the HLL/bottom-k/MG discipline). Estimates NEVER
# underestimate; the overestimate is ≤ e·N/w with probability
# ≥ 1 − e^−d (N = total stream weight). Composed with Misra-Gries
# (candidates = guaranteed heavy-hitter superset, CMS = their count
# estimates) it answers approximate top-k with ZERO shuffle and
# O(k + d·w) driver state.

CMS_D = 4                  # rows → overestimate prob ≤ e^-4 ≈ 1.8%
CMS_W = 1 << 14            # counters/row → overestimate ≤ e·N/16384


def cms_new(d: int = CMS_D, w: int = CMS_W) -> np.ndarray:
    return np.zeros((d, w), dtype=np.int64)


def _cms_positions(hashes: np.ndarray, d: int, w: int) -> np.ndarray:
    """(d, len(hashes)) counter columns via double hashing; odd h2 ⇒
    full cycle against the power-of-two width (same argument as the
    Bloom probes)."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    r = np.arange(d, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + r * h2[None, :]) % np.uint64(w)) \
            .astype(np.int64)


def cms_add_hashes(sk: np.ndarray, hashes: np.ndarray,
                   counts: np.ndarray) -> np.ndarray:
    if len(hashes) == 0:
        return sk
    pos = _cms_positions(hashes, sk.shape[0], sk.shape[1])
    c = counts.astype(np.int64)
    for r in range(sk.shape[0]):
        np.add.at(sk[r], pos[r], c)
    return sk


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_query_hashes(sk: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates (min over rows), vectorized over the probe set."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=np.int64)
    pos = _cms_positions(hashes, sk.shape[0], sk.shape[1])
    est = sk[0][pos[0]]
    for r in range(1, sk.shape[0]):
        est = np.minimum(est, sk[r][pos[r]])
    return est.astype(np.int64)
