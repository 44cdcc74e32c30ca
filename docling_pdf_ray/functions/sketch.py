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
