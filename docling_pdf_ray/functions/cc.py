"""Distributed connected components — the SCALE PATH for the near-dup
dedup-grouping decision.

``queries.dedup_groups_from_pairs`` union-finds the pair graph on the
driver; that is the right call while the pair set is O(near-dups) and
driver-sized, but a 100-TB crawl with a 30% duplication rate produces
billions of edges — the component computation itself must then be
distributed. This module implements the alternating LARGE-STAR /
SMALL-STAR algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", ACM SoCC 2014): each
half-round is ONE bucketed shuffle of the edge list, the edge set is the
only state (it lives in the object store, never on the driver), and the
edge count never grows above 2x the input, converging to a disjoint
union of stars centered at the component minima in O(log^2 n) rounds
(O(log n) in practice; near-dup graphs are clique/star-like and finish
in 2-3).

Per-round dataflow, in repo house style (the same bucketed-groupby
pattern as the minhash pairing and sessionization stages — a fixed
number of FAT vectorized groups, never one Python call per node):

- ``map_batches``: orient/bidirect the edges and attach
  ``_bucket = node % n_buckets`` for the grouping endpoint;
- ``groupby("_bucket").map_groups``: all edges of every node hashing to
  the bucket are co-located, so a batch ``drop_duplicates`` is a GLOBAL
  dedup and the star emission is one pandas ``groupby("u").transform``
  — no per-node tasks, no Python loop over rows;
- ``materialize()`` per round: iterative algorithms must cut lineage or
  every round re-executes the whole upstream detection pipeline.

Semantics of the two half-rounds (edges held canonical ``u > v``):

- large-star (grouped on BOTH endpoints via bidirection): for node c
  with neighborhood N(c), m = min(N(c) + [c]); emit (n, m) for every
  neighbor n > c. Connects all larger neighbors to the local minimum.
- small-star (grouped on the larger endpoint): for node u with smaller
  neighbors N-(u), m = min(N-(u)); emit (u, m) and (v, m) for every
  v in N-(u), v != m. Contracts the smaller neighborhood onto its min.

Convergence: at the star fixpoint both operations reproduce the edge
set EXACTLY (each star edge is emitted once, by its center's group in
large-star and its leaf's group in small-star), so the per-round
multiset statistics (count, wrapping int64 sum and xor of
``mix64(mix64(u) ^ v)``) become stable; stability is checked after every
round and the final edge set is additionally verified to be star-formed
(every larger endpoint has exactly one distinct neighbor and no center
appears as a leaf) before extraction — a 2^-128 checksum coincidence
fails loudly instead of returning a wrong grouping. Equivalence with
driver union-find is pinned by tests on path / clique / random graphs
under hostile block layouts (tests/test_cc.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .sketch import mix64

CC_MAX_ROUNDS = 64


def _rd():
    import ray.data
    return ray.data


def _canon_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize an edge frame: int64 (u, v) with u > v, self-loops
    dropped, deduplicated. Driver-side, input-preparation only."""
    u = df["u"].to_numpy(np.int64)
    v = df["v"].to_numpy(np.int64)
    hi, lo = np.maximum(u, v), np.minimum(u, v)
    keep = hi != lo
    out = pd.DataFrame({"u": hi[keep], "v": lo[keep]})
    return out.drop_duplicates(ignore_index=True)


def _stats(edges) -> tuple[int, int, int]:
    """Order- and partitioning-independent multiset checksum of a
    canonical edge Dataset: (count, sum, xor) of mix64(mix64(u) ^ v).
    One cheap streaming pass over the materialized edges."""

    def partial(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False).astype(np.uint64)
        v = batch.column("v").to_numpy(zero_copy_only=False).astype(np.uint64)
        # int64 values are the two's-complement REINTERPRETATION of the
        # uint64 hashes: wrapping int64 addition then equals uint64
        # addition mod 2^64 regardless of how rows split into partials,
        # so the statistic is exactly block-layout-invariant.
        h = mix64(mix64(u) ^ v).view(np.int64)
        with np.errstate(over="ignore"):
            s = int(h.sum(dtype=np.int64)) if len(h) else 0
        x = int(np.bitwise_xor.reduce(h)) if len(h) else 0
        return pa.table({"n": pa.array([len(h)], pa.int64()),
                         "s": pa.array([s], pa.int64()),
                         "x": pa.array([x], pa.int64())})

    parts = edges.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return (0, 0, 0)
    with np.errstate(over="ignore"):
        s = int(parts["s"].to_numpy(np.int64).sum(dtype=np.int64))
        x = int(np.bitwise_xor.reduce(parts["x"].to_numpy(np.int64)))
    return (int(parts["n"].sum()), s, x)


def _large_star(edges, n_buckets: int):
    """One large-star half-round: ONE bucketed shuffle, vectorized
    per-bucket emission."""

    def bidirect(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        c = np.concatenate([u, v])          # grouping endpoint
        n = np.concatenate([v, u])
        return pa.table({"c": pa.array(c, pa.int64()),
                         "n": pa.array(n, pa.int64()),
                         "_bucket": pa.array(c % n_buckets, pa.int32())})

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["c", "n"])  # co-located => global dedup
        m = np.minimum(d.groupby("c")["n"].transform("min").to_numpy(np.int64),
                       d["c"].to_numpy(np.int64))
        keep = d["n"].to_numpy(np.int64) > d["c"].to_numpy(np.int64)
        return pd.DataFrame({"u": d["n"].to_numpy(np.int64)[keep],
                             "v": m[keep]})

    return edges.map_batches(bidirect, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(emit, batch_format="pandas")


def _small_star(edges, n_buckets: int):
    """One small-star half-round (input canonical u > v): ONE bucketed
    shuffle on the larger endpoint, vectorized per-bucket emission."""

    def bucket(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_bucket", pa.array(u % n_buckets, pa.int32()))

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["u", "v"])
        u = d["u"].to_numpy(np.int64)
        v = d["v"].to_numpy(np.int64)
        m = d.groupby("u")["v"].transform("min").to_numpy(np.int64)
        # (v, m) for smaller neighbors v != m, plus one (u, m) per node
        keep = v != m
        first = np.zeros(len(d), dtype=bool)    # one row per distinct u
        first[np.unique(u, return_index=True)[1]] = True
        return pd.DataFrame({
            "u": np.concatenate([v[keep], u[first]]),
            "v": np.concatenate([m[keep], m[first]])})

    return edges.map_batches(bucket, batch_format="pyarrow") \
        .groupby("_bucket").map_groups(emit, batch_format="pandas")


def connected_components(edges, n_buckets: int = 32) -> pd.DataFrame:
    """Connected components of an undirected edge list by alternating
    large-star / small-star rounds (see module docstring).

    ``edges``: a ``ray.data.Dataset`` with int64 columns (u, v), or a
    pandas frame (converted; the Dataset path is the scale contract —
    the edge set stays in the object store throughout). Returns the
    driver-sized decision frame matching
    ``queries.dedup_groups_from_pairs``: one (node, rep) row per node
    incident to an edge, rep = component minimum, sorted by node —
    O(nodes-in-groups), the same size as the output a corpus build
    applies."""
    if isinstance(edges, pd.DataFrame):
        df = _canon_frame(edges)
        if df.empty:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                 "rep": pd.Series([], dtype="int64")})
        chunk = 25_000
        edges = _rd().from_pandas(
            [df.iloc[i:i + chunk] for i in range(0, len(df), chunk)])
    else:
        def canon(batch: pa.Table) -> pa.Table:
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            hi, lo = np.maximum(u, v), np.minimum(u, v)
            keep = hi != lo
            return pa.table({"u": pa.array(hi[keep], pa.int64()),
                             "v": pa.array(lo[keep], pa.int64())})
        edges = edges.map_batches(canon, batch_format="pyarrow")

    edges = edges.materialize()
    prev = _stats(edges)
    if prev[0] == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "rep": pd.Series([], dtype="int64")})
    for _ in range(CC_MAX_ROUNDS):
        edges = _small_star(_large_star(edges, n_buckets),
                            n_buckets).materialize()
        cur = _stats(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError("connected_components: no convergence in "
                           f"{CC_MAX_ROUNDS} rounds")

    # Extraction + exact star verification. The converged edge set is
    # O(nodes-in-groups) == O(output): driver-sized by the same
    # contract as the result itself.
    star = edges.to_pandas().drop_duplicates(["u", "v"])
    per_u = star.groupby("u")["v"].nunique()
    if int(per_u.max()) != 1 or \
            not set(star["u"]).isdisjoint(set(star["v"])):
        raise RuntimeError("connected_components: converged edge set "
                           "is not star-formed (checksum coincidence)")
    roots = np.sort(star["v"].unique())
    out = pd.DataFrame({
        "node": np.concatenate([star["u"].to_numpy(np.int64), roots]),
        "rep": np.concatenate([star["v"].to_numpy(np.int64), roots])})
    return out.sort_values("node", ignore_index=True).astype(
        {"node": "int64", "rep": "int64"})
