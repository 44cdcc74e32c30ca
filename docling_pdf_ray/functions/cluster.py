"""K-means (Lloyd 1982) over an embedding Dataset — the
iterative-algorithm pattern the rest of the registry doesn't cover
(every other operator is a single logical pass; training-data
pipelines also need fixpoint loops: clustering for corpus mixture
balancing, semantic sharding, IVF coarse quantizers).

Scale shape (the reason this lives here and not in a driver loop over
``take_all``): each Lloyd iteration is ONE streaming ``map_batches``
pass over the Dataset.  The O(k·dim) centroid matrix is broadcast
once per iteration via ``ray.put`` and read zero-copy inside every
task; each batch emits a MERGEABLE partial — per-cluster (vector sum,
count) — and the driver reduces k×dim floats per iteration.  Nothing
shuffles at any corpus size, worker memory is O(batch), driver state
is O(k·dim); the ``iters`` full scans are inherent to Lloyd's
algorithm itself.  This mirrors the IVF trainer (``ann.py``) except
the loop here runs over the FULL dataset distributed, not a
driver-side sample — which is exactly the delta that makes it an
engine operator rather than a utility.

Determinism: seeding is data-deterministic (the k smallest ``vec_id``
rows — found with the same min-k-partials pattern as ``ann.py``'s
top-k, never a global sort), and assignment ties break toward the
lower cluster id via ``np.argmin``.  Centroid float sums depend on
block combination order, so cross-parallelism equality of the last
bits is NOT guaranteed — assignments are stable for any corpus whose
points aren't within float-noise of equidistant (pinned by tests at
two parallelism levels); byte-level reproducibility of centroids is
restored by sorting partials before the driver reduce.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def batch_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    from .ann import _to_matrix     # one embedding-decode path repo-wide

    return _to_matrix(batch.column(col))


def assign(m: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid ids for the rows of ``m`` (vectorized squared
    L2 via the expansion ‖x‖²−2x·c+‖c‖²; ties → lowest cluster id)."""
    d = ((m * m).sum(axis=1, keepdims=True)
         - 2.0 * (m @ cents.T)
         + (cents * cents).sum(axis=1))
    return np.argmin(d, axis=1)


def seed_centroids(ds, k: int) -> np.ndarray:
    """Data-deterministic init: the embeddings of the k smallest
    vec_ids.  Pass 1 streams min-k vec_id partials (k int64 per
    block); pass 2 fetches exactly those k rows with a pushed-down
    ``is_in`` filter.  Driver memory O(k·blocks), never O(N)."""
    import pyarrow.compute as pc

    def kmin(batch: pa.Table) -> pa.Table:
        ids = np.sort(batch.column("vec_id").to_numpy(zero_copy_only=False))
        return pa.table({"vec_id": pa.array(ids[:k], pa.int64())})

    parts = ds.select_columns(["vec_id"]).map_batches(
        kmin, batch_format="pyarrow").to_pandas()
    want = np.sort(parts["vec_id"].to_numpy())[:k]
    want_set = pa.array(want, pa.int64())

    def pick(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("vec_id"),
                                     value_set=want_set))

    rows = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    rows = rows.sort_values("vec_id").reset_index(drop=True)
    return np.asarray(list(rows["embedding"]), dtype=np.float64)


def kmeans_fit(ds, k: int = 8, iters: int = 8) -> tuple[np.ndarray, float]:
    """Run ``iters`` Lloyd iterations; returns (centroids, inertia)
    where inertia is the final pass's summed squared distance (the
    quantity each iteration can only decrease — pinned by tests)."""
    import ray

    cents = seed_centroids(ds, k)
    dim = cents.shape[1]
    inertia = float("inf")
    for _ in range(iters):
        ref = ray.put(cents)

        def part(batch: pa.Table, _ref=ref, _k=k, _dim=dim) -> pa.Table:
            c = ray.get(_ref)
            m = batch_matrix(batch)
            a = assign(m, c)
            d = m - c[a]
            sse = float((d * d).sum())
            sums = np.zeros((_k, _dim), dtype=np.float64)
            for j in range(_k):                      # k is tiny; the
                sel = a == j                         # inner sum is the
                if sel.any():                        # vectorized part
                    sums[j] = m[sel].sum(axis=0)
            counts = np.bincount(a, minlength=_k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(_k, dtype=np.int64)),
                "s": pa.array(sums.tolist(), pa.list_(pa.float64())),
                "n": pa.array(counts),
                "sse": pa.array(np.full(_k, sse / _k, dtype=np.float64)),
            })

        parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        # sort before reducing → byte-reproducible centroid sums for a
        # fixed block partitioning
        parts = parts.sort_values("cluster", kind="stable")
        g = parts.groupby("cluster", sort=True)
        counts = g["n"].sum()
        inertia = float(parts["sse"].sum())
        new = cents.copy()                 # empty cluster keeps its seed
        for j, grp in g:
            nj = int(counts.loc[j])
            if nj > 0:
                new[int(j)] = np.add.reduce(
                    np.asarray(list(grp["s"]), dtype=np.float64)) / nj
        cents = new
    return cents, inertia


def label_stats(ds, cents: np.ndarray):
    """Final assignment audit: per-cluster size + majority planted
    label — one more streaming pass emitting (cluster, label, n)
    partials; the driver combine is O(k × labels)."""
    import pandas as pd
    import ray

    ref = ray.put(cents)

    def part(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        a = assign(batch_matrix(batch), c)
        t = pa.table({"cluster": pa.array(a, pa.int64()),
                      "label": batch.column("label").cast(pa.int64())})
        g = t.group_by(["cluster", "label"]).aggregate([([], "count_all")])
        # select every column by NAME (the r2-advice discipline): a
        # pyarrow release reordering keys vs aggregates must error
        # here, not silently swap cluster ids and counts
        return pa.table({"cluster": g.column("cluster"),
                         "label": g.column("label"),
                         "p_n": g.column("count_all")})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    cl = parts.groupby(["cluster", "label"], sort=True)["p_n"].sum() \
        .reset_index()
    out = []
    for j, grp in cl.groupby("cluster", sort=True):
        top = grp.sort_values(["p_n", "label"],
                              ascending=[False, True]).iloc[0]
        out.append({"cluster_id": int(j),
                    "n_vectors": int(grp["p_n"].sum()),
                    "majority_label": int(top["label"]),
                    "majority_n": int(top["p_n"])})
    return pd.DataFrame(out, columns=["cluster_id", "n_vectors",
                                      "majority_label", "majority_n"])
