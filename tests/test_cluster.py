"""Pins for the iterative k-means operator (functions/cluster.py) —
the rows-only driver entry ``kmeans_clusters`` is justified by these:
inertia monotonicity (Lloyd's invariant), exact corpus partition,
determinism, and assignment stability across block partitionings."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
COLS = ["vec_id", "embedding", "label"]


def _ds(n_blocks=None):
    import ray.data as rd

    kw = {"override_num_blocks": n_blocks} if n_blocks else {}
    return rd.read_parquet(f"{SF}/embeddings.parquet", columns=COLS, **kw)


def test_inertia_monotone_and_shapes(ray_session):
    from docling_pdf_ray.functions import cluster as cl

    ds = _ds()
    prev = None
    for iters in (1, 3, 6):
        cents, inertia = cl.kmeans_fit(ds, k=8, iters=iters)
        assert cents.shape == (8, 64)
        assert np.isfinite(inertia)
        if prev is not None:
            # Lloyd: SSE can only go down as iterations accumulate
            assert inertia <= prev + 1e-9
        prev = inertia


def test_label_stats_partitions_corpus(ray_session):
    from docling_pdf_ray.functions import cluster as cl

    ds = _ds()
    cents, _ = cl.kmeans_fit(ds, k=8, iters=4)
    out = cl.label_stats(ds, cents)
    assert list(out.columns) == ["cluster_id", "n_vectors",
                                 "majority_label", "majority_n"]
    assert out["n_vectors"].sum() == 500          # exact partition
    assert (out["majority_n"] <= out["n_vectors"]).all()
    assert set(out["cluster_id"]) <= set(range(8))
    assert out["majority_label"].isin(range(10)).all()


def test_deterministic_and_partition_invariant(ray_session):
    """Same input → same result; and the cluster SIZES are invariant
    to the block partitioning (assignments don't depend on which
    block a vector landed in)."""
    from docling_pdf_ray.functions import cluster as cl

    def run(n_blocks):
        ds = _ds(n_blocks)
        cents, _ = cl.kmeans_fit(ds, k=8, iters=4)
        return cl.label_stats(ds, cents)

    a, b = run(2), run(2)
    pd.testing.assert_frame_equal(a, b)           # determinism
    c = run(8)
    pd.testing.assert_frame_equal(                # partition invariance
        a.reset_index(drop=True), c.reset_index(drop=True))


def test_query_entry_runs(ray_session):
    from docling_pdf_ray import queries as Q

    out = Q.QUERIES["kmeans_clusters"](SF)
    assert len(out) >= 1
    assert out["n_vectors"].sum() == 500
