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


def test_semdedup_prune_greedy_replay_and_contract(ray_session):
    """semdedup_prune's greedy stage replayed EXACTLY in pure numpy
    over the query's OWN cluster assignments (integer-quantized
    similarity makes the keep decision bit-reproducible — no float
    kmeans replay needed), plus the structural contract: one row per
    vector, first member of every cluster kept, and pruned rows are
    similar to some earlier KEPT member of the same cluster."""
    import pyarrow.parquet as pq

    from docling_pdf_ray import queries as Q

    out = Q.q_semdedup_prune(SF)
    base = Q._plant_embeddings(
        pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding"])).to_pandas()
    assert len(out) == len(base)
    assert sorted(out["vec_id"]) == sorted(base["vec_id"])

    emb = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
           for r in base.itertuples()}
    num2, den2 = Q.SEMDEDUP_NUM ** 2, Q.SEMDEDUP_DEN ** 2
    n_pruned = 0
    for _, g in out.groupby("cluster"):
        g = g.sort_values("vec_id")
        qm = np.floor(np.stack([emb[i] for i in g["vec_id"]])
                      * Q._QIP_SCALE).astype(np.int64)
        n2 = (qm * qm).sum(axis=1)
        s = qm @ qm.T
        dup = (s > 0) & (s * s * den2 >= num2 * np.outer(n2, n2))
        keep = np.zeros(len(g), dtype=bool)
        for i in range(len(g)):
            keep[i] = not dup[i, :i][keep[:i]].any()
        assert (g["keep"].to_numpy() == keep).all()
        assert keep[0]                       # first occurrence always kept
        n_pruned += int((~keep).sum())
    # every planted exact copy must be pruned: an identical vector
    # shares its source's cluster (deterministic argmin), and if the
    # source was itself pruned by kept member u, the copy has the SAME
    # similarity to u — pruning is unavoidable either way
    planted = out[out["vec_id"] >= Q.EMB_PLANT_OFFSET]
    assert len(planted) > 0 and not planted["keep"].any()
    assert n_pruned >= len(planted)


def test_semdedup_prune_scaled_k_branch(ray_session, monkeypatch):
    """The k ∝ N sizing path (k > the 8 floor) — never hit at fixture
    scale otherwise: with a tiny target cluster size, k derives from
    the footer row count, the output is still one row per vector, and
    every planted exact copy is still pruned (identical vectors share
    a cluster at ANY k)."""
    from docling_pdf_ray import queries as Q

    monkeypatch.setattr(Q, "SEMDEDUP_TARGET_C", 64)   # 520 rows -> k=9
    out = Q.q_semdedup_prune(SF)
    assert len(out) == 520
    assert out["cluster"].nunique() >= 8
    planted = out[out["vec_id"] >= Q.EMB_PLANT_OFFSET]
    assert len(planted) == 20 and not planted["keep"].any()
