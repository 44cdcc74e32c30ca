"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — a broadcast query matrix
(``ray.put`` once, read per actor) against each Arrow batch via one
numpy matmul; per-batch local top-k partials keep the shuffle tiny
(k rows per query per batch), then an exact final top-k per query.

Scale path: random-hyperplane LSH bucketing
(:func:`docling_pdf_ray.functions.dedup.hyperplane_signs`) — bucket
both sides, search only matching buckets; and an IVF-style variant
(k-means-free: bucket centroids from the hyperplane code) is the same
groupby shape.

Determinism: scores are rounded to 6 decimals and ties broken by
vec_id before ranking, so results are stable across batch orders,
parallelism levels, and vs the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    a = col.to_pylist()
    return np.asarray(a, dtype=np.float64)


def make_topk_partial(queries_ref, k: int):
    """map_batches function computing per-batch local top-k candidates
    for every query. ``queries_ref`` is a ``ray.ObjectRef`` to
    (qids, qmat) — put once on the driver, fetched (zero-copy from the
    local object store) inside the task: the broadcast pattern. A plain
    function (not an actor) because the state is a cheap ray.get, so
    stateless tasks scale elastically with no pool startup."""
    import ray

    def _partial(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(queries_ref)
        qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _to_matrix(batch.column("embedding"))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        scores = qn @ mn.T                          # (Q, B) one matmul
        out_q, out_v, out_s = [], [], []
        kk = min(k + 1, scores.shape[1])            # +1 to survive self-hit
        for qi, qid in enumerate(qids):
            # candidate selection must use the SAME ordering as the
            # final ranking (rounded score desc, vec_id asc) or a
            # vector within 1e-6 of the cutoff could be dropped here
            # yet outrank a kept one after rounding. O(B) argpartition
            # on the rounded scores, then include ALL cutoff ties and
            # lexsort only that small slice.
            row_r = np.round(scores[qi], 6)
            if kk < row_r.size:
                part = np.argpartition(-row_r, kk - 1)
                cutoff = row_r[part[kk - 1]]
                cand = np.where(row_r >= cutoff)[0]
            else:
                cand = np.arange(row_r.size)
            order = cand[np.lexsort((vids[cand], -row_r[cand]))][:kk]
            for j in order:
                if vids[j] == qid:
                    continue                        # exclude self
                out_q.append(qid)
                out_v.append(int(vids[j]))
                out_s.append(float(row_r[j]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "cos_r": pa.array(out_s, pa.float64())})

    return _partial


def brute_force_topk(ds, queries_ref, k: int = 5) -> pd.DataFrame:
    """ds: Dataset with (vec_id, embedding) → DataFrame of
    (query_id, rank, vec_id, cos_r). The per-batch partials are at most
    Q×(k+1) rows per block — the final exact top-k runs on the driver
    over that tiny set (a distributed groupby would pay seconds of
    shuffle fixed-cost to sort a few hundred rows)."""
    partials = ds.map_batches(make_topk_partial(queries_ref, k),
                              batch_format="pyarrow")
    cand = pd.concat(list(partials.iter_batches(batch_format="pandas")),
                     ignore_index=True)
    out = []
    for qid, g in cand.groupby("query_id"):
        g = g.sort_values(["cos_r", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g[["query_id", "rank", "vec_id", "cos_r"]])
    return (pd.concat(out, ignore_index=True)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


def _final_topk(cand: pd.DataFrame, k: int) -> pd.DataFrame:
    """Exact per-query top-k over the (small) candidate partials —
    shared driver merge for the LSH and IVF scale paths."""
    out = []
    for qid, g in cand.groupby("query_id"):
        g = g.drop_duplicates("vec_id") \
            .sort_values(["cos_r", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        out.append(g[["query_id", "rank", "vec_id", "cos_r"]])
    if not out:
        return pd.DataFrame(columns=["query_id", "rank", "vec_id", "cos_r"])
    return (pd.concat(out, ignore_index=True)
            .sort_values(["query_id", "rank"]).reset_index(drop=True))


def train_centroids(sample: np.ndarray, n_centroids: int, seed: int = 42,
                    n_iter: int = 10) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd on normalized vectors,
    cosine assignment) over a DRIVER-SIDE sample — the IVF training
    step. The sample is small by contract (ds.limit of the corpus);
    the full corpus is never pulled to the driver."""
    rng = np.random.RandomState(seed)
    s = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    n_centroids = min(n_centroids, len(s))
    cent = s[rng.choice(len(s), size=n_centroids, replace=False)].copy()
    for _ in range(n_iter):
        assign = (s @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            m = s[assign == c]
            if len(m):
                v = m.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def ivf_topk(ds, queries_ref, k: int = 5, n_centroids: int = 32,
             n_probe: int = 4, train_sample: int = 2048,
             seed: int = 42) -> pd.DataFrame:
    """Approximate top-k via IVF-Flat, Dataset-native: train spherical
    k-means centroids on a small deterministic sample (ds.limit →
    driver), broadcast (centroids + each query's n_probe nearest
    cells) once via ray.put, then ONE streaming pass over the corpus —
    each batch assigns its vectors to cells with a single matmul and
    scores a vector only against the queries probing its cell. No
    inverted index is materialized; the 'inverted list' is the
    cell-membership test inside the pass. Per-block partials are tiny
    (≤ Q×k rows), merged exactly on the driver. recall < 1 by design
    (quantified by the test harness); raise n_probe toward n_centroids
    to trade cost for recall."""
    import ray

    qids, qmat = ray.get(queries_ref)
    sample_rows = ds.limit(train_sample).take_all()
    sample = np.asarray([r["embedding"] for r in sample_rows], dtype=np.float64)
    cent = train_centroids(sample, n_centroids, seed=seed)

    qn = np.asarray(qmat, dtype=np.float64)
    qn = qn / np.maximum(np.linalg.norm(qn, axis=1, keepdims=True), 1e-12)
    n_probe = min(n_probe, len(cent))
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    # cell → row-indices of queries probing it (tiny; ships via ray.put)
    cell_to_q: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probe[qi]:
            cell_to_q.setdefault(int(c), []).append(qi)
    state_ref = ray.put((np.asarray(qids, dtype=np.int64), qn, cent, cell_to_q))

    def _partial(batch: pa.Table) -> pa.Table:
        # Vectorized (r3, replaces the per-vector Python loop): sort
        # the batch by assigned cell, then for each populated cell with
        # probing queries do ONE matmul of (probing queries × cell
        # vectors) and a per-query numpy top-k over that slice. The
        # only Python iteration left is over (cell, probing query) —
        # O(Q × n_probe) per block, independent of batch size.
        _qids, _qn, _cent, _c2q = ray.get(state_ref)
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _to_matrix(batch.column("embedding"))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cells = (mn @ _cent.T).argmax(axis=1)
        order = np.argsort(cells, kind="stable")
        uniq, starts = np.unique(cells[order], return_index=True)
        bounds = np.append(starts, len(order))
        out_q, out_v, out_s = [], [], []
        for ci, c in enumerate(uniq):
            qis = _c2q.get(int(c))
            if not qis:
                continue
            sl = order[bounds[ci]:bounds[ci + 1]]
            sub_v, sub_m = vids[sl], mn[sl]
            scores = np.round(_qn[np.asarray(qis)] @ sub_m.T, 6)
            for row, qi in enumerate(qis):
                # per-(cell, query) truncation keeps the Python work
                # O(k log k) per slice; the cross-cell merge below
                # restores the ≤ Q×k per-block bound
                mask = sub_v != _qids[qi]            # exclude self
                sv, vv = scores[row][mask], sub_v[mask]
                if len(sv) > k:
                    cutoff = sv[np.argpartition(-sv, k - 1)[k - 1]]
                    keep = sv >= cutoff              # include cutoff ties
                    sv, vv = sv[keep], vv[keep]
                top = np.lexsort((vv, -sv))[:k]
                out_q.append(np.full(len(top), _qids[qi], np.int64))
                out_v.append(vv[top])
                out_s.append(sv[top])
        if out_q:
            q_arr, v_arr, s_arr = (np.concatenate(out_q),
                                   np.concatenate(out_v),
                                   np.concatenate(out_s))
            # cross-cell per-QUERY merge: a query probing n_probe cells
            # of this block would otherwise emit up to n_probe×k rows —
            # re-truncate under the same (score desc, vec_id asc) total
            # order so the partial is ≤ Q×k rows per block (top-k of a
            # total order per block always contains the global top-k's
            # block members, so the driver merge stays exact)
            kq, kv, ks = [], [], []
            for q in np.unique(q_arr):
                m_ = q_arr == q
                sv, vv = s_arr[m_], v_arr[m_]
                top = np.lexsort((vv, -sv))[:k]
                kq.append(np.full(len(top), q, np.int64))
                kv.append(vv[top])
                ks.append(sv[top])
            q_arr, v_arr, s_arr = (np.concatenate(kq), np.concatenate(kv),
                                   np.concatenate(ks))
        else:
            q_arr = v_arr = np.array([], np.int64)
            s_arr = np.array([], np.float64)
        return pa.table({"query_id": pa.array(q_arr, pa.int64()),
                         "vec_id": pa.array(v_arr, pa.int64()),
                         "cos_r": pa.array(s_arr, pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    frames = list(partials.iter_batches(batch_format="pandas"))
    cand = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame(columns=["query_id", "vec_id", "cos_r"])
    return _final_topk(cand, k)


def lsh_topk(ds, queries_ref, k: int = 5, n_planes: int = 8,
             seed: int = 42) -> pd.DataFrame:
    """Approximate top-k via random-hyperplane LSH (the scale path):
    bucket every corpus vector by its n-plane sign pattern; each query
    probes its own bucket plus all 1-bit-flip neighbors (multi-probe),
    so only vectors in ~(n_planes+1) of 2^n_planes buckets are scored.
    Same output schema as :func:`brute_force_topk`; recall < 1 by
    design — the recall/test harness quantifies it."""
    import ray

    from .dedup import hyperplane_signs

    qids, qmat = ray.get(queries_ref)
    qbuckets = hyperplane_signs(np.asarray(qmat, dtype=np.float64),
                                n_planes=n_planes, seed=seed)
    probes: dict[int, set[int]] = {}
    for qid, b in zip(qids, qbuckets):
        s = {int(b)}
        for bit in range(n_planes):
            s.add(int(b) ^ (1 << bit))
        probes[int(qid)] = s
    # bucket → queries probing it (broadcast via closure; tiny)
    bucket_to_q: dict[int, list[int]] = {}
    for qid, s in probes.items():
        for b in s:
            bucket_to_q.setdefault(b, []).append(qid)
    qindex = {int(q): i for i, q in enumerate(qids)}

    def _partial(batch: pa.Table) -> pa.Table:
        # Vectorized (r3, replaces the per-vector Python loop): sort
        # the batch by bucket, then for each populated bucket with
        # probing queries do ONE matmul of (probing queries × bucket
        # vectors) and emit the scored pairs via repeat/tile — the only
        # Python iteration left is over populated (bucket, query-list)
        # groups.
        _qids, _qmat = ray.get(queries_ref)
        qn = _qmat / np.maximum(np.linalg.norm(_qmat, axis=1, keepdims=True), 1e-12)
        vids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _to_matrix(batch.column("embedding"))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        buckets = hyperplane_signs(m, n_planes=n_planes, seed=seed)
        order = np.argsort(buckets, kind="stable")
        uniq, starts = np.unique(buckets[order], return_index=True)
        bounds = np.append(starts, len(order))
        chunks_q, chunks_v, chunks_s = [], [], []
        for bi, b in enumerate(uniq):
            qlist = bucket_to_q.get(int(b))
            if not qlist:
                continue
            sl = order[bounds[bi]:bounds[bi + 1]]
            sub_v = vids[sl]
            qarr = np.asarray(qlist, dtype=np.int64)
            qrows = np.asarray([qindex[q] for q in qlist])
            scores = np.round(qn[qrows] @ mn[sl].T, 6)   # (Q_b, N_b)
            qcol = np.repeat(qarr, len(sl))
            vcol = np.tile(sub_v, len(qarr))
            mask = vcol != qcol                          # exclude self
            chunks_q.append(qcol[mask])
            chunks_v.append(vcol[mask])
            chunks_s.append(scores.ravel()[mask])
        if chunks_q:
            q_arr, v_arr, s_arr = (np.concatenate(chunks_q),
                                   np.concatenate(chunks_v),
                                   np.concatenate(chunks_s))
        else:
            q_arr = v_arr = np.array([], np.int64)
            s_arr = np.array([], np.float64)
        return pa.table({"query_id": pa.array(q_arr, pa.int64()),
                         "vec_id": pa.array(v_arr, pa.int64()),
                         "cos_r": pa.array(s_arr, pa.float64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    frames = list(partials.iter_batches(batch_format="pandas"))
    cand = pd.concat(frames, ignore_index=True) if frames else \
        pd.DataFrame(columns=["query_id", "vec_id", "cos_r"])
    return _final_topk(cand, k)
