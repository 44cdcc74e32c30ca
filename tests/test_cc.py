"""Distributed connected components (functions/cc.py): equivalence
with driver union-find on hostile graph shapes, block-layout
invariance, star-verification, and dtype discipline."""

import numpy as np
import pandas as pd
import pytest

from docling_pdf_ray.functions import cc


def _uf_reference(edges: pd.DataFrame) -> pd.DataFrame:
    """Driver union-find ground truth: (node, rep=component min)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(edges["u"], edges["v"]):
        a, b = int(a), int(b)
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(set(int(x) for x in edges.loc[edges["u"] != edges["v"],
                                                 ["u", "v"]].to_numpy().ravel()))
    return pd.DataFrame({"node": pd.Series(nodes, dtype="int64"),
                         "rep": pd.Series([find(n) for n in nodes],
                                          dtype="int64")})


GRAPHS = {
    # worst-case diameter: a 400-node path (forces multiple rounds)
    "path": pd.DataFrame({"u": np.arange(399), "v": np.arange(1, 400)}),
    # dense clique + disjoint star + an isolated edge
    "clique_star": pd.concat([
        pd.DataFrame([(a, b) for a in range(20) for b in range(a)],
                     columns=["u", "v"]),
        pd.DataFrame({"u": [100] * 30, "v": np.arange(101, 131)}),
        pd.DataFrame({"u": [999], "v": [998]})], ignore_index=True),
    # random sparse graph, many components
    "random": pd.DataFrame({
        "u": np.random.RandomState(7).randint(0, 3000, 4000),
        "v": np.random.RandomState(8).randint(0, 3000, 4000)}),
    # duplicated edges, both orientations, self loops
    "dirty": pd.DataFrame({
        "u": [1, 2, 3, 3, 5, 5, 7, 8, 8],
        "v": [2, 1, 4, 4, 5, 6, 7, 9, 9]}),
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_cc_matches_union_find(ray_session, name):
    edges = GRAPHS[name]
    got = cc.connected_components(edges, n_buckets=8)
    want = _uf_reference(edges)
    pd.testing.assert_frame_equal(got, want)
    assert got["node"].dtype == "int64" and got["rep"].dtype == "int64"


def test_cc_block_layout_and_bucket_invariance(ray_session):
    """Identical output for different bucket counts and different
    input block layouts (single block vs many tiny blocks vs a
    sorted layout that skews one bucket)."""
    import ray.data as rd

    edges = GRAPHS["random"]
    want = _uf_reference(edges)
    for n_buckets in (1, 5, 32):
        got = cc.connected_components(edges, n_buckets=n_buckets)
        pd.testing.assert_frame_equal(got, want)
    for frames in (
            [edges],
            [edges.iloc[i:i + 97] for i in range(0, len(edges), 97)],
            [edges.sort_values("u", ignore_index=True)]):
        ds = rd.from_pandas([f for f in frames if len(f)])
        got = cc.connected_components(ds, n_buckets=8)
        pd.testing.assert_frame_equal(got, want)


def test_cc_empty_and_self_loop_only(ray_session):
    empty = pd.DataFrame({"u": pd.Series([], dtype="int64"),
                          "v": pd.Series([], dtype="int64")})
    for edges in (empty,
                  pd.DataFrame({"u": [4, 4], "v": [4, 4]})):
        got = cc.connected_components(edges)
        assert got.empty
        assert got["node"].dtype == "int64" and got["rep"].dtype == "int64"


def test_cc_stats_block_layout_invariant(ray_session):
    """The convergence checksum must be EXACTLY invariant to how rows
    split into blocks (wrapping int64 reinterpretation) — otherwise a
    round with a different block count would never test equal."""
    import ray.data as rd

    rng = np.random.RandomState(3)
    df = pd.DataFrame({"u": rng.randint(0, 2**62, 5000),
                       "v": rng.randint(0, 2**62, 5000)})
    layouts = [[df],
               [df.iloc[i:i + 123] for i in range(0, len(df), 123)],
               [df.iloc[::2], df.iloc[1::2]]]
    stats = {cc._stats(rd.from_pandas(layout)) for layout in layouts}
    assert len(stats) == 1
