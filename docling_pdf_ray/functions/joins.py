"""Partitioned joins for two LARGE sides (ray_guide pattern: when
neither side fits a broadcast, bucket both by key hash and join
matching buckets pairwise).

Implementation is the single-shuffle co-group trick: pad both sides to
a common schema (absent columns null), tag the side, union, and
``groupby(bucket)`` ONCE — one all-to-all exchange moves both sides
together — then pandas-merge/merge_asof the two sides inside
``map_groups``.

Skew note: a hot key inflates its bucket; salt hot keys into
sub-buckets before calling (extension point). ``n_buckets`` controls
shuffle granularity.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa


def _bucket_of(col: pa.ChunkedArray, n_buckets: int) -> pa.Array:
    # null keys ride bucket 0 (they match nothing — see merge); a null
    # bucket key would break the shuffle groupby
    if pa.types.is_integer(col.type):
        vals = col.to_pylist()
        return pa.array([0 if v is None else int(v) % n_buckets for v in vals],
                        pa.int32())
    return pa.array([0 if v is None else zlib.crc32(str(v).encode()) % n_buckets
                     for v in col.to_pylist()], pa.int32())


def _pad_and_union(left_ds, right_ds, key: str, n_buckets: int):
    """Shared co-group scaffolding: validate disjoint columns, pad both
    sides to the union schema (absent columns null), tag the side,
    bucket by key, union. Returns (both_ds, l_only, r_only)."""
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    shared = (set(l_schema.names) & set(r_schema.names)) - {key}
    if shared:
        raise ValueError(f"non-key columns must be disjoint; shared: {shared}")
    all_fields = list(zip(l_schema.names, l_schema.types)) + \
        [(n, t) for n, t in zip(r_schema.names, r_schema.types) if n != key]

    def pad(side: str):
        def _f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            arrays, names = [], []
            for name, typ in all_fields:
                names.append(name)
                if name in batch.column_names:
                    arrays.append(batch.column(name).cast(typ))
                else:
                    arrays.append(pa.nulls(n, typ))
            out = pa.Table.from_arrays(arrays, names=names)
            out = out.append_column("_bucket", _bucket_of(batch.column(key), n_buckets))
            return out.append_column("_side", pa.array([side] * n, pa.string()))

        return _f

    both = left_ds.map_batches(pad("l"), batch_format="pyarrow").union(
        right_ds.map_batches(pad("r"), batch_format="pyarrow"))
    l_only = [c for c in l_schema.names if c != key]
    r_only = [c for c in r_schema.names if c != key]
    return both, l_only, r_only


def bucketed_hash_join(left_ds, right_ds, key: str, n_buckets: int = 64,
                       how: str = "inner"):
    """left ⋈ right on ``key`` → Dataset of merged rows (left columns
    then right columns, SQL null semantics: null keys never match).
    Non-key column names must be disjoint across the sides. Supported
    ``how``: 'inner', 'left' (a right/full-outer needs per-bucket
    right-side emission this cogroup shape doesn't implement — rejected
    loudly rather than silently degrading)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    both, l_only, r_only = _pad_and_union(left_ds, right_ds, key, n_buckets)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # SQL semantics: null keys match nothing (pandas merge would
        # pair NaN==NaN) — null-key left rows survive only under 'left'
        l = g[g["_side"] == "l"][[key] + l_only]
        r = g[g["_side"] == "r"][[key] + r_only]
        r = r[r[key].notna()]
        if how == "inner":
            l = l[l[key].notna()]
        if l.empty or (r.empty and how == "inner"):
            return pd.DataFrame(columns=[key] + l_only + r_only)
        if how == "left":
            l_null = l[l[key].isna()]
            l = l[l[key].notna()]
            merged = l.merge(r, on=key, how="left") if not l.empty else l
            if not l_null.empty:
                merged = pd.concat([merged, l_null], ignore_index=True)
            return merged
        return l.merge(r, on=key, how=how)

    return both.groupby("_bucket").map_groups(merge, batch_format="pandas")


def bucketed_asof_join(left_ds, right_ds, key: str, ts_left: str,
                       ts_right: str, n_buckets: int = 64):
    """As-of join (ray_guide pattern): for each left row, the LATEST
    right row with the same ``key`` and ``ts_right <= ts_left``. Both
    sides co-shuffle once by key bucket; each bucket sorts and runs
    ``pd.merge_asof`` grouped by key. Left rows with no match — and
    null-key left rows, which match nothing — keep null right columns
    (left-join semantics). Equal-``ts_right`` ties resolve to the same
    timestamp, so emit the right TS (and aggregates of it), not
    tie-ambiguous payload columns, when cross-engine determinism
    matters."""
    both, l_only, r_only = _pad_and_union(left_ds, right_ds, key, n_buckets)

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        l_all = g[g["_side"] == "l"][[key] + l_only]
        r = g[g["_side"] == "r"][[key] + r_only]
        l_null = l_all[l_all[key].isna()]
        l = l_all[l_all[key].notna()].sort_values(ts_left, kind="mergesort")
        r = r[r[key].notna()].sort_values(ts_right, kind="mergesort")
        if l.empty and l_null.empty:
            return pd.DataFrame(columns=[key] + l_only + r_only)
        if l.empty:
            merged = pd.DataFrame(columns=[key] + l_only + r_only)
        elif r.empty:
            merged = l.copy()
            for c in r_only:
                merged[c] = pd.NA
        else:
            merged = pd.merge_asof(l, r, left_on=ts_left, right_on=ts_right,
                                   by=key, direction="backward")
        if not l_null.empty:
            merged = pd.concat([merged, l_null], ignore_index=True)
        return merged

    return both.groupby("_bucket").map_groups(asof, batch_format="pandas")
