"""Schema-evolution-tolerant parquet reading (union-by-name).

A long-lived crawl corpus is written by many pipeline versions: later
shards gain columns (a new quality score, a language field), earlier
shards lack them. A reader pinned to one schema either crashes on old
shards or silently drops new columns. ``read_parquet_union`` reads a
heterogeneous shard set under UNION-BY-NAME semantics — the union
schema is computed from the parquet FOOTERS only (no data pages
touched), each shard is read with per-shard column pruning (only the
columns it actually has and the caller wants leave storage), and every
batch is padded to the union layout with typed nulls. The same
semantics as DuckDB's ``read_parquet(..., union_by_name=true)``.

Scale notes: footer inspection is O(shards) metadata reads; the pad is
a zero-copy Arrow wrap (existing columns are referenced, missing ones
are null arrays); column pruning still pushes down per shard, so a
2-column query over a 40-column late-era shard reads 2 columns, and
over an early shard reads only what exists.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def union_schema(schemas: list[pa.Schema],
                 columns: list[str] | None = None) -> list[tuple[str, pa.DataType]]:
    """Ordered (first-seen) union of field names → types. A name that
    appears with two different types is an error (silent coercion
    could corrupt values; widen explicitly upstream instead)."""
    fields: list[tuple[str, pa.DataType]] = []
    seen: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name in seen:
                if seen[f.name] != f.type:
                    raise ValueError(
                        f"column {f.name!r} has conflicting types across "
                        f"shards: {seen[f.name]} vs {f.type}")
                continue
            seen[f.name] = f.type
            fields.append((f.name, f.type))
    if columns is not None:
        want = set(columns)
        missing = want - set(seen)
        if missing:
            raise ValueError(f"columns not present in any shard: {missing}")
        fields = [(n, t) for n, t in fields if n in want]
    return fields


def _pad_to(fields: list[tuple[str, pa.DataType]]):
    def pad(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = []
        for name, typ in fields:
            i = batch.schema.get_field_index(name)
            cols.append(batch.column(i) if i >= 0 else pa.nulls(n, typ))
        return pa.table(dict(zip([f[0] for f in fields], cols)))
    return pad


def read_parquet_union(paths: list[str],
                       columns: list[str] | None = None) -> "rd.Dataset":
    """Read heterogeneous parquet shards as ONE Dataset under the
    union-by-name schema. ``columns`` prunes the union schema (and
    each shard's read) to the requested subset."""
    import pyarrow.parquet as pq

    if not paths:
        raise ValueError("read_parquet_union: no paths")
    schemas = [pq.read_schema(p) for p in paths]
    fields = union_schema(schemas, columns)
    names = [n for n, _ in fields]
    parts = []
    for p, sch in zip(paths, schemas):
        have = [n for n in names if n in sch.names]
        if have:
            ds = rd.read_parquet(p, columns=have)
        else:
            # the shard predates EVERY requested column: union-by-name
            # still contributes its rows (all null) — synthesize them
            # from the footer row count, zero data pages read (the pad
            # keys off num_rows only)
            ds = rd.range(pq.ParquetFile(p).metadata.num_rows)
        ds = ds.map_batches(_pad_to(fields), batch_format="pyarrow")
        parts.append(ds)
    out = parts[0]
    for ds in parts[1:]:
        out = out.union(ds)
    return out
