"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
functions use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline over sf0.001: synthesize Common-Crawl-style
    pages from the documents table (deterministic, in-stream), run the
    two-stage extraction (sniff + HTML-strip tasks → PDF actor pool),
    return the extracted Dataset (lazy; stable EXTRACTED_SCHEMA)."""
    from docling_pdf_ray.pipelines.extract import build_extract_ds
    from docling_pdf_ray.sources.pages_from_documents import pages_dataset

    return build_extract_ds(pages_dataset(SF0001))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (plus the large-scale training-data operators). Column names match
    oracle_sql exactly."""
    from docling_pdf_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from docling_pdf_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
