"""Driver contract for the ocr_ray engine.

``entry()`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes every implemented operator (one callable per
SURVEY.md §2 capability, plus the training-data operator suite);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each SQL-expressible
query (same column names, exact numeric parity — see
``ocr_ray/pipelines/queries.py``).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ocr_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship extraction pipeline on sf0.001 (nested documents out)."""
    from ocr_ray.corpus import ensure_corpus
    from ocr_ray.pipelines.extract import extract_documents
    from ocr_ray.sources import read_documents

    corpus = ensure_corpus(SF_SMOKE, glyphs=True)
    return extract_documents(
        read_documents(corpus), num_buckets=8, recognizer_concurrency=2
    )


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_ray.pipelines.queries import QUERY_FNS

    return dict(QUERY_FNS)


def oracle_sql() -> dict[str, str]:
    from ocr_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
