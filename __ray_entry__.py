"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ray.init()/ray.shutdown(). Results may be a
ray.data.Dataset, pandas.DataFrame or pyarrow.Table.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline (full extraction over the deterministic synthetic
    transcript corpus sized to sf0.001); returns a ray.data.Dataset."""
    from medical_ocr_service_ray.pipelines.queries import q16_extract_transcripts

    return q16_extract_transcripts("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2 (plus the
    scale additions: dedup family, ANN, text analysis, windows). Ordered
    risk-first (DRIVER_PRIORITY): the driver's correctness harness checks the
    first ~50 entries, so the flagship, the newest queries and the heaviest
    machinery sit inside that window."""
    from medical_ocr_service_ray.pipelines.queries import QUERIES, driver_ordered

    return driver_ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query where SQL-expressible; the rest get the
    driver's rows-only check and are gated by pytest oracles instead."""
    from medical_ocr_service_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
