"""Query/operator surface: Ray Data implementations + DuckDB oracle SQL.

Each ``q*`` function takes ``sf_dir`` (a /root/testdata/sf* directory) and
returns a Dataset / pandas DataFrame / pyarrow Table; ORACLE_SQL carries the
ANSI-SQL equivalent the driver runs through DuckDB on the same tables.

Float determinism policy (the driver hash-compares values): sums over
2/4-decimal columns are computed on integer cents (round(x*100) etc.) so the
accumulation is EXACT and order-independent, then converted back with the
same division expression on both sides. Derived ratios use identical operand
order in Ray and SQL. Counts/mins/maxes are integers. This mirrors the
reference's own determinism choice (2-decimal rounding,
src/services/pre-visacion.service.js:262).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from pathlib import Path
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from medical_ocr_service_ray.config import set_engine_shuffle_profile
from medical_ocr_service_ray.functions.textstats import (
    LANGS,
    STOPWORDS,
    sql_lang_score,
    sql_occurrences,
)
from medical_ocr_service_ray.stages import text as text_stages
from medical_ocr_service_ray.stages.aggregate import (
    bucketed_combine,
    driver_combine,
    partial_then_combine,
)
from medical_ocr_service_ray.stages.dedup import exact_dedup, minhash_lsh_pairs, simhash_pairs
from medical_ocr_service_ray.stages.join import BroadcastMapper, SemiAntiFilter


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> "rd.Dataset":
    set_engine_shuffle_profile()
    path = f"{sf_dir}/{table}.parquet"
    # Strip file-level pandas metadata: pyarrow 16 schemas carrying a
    # metadata dict are UNHASHABLE, which defeats Ray's schema-dedup
    # early-exit and fires its per-unify warning inside every read worker
    # (where a log filter can't reach). Projected to the requested columns
    # because read_parquet requires schema/columns to agree.
    sch = pq.read_schema(path).remove_metadata()
    if columns:
        sch = pa.schema([sch.field(c) for c in columns])
    return rd.read_parquet(path, columns=columns, schema=sch)


def _parquet_num_rows(sf_dir: str, table: str) -> int:
    """Exact row count from the parquet FOOTER — zero data scan. The 100-TB
    habit: never run a count job for what the table metadata already
    records."""
    return pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata.num_rows


def _parquet_ts_max_us(sf_dir: str, table: str, col: str) -> int | None:
    """Exact column max (epoch-µs) from parquet row-group STATISTICS — zero
    data scan (parquet stats maxima are actual column values for
    timestamps). Returns None when any row group lacks stats, in which case
    the caller falls back to a scan."""
    f = pq.ParquetFile(f"{sf_dir}/{table}.parquet")
    idx = f.schema_arrow.get_field_index(col)
    best = None
    for rg in range(f.metadata.num_row_groups):
        st = f.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        mx = st.max
        if hasattr(mx, "timestamp"):  # datetime -> epoch µs
            import calendar

            mx = calendar.timegm(mx.timetuple()) * 1_000_000 + mx.microsecond
        best = mx if best is None else max(best, mx)
    return int(best) if best is not None else None


def _events_max_us(sf_dir: str) -> int:
    """Corpus max event timestamp: footer statistics when present, else one
    1-row-per-batch driver reduce."""
    stat = _parquet_ts_max_us(sf_dir, "events", "ts")
    if stat is not None:
        return stat
    ds = _read(sf_dir, "events", ["ts"])

    def batch_max(df: pd.DataFrame) -> pd.DataFrame:
        us = df.ts.to_numpy().astype("datetime64[us]").astype("int64")
        return pd.DataFrame({"m": [us.max()]})

    return int(
        driver_combine(ds, batch_max, lambda df: pd.DataFrame({"m": [df.m.max()]})).m[0]
    )


def _cents(series: pd.Series, scale: int = 100) -> pd.Series:
    # np.rint (half-even) == SQL round() here: scaled decimals land near
    # integers, never near .5
    return np.rint(series * scale).astype("int64")
