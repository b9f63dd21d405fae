"""Driver-style correctness harness: run each queries() entry and compare to
its oracle_sql() through DuckDB (row count + schema + order-insensitive
value comparison). Usage: python scripts/check_oracle.py [sf_dir] [names...]"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"ok*   {name}: rows={len(got)} cols={list(got.columns)} ({wall:.1f}s) [rows-only]")
            continue
        exp = normalize(con.execute(oracles[name]).df())
        status = "ok"
        if list(got.columns) != list(exp.columns):
            status = f"FAIL cols {list(got.columns)} != {list(exp.columns)}"
        elif len(got) != len(exp):
            status = f"FAIL rows {len(got)} != {len(exp)}"
        else:
            for c in got.columns:
                a, b = got[c], exp[c]
                if str(a.dtype) != str(b.dtype):
                    status = f"WARN dtype {c}: {a.dtype} vs {b.dtype}"
                try:
                    eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
                    if not eq.all():
                        bad = (~eq).nonzero()[0][:3]
                        status = f"FAIL values col={c} rows={bad.tolist()} got={a.iloc[bad].tolist()} exp={b.iloc[bad].tolist()}"
                        break
                except Exception as exc:
                    status = f"FAIL compare {c}: {exc}"
                    break
        tag = "ok  " if status.startswith("ok") else status.split()[0] + "  "
        if not status.startswith("ok") and not status.startswith("WARN"):
            failures.append(name)
        print(f"{tag}{name}: rows={len(got)} ({wall:.1f}s) {status if status != 'ok' else ''}")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    import ray

    ray.shutdown()
    sys.exit(code)
