"""Local simulation of the driver's correctness gate: run every
``queries()`` entry at sf0.01 and compare with ``oracle_sql()`` via DuckDB
(row count, column names, order-insensitive values).

Usage: python scripts/check_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"rows {len(got)} != {len(want)}")
        return problems
    g, w = normalize(got), normalize(want)
    for col in g.columns:
        gv, wv = g[col], w[col]
        if gv.dtype.kind == "f" or wv.dtype.kind == "f":
            ok = np.allclose(gv.astype(float), wv.astype(float),
                             rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = (gv.astype(str) == wv.astype(str)).all()
        if not ok:
            bad = (gv.astype(str) != wv.astype(str))
            problems.append(
                f"col {col}: first diff at row {bad.idxmax()}: "
                f"{gv[bad.idxmax()]!r} != {wv[bad.idxmax()]!r}"
            )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )

    print("== entry() smoke ==")
    t0 = time.perf_counter()
    res = entrymod.entry()
    print(f"entry ok: {len(to_pandas(res))} rows in "
          f"{time.perf_counter() - t0:.1f}s")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: {len(got)} rows (rows-only) [{dt:.1f}s]")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}")
            continue
        problems = compare(name, got, want)
        if problems:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(got)} rows == oracle [{dt:.1f}s]")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    import ray

    ray.shutdown()
    sys.exit(code)
