"""Local stand-in for the driver's correctness gate: run every
queries() entry and, where an oracle_sql() exists, compare against
DuckDB on the same parquet tables (row count, column names, exact
values after sorting columns by name).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if len(ray_df) != len(sql_df):
        return f"ROWS {len(ray_df)} vs {len(sql_df)}"
    rc = sorted(ray_df.columns)
    sc = sorted(sql_df.columns)
    if rc != sc:
        return f"SCHEMA {rc} vs {sc}"
    a = ray_df[rc].reset_index(drop=True)
    b = sql_df[rc].reset_index(drop=True)
    for c in rc:
        av, bv = a[c], b[c]
        try:
            if not av.equals(bv):
                eq = av.astype(str).values == bv.astype(str).values
                if not eq.all():
                    i = int((~eq).argmax())
                    return (f"VALUES col={c} row={i}: "
                            f"{av.iloc[i]!r} vs {bv.iloc[i]!r}")
        except Exception as e:
            return f"CMPERR col={c}: {e}"
    return "OK"


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    try:
        from ray.data import DataContext
        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ray_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")

    qs = mod.queries()
    sqls = mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                res = res.to_pandas()
        except Exception as e:
            failures.append(name)
            print(f"{name:26s} RAY-ERROR {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name in sqls:
            try:
                sql_df = con.sql(sqls[name]).df()
            except Exception as e:
                failures.append(name)
                print(f"{name:26s} SQL-ERROR {e}")
                continue
            verdict = compare(name, res, sql_df)
            if verdict != "OK":
                failures.append(name)
            print(f"{name:26s} {verdict:40s} rows={len(res)} {dt:5.1f}s")
        else:
            print(f"{name:26s} rows-only{'':31s} rows={len(res)} {dt:5.1f}s")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
