"""Local stand-in for the driver's correctness gate: run every
queries() entry and its oracle_sql() twin at a given sf, compare
row-count, column names, and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        df[c] = df[c].astype(str)
    rows = sorted(df.apply("|".join, axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            rdf = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in os_:
            print(f"ok   {name}: rows={len(rdf)} ({dt:.1f}s) [rows-only]")
            n_pass += 1
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(rdf) != len(odf):
            problems.append(f"rows {len(rdf)} vs {len(odf)}")
        if sorted(map(str, rdf.columns)) != sorted(map(str, odf.columns)):
            problems.append(f"cols {sorted(rdf.columns)} vs {sorted(odf.columns)}")
        elif [str(rdf[c].dtype) for c in sorted(rdf.columns)] != [
            str(odf[c].dtype) for c in sorted(odf.columns)
        ]:
            problems.append(
                "dtypes "
                + str({c: (str(rdf[c].dtype), str(odf[c].dtype))
                       for c in sorted(rdf.columns)
                       if str(rdf[c].dtype) != str(odf[c].dtype)})
            )
        elif value_hash(rdf) != value_hash(odf):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({dt:.1f}s)")
            n_fail += 1
        else:
            print(f"ok   {name}: rows={len(rdf)} ({dt:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
