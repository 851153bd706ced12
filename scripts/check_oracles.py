"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() DuckDB equivalent at a given SF, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    """Type-PRESERVING canonicalization: an int and a float of equal value
    must NOT compare equal (Python ``302 == 302.0``), because the driver's
    gate hashes typed values — DuckDB HUGEINT→float64 vs Spark bigint is a
    real mismatch this local gate must catch (it shipped one in r3)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return ("f", round(v, 6))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return norm_cell(v.item())
        if isinstance(v, np.ndarray):
            return tuple(norm_cell(x) for x in v.tolist())
    except Exception:
        pass
    import datetime
    import decimal

    if isinstance(v, decimal.Decimal):
        # Tagged distinctly from float: Spark decimal(N,M) reaches pandas as
        # Decimal objects while DuckDB DECIMAL arrives as float64 — the driver
        # hash-mismatches on that dtype split (column_stats, r3+r4), so the
        # local gate must too.
        return ("d", round(float(v), 6))
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return v


def norm_frame(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from bytefreq_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    import time

    t_all = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)"
                  f"  [{time.time() - t0:.1f}s]")
            if len(sdf) == 0:
                print(f"      WARNING: 0 rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL {name}: oracle error {str(e)[:300]}")
            continue
        sc, sr = norm_frame(sdf)
        oc, orows = norm_frame(odf)
        if sc != oc:
            failures.append((name, f"columns differ: spark={sc} oracle={oc}"))
            print(f"FAIL {name}: columns spark={sc} oracle={oc}")
            continue
        if len(sr) != len(orows):
            failures.append((name, f"rowcount {len(sr)} vs {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(orows)}")
            continue
        if sr != orows:
            bad = [(a, b) for a, b in zip(sr, orows) if a != b][:3]
            failures.append((name, f"values differ, first: {bad}"))
            print(f"FAIL {name}: values differ; first diffs: {bad}")
            continue
        print(f"ok   {name}: {len(sr)} rows match  [{time.time() - t0:.1f}s]")

    print(f"\n{len(failures)} failures  total {time.time() - t_all:.1f}s")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
