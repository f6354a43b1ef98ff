"""Driver-mimicking correctness harness.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB against the same parquet tables, then
compares row count, column-name set, and order-insensitive values.
Stricter than the driver: reports per-column max numeric deviation so
we know whether a match is bit-exact (safe) or merely approximate
(risky under an unknown hash).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return v


def norm_rows(cols, rows):
    # sort columns by name (driver behavior), then sort rows
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def canon_pandas(df):
    """Mimic the driver's canonicalization: pandas frame, columns sorted
    by name, rows sorted by all columns, cells compared by repr.

    This is deliberately strict about dtype repr: int64 ``5`` vs float64
    ``5.0`` is a MISMATCH (that is how the driver's value hash behaves
    when DuckDB widens BIGINT sums to HUGEINT→float64 or returns DECIMAL
    as float64 against Spark Decimal/long cells).
    """
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return [tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)]


def main() -> int:
    import __spark_entry__ as entry_mod
    from changedatacapture_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            spd = sdf.toPandas()
            srows = list(spd.itertuples(index=False))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dpd = res.df()
            dcols = list(dpd.columns)
            drows = list(dpd.itertuples(index=False))
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        ok = True
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duckdb={len(drows)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns spark={sorted(scols)} duckdb={sorted(dcols)}")
            ok = False
        if ok:
            ns = canon_pandas(spd)
            nd = canon_pandas(dpd)
            if ns != nd:
                ok = False
                # find first differing row for diagnostics
                shown = 0
                for a, b in zip(ns, nd):
                    if a != b and shown < 3:
                        print(f"FAIL {name}: row diff\n  spark : {a}\n  duckdb: {b}")
                        shown += 1
                if shown == 0:
                    print(f"FAIL {name}: value mismatch (row set differs)")
        if ok:
            print(f"PASS {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print(f"all {len([n for n in queries if not ONLY or n in ONLY])} queries ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
