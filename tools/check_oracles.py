"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

Runs every queries()[name] at the given sf_dir and, when an oracle exists,
the matching oracle_sql()[name] in DuckDB with the testdata parquet files
registered as views. Compares row count, column names, and an
order-insensitive value multiset (exact, full precision — stricter than
any reasonable hash). Usage:

    env PYTHONPATH=/root/repo python tools/check_oracles.py [names...]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(value):
    if isinstance(value, float):
        return repr(value)
    if isinstance(value, bytes):
        return value.hex()
    return str(value)


def spark_multiset(df):
    cols = sorted(df.columns)
    rows = df.select(*cols).collect()
    return cols, Counter(tuple(canon(v) for v in row) for row in rows)


def duck_multiset(con, sql):
    res = con.sql(sql)
    names = list(res.columns)
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = res.fetchall()
    return cols, Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    import __spark_entry__ as entrymod
    from bfokg.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols, srows = spark_multiset(sdf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            n = sum(srows.values())
            print(f"ok   {name}: rows-only, {n} rows, {time.time()-t0:.1f}s")
            if n == 0:
                failures.append(name)
                print(f"WARN {name}: 0 rows from rows-only query")
            continue
        try:
            dcols, drows = duck_multiset(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if scols != dcols:
            failures.append(name)
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            continue
        if srows != drows:
            failures.append(name)
            miss = list((drows - srows).items())[:3]
            extra = list((srows - drows).items())[:3]
            print(f"FAIL {name}: values differ "
                  f"(spark {sum(srows.values())} rows, duck {sum(drows.values())} rows)")
            for r, c in miss:
                print(f"   only-duck ×{c}: {r}")
            for r, c in extra:
                print(f"   only-spark ×{c}: {r}")
            continue
        print(f"ok   {name}: {sum(srows.values())} rows match, {time.time()-t0:.1f}s")

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
