"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given sf dir, then compares row count, column-name schema, and
an order-insensitive value comparison (exact for ints/strings, exact-first
then 1e-9-tolerance report for floats) so oracle drift is caught before the
driver sees it.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(row[i] for i in order))
    return sorted(out, key=lambda r: tuple(str(x) for x in r)), [cols[i] for i in order]


def values_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True, True
        close = math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
        return False, close
    return (a == b, a == b)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from vectordb_cloud_spark.session import get_spark

    spark = get_spark("check-queries")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only - set(qs):
        # explicitly-named rows that are not in the 50-slot registry:
        # resolve them from the library of retired-but-oracle-backed rows
        # (r11 rotation) so spot runs keep working after a rotation
        from vectordb_cloud_spark import queries as _qmod

        lib, lib_orc = _qmod.library(), _qmod.library_oracles()
        for n in sorted(only - set(qs)):
            if n in lib:
                qs[n] = lib[n]
                if n in lib_orc:
                    oracles[n] = lib_orc[n]
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0
        if name not in oracles:
            print(f"  {name:32s} rows-only: {len(srows)} rows ({spark_s:.1f}s)")
            continue
        t0 = time.time()
        res = con.sql(oracles[name])
        dcols = res.columns
        # lint: HUGEINT / DECIMAL / TIMESTAMP_NS output columns serialize
        # differently from Spark's int64/double/µs-timestamp under the
        # driver's pandas-based value hash even when the values are equal
        # (CORRECTNESS_r01: doc_stats_by_lang, sessionize_users). fetchall()
        # masks this (Python ints compare equal), so check declared types.
        bad_types = [
            f"{c}:{t}" for c, t in zip(dcols, res.types)
            if str(t) in ("HUGEINT", "TIMESTAMP_NS") or str(t).startswith("DECIMAL")
        ]
        drows = res.fetchall()
        duck_s = time.time() - t0
        if bad_types:
            print(f"  {name:32s} ORACLE-TYPE-LINT       {' '.join(bad_types)} (cast ::BIGINT/::DOUBLE/::TIMESTAMP)")
            failures.append(name)
            continue
        s_n, s_c = normalize(srows, scols)
        d_n, d_c = normalize(drows, dcols)
        status, detail = "OK", ""
        if s_c != d_c:
            status, detail = "SCHEMA-MISMATCH", f"spark={s_c} duck={d_c}"
        elif len(s_n) != len(d_n):
            status, detail = "ROWCOUNT-MISMATCH", f"spark={len(s_n)} duck={len(d_n)}"
        else:
            exact = close = True
            first_bad = None
            for sr, dr in zip(s_n, d_n):
                for sv, dv in zip(sr, dr):
                    e, c = values_equal(sv, dv)
                    exact &= e
                    close &= c
                    if not c and first_bad is None:
                        first_bad = (sr, dr)
            if not exact:
                status = "VALUES-EXACT-FAIL" + ("(close)" if close else "")
                detail = f"first diff: {first_bad}" if first_bad else "within 1e-9"
        print(f"  {name:32s} {status:22s} rows={len(srows)} spark={spark_s:.1f}s duck={duck_s:.1f}s {detail}")
        if status != "OK":
            failures.append(name)
    print()
    if failures:
        print("FAILURES:", ", ".join(failures))
        sys.exit(1)
    print("all checked queries OK")


if __name__ == "__main__":
    main()
