"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, compare
row count + column names + order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime
import decimal
import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v.normalize())
    if isinstance(v, (datetime.datetime,)):
        return v.isoformat(sep=" ")
    if isinstance(v, (datetime.date,)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return json.dumps({k: norm_value(x) for k, x in sorted(v.items())})
    return str(v)


def hash_rows(cols, rows):
    """Sort columns by name (like the driver), normalize values, hash the
    sorted row multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(norm_value(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    import duckdb
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("correctness-check")
             .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    import __spark_entry__ as entry_mod
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()

    results = {}
    failed = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            results[name] = {"status": "SPARK_ERROR", "error": str(e)[:300]}
            failed.append(name)
            print(f"✗ {name}: SPARK_ERROR {str(e)[:200]}")
            continue
        if name not in oracles:
            results[name] = {"status": "ROWS_ONLY", "rows": len(srows),
                             "sec": round(time.time() - t0, 2)}
            print(f"~ {name}: rows-only, {len(srows)} rows")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            results[name] = {"status": "ORACLE_ERROR", "error": str(e)[:300]}
            failed.append(name)
            print(f"✗ {name}: ORACLE_ERROR {str(e)[:200]}")
            continue
        ok_count = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = hash_rows(scols, srows), hash_rows(ocols, orows)
        ok_hash = sh == oh
        status = "MATCH" if (ok_count and ok_cols and ok_hash) else "MISMATCH"
        results[name] = {"status": status, "spark_rows": len(srows),
                         "oracle_rows": len(orows),
                         "cols_match": ok_cols, "hash_match": ok_hash,
                         "sec": round(time.time() - t0, 2)}
        mark = "✓" if status == "MATCH" else "✗"
        print(f"{mark} {name}: {status} spark={len(srows)} oracle={len(orows)} "
              f"cols={ok_cols} hash={ok_hash} ({results[name]['sec']}s)")
        if status != "MATCH":
            failed.append(name)
            if ok_cols and ok_count:
                # show first differing rows for debugging
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                sset = sorted("\x1f".join(norm_value(r[i]) for i in order)
                              for r in srows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                oset = sorted("\x1f".join(norm_value(r[i]) for i in oorder)
                              for r in orows)
                diff_s = [x for x in sset if x not in set(oset)][:3]
                diff_o = [x for x in oset if x not in set(sset)][:3]
                for d in diff_s:
                    print(f"    spark-only: {d[:200]}")
                for d in diff_o:
                    print(f"    oracle-only: {d[:200]}")

    n_match = sum(1 for r in results.values() if r["status"] == "MATCH")
    n_rows_only = sum(1 for r in results.values() if r["status"] == "ROWS_ONLY")
    print(f"\n{n_match} MATCH, {n_rows_only} rows-only, {len(failed)} failed "
          f"of {len(results)} (sf={SF_DIR})")
    if failed:
        print("failed:", ", ".join(failed))
        sys.exit(1)


if __name__ == "__main__":
    main()
