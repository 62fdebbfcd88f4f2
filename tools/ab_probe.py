"""Interleaved same-window A/B of COW fast-lane probe strategies.

Window drift makes sequential tool runs incomparable (load on this box can
double batch times within minutes), so this drives BOTH strategies from ONE
SparkSession against twin tables and alternates batches ABBA-style:
round k runs the two modes in order (A,B) when k is even, (B,A) when odd.

Run: python tools/ab_probe.py [sf_dir] [n_rounds]
Prints per-mode per-round seconds and the trimmed means.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MODES = ("profile", "warm_tag")


def main():
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("ab-probe")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from incubator_hudi_spark import HudiTable
    from incubator_hudi_spark.config import INDEX_INMEMORY
    from incubator_hudi_spark.functions.io import load_table

    work = tempfile.mkdtemp(prefix="hudi_ab_")
    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()
    upd = (li.filter("l_orderkey % 100 = 7")
           .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    upd.persist().count()

    tables = {}
    for m in MODES:
        t = HudiTable.create(
            spark, os.path.join(work, m), name=m,
            recordkey_fields=["l_orderkey", "l_linenumber"],
            partition_expr="date_format(l_shipdate,'yyyy-MM')",
            precombine_field="l_shipdate")
        t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY, fast_lane_probe=m)
        t.bulk_insert(li)
        t.upsert(upd)                       # warm both lanes identically
        tables[m] = t

    times = {m: [] for m in MODES}
    for k in range(N):
        order = MODES if k % 2 == 0 else tuple(reversed(MODES))
        for m in order:
            t0 = time.time()
            tables[m].upsert(upd.withColumn("l_extendedprice",
                                            F.col("l_extendedprice") + k))
            times[m].append(time.time() - t0)
        print(f"round {k}: " + "  ".join(
            f"{m}={times[m][-1]:.3f}s" for m in order), file=sys.stderr)

    print("\n== trimmed means (drop best+worst) ==", file=sys.stderr)
    for m in MODES:
        xs = sorted(times[m])[1:-1] if len(times[m]) > 2 else times[m]
        print(f"  {m}: {sum(xs)/len(xs):.3f}s  (all: "
              + " ".join(f"{x:.2f}" for x in times[m]) + ")", file=sys.stderr)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
