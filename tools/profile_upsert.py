"""Wall-clock profile of the COW upsert loop (the bench's dominant entry).

Run: HUDI_SPARK_TIMING=1 python tools/profile_upsert.py [sf_dir] [n_batches]
Prints per-stage timings (table.py _stage probes) plus per-batch totals.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main():
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("profile-upsert")
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

    work = tempfile.mkdtemp(prefix="hudi_prof_")
    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()
    t = HudiTable.create(
        spark, os.path.join(work, "cow"), name="cow",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY)

    t0 = time.time()
    t.bulk_insert(li)
    print(f"[total] bulk_insert: {time.time()-t0:.3f}s", file=sys.stderr)

    upd = (li.filter("l_orderkey % 100 = 7")
           .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    upd.persist().count()
    for i in range(N):
        t0 = time.time()
        t.upsert(upd.withColumn("l_extendedprice", F.col("l_extendedprice") + i))
        print(f"[total] upsert#{i}: {time.time()-t0:.3f}s", file=sys.stderr)
    li.unpersist()
    upd.unpersist()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
