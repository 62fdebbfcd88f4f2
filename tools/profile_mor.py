"""Wall-clock profile of the MOR ingest/read/compaction path.

Run: HUDI_SPARK_TIMING=1 python tools/profile_mor.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main():
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("profile-mor")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from incubator_hudi_spark import MERGE_ON_READ, HudiTable
    from incubator_hudi_spark.config import INDEX_INMEMORY
    from incubator_hudi_spark.functions.io import load_table

    work = tempfile.mkdtemp(prefix="hudi_prof_mor_")
    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()
    upd = (li.filter("l_orderkey % 100 = 7")
           .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    upd.persist().count()

    t = HudiTable.create(
        spark, os.path.join(work, "mor"), name="mor",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False, index_type=INDEX_INMEMORY)

    t0 = time.time()
    t.upsert(li)
    print(f"[total] mor_initial_upsert: {time.time()-t0:.3f}s", file=sys.stderr)
    for i in range(3):
        t0 = time.time()
        t.upsert(upd.withColumn("l_quantity", F.col("l_quantity") + i))
        print(f"[total] mor_delta#{i}: {time.time()-t0:.3f}s", file=sys.stderr)
    t0 = time.time()
    t.read().count()
    print(f"[total] mor_merged_read: {time.time()-t0:.3f}s", file=sys.stderr)
    t0 = time.time()
    t.run_compaction()
    print(f"[total] mor_compaction: {time.time()-t0:.3f}s", file=sys.stderr)
    t0 = time.time()
    t.read().count()
    print(f"[total] mor_read_post_compact: {time.time()-t0:.3f}s", file=sys.stderr)
    li.unpersist()
    upd.unpersist()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
