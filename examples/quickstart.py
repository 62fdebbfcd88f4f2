"""Quickstart — the engine's public surface in one script.

Mirrors the reference's hudi-examples/HoodieDataSourceExample.scala tour:
create → upsert → snapshot / incremental / point-in-time reads → SQL DML →
MOR + compaction → table services.  Runs on the driver-generated testdata.

    python examples/quickstart.py [sf_dir]     # default /root/testdata/sf0.001
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (SparkSession.builder.master("local[4]")
             .appName("hudi-py-quickstart")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from incubator_hudi_spark import (HudiTable, MERGE_ON_READ,
                                      QUERY_INCREMENTAL, QUERY_READ_OPTIMIZED)

    work = tempfile.mkdtemp(prefix="hudi_quickstart_")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    # -- create + upsert ----------------------------------------------------
    t = HudiTable.create(
        spark, os.path.join(work, "lineitem"), name="lineitem",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    c1 = t.upsert(li)
    print(f"ingested {t.read().count()} rows at commit {c1}")

    c2 = t.upsert(li.filter("l_linenumber = 1")
                    .withColumn("l_quantity", F.col("l_quantity") + 1000.0))
    print("updated rows:", t.read().filter("l_quantity > 1000").count())

    # -- three query views --------------------------------------------------
    inc = t.read(QUERY_INCREMENTAL, begin=c1, end=c2)
    print("incremental (c1, c2]:", inc.count())
    print("point-in-time at c1, updated rows:",
          t.read(as_of=c1).filter("l_quantity > 1000").count())

    # -- SQL DML ------------------------------------------------------------
    from incubator_hudi_spark.sql import HudiSqlSession
    hs = HudiSqlSession(spark)
    hs.register("lineitem", t)
    hs.sql("UPDATE lineitem SET l_discount = 0.0 WHERE l_quantity > 1000")
    hs.sql("DELETE FROM lineitem WHERE l_returnflag = 'R'")
    print("after DML:", t.read().count())

    # -- MOR + compaction ---------------------------------------------------
    m = HudiTable.create(
        spark, os.path.join(work, "lineitem_mor"), name="lineitem_mor",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", table_type=MERGE_ON_READ)
    m.cfg = m.cfg.with_(inline_compaction=False)
    m.upsert(li)
    m.upsert(li.filter("l_linenumber = 2")
               .withColumn("l_quantity", F.lit(0.5)))
    print("MOR snapshot vs read-optimized halves:",
          m.read().filter("l_quantity = 0.5").count(),
          m.read(QUERY_READ_OPTIMIZED).filter("l_quantity = 0.5").count())
    m.run_compaction()
    print("after compaction, read-optimized sees the update:",
          m.read(QUERY_READ_OPTIMIZED).filter("l_quantity = 0.5").count())

    # -- services + admin ---------------------------------------------------
    sp = t.savepoint()
    t.cluster(sort_columns=["l_orderkey"])
    t.clean()
    from incubator_hudi_spark import admin
    admin.commits_df(t).show(5, truncate=False)
    print("stats:", admin.stats_df(t).count(), "commits;",
          "savepoint", sp, "pinned")

    spark.stop()


if __name__ == "__main__":
    main()
