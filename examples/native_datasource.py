"""Native Python DataSource tour — ``format("hudi_py")`` batch + streaming.

The reference's user surface here is ``spark.read.format("hudi")`` /
``spark.readStream.format("hudi")`` (DefaultSource.scala,
HoodieStreamSource.scala); this engine registers the same shapes through
PySpark 4's Python DataSource API (incubator_hudi_spark/pyds.py).

    python examples/native_datasource.py [sf_dir]   # default /root/testdata/sf0.001
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
             .appName("hudi-py-native-datasource")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from incubator_hudi_spark import MERGE_ON_READ, HudiTable, pyds
    pyds.register(spark)                       # once per session

    work = tempfile.mkdtemp(prefix="hudi_native_")
    path = os.path.join(work, "trips")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(5000)

    # -- build a MOR table with history (writes go through the engine) -----
    t = HudiTable.create(spark, path, name="trips",
                         recordkey_fields=["o_orderkey"],
                         partition_expr="date_format(o_orderdate,'yyyy')",
                         precombine_field="o_orderdate",
                         table_type=MERGE_ON_READ)
    t.bulk_insert(orders)
    c1 = t.upsert(orders.limit(500).withColumn("o_comment", F.lit("v1")))
    c2 = t.upsert(orders.limit(200).withColumn("o_comment", F.lit("v2")))

    # -- batch reads -------------------------------------------------------
    snap = spark.read.format("hudi_py").load(path)
    print("snapshot rows:", snap.count())

    ro = (spark.read.format("hudi_py")
          .option("hoodie.datasource.query.type", "read_optimized")
          .load(path))
    print("read-optimized rows (bases only):", ro.count())

    inc = (spark.read.format("hudi_py")
           .option("hoodie.datasource.query.type", "incremental")
           .option("hoodie.datasource.read.begin.instanttime", c1)
           .option("hoodie.datasource.read.end.instanttime", c2)
           .load(path))
    print("incremental (c1, c2] rows:", inc.count())

    old = (spark.read.format("hudi_py")
           .option("as.of.instant", c1).load(path))
    print("time travel to c1 — v2 visible?",
          old.filter("o_comment = 'v2'").count() > 0)

    narrow = (spark.read.format("hudi_py")
              .option("hoodie.datasource.read.columns",
                      "o_orderkey,o_totalprice")
              .load(path))
    print("projected columns:", narrow.columns)

    # -- streaming source: drain history exactly-once ----------------------
    out, ckpt = os.path.join(work, "out"), os.path.join(work, "ckpt")
    q = (spark.readStream.format("hudi_py").load(path)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    print("streamed rows (full history):", spark.read.parquet(out).count())

    t.upsert(orders.limit(50).withColumn("o_comment", F.lit("v3")))
    q = (spark.readStream.format("hudi_py").load(path)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    print("streamed rows after resume (only the new commit added):",
          spark.read.parquet(out).count())

    # -- native write side: bulk load a NEW table ---------------------------
    path2 = os.path.join(work, "trips_copy")
    (spark.read.format("hudi_py").load(path)
     .drop(*[c for c in snap.columns if c.startswith("_hoodie")])
     .write.format("hudi_py")
     .option("hoodie.table.name", "trips_copy")
     .option("hoodie.datasource.write.recordkey.field", "o_orderkey")
     .option("hoodie.spark.partitionpath.expr",
             "date_format(o_orderdate,'yyyy')")
     .mode("append").save(path2))
    print("bulk-loaded copy rows:",
          spark.read.format("hudi_py").load(path2).count())

    # -- native streaming sink: hudi -> hudi incremental pipeline -----------
    path3, ck2 = os.path.join(work, "mirror"), os.path.join(work, "ck2")
    q = (spark.readStream.format("hudi_py").load(path)
         .writeStream.format("hudi_py")
         .option("hoodie.table.name", "mirror")
         .option("hoodie.datasource.write.recordkey.field", "o_orderkey")
         .option("hoodie.spark.partitionpath.expr",
                 "date_format(o_orderdate,'yyyy')")
         .option("path", path3).option("checkpointLocation", ck2)
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    print("mirrored table rows (exactly-once stream sink):",
          spark.read.format("hudi_py").load(path3).count())

    spark.stop()


if __name__ == "__main__":
    main()
