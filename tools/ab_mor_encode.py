"""Bounded encode experiment for the MOR ingest lane (r6 verdict Next #7):
write.files is ~75% of mor_ingest_plus_3_deltas' ingest leg — try parquet
page-size / dictionary knobs on the writers and measure the full bench
sequence (initial upsert + 3 grouped deltas) interleaved.

Knobs are applied through the session Hadoop configuration so both the
base-file writer (write_instant_files) and the grouped-delta writer
(write_grouped_log_files) see them without code changes; adoption would
thread them through WriteConfig.

Run: python tools/ab_mor_encode.py [sf_dir]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

VARIANTS = {
    "baseline": {},
    "dict_off": {"parquet.enable.dictionary": "false"},
    "page_4m": {"parquet.page.size": str(4 * 1024 * 1024)},
    "dict_off_page_4m": {"parquet.enable.dictionary": "false",
                         "parquet.page.size": str(4 * 1024 * 1024)},
    "blk_32m": {"parquet.block.size": str(32 * 1024 * 1024)},
}


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("ab-mor-encode")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from incubator_hudi_spark import HudiTable, MERGE_ON_READ
    from incubator_hudi_spark.config import INDEX_INMEMORY
    from incubator_hudi_spark.functions.io import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()
    upd = (li.filter("l_orderkey % 100 = 7")
           .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    upd.persist().count()
    work = tempfile.mkdtemp(prefix="ab_mor_encode_")
    hconf = spark.sparkContext._jsc.hadoopConfiguration()

    def run_once(name, knobs, tag):
        for k, v in knobs.items():
            hconf.set(k, v)
        try:
            path = os.path.join(work, f"{name}_{tag}")
            tm = HudiTable.create(
                spark, path, name="mor",
                recordkey_fields=["l_orderkey", "l_linenumber"],
                partition_expr="date_format(l_shipdate,'yyyy-MM')",
                precombine_field="l_shipdate", table_type=MERGE_ON_READ)
            tm.cfg = tm.cfg.with_(inline_compaction=False,
                                  index_type=INDEX_INMEMORY)
            t0 = time.time()
            tm.upsert(li)
            for i in range(3):
                tm.upsert(upd.withColumn("l_quantity",
                                         F.col("l_quantity") + i))
            wall = time.time() - t0
            size = sum(os.path.getsize(os.path.join(r, f))
                       for r, _, fs in os.walk(path) for f in fs)
            n = tm.read().count()
            shutil.rmtree(path, ignore_errors=True)
            return wall, size, n
        finally:
            for k in knobs:
                hconf.unset(k)

    # warm
    run_once("warm", {}, "w")
    rounds = 3
    walls = {k: [] for k in VARIANTS}
    for r in range(rounds):
        for name, knobs in VARIANTS.items():
            wall, size, n = run_once(name, knobs, f"r{r}")
            walls[name].append(wall)
            if r == 0:
                print(f"{name:20s} size={size/1e6:8.1f}MB rows={n}")
    med = lambda xs: sorted(xs)[len(xs) // 2]
    for name, xs in walls.items():
        print(f"{name:20s} median={med(xs):6.3f} {[round(x,3) for x in xs]}")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
