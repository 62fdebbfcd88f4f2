"""Interleaved A/B: engine writes through the checksummed LocalFileSystem
(r6 behavior — every written file gets a .crc sidecar and every commit a
_SUCCESS pair) vs per-write-scoped RawLocalFileSystem options (no sidecars).

Rationale (guide §6, host pathology): this host degrades under concurrent
small-file churn; .crc sidecars double the file create/delete count of every
write lane, and parquet pages already carry their own CRCs
(parquet.page.write-checksum.enabled defaults true), so the sidecars add no
integrity on top.  The options ride the write job's Hadoop conf
(newHadoopConfWithOptions) — session config and non-file schemes untouched.

Measures the two heaviest bench lanes: the COW upsert_10x_1pct sequence and
the MOR ingest+3 deltas sequence.

Run: python tools/ab_rawfs_writes.py [sf_dir]
"""
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("ab-rawfs")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from incubator_hudi_spark import HudiTable, MERGE_ON_READ
    from incubator_hudi_spark import writer as W
    from incubator_hudi_spark.config import INDEX_INMEMORY
    from incubator_hudi_spark.functions.io import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()
    upd = (li.filter("l_orderkey % 100 = 7")
           .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    upd.persist().count()
    work = tempfile.mkdtemp(prefix="ab_rawfs_")

    def cow_lane(path):
        t = HudiTable.create(
            spark, path, name="cow",
            recordkey_fields=["l_orderkey", "l_linenumber"],
            partition_expr="date_format(l_shipdate,'yyyy-MM')",
            precombine_field="l_shipdate")
        t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY)
        t.bulk_insert(li)
        t0 = time.time()
        for i in range(10):
            t.upsert(upd.withColumn("l_extendedprice",
                                    F.col("l_extendedprice") + i))
        wall = time.time() - t0
        n = t.read().count()
        return wall, n

    def mor_lane(path):
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
            tm.upsert(upd.withColumn("l_quantity", F.col("l_quantity") + i))
        wall = time.time() - t0
        return wall, tm.read().count()

    variants = [("checksummed", False), ("rawfs", True)]
    # warm
    W.LOCAL_RAW_FS_WRITES = False
    cow_lane(os.path.join(work, "warm_cow"))
    results = {f"{lane}:{v}": [] for v, _ in variants for lane in ("cow", "mor")}
    counts = {}
    crc_seen = {}
    rounds = int(os.environ.get("AB_ROUNDS", "4"))
    for r in range(rounds):
        # counterbalanced ordering: alternate which variant runs first each
        # round so a drifting host window cannot systematically favor the
        # later variant
        order = variants if r % 2 == 0 else variants[::-1]
        for vname, flag in order:
            W.LOCAL_RAW_FS_WRITES = flag
            for lane, fn in (("cow", cow_lane), ("mor", mor_lane)):
                p = os.path.join(work, f"{lane}_{vname}_{r}")
                wall, n = fn(p)
                results[f"{lane}:{vname}"].append(wall)
                counts.setdefault(f"{lane}:{vname}", n)
                crc = sum(1 for rr, _, fs in os.walk(p)
                          for f in fs if f.endswith(".crc"))
                crc_seen[f"{lane}:{vname}"] = crc
                shutil.rmtree(p, ignore_errors=True)
    W.LOCAL_RAW_FS_WRITES = False
    med = lambda xs: sorted(xs)[len(xs) // 2]
    for k, xs in results.items():
        print(f"{k:18s} median={med(xs):7.3f} {[round(x,3) for x in xs]} "
              f"rows={counts[k]} crc_files={crc_seen[k]}")


if __name__ == "__main__":
    main()
