"""A/B: warm_tag vs profile probe on a SPARSE-TOUCH batch over a layout
stats pruning cannot see through.

Scenario: bulk load with SORT_NONE (hash-ish arrival order → every file's
key range spans ~the whole key space, so min/max pruning keeps nothing)
into MULTI-GROUP partitions (small target size), NO bloom sidecar, then
upsert point-fix batches (a few dozen keys — the CDC/GDPR shape).  The
profile strategy's stats-pruned rewrite superset degrades to "every group
in every touched partition"; warm_tag's exact tag-profile rewrites only
the groups that actually hold batch keys.  This is the cluster-scale
point-fix shape (thousands of keys over millions of 120 MB groups) where
the exact set is the difference between a bounded write and a partition
rewrite.

Run: python tools/ab_sparse_touch.py [sf_dir] [n_rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 6
MODES = ("profile", "warm_tag")


def main():
    import shutil
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("ab-sparse")
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
    from incubator_hudi_spark.config import INDEX_INMEMORY, SORT_NONE
    from incubator_hudi_spark.functions.io import load_table

    work = tempfile.mkdtemp(prefix="hudi_sparse_")
    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()
    # point-fix batch: ~20 order keys (each key lives in exactly one file
    # group per partition it appears in)
    upd = (li.filter("l_orderkey % 30000 = 7")
           .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    upd.persist()
    print(f"batch rows: {upd.count()}", file=sys.stderr)

    tables, touched_files = {}, {}
    for m in MODES:
        t = HudiTable.create(
            spark, os.path.join(work, m), name=m,
            recordkey_fields=["l_orderkey", "l_linenumber"],
            partition_expr="date_format(l_shipdate,'yyyy')",
            precombine_field="l_shipdate")
        t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY, fast_lane_probe=m,
                            bulk_insert_sort_mode=SORT_NONE,
                            target_file_size_bytes=2 * 1024 * 1024)
        t.bulk_insert(li)
        t.upsert(upd)                       # warm index + plan shape
        tables[m] = t

    times = {m: [] for m in MODES}
    for k in range(N):
        order = MODES if k % 2 == 0 else tuple(reversed(MODES))
        for m in order:
            t0 = time.time()
            c = tables[m].upsert(upd.withColumn(
                "l_extendedprice", F.col("l_extendedprice") + k))
            times[m].append(time.time() - t0)
            touched_files[m] = len(
                [s for s in tables[m].view().latest_slices()
                 if s.base_instant == c])
        print(f"round {k}: " + "  ".join(
            f"{m}={times[m][-1]:.3f}s" for m in order), file=sys.stderr)

    print("\n== trimmed means (drop best+worst) ==", file=sys.stderr)
    for m in MODES:
        xs = sorted(times[m])[1:-1] if len(times[m]) > 2 else times[m]
        print(f"  {m}: {sum(xs)/len(xs):.3f}s  rewrote {touched_files[m]} "
              "file groups/batch  (all: "
              + " ".join(f"{x:.2f}" for x in times[m]) + ")", file=sys.stderr)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
