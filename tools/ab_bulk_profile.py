"""A/B probe for the GLOBAL_SORT bulk-load planning passes.

Measures, for one bulk_insert into an empty table whose target file size
forces multi-bucket partitions (the 100 TB bulk-load shape):
  - how many Spark jobs the operation runs (job-group id count),
  - wall clock, and the insert.profile stage share,
  - that written base files carry DISJOINT key ranges per partition (the
    property GLOBAL_SORT range assignment exists for).

Run: python tools/ab_bulk_profile.py [sf_dir] [target_file_bytes]
Before the round-6 fold this prints 3 planning+write jobs (count profile,
range-split sample scan, write); after, 2 (combined profile+sample, write).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("HUDI_SPARK_TIMING", "1")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TARGET = int(sys.argv[2]) if len(sys.argv) > 2 else 2 * 1024 * 1024


def main():
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[32]")
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
    from incubator_hudi_spark import timing
    from incubator_hudi_spark.config import WriteConfig
    from incubator_hudi_spark.functions.io import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()

    work = tempfile.mkdtemp(prefix="hudi_ab_bulkprof_")
    results = []
    for rep in range(3):
        t = HudiTable.create(
            spark, os.path.join(work, f"cow{rep}"), name=f"cow{rep}",
            recordkey_fields=["l_orderkey", "l_linenumber"],
            partition_expr="date_format(l_shipdate,'yyyy-MM')",
            precombine_field="l_shipdate",
            write_config=WriteConfig(target_file_size_bytes=TARGET))
        timing.records.clear()
        group = f"bulkprof{rep}"
        spark.sparkContext.setJobGroup(group, "bulk_insert probe")
        t0 = time.time()
        t.bulk_insert(li)
        wall = time.time() - t0
        spark.sparkContext.setJobGroup(None, None)
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
        stages = {lbl: round(dt, 3) for lbl, dt in timing.records}
        # verify per-partition key-range disjointness of the written files
        import pyarrow.parquet as pq
        overlaps = 0
        view = t.view()
        from collections import defaultdict
        per_part = defaultdict(list)
        for sl in view.latest_slices():
            for bf in sl.base_files:
                p_abs = bf.path if os.path.isabs(bf.path) \
                    else os.path.join(t.meta.base_path, bf.path)
                md = pq.read_metadata(p_abs)
                names = [md.schema.column(i).name
                         for i in range(md.num_columns)]
                ci = names.index("_hoodie_record_key")
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    if st is not None and st.has_min_max:
                        mins.append(st.min)
                        maxs.append(st.max)
                if mins:
                    per_part[sl.partition].append((min(mins), max(maxs)))
        n_files = 0
        for p, ranges in per_part.items():
            ranges.sort()
            n_files += len(ranges)
            for i in range(1, len(ranges)):
                if ranges[i][0] <= ranges[i - 1][1]:
                    overlaps += 1
        results.append((len(jobs), wall, stages, n_files, overlaps))
        print(f"rep{rep}: jobs={len(jobs)} wall={wall:.2f}s "
              f"files={n_files} range_overlaps={overlaps} stages={stages}",
              flush=True)
    walls = sorted(w for _, w, _, _, _ in results)
    print(f"median wall: {walls[len(walls)//2]:.2f}s  "
          f"jobs per run: {[r[0] for r in results]}")


if __name__ == "__main__":
    main()
