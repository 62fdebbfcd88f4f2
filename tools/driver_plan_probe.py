"""Driver-side planning cost vs partition count (VERDICT r5 Next #7).

The claims that survive a 1000x scale-up are about the DRIVER: per-batch
planning must not grow linearly with table size.  This probe builds the
same monthly-partitioned lineitem table at 1x/4x/8x/16x PARTITION COUNT
(constant data per partition — how a real table grows), runs 12 steady
partition-local batches per scale with archival + auto-clean + the
metadata-table checkpoint cadence all ON (defaults), and measures, per
batch, the pure-driver components:

  listing      timeline.instants() — ONE per batch by design
  token        _data_instants_token derived from that listing
  view         FileSystemView build (metadata-table checkpoint + tail fold)
  bucket_plan  plan_insert_buckets over an all-partition profile
  local_upsert full wall of a partition-local upsert (sanity: flat)

Expected shape: listing/token ~flat (bounded by archival, O(active
timeline)); view bounded by the checkpoint load (O(file groups) parquet
read, NOT O(history)); bucket_plan O(batch partitions).  Writes the
"Driver-side planning" section of SCALE.md (tools/scale_probe.py preserves
it on rewrite).

Run: python tools/driver_plan_probe.py [sf_dir]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULTS = (1, 4, 8, 16)
MARKER = "## Driver-side planning vs partition count"


def main():
    from pyspark.sql import SparkSession, functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("driver-plan-probe")
             .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "24g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from incubator_hudi_spark import HudiTable
    from incubator_hudi_spark import timeline as tl
    from incubator_hudi_spark.config import INDEX_INMEMORY
    from incubator_hudi_spark.functions.workloads import \
        partition_local_update_batch
    from incubator_hudi_spark.plans.buckets import (avg_record_size,
                                                    plan_insert_buckets)

    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    li = li.persist()
    li.count()
    work = tempfile.mkdtemp(prefix="hudi_dplan_")

    def at_scale(mult):
        parts = [li.withColumn("l_orderkey",
                               F.col("l_orderkey") + 10_000_000 * i)
                   .withColumn("l_shipdate",
                               F.col("l_shipdate")
                               + F.make_dt_interval(F.lit(i * 2557)))
                 for i in range(mult)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    rows = {}
    for mult in MULTS:
        src = at_scale(mult).persist()
        src.count()
        t = HudiTable.create(
            spark, os.path.join(work, f"x{mult}"), name=f"x{mult}",
            recordkey_fields=["l_orderkey", "l_linenumber"],
            partition_expr="date_format(l_shipdate,'yyyy-MM')",
            precombine_field="l_shipdate")
        # defaults: metadata_checkpoint_commits=10; make archival/clean real
        t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY, auto_clean=True,
                            auto_archive=True, clean_retain_commits=4,
                            archive_min_commits=3, archive_max_commits=6)
        t.bulk_insert(src)
        loc = partition_local_update_batch(src)
        loc = loc.persist()
        loc.count()

        meas = {k: [] for k in ("listing", "token", "view", "bucket_plan",
                                "local_upsert")}
        n_groups = n_parts = 0
        for k in range(12):
            t0 = time.time()
            t.upsert(loc.withColumn("l_quantity", F.lit(float(k))))
            wall = time.time() - t0
            if k < 8:          # settle: checkpoint lands at 10 data commits
                continue
            meas["local_upsert"].append(wall)
            t0 = time.time()
            active = t.timeline.instants()
            meas["listing"].append(time.time() - t0)
            t0 = time.time()
            t._data_instants_token(active)
            meas["token"].append(time.time() - t0)
            t0 = time.time()
            view = t.view(active_instants=active)
            slices = view.latest_slices()
            meas["view"].append(time.time() - t0)
            n_groups = len(slices)
            parts_all = sorted({sl.partition for sl in slices})
            n_parts = len(parts_all)
            profile = {p: 1000 for p in parts_all}
            rec = avg_record_size(t.meta, t.timeline,
                                  t.cfg.record_size_estimate)
            t0 = time.time()
            plan_insert_buckets(profile, view, t.cfg, rec)
            meas["bucket_plan"].append(time.time() - t0)
        rows[mult] = {
            "partitions": n_parts, "file_groups": n_groups,
            **{k: round(sum(v) / len(v), 4) for k, v in meas.items()},
        }
        print(f"x{mult}: {rows[mult]}", file=sys.stderr)
        loc.unpersist()
        src.unpersist()

    # ---- write the SCALE.md section (preserved by scale_probe rewrites)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALE.md")
    head = ""
    if os.path.exists(path):
        with open(path) as f:
            head = f.read().split(MARKER)[0].rstrip() + "\n"
    cols = ["partitions", "file_groups", "listing", "token", "view",
            "bucket_plan", "local_upsert"]
    lines = [head, MARKER, "",
             "Per-batch DRIVER planning cost at 1x/4x/8x/16x partition count",
             "(constant data per partition; archival + auto-clean + the",
             "default 10-commit metadata-table checkpoint cadence all live;",
             "means over the last 4 of 12 steady partition-local batches,",
             "seconds, tools/driver_plan_probe.py):", "",
             "| metric \\ scale | " + " | ".join(f"{m}x" for m in MULTS) + " |",
             "|---|" + "---|" * len(MULTS)]
    for c in cols:
        lines.append(f"| {c} | " + " | ".join(
            str(rows[m][c]) for m in MULTS) + " |")
    r1, r16 = rows[MULTS[0]], rows[MULTS[-1]]
    lines += [
        "",
        f"listing/token are bounded by the ACTIVE timeline (archival keeps",
        f"it ~constant): {r1['listing']}s → {r16['listing']}s and",
        f"{r1['token']}s → {r16['token']}s across 16x partitions.  The view",
        "build folds a metadata-table checkpoint plus ≤10 tail commits, so",
        f"it tracks checkpoint size (O(file groups)): {r1['view']}s →",
        f"{r16['view']}s for {r1['file_groups']} → {r16['file_groups']}",
        "groups.  bucket_plan here is the ALL-partition worst case (the",
        "probe profiles an insert into every partition); it is O(batch",
        "partitions) driver dict work, and a real batch touches few.",
        "local_upsert stays bounded by the touched partition:",
        f"{r1['local_upsert']}s → {r16['local_upsert']}s on a 16x table.",
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    sub_linear = r16["listing"] <= 4 * max(r1["listing"], 0.002) and \
        r16["local_upsert"] <= 2.5 * r1["local_upsert"] + 0.5
    print("wrote SCALE.md driver section",
          "SUB-LINEAR-OK" if sub_linear else "DRIVER COST GREW")


if __name__ == "__main__":
    main()
