"""Dump `.explain("formatted")` plans for the round-7-touched query paths.

Usage: python tools/dump_plans_r07.py <out_dir> <tag> [sf_dir]

Writes <out_dir>/<query>_<tag>.txt for each captured query.  Run once with
tag=before from a worktree at the round-6 end commit and once with tag=after
on HEAD; sections that do not exist at a revision are skipped with a note.

Captured paths (the r7-touched set):
  - bulk_insert_profile        (distributed split-point selection inside the
                                fused profile aggregation — r7 Next #3)
  - minhash_lsh_pairs          (default path — must be UNCHANGED vs r6)
  - minhash_lsh_pairs_bounded  (new max_bucket_size mode: windowed bucket
                                gate + salted self-join — r7 Next #2)
  - exact_substring_dedup      (checkpoint_dir default None — unchanged)
  - dup_clusters_pairs_input   (reference, unchanged)
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = sys.argv[1]
TAG = sys.argv[2]
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"


def main():
    from pyspark.sql import SparkSession, functions as F

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .config("spark.sql.adaptive.enabled", "false")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def explain(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))

    def dump(name, df, note=""):
        path = os.path.join(OUT_DIR, f"{name}_{TAG}.txt")
        with open(path, "w") as f:
            if note:
                f.write(f"-- {note}\n")
            f.write(explain(df))
        print(f"wrote {path}")

    def section(name):
        def deco(fn):
            try:
                fn()
            except Exception:
                print(f"SKIP {name}: construction failed at this revision")
                traceback.print_exc(limit=2)
        return deco

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))

    @section("bulk_insert_profile")
    def _():
        # the fused profile aggregation exactly as _write_inserts builds it
        from incubator_hudi_spark.config import TableConfig
        from incubator_hudi_spark.writer import with_key_columns
        from incubator_hudi_spark.config import (META_PARTITION_PATH,
                                                  META_RECORD_KEY)
        tc = TableConfig(
            name="t", recordkey_fields=["l_orderkey", "l_linenumber"],
            partition_expr="date_format(l_shipdate,'yyyy-MM')",
            precombine_field="l_shipdate")
        src = with_key_columns(li, tc)
        try:
            from incubator_hudi_spark.plans.buckets import \
                fused_profile_splits
            agg = fused_profile_splits(src, META_PARTITION_PATH,
                                       META_RECORD_KEY, 64, 16 * 1024)
            note = ("r7: ONE aggregation yields counts AND the k-1 split "
                    "points; no raw sampled key reaches the driver")
        except ImportError:
            # r6 shape: counts + raw key sample collected to the driver
            frac = min(1.0, (100 * 64) / (16 * 1024))
            thresh = max(1, int(frac * (1 << 20)))
            agg = (src.groupBy(META_PARTITION_PATH)
                   .agg(F.count(F.lit(1)).alias("_n"),
                        F.collect_list(F.when(
                            F.pmod(F.xxhash64(F.col(META_RECORD_KEY)),
                                   F.lit(1 << 20)) < F.lit(thresh),
                            F.col(META_RECORD_KEY))).alias("_ks")))
            note = ("r6 shape: counts + RAW key samples collected to the "
                    "driver (collect_list of keys in the output)")
        dump("bulk_insert_profile", agg, note)

    @section("minhash_lsh_pairs")
    def _():
        from incubator_hudi_spark.operators import dedup
        dump("minhash_lsh_pairs",
             dedup.minhash_lsh_pairs(docs, k=16, bands=8,
                                     verify_threshold=0.7),
             "default path — r7 must be plan-identical to r6")

    @section("minhash_lsh_pairs_bounded")
    def _():
        from incubator_hudi_spark.operators import dedup
        dump("minhash_lsh_pairs_bounded",
             dedup.minhash_lsh_pairs(docs, k=16, bands=8,
                                     verify_threshold=0.7,
                                     max_bucket_size=100_000),
             "r7 bounded mode: Window count gate over (band,bh) + salted "
             "self-join on (band,bh,_salt) — new capability, default off")

    @section("exact_substring_dedup")
    def _():
        from incubator_hudi_spark.operators.text import dedup_exact_substrings
        dump("exact_substring_dedup",
             dedup_exact_substrings(docs, min_words=8),
             "checkpoint_dir=None default — unchanged vs r6")


if __name__ == "__main__":
    main()
