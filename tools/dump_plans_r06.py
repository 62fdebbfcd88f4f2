"""Dump `.explain("formatted")` plans for the round-6-touched query paths.

Usage: python tools/dump_plans_r06.py <out_dir> <tag> [sf_dir]

Writes <out_dir>/<query>_<tag>.txt for each captured query.  Run once with
tag=before from a worktree at the round-5 end commit and once with tag=after
on HEAD; each section is independent (a construction that does not exist at
a given revision is skipped with a note, so the same script runs at both).

The captured paths are the ones round 6 changed:
  - exact_substring_dedup  (window-hash kernel rewrite + candidate prefilter)
  - span_dedup             (tokenize-once + materialized token array)
  - minhash_lsh_pairs      (shared shingling helpers)
  - ngram_jaccard_pairs    (shared shingling helpers)
  - mor_delta_write        (insert-probe fold: CollectMetrics under the tag)
  - mor_snapshot_read      (merged read; r6 touched slice materialization)
  - incremental_glob       (file-level GlobPattern parity — plan + file count)
  - cow_upsert_merge       (auto-routed fast lane, unchanged r6 — reference)
  - snapshot_agg           (bench read entry — reference)
"""

from __future__ import annotations

import os
import sys
import tempfile
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

    tmp = tempfile.mkdtemp(prefix="plans_r06_")
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    # ---- corpus operators ------------------------------------------------
    @section("exact_substring_dedup")
    def _():
        from incubator_hudi_spark.operators.text import dedup_exact_substrings
        dump("exact_substring_dedup",
             dedup_exact_substrings(docs, min_words=8),
             note="dedup_exact_substrings(docs, min_words=8)")

    @section("span_dedup")
    def _():
        from incubator_hudi_spark.operators.text import dedup_spans
        dump("span_dedup", dedup_spans(docs, span_words=10),
             note="dedup_spans(docs, span_words=10)")

    @section("minhash_lsh_pairs")
    def _():
        from incubator_hudi_spark.operators.dedup import minhash_lsh_pairs
        dump("minhash_lsh_pairs",
             minhash_lsh_pairs(docs, k=16, bands=8, verify_threshold=0.7),
             note="minhash_lsh_pairs(docs, k=16, bands=8, thresh=0.7)")

    @section("ngram_jaccard_pairs")
    def _():
        from incubator_hudi_spark.operators.dedup import ngram_jaccard_pairs
        dump("ngram_jaccard_pairs",
             ngram_jaccard_pairs(docs, n=3, threshold=0.5),
             note="ngram_jaccard_pairs(docs, n=3, threshold=0.5)")

    # ---- engine write/read paths ----------------------------------------
    from incubator_hudi_spark import HudiTable, MERGE_ON_READ
    from incubator_hudi_spark.config import QUERY_INCREMENTAL

    t = HudiTable.create(spark, tmp + "/cow", "cow",
                         recordkey_fields=["l_orderkey", "l_linenumber"],
                         partition_expr="date_format(l_shipdate,'yyyy-MM')",
                         precombine_field="l_shipdate")
    c0 = t.bulk_insert(li)
    upd = li.limit(300).withColumn("l_quantity", F.lit(1.0))
    c1 = t.upsert(upd)

    @section("snapshot_agg")
    def _():
        dump("snapshot_agg",
             t.read().groupBy("l_returnflag", "l_linestatus")
              .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")),
                   F.count(F.lit(1))),
             note="bench snapshot_agg over the COW table")

    @section("incremental_glob")
    def _():
        inc = t.read(QUERY_INCREMENTAL, begin=c0, end=c1,
                     path_glob="199[5-8]-*/*")
        n = len(inc.inputFiles())
        dump("incremental_glob", inc,
             note=f"incremental read begin..end, path_glob=199[5-8]-*/* "
                  f"({n} input files)")

    @section("cow_upsert_merge")
    def _():
        # mirror _upsert_impl's merge construction (explain_audit section 3)
        from incubator_hudi_spark.writer import (FG, NEW_FLAG, drop_deleted,
                                                 merge_latest)
        from incubator_hudi_spark.indexing import (FG_COL, load_key_index,
                                                   tag_locations)
        view = t.view()
        prepared = t._prepare(upd, "99999999999999999", combine=True).persist()
        prepared.count()
        idx = load_key_index(spark, t.meta, view, t.cfg.index_type, tc=t.tc)
        tagged = tag_locations(prepared, idx, t.cfg.index_type,
                               broadcast_incoming=True).persist()
        tagged.count()
        updates = (tagged.filter(F.col(FG_COL).isNotNull())
                   .withColumn(FG, F.col(FG_COL)).drop(FG_COL)
                   .withColumn(NEW_FLAG, F.lit(True)))
        old = t._read_fg_files(
            view, {r[0] for r in updates.select(FG).distinct().collect()}
        ).withColumn(NEW_FLAG, F.lit(False))
        merged = (old.unionByName(updates, allowMissingColumns=True)
                  .repartition(8, F.col(FG)))
        merged = drop_deleted(merge_latest(merged, t.tc, bucket_col=FG))
        dump("cow_upsert_merge", merged,
             note="COW upsert merge stream (window lane)")

    m = HudiTable.create(spark, tmp + "/mor", "mor",
                         recordkey_fields=["l_orderkey", "l_linenumber"],
                         partition_expr="date_format(l_shipdate,'yyyy-MM')",
                         precombine_field="l_shipdate",
                         table_type=MERGE_ON_READ)
    m.cfg = m.cfg.with_(inline_compaction=False)
    m.upsert(li)
    m.upsert(li.limit(300).withColumn("l_quantity", F.lit(2.0)))

    @section("mor_snapshot_read")
    def _():
        dump("mor_snapshot_read", m.read(),
             note="MOR merged snapshot read after 1 delta batch")

    @section("mor_delta_write")
    def _():
        # the tagged delta stream a MOR upsert writes (the r6 insert-probe
        # fold adds a CollectMetrics observation on this plan)
        from incubator_hudi_spark.indexing import (FG_COL, load_key_index,
                                                   tag_locations)
        view = m.view()
        prepared = m._prepare(li.limit(300).withColumn("l_quantity",
                                                       F.lit(3.0)),
                              "99999999999999998", combine=True)
        idx = load_key_index(spark, m.meta, view, m.cfg.index_type, tc=m.tc)
        tagged = tag_locations(prepared, idx, m.cfg.index_type,
                               broadcast_incoming=True)
        # mirror _upsert_impl: at revisions with the insert-probe fold the
        # tagged stream carries a CollectMetrics observation; detect by
        # source so before/after dumps show the actual plan difference
        import inspect
        from incubator_hudi_spark import table as _tablemod
        has_fold = "tag_obs = Observation()" in inspect.getsource(_tablemod)
        if has_fold:
            from pyspark.sql import Observation
            from incubator_hudi_spark.indexing import FG_COL as _FGC
            tagged = tagged.observe(
                Observation(),
                F.count(F.when(F.col(_FGC).isNull(), True))
                 .alias("n_inserts"))
        dump("mor_delta_write", tagged,
             note=f"MOR delta-write tagged stream (insert-probe fold "
                  f"present at this revision: {has_fold})")

    spark.stop()


if __name__ == "__main__":
    main()
