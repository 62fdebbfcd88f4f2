"""Decompose the bench's mor_ingest_plus_3_deltas entry into write-path
stages (VERDICT r5 Next #2) — the same treatment upsert_10x_1pct got.

Reproduces the bench shape exactly (MOR + INMEMORY index + grouped deltas,
initial full-corpus upsert then 3 × 1% delta batches at sf0.1) with
HUDI_SPARK_TIMING=1, attributing each batch's wall time to:

  upsert.view        one .hoodie listing + fsview build (driver)
  upsert.bc_probe /
  upsert.profile     the pre-tag batch probe (per-partition counts or the
                     warm-tag existence probe, lane-dependent)
  upsert.load_index  key-index build/refresh (first batch only when warm)
  mor.delta_write    tag join + grouped delta-log write (ONE Spark job —
                     appends read nothing, HoodieAppendHandle.java:71)
  mor.insert_probe   per-partition insert counts on the tagging cache
                     (the collect at table.py; skipped when the delta write
                     observed zero untagged rows)
  mor.new_fg_write   new-file-group write for insert rows (ingest only)
  upsert.complete    commit JSON + timeline transition (driver)
  upsert.post_commit gates + (disabled here) inline services

Run: HUDI_SPARK_TIMING=1 python tools/mor_decompose.py [sf_dir] [n_rounds]
(The tool sets the env var itself if missing.)  Repeats the 3-delta block
n_rounds times on fresh tables, prints per-stage trimmed means.
"""

import os
import sys
import time

os.environ.setdefault("HUDI_SPARK_TIMING", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def main():
    import shutil
    import tempfile
    from collections import defaultdict

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master("local[32]")
             .appName("mor-decompose")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from incubator_hudi_spark import MERGE_ON_READ, HudiTable, timing
    from incubator_hudi_spark.config import INDEX_INMEMORY
    from incubator_hudi_spark.functions.io import load_table

    work = tempfile.mkdtemp(prefix="hudi_mordec_")
    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()
    upd = (li.filter("l_orderkey % 100 = 7")
           .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    upd.persist().count()

    def make(name):
        t = HudiTable.create(
            spark, os.path.join(work, name), name=name,
            recordkey_fields=["l_orderkey", "l_linenumber"],
            partition_expr="date_format(l_shipdate,'yyyy-MM')",
            precombine_field="l_shipdate", table_type=MERGE_ON_READ)
        t.cfg = t.cfg.with_(inline_compaction=False,
                            index_type=INDEX_INMEMORY)
        return t

    # untimed warmup: identical shape, JIT + codegen caches
    w = make("warm")
    w.upsert(li)
    w.upsert(upd)
    timing.records.clear()

    ingest = defaultdict(list)       # stage -> [s] for the initial upsert
    delta = defaultdict(list)        # stage -> [s] per delta batch
    totals = {"ingest": [], "delta": [], "entry": []}

    for r in range(ROUNDS):
        t = make(f"r{r}")
        e0 = time.time()
        timing.records.clear()
        t0 = time.time()
        t.upsert(li)
        totals["ingest"].append(time.time() - t0)
        for lbl, s in timing.records:
            ingest[lbl].append(s)
        for i in range(3):
            timing.records.clear()
            t0 = time.time()
            t.upsert(upd.withColumn("l_quantity", F.col("l_quantity") + i))
            totals["delta"].append(time.time() - t0)
            for lbl, s in timing.records:
                delta[lbl].append(s)
        totals["entry"].append(time.time() - e0)
        print(f"round {r}: entry={totals['entry'][-1]:.2f}s "
              f"ingest={totals['ingest'][-1]:.2f}s "
              f"deltas={[f'{x:.2f}' for x in totals['delta'][-3:]]}",
              file=sys.stderr)

    def tmean(xs):
        xs = sorted(xs)
        xs = xs[1:-1] if len(xs) > 3 else xs
        return sum(xs) / len(xs)

    print("\n== mor_ingest_plus_3_deltas decomposition "
          f"(sf={SF_DIR}, {ROUNDS} rounds, trimmed means) ==")
    print(f"entry total     : {tmean(totals['entry']):.2f}s")
    print(f"  initial ingest: {tmean(totals['ingest']):.2f}s")
    for lbl in sorted(ingest, key=lambda l: -tmean(ingest[l])):
        print(f"    {lbl:<22} {tmean(ingest[lbl]):.3f}s")
    print(f"  per delta batch: {tmean(totals['delta']):.3f}s  ×3")
    for lbl in sorted(delta, key=lambda l: -tmean(delta[l])):
        print(f"    {lbl:<22} {tmean(delta[lbl]):.3f}s")
    # stages nest (upsert.write ⊃ mor.delta_write ⊃ write.files;
    # insert.write ⊃ write.files) — only top-level stages sum to batch wall
    def top(stages):
        return {l: v for l, v in stages.items()
                if not l.startswith(("mor.", "write."))}
    acc_i = sum(tmean(v) for v in top(ingest).values())
    acc_d = sum(tmean(v) for v in top(delta).values())
    print(f"  unattributed: ingest {tmean(totals['ingest']) - acc_i:.3f}s, "
          f"delta {tmean(totals['delta']) - acc_d:.3f}s "
          "(DataFrame planning + python glue; nested mor.*/write.* stages "
          "excluded from the sum)")
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
