"""Headline benchmark: engine write/read/services + data-pipeline operators
at $SPARK_GRAFT_SF_DIR (default sf0.1, ~600k lineitem rows) on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder
             .master(f"local[{CPUS}]")
             .appName("incubator-hudi-spark-bench")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from incubator_hudi_spark import (HudiTable, MERGE_ON_READ,
                                      QUERY_INCREMENTAL, QUERY_READ_OPTIMIZED,
                                      WriteConfig)
    from incubator_hudi_spark.functions.io import load_table
    from incubator_hudi_spark.operators import dedup, similarity, text

    work = tempfile.mkdtemp(prefix="hudi_bench_")
    timings: dict[str, float] = {}
    repeats: dict[str, int] = {}
    samples: dict[str, list[float]] = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.time()
            def __exit__(self, *a):
                timings[name] = round(time.time() - self.t0, 3)
                repeats[name] = 1
                samples[name] = [timings[name]]
        return _T()

    def timed_median(name, fn, n=3):
        """Sub-second idempotent entries flap ±0.2 s with window drift on
        this box — run them n× and record the MEDIAN so round-over-round
        deltas measure code, not hypervisor noise (still one run's worth in
        the total).  Raw samples are published in the "samples" field so a
        reader can see flap directly instead of trusting the median."""
        xs = []
        for _ in range(n):
            t0 = time.time()
            fn()
            xs.append(time.time() - t0)
        timings[name] = round(sorted(xs)[len(xs) // 2], 3)
        repeats[name] = n
        samples[name] = [round(x, 3) for x in xs]

    li = load_table(spark, SF_DIR, "lineitem")
    li.persist().count()
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")

    # untimed warmup: exercise the write/read codegen paths so timed numbers
    # measure the engine, not JVM/JIT warmup.  The slice must be big enough
    # to push the parquet encode / merge / window loops past the C2
    # compilation threshold — a few thousand rows JITs nothing.
    from incubator_hudi_spark.config import INDEX_INMEMORY as _IM
    wli = li.limit(150_000)
    wupd = wli.filter("l_orderkey % 50 = 7").withColumn("l_quantity", F.lit(1.0))
    wt = HudiTable.create(
        spark, os.path.join(work, "warmup"), name="warmup",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    wt.cfg = wt.cfg.with_(index_type=_IM)
    wt.bulk_insert(wli)
    wt.upsert(wupd)                      # cold-index upsert (anti-join path)
    wt.upsert(wupd)                      # warm-index steady-state path
    wt.delete(wupd.limit(5000))
    wt.read().count()
    wm = HudiTable.create(
        spark, os.path.join(work, "warmup_mor"), name="warmup_mor",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", table_type=MERGE_ON_READ)
    wm.cfg = wm.cfg.with_(inline_compaction=False, index_type=_IM)
    wm.upsert(wli)
    wm.upsert(wupd)                      # delta-append path
    wm.read().count()                    # merged-read window path
    wm.run_compaction()

    # Window-health canary (ADDED r6, excluded from the engine total):
    # fixed code-independent CPU work — bit_xor(xxhash64) over 80M rows per
    # core, so the healthy value (~1.2–1.6 s) is constant across the
    # driver's core-count sweep.  This host shows multi-second sys-CPU/
    # steal storms under sustained parallel load (BASELINE.md r6 section);
    # the canary lets any reader separate window degradation from code:
    # canary at ~1.5 s → trust the run; canary at 3 s+ → the window, not
    # the engine, moved.  Pure spark.range compute: no engine code, no
    # files, identical bytes every round.
    #
    # r7 restructure (ordered by the r6 verdict): the canaries BRACKET the
    # run — CPU canary here (start) and again at the very end
    # (host_canary_fixed_work_end), and the file-churn canary runs AFTER the
    # last timed entry, so its own ~19k file create/deletes can no longer
    # perturb the timed sections it is supposed to stamp.
    def _cpu_canary():
        spark.range(0, 80_000_000 * CPUS, 1, CPUS) \
             .selectExpr("bit_xor(xxhash64(id))").collect()
    timed_median("host_canary_fixed_work", _cpu_canary)

    # Second canary, same contract: CONCURRENT small-file create+delete
    # ($CPUS threads x 200 x 64 KB, driver-side, no Spark) — the write
    # lanes' actual failure mode on this host is a kernel-side collapse
    # under parallel file churn (measured 0.27 s healthy -> 5.4-8.6 s in
    # degraded windows while the CPU canary stays clean), so this is the
    # number that explains a slow bulk_insert/upsert entry when the CPU
    # canary does not.  Invoked after the last timed entry (see below).
    def _churn_once():
        import shutil as _sh
        import tempfile as _tf
        import threading as _th

        def churn(d, n=200, sz=64 * 1024):
            for i in range(n):
                with open(os.path.join(d, f"f{i}"), "wb") as fh:
                    fh.write(b"x" * sz)
            for i in range(n):
                os.unlink(os.path.join(d, f"f{i}"))
        dirs = [_tf.mkdtemp(prefix="canary_churn_") for _ in range(CPUS)]
        ths = [_th.Thread(target=churn, args=(d,)) for d in dirs]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        for d in dirs:
            _sh.rmtree(d, ignore_errors=True)

    def make_table(name, table_type="COPY_ON_WRITE"):
        return HudiTable.create(
            spark, os.path.join(work, name), name=name,
            recordkey_fields=["l_orderkey", "l_linenumber"],
            partition_expr="date_format(l_shipdate,'yyyy-MM')",
            precombine_field="l_shipdate", table_type=table_type)

    # ---- COW write path -------------------------------------------------
    from incubator_hudi_spark.config import INDEX_INMEMORY
    t = make_table("cow")
    # steady-state writer shape: keep the key index warm across batches
    # (INMEMORY index — update-only commits retain the persisted index)
    t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY)
    with timed("bulk_insert"):
        c0 = t.bulk_insert(li)

    upd = (li.filter("l_orderkey % 100 = 7")
           .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    upd.persist().count()
    with timed("upsert_10x_1pct"):
        for i in range(10):
            last = t.upsert(upd.withColumn("l_extendedprice",
                                           F.col("l_extendedprice") + i))
    # SIMPLE-index steady state: the 100 TB-realistic path — no driver-cached
    # index; tagging scans the key columns of the stats-pruned slice set
    # lazily inside the write job
    ts = make_table("cow_simple")
    ts.bulk_insert(li)
    ts.upsert(upd)                        # warm the plan shape
    with timed("upsert_simple_index_batch"):
        ts.upsert(upd.withColumn("l_extendedprice",
                                 F.col("l_extendedprice") + 99))

    # partition-local update: write amplification must be bounded by the
    # touched partition, not the table (the 100 TB property — a 1-partition
    # update of a 1000-partition table rewrites ~1/1000th of the files)
    from incubator_hudi_spark.functions.workloads import \
        partition_local_update_batch
    loc = partition_local_update_batch(li)
    loc.persist().count()
    with timed("upsert_partition_local"):
        t.upsert(loc)
    loc.unpersist()

    with timed("delete_batch"):
        t.delete(li.filter("l_orderkey % 100 = 13"))

    timed_median("snapshot_agg", lambda: (
        t.read().groupBy("l_returnflag", "l_linestatus")
         .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")),
              F.count(F.lit(1))).collect()))

    timed_median("incremental_pull", lambda: (
        t.read(QUERY_INCREMENTAL, begin=c0, end=last).count()))

    # ---- MOR ------------------------------------------------------------
    tm = make_table("mor", MERGE_ON_READ)
    tm.cfg = tm.cfg.with_(inline_compaction=False,
                          index_type=INDEX_INMEMORY)
    with timed("mor_ingest_plus_3_deltas"):
        tm.upsert(li)
        for i in range(3):
            tm.upsert(upd.withColumn("l_quantity", F.col("l_quantity") + i))
    timed_median("mor_snapshot_merge_read", lambda: tm.read().count())
    # compaction mutates the table, so repeats need identical inputs: clone
    # the pre-compaction table dir twice and compact clone, clone, original
    # — the recorded median is over three identical compactions
    clones = []
    for ci in range(2):
        cp = os.path.join(work, f"mor_comp_clone{ci}")
        shutil.copytree(os.path.join(work, "mor"), cp)
        clones.append(HudiTable.load(spark, cp))
    comp_targets = iter(clones + [tm])
    timed_median("mor_compaction", lambda: next(comp_targets).run_compaction())
    timed_median("mor_read_after_compaction", lambda: tm.read().count())

    # ---- data-pipeline operators -----------------------------------------
    # the write sections are done with their caches (lineitem, update batch,
    # per-table key indexes); drop them so operator timings measure the
    # operators, not GC pressure from dead cached state
    li.unpersist()
    upd.unpersist()
    spark.catalog.clearCache()
    docs.persist().count()
    emb.persist().count()

    # untimed warmup of the operator plan shapes (codegen/JIT), mirroring the
    # write-path warmup above — timed numbers measure the operators
    wdocs, wemb = docs.limit(2000), emb.limit(2000)
    dedup.minhash_lsh_pairs(wdocs, k=16, bands=8, verify_threshold=0.7).count()
    wq = wemb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    similarity.brute_force_topk(wemb, wq, k=5).count()
    text.analyze(wdocs).select(F.sum("n_tokens"),
                               F.sum(F.pmod(F.col("fingerprint"),
                                            F.lit(1000003)))).collect()
    text.pii_scrub(wdocs).select(F.sum("n_emails"),
                                 F.sum(F.length("text_clean"))).collect()

    with timed("minhash_lsh_pairs"):
        dedup.minhash_lsh_pairs(docs, k=16, bands=8, verify_threshold=0.7).count()
    q = emb.limit(16).select(F.col("vec_id").alias("query_id"), "embedding")
    timed_median("ann_brute_force_top10",
                 lambda: similarity.brute_force_topk(emb, q, k=10).count())
    timed_median("text_analyze", lambda: text.analyze(docs).select(
        F.sum("n_tokens"),
        F.sum(F.pmod(F.col("fingerprint"), F.lit(1000003)))).collect())
    timed_median("pii_scrub", lambda: text.pii_scrub(docs).select(
        F.sum("n_emails"), F.sum(F.length("text_clean"))).collect())
    from incubator_hudi_spark.streaming.sessionize import sessionize
    ev = load_table(spark, SF_DIR, "events")
    timed_median("sessionization",
                 lambda: sessionize(ev, gap_minutes=30).count())

    # ---- closing canary bracket (after the LAST timed entry) -------------
    # host_canary_file_churn keeps its r6 name but now runs here so its file
    # churn cannot trigger the host pathology inside the timed window; the
    # second CPU canary closes the bracket — a run is trustworthy when BOTH
    # fixed-work readings and the churn reading are healthy.
    timed_median("host_canary_file_churn", _churn_once)
    timed_median("host_canary_fixed_work_end", _cpu_canary)

    # the canaries measure the HOST, not the engine — they stay out of the
    # engine total so round-over-round totals keep comparing engine work
    total = round(sum(v for k, v in timings.items()
                      if not k.startswith("host_canary_")), 3)
    shutil.rmtree(work, ignore_errors=True)

    print(json.dumps({
        "metric": "engine_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "repeats": repeats,
        "samples": samples,
        "sf": os.path.basename(SF_DIR.rstrip("/")),
    }))


if __name__ == "__main__":
    main()
