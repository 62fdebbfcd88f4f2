"""Interleaved A/B: ExactSubstr window-pass shapes (round 7).

The corpus-wide window pass of dedup_exact_substrings is
    seg(doc_id,pos,h1,h2)  ->  groupBy(h).min(doc)  ->  seg JOIN owners
                          ->  covered(doc_id,pos)
and the join is the expensive part at scale: its probe side is seg again
(~1 row per WORD).  A window hash that occurs ONCE corpus-wide can never
produce a covered row (its only seg row has doc_id == owner), so on a
mostly-clean corpus almost the entire owners side is dead weight in the
join.  Variants:

  A join_min       r6 shape: agg min(doc) only, join seg against ALL hashes
  B join_duponly   agg min(doc)+count, filter count>=2 before the join —
                   provably identical covered set, build side shrinks to
                   the duplicated hashes only
  C onepass_list   no join at all: agg min(doc)+collect_list(doc,pos),
                   explode dup groups — one exchange, no SMJ sorts, but
                   pays object aggregation on every group

Corpora: "lowdup" = documents.parquet as-is (natural duplication only —
the 100 TB-representative shape); "worstdup" = corpus unioned with itself
under shifted ids (EVERY window duplicated — the count>=2 filter keeps
everything, so B/C degenerate to A's volume).

The timed action counts the covered set (count of (doc,pos) after the
id>owner filter + distinct) — every variant must return the SAME number,
asserted each round.

Run: python tools/ab_exactsubstr_prefilter.py [sf_dir] [n_rounds]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 6
MIN_WORDS = 20


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ab-exactsubstr-prefilter")
             .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    base = (spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
            .select("doc_id", "text"))
    corpora = {
        "lowdup": base.persist(),
        "worstdup": base.unionByName(
            base.select(F.col("doc_id") + 10_000_000, "text")
                .toDF("doc_id", "text")).persist(),
    }
    for d in corpora.values():
        d.count()

    def seg_of(docs):
        words = F.split(F.col("text"), r"\s+")
        wh_docs = (docs
                   .select("doc_id",
                           F.transform(words,
                                       lambda w: F.xxhash64(w)).alias("wh"))
                   .select("doc_id", "wh",
                           F.explode(F.when(
                               F.size("wh") >= MIN_WORDS,
                               F.sequence(F.lit(0),
                                          F.size("wh") - MIN_WORDS))
                               .otherwise(F.array().cast("array<int>")))
                           .alias("pos")))
        return wh_docs.select(
            "doc_id", "pos",
            F.xxhash64(F.slice("wh", F.col("pos") + 1,
                               F.lit(MIN_WORDS))).alias("h1"),
            F.xxhash64(F.lit(0x9E3779B9),
                       F.slice("wh", F.col("pos") + 1,
                               F.lit(MIN_WORDS))).alias("h2"))

    def covered_count(cov):
        return cov.select("doc_id", "pos").distinct().count()

    def join_min(docs):
        seg = seg_of(docs)
        owners = seg.groupBy("h1", "h2").agg(F.min("doc_id").alias("_o"))
        return covered_count(
            seg.join(owners, ["h1", "h2"])
               .filter(F.col("doc_id") > F.col("_o")))

    def join_duponly(docs):
        seg = seg_of(docs)
        owners = (seg.groupBy("h1", "h2")
                  .agg(F.min("doc_id").alias("_o"),
                       F.count(F.lit(1)).alias("_n"))
                  .filter(F.col("_n") >= 2).drop("_n"))
        return covered_count(
            seg.join(owners, ["h1", "h2"])
               .filter(F.col("doc_id") > F.col("_o")))

    def onepass_list(docs):
        seg = seg_of(docs)
        groups = (seg.groupBy("h1", "h2")
                  .agg(F.min("doc_id").alias("_o"),
                       F.collect_list(F.struct("doc_id", "pos"))
                        .alias("_occ")))
        return covered_count(
            groups.filter(F.size("_occ") >= 2)
                  .select("_o", F.explode("_occ").alias("occ"))
                  .filter(F.col("occ.doc_id") > F.col("_o"))
                  .select(F.col("occ.doc_id").alias("doc_id"),
                          F.col("occ.pos").alias("pos")))

    kernels = {"join_min": join_min, "join_duponly": join_duponly,
               "onepass_list": onepass_list}
    for cname, docs in corpora.items():
        expect = {k: fn(docs) for k, fn in kernels.items()}  # warmup + check
        assert len(set(expect.values())) == 1, (cname, expect)
        print(f"{cname}: covered={next(iter(expect.values()))}",
              file=sys.stderr)
    times = {(c, k): [] for c in corpora for k in kernels}
    for r in range(N):
        order = list(kernels) if r % 2 == 0 else list(reversed(kernels))
        for cname, docs in corpora.items():
            for k in order:
                t0 = time.time()
                kernels[k](docs)
                times[(cname, k)].append(time.time() - t0)
        print(f"round {r}: " + "  ".join(
            f"{c}/{k}={times[(c, k)][-1]:.2f}s"
            for c in corpora for k in order), file=sys.stderr)
    print("\n== trimmed means (drop best+worst) ==")
    for (c, k), xs in times.items():
        xs = sorted(xs)[1:-1] if len(xs) > 2 else xs
        print(f"  {c:9s} {k:13s}: {sum(xs)/len(xs):.3f}s")


if __name__ == "__main__":
    main()
