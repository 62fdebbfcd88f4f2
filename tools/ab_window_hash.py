"""Interleaved A/B: ExactSubstr window-pass hash kernels (round 6).

The window pass is the per-byte-heaviest step of dedup_exact_substrings:
per word it builds the 20-word window STRING (array_join of a slice) and
md5s it (~120 bytes concatenated + a cryptographic hash, per word).  The
candidate kernel hashes each word ONCE (xxhash64), then per window hashes
the 20-long slice of word-hashes twice with different salts (128 effective
bits, no string building, and a 20-byte hash pair instead of a 32-char md5
string in the shuffle).

Both kernels are built in ONE SparkSession over the same cached corpus and
run alternately ABBA per round (window drift on this box makes sequential
runs incomparable).  The timed action is the full window pass + owner
groupBy — the part the kernel changes.

Run: python tools/ab_window_hash.py [sf_dir] [n_rounds]
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
             .appName("ab-window-hash")
             .config("spark.sql.shuffle.partitions", str(max(8, int(cpus))))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "16g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs = docs.select("doc_id", "text").unionByName(
        docs.select(F.col("doc_id") + 10_000_000, "text")
            .toDF("doc_id", "text")).persist()
    docs.count()

    words = F.split(F.col("text"), r"\s+")
    n_words = F.size(words)
    starts = F.when(
        n_words >= MIN_WORDS,
        F.sequence(F.lit(0), n_words - MIN_WORDS)).otherwise(
        F.array().cast("array<int>"))

    def md5_pass():
        grams = F.transform(
            starts, lambda i: F.struct(
                i.alias("pos"),
                F.md5(F.array_join(
                    F.slice(words, i + 1, MIN_WORDS), " ")).alias("h")))
        seg = (docs.select("doc_id", F.explode(grams).alias("g"))
               .select("doc_id", "g.pos", F.col("g.h").alias("h")))
        return (seg.groupBy("h").agg(F.min("doc_id").alias("o"))
                .agg(F.count(F.lit(1)), F.sum("o")).collect())

    def xxh_pass():
        wh = F.transform(words, lambda w: F.xxhash64(w))
        grams = F.transform(
            starts, lambda i: F.struct(
                i.alias("pos"),
                F.xxhash64(F.slice(wh, i + 1, MIN_WORDS)).alias("h1"),
                F.xxhash64(F.lit(0x9E3779B9),
                           F.slice(wh, i + 1, MIN_WORDS)).alias("h2")))
        seg = (docs.select("doc_id", F.explode(grams).alias("g"))
               .select("doc_id", "g.pos", "g.h1", "g.h2"))
        return (seg.groupBy("h1", "h2").agg(F.min("doc_id").alias("o"))
                .agg(F.count(F.lit(1)), F.sum("o")).collect())

    def xxh_materialized_pass():
        # force the per-word hash array to be computed ONCE per doc by
        # materializing it through the explode boundary (Catalyst's
        # CollapseProject otherwise inlines the transform into every
        # window's slice — 20x recompute per word)
        wh_docs = (docs
                   .select("doc_id",
                           F.transform(words,
                                       lambda w: F.xxhash64(w)).alias("wh"))
                   .select("doc_id", F.col("wh"),
                           F.explode(F.when(
                               F.size("wh") >= MIN_WORDS,
                               F.sequence(F.lit(0),
                                          F.size("wh") - MIN_WORDS))
                               .otherwise(F.array().cast("array<int>")))
                           .alias("pos")))
        seg = wh_docs.select(
            "doc_id", "pos",
            F.xxhash64(F.slice("wh", F.col("pos") + 1,
                               F.lit(MIN_WORDS))).alias("h1"),
            F.xxhash64(F.lit(0x9E3779B9),
                       F.slice("wh", F.col("pos") + 1,
                               F.lit(MIN_WORDS))).alias("h2"))
        return (seg.groupBy("h1", "h2").agg(F.min("doc_id").alias("o"))
                .agg(F.count(F.lit(1)), F.sum("o")).collect())

    kernels = {"md5_string": md5_pass, "xxh64_pair": xxh_pass,
               "xxh64_mat": xxh_materialized_pass}
    for fn in kernels.values():          # untimed warmup
        fn()
    times = {k: [] for k in kernels}
    for r in range(N):
        order = list(kernels) if r % 2 == 0 else list(reversed(kernels))
        for k in order:
            t0 = time.time()
            kernels[k]()
            times[k].append(time.time() - t0)
        print(f"round {r}: " + "  ".join(
            f"{k}={times[k][-1]:.2f}s" for k in order), file=sys.stderr)
    print("\n== trimmed means (drop best+worst) ==")
    for k, xs in times.items():
        xs = sorted(xs)[1:-1] if len(xs) > 2 else xs
        print(f"  {k}: {sum(xs)/len(xs):.3f}s")


if __name__ == "__main__":
    main()
