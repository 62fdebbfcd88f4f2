"""Decompose minhash_lsh_pairs at sf0.1: signature aggregation vs banding
self-join vs pair dedup.  Noop-sink timings (guide §1.4), labelled jobs."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("profile-minhash")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from incubator_hudi_spark.functions.io import load_table
    from incubator_hudi_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents")
    docs.persist().count()
    print("n_docs", docs.count())

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def t(name, fn, n=3):
        xs = []
        for _ in range(n):
            t0 = time.time()
            fn()
            xs.append(time.time() - t0)
        xs = [round(x, 3) for x in xs]
        print(f"{name:32s} median={sorted(xs)[n//2]:7.3f} {xs}")

    # warm
    dedup.minhash_lsh_pairs(docs.limit(2000), k=16, bands=8,
                            verify_threshold=0.7).count()

    k, bands = 16, 8
    sigs = dedup.minhash_signatures_df(docs, "text", "doc_id", k, 3)
    t("signatures_only", lambda: noop(sigs))

    full = dedup.minhash_lsh_pairs(docs, k=16, bands=8, verify_threshold=0.7)
    t("full_pairs_count", lambda: full.count())
    t("full_pairs_noop", lambda: noop(full))

    # banded frame stats: bucket-size distribution
    r = k // bands
    def band_hash(b):
        return F.xxhash64(*[F.col(f"mh{b*r+j}") for j in range(r)])
    banded = sigs.select(
        "_id",
        F.explode(F.array(*[F.struct(F.lit(b).alias("band"),
                                     band_hash(b).alias("bh"))
                            for b in range(bands)])).alias("bk")
    ).select("_id", "bk.band", "bk.bh")
    bs = (banded.groupBy("band", "bh").count()
          .groupBy().agg(F.count("*").alias("n_buckets"),
                         F.sum(F.when(F.col("count") == 1, 1)).alias("singletons"),
                         F.max("count").alias("max_bucket"),
                         F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("cand_pairs"))
          .collect()[0])
    print("bucket stats:", bs.asDict())


if __name__ == "__main__":
    main()
