"""Interleaved A/B: r6 unbounded band self-join vs r7 bounded (singleton
prefilter + hot-bucket salting) in minhash_lsh_pairs, sf0.1, count() like
the bench entry."""
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
             .appName("ab-minhash-bound")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.autoBroadcastJoinThreshold", "64m")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from incubator_hudi_spark import operators
    from incubator_hudi_spark.functions.io import load_table
    from incubator_hudi_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents")
    docs.persist().count()

    k, bands = 16, 8

    def old_pairs():
        """The r6 shape: unbounded self-join on (band, bh)."""
        r = k // bands
        sigs = dedup.minhash_signatures_df(docs, "text", "doc_id", k, 3)

        def band_hash(b):
            return F.xxhash64(*[F.col(f"mh{b * r + j}") for j in range(r)])
        sig_arr = F.array(*[F.col(f"mh{i}") for i in range(k)])
        banded = sigs.select(
            "_id", sig_arr.alias("_sig"),
            F.explode(F.array(*[
                F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh"))
                for b in range(bands)])).alias("bk")
        ).select("_id", "_sig", "bk.band", "bk.bh")
        sim = (F.aggregate(
            F.zip_with(F.col("a._sig"), F.col("b._sig"),
                       lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0), lambda acc, v: acc + v) / F.lit(float(k)))
        return (banded.alias("a")
                .join(banded.alias("b"), on=["band", "bh"])
                .filter(F.col("a._id") < F.col("b._id"))
                .select(F.col("a._id").alias("id_a"),
                        F.col("b._id").alias("id_b"),
                        sim.alias("sig_similarity"))
                .dropDuplicates(["id_a", "id_b"])
                .filter(F.col("sig_similarity") >= 0.7))

    def new_pairs():
        return dedup.minhash_lsh_pairs(docs, k=16, bands=8,
                                       verify_threshold=0.7)

    # result equality first (collect both — the pair list is small)
    ra = sorted(map(tuple, old_pairs().collect()))
    rb = sorted(map(tuple, new_pairs().collect()))
    print(f"counts old={len(ra)} new={len(rb)} equal={ra == rb}")
    assert ra == rb

    # warm both shapes
    old_pairs().count()
    new_pairs().count()
    rounds = 5
    ta, tb = [], []
    for i in range(rounds):
        for name, fn, acc in (("old", old_pairs, ta), ("new", new_pairs, tb)):
            t0 = time.time()
            fn().count()
            acc.append(time.time() - t0)
    med = lambda xs: sorted(xs)[len(xs) // 2]
    print("old:", [round(x, 3) for x in ta], "median", round(med(ta), 3))
    print("new:", [round(x, 3) for x in tb], "median", round(med(tb), 3))


if __name__ == "__main__":
    main()
