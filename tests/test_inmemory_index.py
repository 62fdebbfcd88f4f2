"""INMEMORY index cache lifecycle: seeding from an empty-table write,
retention across update-only commits, invalidation on out-of-band commits.

Reference: SparkInMemoryHashIndex.java (key→location map held in memory) and
HoodieIndex.updateLocation (write results feed the index).  Our INMEMORY
index is a persisted (key, partition, fg) DataFrame pinned on the session;
an empty-table write seeds it directly from the write frame (no re-scan).
"""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, MERGE_ON_READ
from incubator_hudi_spark.config import INDEX_INMEMORY


def _make(spark, path, table_type="COPY_ON_WRITE"):
    t = HudiTable.create(
        spark, path, name="t",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", table_type=table_type)
    t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY)
    if table_type == MERGE_ON_READ:
        t.cfg = t.cfg.with_(inline_compaction=False)
    return t


def test_seeded_index_matches_scan_and_routes_updates(
        spark, tmp_table_path, lineitem):
    t = _make(spark, tmp_table_path)
    c1 = t.upsert(lineitem)                      # empty table → seeds index
    assert t._key_index is not None
    assert t._key_index_valid_at == c1
    # seeded index must agree with a fresh file scan
    from incubator_hudi_spark.indexing import load_key_index
    scanned = load_key_index(spark, t.meta, t.view(), tc=t.tc)
    seeded = t._key_index
    assert (seeded.select(seeded.columns).exceptAll(scanned).count() == 0
            and scanned.exceptAll(seeded.select(scanned.columns)).count() == 0)

    # an upsert routed through the seeded index must update in place
    upd = (lineitem.filter("l_orderkey % 7 = 1")
           .withColumn("l_quantity", F.lit(123.0)))
    n_before = t.read().count()
    t.upsert(upd)
    snap = t.read()
    assert snap.count() == n_before               # no duplicate inserts
    # record identity is (key, month partition) — the testdata contains
    # twin keys in distinct months by design
    exp = (lineitem.filter("l_orderkey % 7 = 1")
           .selectExpr("l_orderkey", "l_linenumber",
                       "date_format(l_shipdate,'yyyy-MM') AS m")
           .distinct().count())
    assert (snap.filter("l_quantity = 123.0")
            .selectExpr("l_orderkey", "l_linenumber",
                        "date_format(l_shipdate,'yyyy-MM') AS m")
            .distinct().count() == exp)
    # every updated record carries the new value exactly once
    got = (snap.filter("l_quantity = 123.0")
           .groupBy("l_orderkey", "l_linenumber", "_hoodie_partition_path")
           .count().filter("count > 1").count())
    assert got == 0


def test_seed_survives_commit_and_skips_rescan(spark, tmp_table_path, lineitem):
    t = _make(spark, tmp_table_path)
    t.upsert(lineitem)
    seeded = t._key_index
    upd = lineitem.limit(500).withColumn("l_quantity", F.lit(9.0))
    t.upsert(upd)                                # update-only → cache retained
    assert t._key_index is not None
    assert t._key_index is seeded                # same persisted frame reused


def test_mor_first_commit_seeds_index(spark, tmp_table_path, lineitem):
    t = _make(spark, tmp_table_path, MERGE_ON_READ)
    c1 = t.upsert(lineitem)
    assert t._key_index is not None and t._key_index_valid_at == c1
    upd = lineitem.filter("l_orderkey % 11 = 2") \
                  .withColumn("l_quantity", F.lit(55.0))
    t.upsert(upd)
    snap = t.read()
    assert snap.count() == t.read().count()
    exp = (lineitem.filter("l_orderkey % 11 = 2")
           .selectExpr("l_orderkey", "l_linenumber",
                       "date_format(l_shipdate,'yyyy-MM') AS m")
           .distinct().count())
    assert (snap.filter("l_quantity = 55.0")
            .selectExpr("l_orderkey", "l_linenumber",
                        "date_format(l_shipdate,'yyyy-MM') AS m")
            .distinct().count() == exp)


def test_out_of_band_commit_invalidates_seed(spark, tmp_table_path, lineitem):
    t = _make(spark, tmp_table_path)
    t.upsert(lineitem)
    assert t._key_index is not None
    # a second writer handle commits out-of-band
    t2 = HudiTable.load(spark, tmp_table_path)
    t2.cfg = t2.cfg.with_(index_type=INDEX_INMEMORY)
    extra = (lineitem.limit(100)
             .withColumn("l_orderkey", F.col("l_orderkey") + 90_000_000))
    t2.insert(extra)
    # first handle's next upsert must detect staleness and still be correct
    upd = extra.withColumn("l_quantity", F.lit(77.0))
    t.upsert(upd)
    snap = t.read()
    assert snap.filter("l_orderkey >= 90000000").count() == \
        extra.select("l_orderkey", "l_linenumber", "l_shipdate").distinct().count()
    assert snap.filter("l_orderkey >= 90000000")\
               .filter("l_quantity != 77.0").count() == 0
