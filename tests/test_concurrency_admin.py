"""OCC, commit callbacks, admin DataFrames, DEFAULT-payload ordering guard,
and global-index semantics."""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import (HudiTable, PAYLOAD_DEFAULT, WriteConfig)
from incubator_hudi_spark.concurrency import ConcurrentWriteConflict, OccWriter
from incubator_hudi_spark import admin


def make_orders(spark, path, **kw):
    return HudiTable.create(
        spark, path, name="orders", recordkey_fields=["o_orderkey"],
        partition_expr="date_format(o_orderdate,'yyyy')",
        precombine_field="o_orderdate", **kw)


def test_occ_conflict_detection(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path)
    t.upsert(orders)
    # writer B lands a commit touching the same file groups mid-scope
    writer_b = HudiTable.load(spark, tmp_table_path)
    with OccWriter(t):
        writer_b.upsert(orders.limit(200).withColumn("o_totalprice", F.lit(2.0)))
        with pytest.raises(ConcurrentWriteConflict):
            t.upsert(orders.limit(100).withColumn("o_totalprice", F.lit(3.0)))
    # loser's instant stayed pending and is reclaimed on open
    assert len(t.timeline.pending()) == 1
    HudiTable.load(spark, tmp_table_path)._recover_dangling()
    assert t.timeline.pending() == []
    # winner's data survived, loser's never became visible
    snap = t.read()
    assert snap.filter("o_totalprice = 2.0").count() == 200
    assert snap.filter("o_totalprice = 3.0").count() == 0


def test_occ_disjoint_writes_both_commit(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path)
    t.upsert(orders)
    parts = sorted(t.view().partitions())
    a = orders.filter(F.date_format("o_orderdate", "yyyy") == parts[0]) \
              .withColumn("o_totalprice", F.lit(5.0))
    writer_b = HudiTable.load(spark, tmp_table_path)
    with OccWriter(t):
        writer_b.delete_partitions([parts[-1]])
        t.upsert(a)  # different file groups → no conflict
    snap = t.read()
    assert snap.filter("o_totalprice = 5.0").count() > 0
    assert snap.filter(F.col("_hoodie_partition_path") == parts[-1]).count() == 0


def test_commit_callback(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path)
    seen = []
    t._commit_callbacks = [lambda instant, md: seen.append((instant, md["operation"]))]
    t.upsert(orders.limit(10))
    assert len(seen) == 1 and seen[0][1] == "upsert"


def test_default_payload_ordering_guard(spark, tmp_table_path, orders):
    """DefaultHoodieRecordPayload: a late-arriving update with a LOWER
    precombine value must not overwrite the stored row."""
    t = make_orders(spark, tmp_table_path, payload=PAYLOAD_DEFAULT)
    t.upsert(orders)
    late = (orders.limit(50)
            .withColumn("o_orderdate", F.col("o_orderdate") - F.expr("interval 30 days"))
            .withColumn("o_totalprice", F.lit(-1.0)))
    t.upsert(late)
    snap = t.read()
    # same-partition late rows lost; month shift may cross year → new record
    stale = snap.filter("o_totalprice = -1.0")
    late_keys = [r[0] for r in late.select("o_orderkey").collect()]
    crossed = (late.select("o_orderkey",
                           F.date_format("o_orderdate", "yyyy").alias("y"))
               .join(orders.select("o_orderkey",
                                   F.date_format("o_orderdate", "yyyy").alias("y0")),
                     on="o_orderkey")
               .filter("y != y0").count())
    assert stale.count() == crossed
    # and a NEWER precombine still wins
    fresh = (orders.limit(50)
             .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("interval 1 hour"))
             .withColumn("o_totalprice", F.lit(77.0)))
    t.upsert(fresh)
    assert t.read().filter("o_totalprice = 77.0").count() >= 50 - crossed


def test_global_index_update_routes_to_existing_partition(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path,
                    write_config=WriteConfig(index_type="GLOBAL_SIMPLE"))
    t.upsert(orders)
    n = t.read().count()
    # update with a shifted orderdate (different year partition): global index
    # must route it to the record's existing partition, not create a twin
    upd = (orders.limit(100)
           .withColumn("o_orderdate", F.col("o_orderdate") + F.expr("interval 400 days"))
           .withColumn("o_totalprice", F.lit(9.0)))
    t.upsert(upd)
    snap = t.read()
    assert snap.count() == n  # no duplicates across partitions
    moved = snap.filter("o_totalprice = 9.0")
    assert moved.count() == 100
    # partition path unchanged (update_partition_path=false semantics)
    orig = orders.limit(100).select(
        "o_orderkey", F.date_format("o_orderdate", "yyyy").alias("y"))
    got = moved.select("o_orderkey", F.col("_hoodie_partition_path").alias("y2"))
    assert got.join(orig, on="o_orderkey").filter("y != y2").count() == 0


def test_admin_dataframes(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path)
    t.upsert(orders)
    t.upsert(orders.limit(100).withColumn("o_totalprice", F.lit(1.0)))
    t.savepoint()
    assert admin.commits_df(t).count() == 2
    assert admin.timeline_df(t).filter("state = 'completed'").count() >= 3
    files = admin.files_df(t)
    assert files.filter("kind = 'base'").count() > 0
    assert admin.partitions_df(t).count() == len(t.view().partitions())
    assert admin.savepoints_df(t).count() == 1
    assert admin.pending_compactions_df(t).count() == 0
    assert admin.upgrade_table(t, 2) == 2
    assert t.tc.version == 2


@pytest.mark.slow
def test_global_bloom_index_matches_global_simple(spark, tmp_path, orders):
    """GLOBAL_BLOOM = global routing + key-range file pruning
    (SparkHoodieGlobalBloomIndex.java:143) — same results as GLOBAL_SIMPLE."""
    outs = []
    for idx in ("GLOBAL_SIMPLE", "GLOBAL_BLOOM"):
        t = HudiTable.create(
            spark, str(tmp_path / idx), idx,
            recordkey_fields=["o_orderkey"],
            partition_expr="date_format(o_orderdate,'yyyy')",
            precombine_field="o_orderdate",
            write_config=WriteConfig(index_type=idx))
        t.upsert(orders)
        upd = (orders.limit(200)
               .withColumn("o_orderdate",
                           F.col("o_orderdate") + F.expr("interval 400 days"))
               .withColumn("o_totalprice", F.lit(3.5)))
        t.upsert(upd)
        outs.append(t.read().select("o_orderkey", "_hoodie_partition_path",
                                    "o_totalprice"))
    assert outs[0].exceptAll(outs[1]).count() == 0
    assert outs[1].exceptAll(outs[0]).count() == 0


def test_prepped_variants(spark, tmp_path, orders):
    t = HudiTable.create(
        spark, str(tmp_path / "prepped"), "prepped",
        recordkey_fields=["o_orderkey"],
        partition_expr="date_format(o_orderdate,'yyyy')",
        precombine_field="o_orderdate")
    t.insert_prepped(orders)
    n = t.read().count()
    assert n == orders.count()
    t.upsert_prepped(orders.limit(100).withColumn("o_totalprice", F.lit(-3.0)))
    assert t.read().count() == n
    assert t.read().filter("o_totalprice = -3.0").count() == 100
    t.delete_prepped(orders.limit(40))
    assert t.read().count() == n - 40


@pytest.mark.slow
def test_compaction_admin_validate_and_unschedule(spark, tmp_table_path, lineitem):
    from incubator_hudi_spark import HudiTable, MERGE_ON_READ
    from pyspark.sql import functions as F
    t = HudiTable.create(spark, tmp_table_path, name="li",
                         recordkey_fields=["l_orderkey", "l_linenumber"],
                         partition_expr="date_format(l_shipdate,'yyyy-MM')",
                         precombine_field="l_shipdate",
                         table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False)
    li = lineitem
    t.upsert(li)
    t.upsert(li.filter("l_linenumber = 1")
               .withColumn("l_quantity", F.col("l_quantity") + 1.0))
    c = t.schedule_compaction()
    assert c is not None
    rep = t.validate_compaction_plan(c)
    assert rep and all(r["ok"] for r in rep)
    n = t.read().count()
    # a delta landing AFTER the pending plan tags its logs with the plan's
    # instant; unscheduling must leave those logs readable
    t.upsert(li.filter("l_linenumber = 2")
               .withColumn("l_quantity", F.col("l_quantity") + 2.0))
    assert t.unschedule_compaction(c) is True
    assert t.unschedule_compaction(c) is False          # already gone
    assert not [i for i in t.timeline.pending()]
    assert t.read().count() == n
    assert t.read().filter("l_linenumber = 2 and l_quantity > 2").count() > 0
    # compaction can be rescheduled and run after the unschedule
    assert t.run_compaction() is not None
    assert t.read().count() == n


def test_occ_threaded_disjoint_writers(spark, tmp_table_path, orders):
    """Two ACTUAL concurrent writer threads (shared SparkSession, separate
    HudiTable handles + OccWriter scopes + the filesystem lock provider)
    upserting disjoint partitions: both must commit, and the snapshot is
    the union of both updates."""
    import threading

    t0 = make_orders(spark, tmp_table_path)
    t0.upsert(orders)
    n_before = t0.read().count()
    parts = sorted(t0.view().partitions())
    assert len(parts) >= 2
    halves = [parts[:len(parts) // 2], parts[len(parts) // 2:]]
    errs = []

    def work(i):
        try:
            t = HudiTable.load(spark, tmp_table_path)
            batch = (orders.filter(
                F.date_format("o_orderdate", "yyyy").isin(halves[i]))
                .withColumn("o_totalprice", F.lit(100.0 + i)))
            with OccWriter(t):
                t.upsert(batch)
        except Exception as ex:        # pragma: no cover
            errs.append(ex)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errs, errs
    snap = HudiTable.load(spark, tmp_table_path).read()
    # both writers only UPDATE existing rows → row count is unchanged
    assert snap.count() == n_before
    assert snap.filter("o_totalprice = 100.0").count() > 0
    assert snap.filter("o_totalprice = 101.0").count() > 0
    assert snap.filter("o_totalprice NOT IN (100.0, 101.0)").count() == 0
