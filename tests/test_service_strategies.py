"""Compaction plan/trigger strategies and sized clustering.

Reference: compact/strategy/ (LogFileSizeBased, BoundedIO, DayBased,
UnBounded), CompactionTriggerStrategy.java:21-29,
SparkRecentDaysClusteringPlanStrategy.java:54-123,
SparkSortAndSizeExecutionStrategy.java:68-87.
"""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, MERGE_ON_READ
from incubator_hudi_spark.services import compaction as C
from incubator_hudi_spark.services.clustering import plan_clustering, run_clustering
from incubator_hudi_spark.fsview import FileSystemView


@pytest.fixture()
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def _mor(spark, path, li, deltas=2):
    t = HudiTable.create(
        spark, str(path), "t",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate, 'yyyy-MM')",
        precombine_field="l_shipdate", table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False)
    t.upsert(li)
    for i in range(deltas):
        t.upsert(li.limit(400).withColumn("l_quantity", F.lit(float(i))))
    return t


def test_day_based_limits_partitions(spark, tmp_path, li):
    t = _mor(spark, tmp_path / "t", li)
    ct = C.schedule_compaction(t, strategy=C.STRATEGY_DAY_BASED, day_partitions=2)
    assert ct is not None
    plan = t.timeline.read_metadata(
        __import__("incubator_hudi_spark.timeline", fromlist=["Instant"])
        .Instant(ct, "compaction", "requested"))
    parts = {op["partition"] for op in plan["operations"]}
    all_parts = {sl.partition for sl in FileSystemView(t.meta).latest_slices()
                 if sl.log_files}
    assert parts == set(sorted(all_parts, reverse=True)[:2])
    C.run_compaction(t, ct)
    assert t.read().filter("l_quantity = 1.0").count() >= 0  # still readable


def test_bounded_io_cuts_plan(spark, tmp_path, li):
    t = _mor(spark, tmp_path / "t", li)
    full = C.schedule_compaction(t, strategy=C.STRATEGY_UNBOUNDED)
    import incubator_hudi_spark.timeline as tl
    n_full = len(t.timeline.read_metadata(
        tl.Instant(full, tl.COMPACTION, tl.REQUESTED))["operations"])
    # tiny budget → strictly smaller plan (but never empty)
    cut = C.schedule_compaction(t, strategy=C.STRATEGY_BOUNDED_IO,
                                io_budget_bytes=1)
    n_cut = len(t.timeline.read_metadata(
        tl.Instant(cut, tl.COMPACTION, tl.REQUESTED))["operations"])
    assert 1 <= n_cut < n_full


def test_time_elapsed_trigger(spark, tmp_path, li):
    t = _mor(spark, tmp_path / "t", li, deltas=1)
    t.cfg = t.cfg.with_(compact_trigger="time_elapsed",
                        compact_max_delta_seconds=0,
                        compact_max_delta_commits=99)
    assert C.maybe_inline_compact(t) is not None
    t2 = _mor(spark, tmp_path / "t2", li, deltas=1)
    t2.cfg = t2.cfg.with_(compact_trigger="num_and_time",
                          compact_max_delta_seconds=0,
                          compact_max_delta_commits=99)
    assert C.maybe_inline_compact(t2) is None  # num part not hit


def test_clustering_sized_groups(spark, tmp_path, li):
    t = HudiTable.create(
        spark, str(tmp_path / "t"), "t",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr=None,  # single partition → many small fgs after inserts
        precombine_field="l_shipdate")
    for i in range(3):
        t.cfg = t.cfg.with_()
        t.bulk_insert(li.limit(2000))
    n0 = t.read().count()
    before = len(FileSystemView(t.meta).latest_slices())
    # force multiple output groups with a tiny target size
    t.cfg = t.cfg.with_(target_file_size_bytes=64 * 1024)
    rc = run_clustering(t, sort_columns=["l_orderkey"])
    assert rc is not None
    after = FileSystemView(t.meta).latest_slices()
    assert t.read().count() == n0
    assert len(after) > 1  # sized: more than one output group
    new_fgs = [sl for sl in after if sl.base_instant == rc]
    assert len(new_fgs) == len(after)  # all groups replaced
    assert before >= 2


def test_clustering_recent_partitions(spark, tmp_path, li):
    t = HudiTable.create(
        spark, str(tmp_path / "t"), "t",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate, 'yyyy-MM')",
        precombine_field="l_shipdate")
    t.bulk_insert(li)
    t.bulk_insert(li.withColumn("l_quantity", F.col("l_quantity") + 1))
    groups_all = plan_clustering(t)
    groups_recent = plan_clustering(t, recent_partitions=1)
    assert len(groups_recent) == 1
    assert set(groups_recent) == {sorted(groups_all, reverse=True)[0]}


def test_partition_aware_strategies_partition_and_complement(spark, tmp_path, li):
    """Bounded keeps the rolling [today-N, inf) window; unbounded-partition-
    aware is exactly the complement, so the two plans never share a slice
    (BoundedPartitionAwareCompactionStrategy /
    UnBoundedPartitionAwareCompactionStrategy)."""
    import incubator_hudi_spark.timeline as tl

    t = _mor(spark, tmp_path / "t", li)
    dirty = {sl.partition for sl in FileSystemView(t.meta).latest_slices()
             if sl.log_files}
    assert len(dirty) > 2
    today, days = "1996-01-01", 180            # cutoff = 1995-07-05

    def planned(strategy):
        ct = C.schedule_compaction(t, strategy=strategy,
                                   day_partitions=days, today=today)
        if ct is None:
            return set()
        plan = t.timeline.read_metadata(
            tl.Instant(ct, "compaction", "requested"))
        C.unschedule_compaction(t, ct)
        return {op["partition"] for op in plan["operations"]}

    bounded = planned(C.STRATEGY_BOUNDED_PARTITION)
    unbounded = planned(C.STRATEGY_UNBOUNDED_PARTITION)
    assert bounded and unbounded
    assert bounded.isdisjoint(unbounded)
    assert bounded | unbounded == dirty
    assert all(p.replace("/", "-") >= "1995-07" for p in bounded)
    assert all(p.replace("/", "-") < "1995-07" for p in unbounded)

    # the bounded plan runs end-to-end and the snapshot stays exact
    ct = C.schedule_compaction(t, strategy=C.STRATEGY_BOUNDED_PARTITION,
                               day_partitions=days, today=today)
    before = t.read().count()
    C.run_compaction(t, ct)
    assert t.read().count() == before


def test_partition_aware_rejects_non_date_partitions(spark, tmp_path, li):
    """Letters sort above digits, so a silent lexicographic compare would
    classify every string partition as in-window — fail loudly instead."""
    t = HudiTable.create(
        spark, str(tmp_path / "t"), "t",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="l_returnflag",           # non-date partitioning
        precombine_field="l_shipdate", table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False)
    t.upsert(li)
    t.upsert(li.limit(300).withColumn("l_quantity", F.lit(9.0)))
    with pytest.raises(ValueError, match="not date-shaped"):
        C.schedule_compaction(t, strategy=C.STRATEGY_BOUNDED_PARTITION,
                              day_partitions=7, today="1996-01-01")


def test_bounded_window_numeric_segment_compare():
    """Non-zero-padded date partitions (accepted by the validation regex)
    must compare numerically: '2024-3' is NOT inside an August window even
    though it sorts above '2024-0' lexicographically."""
    from incubator_hudi_spark.services.compaction import _in_bounded_window
    assert not _in_bounded_window("2024-3", "2024-07-16")
    assert _in_bounded_window("2024-9", "2024-07-16")
    assert _in_bounded_window("2024-07-16", "2024-07-16")
    assert not _in_bounded_window("2024/3/1", "2024-07-16")
    assert _in_bounded_window("2024-08", "2024-07-16")
