"""Scheduled (async-style) clustering: plan parked on the timeline, frozen
file groups reject updates, execution swaps groups atomically.

Reference: BaseClusteringPlanActionExecutor (plan as replacecommit.requested),
SparkRejectUpdateStrategy.java:41-62 (update rejection), rollback-on-start
exclusion of pending clustering.
"""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import timeline as tl
from incubator_hudi_spark.config import MERGE_ON_READ
from incubator_hudi_spark.services.clustering import (
    ClusteringUpdateConflict, pending_clustering_fgs)
from incubator_hudi_spark.table import HudiTable


def _make(spark, path, lineitem, table_type="COPY_ON_WRITE"):
    t = HudiTable.create(
        spark, path, name="clust",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", table_type=table_type)
    # several small slices per partition so a plan exists
    t.upsert(lineitem.filter("l_orderkey % 3 = 0"))
    t.upsert(lineitem.filter("l_orderkey % 3 = 1"))
    t.upsert(lineitem.filter("l_orderkey % 3 = 2"))
    return t


def test_schedule_freezes_then_execute_unfreezes(spark, tmp_table_path,
                                                 lineitem):
    t = _make(spark, tmp_table_path, lineitem)
    before = t.read().count()
    st = t.schedule_clustering()
    assert st is not None
    frozen = pending_clustering_fgs(t)
    assert frozen and all(v == st for v in frozen.values())

    # an update touching a frozen group is rejected, and the aborted
    # instant leaves no pending debris
    upd = lineitem.limit(200).withColumn("l_quantity", F.lit(77.0))
    with pytest.raises(ClusteringUpdateConflict):
        t.upsert(upd)
    assert not any(p.action in (tl.COMMIT, tl.DELTA_COMMIT)
                   for p in t.timeline.pending())
    assert t.read().count() == before

    # executing the plan swaps the groups; snapshot content is unchanged
    et = t.cluster()
    assert et == st
    assert not pending_clustering_fgs(t)
    assert t.read().count() == before
    live = {sl.file_group for sl in t.view().latest_slices()}
    assert not (set(frozen) & live)

    # updates flow again after execution
    t.upsert(upd)
    assert t.read().filter("l_quantity = 77.0").count() > 0


def test_inserts_avoid_frozen_groups(spark, tmp_table_path, lineitem):
    t = _make(spark, tmp_table_path, lineitem)
    st = t.schedule_clustering()
    frozen = set(pending_clustering_fgs(t))
    assert st is not None and frozen
    # brand-new keys: pure inserts — must succeed and must not pack into
    # frozen groups
    new = (lineitem.limit(500)
           .withColumn("l_orderkey", F.col("l_orderkey") + 90_000_000))
    ct = t.upsert(new)
    md = t.timeline.read_metadata(tl.Instant(ct, tl.COMMIT))
    written = {s["file_group"] for s in md["write_stats"]}
    assert not (written & frozen)
    assert t.cluster() == st


def test_plan_survives_reopen_and_inflight_recovers(spark, tmp_table_path,
                                                    lineitem):
    t = _make(spark, tmp_table_path, lineitem)
    st = t.schedule_clustering()
    # reopen → rollback-on-start must keep the requested plan
    t2 = HudiTable.load(spark, tmp_table_path)
    t2.upsert(lineitem.limit(100)
              .withColumn("l_orderkey", F.col("l_orderkey") + 80_000_000))
    assert st in set(pending_clustering_fgs(t2).values())
    # simulate a crashed execution: plan inflight, partial data dir
    req = tl.Instant(st, tl.REPLACE_COMMIT, tl.REQUESTED)
    md = t2.timeline.read_metadata(req)
    t2.timeline.transition_to_inflight(req, md)
    t3 = HudiTable.load(spark, tmp_table_path)
    t3.upsert(lineitem.limit(100)
              .withColumn("l_orderkey", F.col("l_orderkey") + 70_000_000))
    pend = [p for p in t3.timeline.pending() if p.time == st]
    assert pend and pend[0].state == tl.REQUESTED
    before = t3.read().count()
    assert t3.cluster() == st
    assert t3.read().count() == before


def test_mor_delta_rejected_and_compaction_skips_frozen(spark, tmp_table_path,
                                                        lineitem):
    t = _make(spark, tmp_table_path, lineitem, table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False)
    st = t.schedule_clustering()
    assert st is not None
    frozen = set(pending_clustering_fgs(t))
    with pytest.raises(ClusteringUpdateConflict):
        t.upsert(lineitem.limit(200).withColumn("l_quantity", F.lit(5.0)))
    # compaction scheduling must not pick frozen groups
    ct = t.schedule_compaction(max_logs_per_slice=1)
    if ct is not None:
        plan = t.timeline.read_metadata(
            tl.Instant(ct, tl.COMPACTION, tl.REQUESTED))
        assert not ({op["file_group"] for op in plan["operations"]} & frozen)
    before = t.read().count()
    assert t.cluster() == st
    assert t.read().count() == before


def test_crashed_execution_rerun_no_duplicates(spark, tmp_table_path,
                                               lineitem):
    """A clustering execution that crashed mid-write leaves the plan
    INFLIGHT with partial files in the instant's data dir; re-running the
    plan must neither raise (the requested file is gone) nor commit the
    crashed attempt's leftovers (row duplication)."""
    import os
    import shutil

    from incubator_hudi_spark.services.clustering import (
        run_clustering, schedule_clustering)

    t = _make(spark, tmp_table_path, lineitem.limit(1500))
    before = t.read().count()
    ct = schedule_clustering(t, sort_columns=["l_orderkey"])
    assert ct is not None
    # simulate the crash: plan moved to inflight, some files already written
    req = tl.Instant(ct, tl.REPLACE_COMMIT, tl.REQUESTED)
    md = t.timeline.read_metadata(req)
    t.timeline.transition_to_inflight(req, md)
    ddir = os.path.join(t.meta.instant_data_dir(ct), "_fg=crashed-partial")
    os.makedirs(ddir, exist_ok=True)
    src = next(t.meta.abs_path(f.path)
               for sl in t.view().latest_slices() for f in sl.base_files)
    shutil.copy(src, os.path.join(ddir, "part-crashed-0.parquet"))

    assert run_clustering(t, instant_time=ct) == ct
    assert t.read().count() == before          # no duplicated rows
    fgs = {sl.file_group for sl in t.view().latest_slices()}
    assert "crashed-partial" not in fgs        # leftover never manifested


def test_completed_with_inflight_residue_is_not_reexecuted(
        spark, tmp_table_path, lineitem):
    """transition_to_completed writes the completed file before removing the
    inflight one; a crash in between leaves both.  Retrying run_clustering
    on that instant must NOT delete the committed files or overwrite the
    manifest — it returns immediately."""
    from incubator_hudi_spark.services.clustering import (run_clustering,
                                                          schedule_clustering)

    t = _make(spark, tmp_table_path, lineitem.limit(1500))
    before = t.read().count()
    ct = schedule_clustering(t, sort_columns=["l_orderkey"])
    assert run_clustering(t, instant_time=ct) == ct
    after_md = t.timeline.read_metadata(
        tl.Instant(ct, tl.REPLACE_COMMIT, tl.COMPLETED))
    assert after_md.get("write_stats")          # real manifest
    # simulate the crash residue: re-materialize the inflight file
    t.timeline._write_json(
        t.timeline._path(tl.Instant(ct, tl.REPLACE_COMMIT, tl.INFLIGHT)),
        {"clustering": True, "operations": after_md.get("operations", [])})
    assert run_clustering(t, instant_time=ct) == ct   # no re-execution
    md2 = t.timeline.read_metadata(
        tl.Instant(ct, tl.REPLACE_COMMIT, tl.COMPLETED))
    assert md2.get("write_stats") == after_md.get("write_stats")
    assert t.read().count() == before           # committed files intact


@pytest.mark.slow
def test_async_clustering_interleaved_with_ingest(spark, tmp_table_path,
                                                  lineitem):
    """Daemon twin of async compaction (AsyncClusteringService.java /
    SparkAsyncClusteringService.java): scheduled plans drain on a worker
    thread while ingest keeps committing.  The frozen-group contract makes
    the interleaving safe — new-key inserts land in fresh groups, updates
    touching frozen groups are rejected until the plan executes."""
    from incubator_hudi_spark.services.async_clustering import (
        AsyncClusteringService, pending_clustering_instants)

    t = _make(spark, tmp_table_path, lineitem)
    before = t.read().count()
    svc = AsyncClusteringService(t)
    st = svc.schedule_and_enqueue(sort_columns=["l_orderkey"])
    assert st is not None
    # ingest continues while the worker clusters: brand-new keys only
    n_new = 0
    for i in range(3):
        new = (lineitem.filter(f"l_orderkey % 17 = {i}")
               .withColumn("l_orderkey",
                           F.col("l_orderkey") + 10_000_000 * (i + 1)))
        t.upsert(new)
        n_new += (new.withColumn("_m", F.date_format("l_shipdate", "yyyy-MM"))
                  .dropDuplicates(["l_orderkey", "l_linenumber", "_m"])
                  .count())
    done = svc.stop()
    assert done == [st]
    assert not pending_clustering_instants(t)
    assert t.read().count() == before + n_new
    # the plan's groups were swapped atomically (replacecommit completed)
    assert any(i.time == st
               for i in t.timeline.completed([tl.REPLACE_COMMIT]))
    # updates flow again after the async execution
    t.upsert(lineitem.limit(100).withColumn("l_quantity", F.lit(33.0)))
    assert t.read().filter("l_quantity = 33.0").count() > 0


@pytest.mark.slow
def test_async_clustering_with_async_compaction_mor(spark, tmp_table_path,
                                                    lineitem):
    """Both daemons live on one MOR table: compaction folds logs while
    clustering rewrites small groups — the timeline + frozen-group/pinned-
    group contracts keep them disjoint (clustering plans exclude groups with
    pending compaction and vice versa)."""
    from incubator_hudi_spark.services.async_clustering import (
        AsyncClusteringService)
    from incubator_hudi_spark.services.async_compaction import (
        AsyncCompactionService)

    t = _make(spark, tmp_table_path, lineitem, table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False)
    t.upsert(lineitem.filter("l_orderkey % 11 = 2")
             .withColumn("l_quantity", F.lit(77.25)))
    before = t.read().count()

    comp = AsyncCompactionService(t)
    clus = AsyncClusteringService(t)
    comp.schedule_and_enqueue()
    clus.schedule_and_enqueue(sort_columns=["l_orderkey"])
    new = (lineitem.filter("l_orderkey % 13 = 1")
           .withColumn("l_orderkey", F.col("l_orderkey") + 50_000_000))
    t.upsert(new)
    comp.stop()
    clus.stop()
    exp_new = (new.withColumn("_m", F.date_format("l_shipdate", "yyyy-MM"))
               .dropDuplicates(["l_orderkey", "l_linenumber", "_m"]).count())
    assert t.read().count() == before + exp_new
    assert t.read().filter("l_quantity = 77.25").count() > 0


def test_upsert_conflicts_when_clustering_completes_after_listing(
        spark, tmp_table_path, lineitem):
    """Race fix (review finding): a clustering plan that COMPLETES between
    the batch's timeline listing and its plan read must still freeze its
    groups for that batch — the stale view would route updates into the
    REPLACED groups (lost on replace), so the batch conservatively raises
    ClusteringUpdateConflict; the caller's retry re-lists and routes to the
    new groups."""
    import unittest.mock as mock

    import pytest
    from incubator_hudi_spark import HudiTable
    from incubator_hudi_spark import timeline as tl
    from incubator_hudi_spark.services.clustering import (
        ClusteringUpdateConflict, run_clustering, schedule_clustering)
    from pyspark.sql import functions as F

    t = HudiTable.create(spark, tmp_table_path, "t",
                         recordkey_fields=["l_orderkey", "l_linenumber"],
                         partition_expr="date_format(l_shipdate,'yyyy')",
                         precombine_field="l_shipdate")
    t.cfg = t.cfg.with_(target_file_size_bytes=64 * 1024)
    t.bulk_insert(lineitem)
    n = t.read().count()
    st = schedule_clustering(t, sort_columns=["l_orderkey"])
    assert st is not None
    stale = t.timeline.instants()
    assert any(i.time == st and i.state != tl.COMPLETED for i in stale)
    assert run_clustering(t, instant_time=st) == st      # daemon wins
    real = type(t.timeline).instants
    calls = {"n": 0}
    def racing(self_tl):
        calls["n"] += 1
        return stale if calls["n"] == 1 else real(self_tl)
    upd = lineitem.withColumn("l_quantity", F.lit(63.0))
    with mock.patch.object(type(t.timeline), "instants", racing):
        with pytest.raises(ClusteringUpdateConflict):
            t.upsert(upd)
    # retry with a fresh listing succeeds and routes to the NEW groups
    t.upsert(upd)
    snap = t.read()
    # the full-table upsert collapses bulk_insert's duplicate-key twins
    # (one row per (key, partition) — standard upsert semantics)
    exp = (lineitem.selectExpr("l_orderkey", "l_linenumber",
                               "date_format(l_shipdate,'yyyy') y")
           .distinct().count())
    assert snap.count() == exp
    assert snap.filter("l_quantity = 63.0").count() == exp
