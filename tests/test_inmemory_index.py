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
    assert c1 in t._key_index_valid_token
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
    assert t._key_index is not None and c1 in t._key_index_valid_token
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


def test_buried_replacecommit_invalidates_cache(spark, tmp_table_path,
                                                lineitem):
    """A scheduled clustering plan executes at its old SCHEDULED instant
    time, which sorts BEFORE later data commits — a newest-instant staleness
    check misses it and the cached key index keeps routing updates into the
    replaced (invisible) file groups: silent row loss.  The validity token
    compares the full completed-instant set, so the buried replacecommit
    invalidates the cache."""
    from incubator_hudi_spark.services.clustering import (run_clustering,
                                                          schedule_clustering)

    t = _make(spark, tmp_table_path)
    # several small groups per partition so a plan exists
    t.upsert(lineitem.filter("l_orderkey % 2 = 0"))
    t.upsert(lineitem.filter("l_orderkey % 2 = 1"))
    parts = sorted({r[0] for r in
                    t.read().select("_hoodie_partition_path").distinct()
                    .collect()})
    frozen_parts, free_parts = parts[:2], parts[2:]
    assert free_parts
    st = schedule_clustering(t, sort_columns=["l_orderkey"],
                             partitions=frozen_parts)
    assert st is not None
    # update-only upsert OUTSIDE the frozen partitions (filter by month —
    # twin keys exist across months, so a key-only filter would leak into
    # the frozen partitions): cache retained, validated at a commit NEWER
    # than the scheduled plan's instant
    month = F.date_format("l_shipdate", "yyyy-MM")
    upd = (lineitem.filter(month.isin(free_parts))
           .withColumn("l_quantity", F.lit(41.0)))
    t.upsert(upd)
    assert t._key_index is not None            # cache survived (update-only)
    n_before = t.read().count()
    # the daemon executes the plan: replacecommit completes at st — an
    # instant time BURIED behind the later update commit
    assert run_clustering(t, instant_time=st) == st
    # updates into the clustered partitions must route to the NEW groups
    upd2 = (lineitem.filter(month.isin(frozen_parts))
            .withColumn("l_quantity", F.lit(42.5)))
    t.upsert(upd2)
    snap = t.read()
    assert snap.count() == n_before            # no rows vanished
    assert snap.filter("l_quantity = 42.5").count() > 0
    # and the updated keys are still readable exactly once
    dups = (snap.groupBy("l_orderkey", "l_linenumber",
                         "_hoodie_partition_path")
            .count().filter("count > 1").count())
    assert dups == 0


def test_archival_shrink_keeps_cache(spark, tmp_table_path, lineitem):
    """Archival moves completed instants out of the active timeline without
    changing any key→file-group mapping, so the cached key index must
    SURVIVE an archival event (the validity token is archival-insensitive:
    a stored token that differs from the current one only by instants now
    in the archive dir is still valid).  A shrink NOT explained by the
    archive (restore) still invalidates."""
    t = _make(spark, tmp_table_path)
    t.cfg = t.cfg.with_(clean_retain_commits=1)
    small = lineitem.filter("l_orderkey % 50 = 3")
    t.upsert(small)
    upd = small.withColumn("l_quantity", F.lit(7.0))
    for i in range(4):
        t.upsert(upd.withColumn("l_extendedprice",
                                F.col("l_extendedprice") + i))
    t.clean()
    assert t._key_index is not None
    idx_before = t._key_index
    # deterministic archival event between two batches
    t.cfg = t.cfg.with_(archive_min_commits=2, archive_max_commits=3)
    moved = t.archive()
    assert moved > 0, "test needs an actual archival event"
    t.upsert(upd.withColumn("l_extendedprice", F.col("l_extendedprice") + 99))
    # cache survived: the SAME persisted DataFrame object routed the batch
    assert t._key_index is idx_before
    # direct semantics of the validity rule
    cur = t._data_instants_token()
    archived = {i.time for i in t.timeline.archived_instants()}
    assert archived, "archival must have populated the archive dir"
    some_archived = next(iter(archived))
    assert t._token_still_valid(cur, cur)
    assert t._token_still_valid(cur | {some_archived}, cur)      # archival shrink
    assert not t._token_still_valid(cur | {"99999999999999999"}, cur)  # restore
    assert not t._token_still_valid(cur - set(list(cur)[:1]), cur)     # foreign commit
    assert not t._token_still_valid(None, cur)
    assert not t._token_still_valid(("pending", "x"), cur)


def test_one_active_listing_per_steady_batch(spark, tmp_table_path, lineitem):
    """The write batch derives its validity token, pending sets, schema
    check, and file-system view from ONE active-timeline listing (a
    counting fake on Timeline.instants; the archive dir is separate and
    only consulted when the active set shrinks)."""
    t = _make(spark, tmp_table_path)
    small = lineitem.filter("l_orderkey % 50 = 3")
    t.upsert(small)                            # cold: seeds cache + recovery
    upd = small.withColumn("l_quantity", F.lit(9.0))
    t.upsert(upd)                              # warm the lane
    calls = {"n": 0}
    real = type(t.timeline).instants
    def counting(self_tl):
        calls["n"] += 1
        return real(self_tl)
    import unittest.mock as mock
    with mock.patch.object(type(t.timeline), "instants", counting):
        t.upsert(upd.withColumn("l_extendedprice",
                                F.col("l_extendedprice") + 1))
    # exactly: 1 listing for the batch planning (token + pending sets +
    # schema check + view, all from the same snapshot) and 1 for the
    # post-commit service-eligibility gates
    assert calls["n"] == 2, f"expected 2 active listings, saw {calls['n']}"


def test_real_restore_invalidates_cache(spark, tmp_table_path, lineitem):
    """A REAL savepoint→restore (not a fabricated token) must drop the
    warm key index: restore deletes completed instants, which the
    archival-insensitive validity rule must NOT explain away — the next
    upsert re-scans and routes against the restored state."""
    t = _make(spark, tmp_table_path)
    small = lineitem.filter("l_orderkey % 40 = 3")
    t.upsert(small)
    sp = t.savepoint()
    # post-savepoint commits warm the cache past the savepoint state
    upd = small.withColumn("l_quantity", F.lit(71.0))
    t.upsert(upd)
    t.upsert(upd.withColumn("l_quantity", F.lit(72.0)))
    assert t._key_index is not None
    idx_before = t._key_index
    t.restore(sp)
    # next write must NOT trust the pre-restore cache (it maps keys into
    # file groups written by the rolled-back commits)
    t.upsert(upd.withColumn("l_quantity", F.lit(73.0)))
    assert t._key_index is not idx_before
    snap = t.read()
    assert snap.filter("l_quantity = 72.0").count() == 0   # rolled back
    exp = (small.selectExpr("l_orderkey", "l_linenumber",
                            "date_format(l_shipdate,'yyyy-MM') m")
           .distinct().count())
    assert snap.filter("l_quantity = 73.0").count() == exp
    assert snap.count() == exp
