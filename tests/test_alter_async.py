"""ALTER TABLE commands, prepped write variants, async compaction."""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, MERGE_ON_READ
from incubator_hudi_spark.services.async_compaction import (
    AsyncCompactionService)
from incubator_hudi_spark.sql import HudiSqlSession


@pytest.fixture()
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def _mk(spark, path, **kw):
    return HudiTable.create(
        spark, str(path), "t",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", **kw)


def test_add_columns_and_rename(spark, tmp_path, li):
    t = _mk(spark, tmp_path / "t")
    t.bulk_insert(li)
    hs = HudiSqlSession(spark)
    hs.register("trips", t)
    hs.sql("ALTER TABLE trips ADD COLUMNS (score double, tag string)")
    df = t.read()
    assert {"score", "tag"} <= set(df.columns)
    assert df.filter("score IS NOT NULL").count() == 0  # old files → nulls
    # new writes can fill the new columns
    t.upsert(li.limit(100).withColumn("score", F.lit(0.9))
             .withColumn("tag", F.lit("good")))
    assert t.read().filter("tag = 'good'").count() >= 100
    with pytest.raises(ValueError, match="already exist"):
        t.add_columns("score double")
    hs.sql("ALTER TABLE trips RENAME TO journeys")
    assert "journeys" in hs.tables and "trips" not in hs.tables
    assert HudiTable.load(spark, str(tmp_path / "t")).tc.name == "journeys"


def test_prepped_variants_skip_combine(spark, tmp_path, li):
    t = _mk(spark, tmp_path / "t")
    # two rows, same key+partition, different precombine: prepped keeps both
    two = li.limit(1).unionByName(
        li.limit(1).withColumn("l_shipdate",
                               F.date_add(F.col("l_shipdate"), 400)))
    # ensure same partition for a honest dup: use identical shipdate rows
    two = li.limit(1).unionByName(li.limit(1))
    t.bulk_insert_prepped(two)
    assert t.read().count() == 2
    assert t.cfg.combine_before_upsert is True  # config restored
    # normal upsert of the same key collapses them
    t.upsert(li.limit(1).withColumn("l_quantity", F.lit(77.0)))
    assert t.read().count() == 1


def test_async_compaction(spark, tmp_path, li):
    t = _mk(spark, tmp_path / "mor", table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False)
    t.upsert(li)
    svc = AsyncCompactionService(t)
    for i in range(2):
        t.upsert(li.limit(300).withColumn("l_quantity", F.lit(float(i))))
        svc.schedule_and_enqueue()
        # ingestion continues while the worker compacts
        t.upsert(li.limit(100).withColumn("l_quantity", F.lit(50.0 + i)))
    done = svc.stop()
    assert done  # at least one compaction ran
    assert t.read().filter("l_quantity = 51.0").count() >= 100
    assert t.read().count() <= li.count()


def test_inmemory_index_cache(spark, tmp_path, li):
    from incubator_hudi_spark.config import INDEX_INMEMORY
    t = _mk(spark, tmp_path / "t")
    t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY)
    t.upsert(li)  # initial load into an empty table SEEDS the cache from
    assert t._key_index is not None  # the write frame (no later re-scan)
    n0 = t.read().count()  # duplicate (key,partition) rows already collapsed
    # update-only upserts keep the cache warm across batches
    t.upsert(li.limit(200).withColumn("l_quantity", F.lit(90.0)))
    assert t._key_index is not None  # built and retained through its commit
    cached = t._key_index
    t.upsert(li.limit(200).withColumn("l_quantity", F.lit(91.0)))
    assert t._key_index is cached  # reused, not rebuilt
    assert t.read().count() == n0
    assert t.read().filter("l_quantity = 91.0").count() == 200
    # an insert batch changes key→fg membership → cache invalidated
    fresh = li.limit(50).withColumn("l_orderkey", F.col("l_orderkey") + 10_000_000)
    t.upsert(fresh)
    assert t._key_index is None
    assert t.read().count() == n0 + 50
    # rebuilt lazily; a delete invalidates again
    t.upsert(li.limit(10).withColumn("l_quantity", F.lit(92.0)))
    assert t._key_index is not None
    t.delete(li.limit(10))
    assert t._key_index is None
    assert t.read().filter("l_quantity = 92.0").count() == 0


def test_catalog_sync(spark, tmp_path, li):
    from incubator_hudi_spark.sync import sync_to_catalog, sync_partitions
    t = _mk(spark, tmp_path / "cow")
    t.upsert(li)
    assert sync_to_catalog(t, "trips_cow") == ["trips_cow"]
    assert spark.sql("select count(*) c from trips_cow").first().c == t.read().count()
    m = _mk(spark, tmp_path / "mor", table_type=MERGE_ON_READ)
    m.cfg = m.cfg.with_(inline_compaction=False)
    m.upsert(li)
    m.upsert(li.limit(100).withColumn("l_quantity", F.lit(77.0)))
    names = sync_to_catalog(m, "trips_mor")
    assert names == ["trips_mor_ro", "trips_mor_rt", "trips_mor"]
    rt = spark.sql("select count(*) c from trips_mor_rt where l_quantity=77.0").first().c
    ro = spark.sql("select count(*) c from trips_mor_ro where l_quantity=77.0").first().c
    assert rt == 100 and ro < 100  # logs visible only through realtime view
    parts = sync_partitions(m)
    assert parts and all("-" in p for p in parts)


def test_change_column_widening(spark, tmp_path, li):
    t = HudiTable.create(
        spark, str(tmp_path / "widen"), "widen",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    t.upsert(li)
    assert dict(t.read().dtypes)["l_linenumber"] == "int"
    # explicit ALTER CHANGE: metadata-only widening, old files read as-is
    t.change_column("l_linenumber", "bigint")
    snap = t.read()
    assert dict(snap.dtypes)["l_linenumber"] == "bigint"
    assert snap.count() == t.read().count()
    # widened writes merge with narrow stored files
    upd = (li.limit(300)
           .withColumn("l_linenumber", F.col("l_linenumber").cast("bigint"))
           .withColumn("l_quantity", F.lit(-5.0)))
    t.upsert(upd)
    assert dict(t.read().dtypes)["l_linenumber"] == "bigint"
    assert t.read().filter("l_quantity = -5.0").count() > 0
    # non-widening change still rejected
    with pytest.raises(ValueError):
        t.change_column("l_quantity", "string")
    with pytest.raises(ValueError):
        t.change_column("l_linenumber", "int")   # narrowing


def test_implicit_widening_on_write(spark, tmp_path, li):
    t = HudiTable.create(
        spark, str(tmp_path / "widen2"), "widen2",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    t.upsert(li)
    # a batch that arrives with a wider type evolves the schema in-place
    t.upsert(li.limit(100)
             .withColumn("l_linenumber", F.col("l_linenumber").cast("bigint")))
    assert dict(t.read().dtypes)["l_linenumber"] == "bigint"
    # and a narrower late batch is upcast into the stored wide type
    t.upsert(li.limit(50)
             .withColumn("l_linenumber", F.col("l_linenumber").cast("int"))
             .withColumn("l_quantity", F.lit(-9.0)))
    assert dict(t.read().dtypes)["l_linenumber"] == "bigint"
    assert t.read().filter("l_quantity = -9.0").count() == 50


def test_async_compaction_cannot_steal_streaming_stamp(spark, tmp_path, li):
    """Interleaving hazard (fixed r4): the streaming batch-id stamp used to
    park in a mutable table slot consumed by the NEXT _complete() — an async
    compaction committing mid-batch stole it, so a crash replay would skip a
    batch whose data never landed (silent data loss).  The stamp now travels
    as a commit_extras ARGUMENT through the write op, so a table-service
    commit interleaved anywhere inside the sink's window cannot carry it.
    Reference pairing: HoodieStreamingSink.scala:92-94 triggers async
    compaction exactly like this."""
    import threading

    from incubator_hudi_spark import timeline as tl
    from incubator_hudi_spark.services.compaction import (run_compaction,
                                                          schedule_compaction)
    from incubator_hudi_spark.streaming.sink import (BATCH_ID_KEY,
                                                     HudiStreamingSink)

    t = _mk(spark, tmp_path / "mor", table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False)
    t.upsert(li)
    t.upsert(li.limit(400).withColumn("l_quantity", F.lit(1.0)))
    plan_instant = schedule_compaction(t)
    assert plan_instant is not None

    compaction_done = threading.Event()

    def mid_batch_compaction(batch_df):
        # runs INSIDE the sink invocation, before the data write commits —
        # exactly the window where the old table-level slot raced
        worker = threading.Thread(
            target=lambda: (run_compaction(t, plan_instant),
                            compaction_done.set()),
            daemon=True)
        worker.start()
        worker.join(timeout=120)
        assert compaction_done.is_set()
        return batch_df

    sink = HudiStreamingSink(t, query_id="race", retries=0,
                             transform=mid_batch_compaction)
    data_instant = sink(li.limit(200).withColumn("l_quantity", F.lit(9.0)), 7)
    assert data_instant is not None

    stamped = {}
    for ins in t.timeline.completed(tl.DATA_ACTIONS):
        extra = t.timeline.read_metadata(ins).get("extra", {})
        if BATCH_ID_KEY in extra:
            stamped[ins.time] = extra[BATCH_ID_KEY]
    # the stamp exists exactly once, on the sink's own data commit — never on
    # the compaction commit that completed inside the batch window
    assert stamped == {data_instant: 7}
    # replay is skipped off the data commit
    assert sink(li.limit(200), 7) is None


def test_sink_stamp_probe_is_incremental(spark, tmp_path, li):
    """Steady-state micro-batches must not re-read the whole timeline: after
    the first (full) probe, last_committed_batch() reads metadata only for
    instants newer than its high-water mark — zero reads when nothing new
    committed, and foreign commits advance the mark without rescans."""
    t = _mk(spark, tmp_path / "cow")
    from incubator_hudi_spark.streaming.sink import HudiStreamingSink

    sink = HudiStreamingSink(t, query_id="probe")
    sink(li.limit(300), 0)
    sink(li.limit(300).withColumn("l_quantity", F.lit(2.0)), 1)

    reads = []
    orig = type(t.timeline).read_metadata

    def counting(self, ins):
        reads.append(ins.time)
        return orig(self, ins)

    type(t.timeline).read_metadata = counting
    try:
        assert sink.last_committed_batch() == 1
        assert reads == []  # nothing new since batch 1's own probe advanced
        # a burst of non-stream commits: the next probe reads ONLY those
        for q in (3.0, 4.0, 5.0):
            t.upsert(li.limit(50).withColumn("l_quantity", F.lit(q)))
        reads.clear()
        assert sink.last_committed_batch() == 1
        n_new = len(reads)
        assert 0 < n_new <= 3
        reads.clear()
        assert sink.last_committed_batch() == 1
        assert reads == []  # mark advanced past the foreign commits
    finally:
        type(t.timeline).read_metadata = orig
    # a FRESH sink (crash replay) still full-scans and agrees
    assert HudiStreamingSink(t, query_id="probe").last_committed_batch() == 1


def test_async_service_stop_deadline_and_guards():
    """stop() must not deadlock on a hung _execute (bounded by
    join_timeout_s), must be idempotent, and enqueue() after stop() must
    refuse instead of queueing work that can never run."""
    import threading
    import time as _time

    from incubator_hudi_spark.services.async_base import (
        AsyncInstantService, ServiceStopTimeout)

    class Hang(AsyncInstantService):
        def __init__(self):
            self.release = threading.Event()
            super().__init__(table=None)
        def _execute(self, instant_time):
            self.release.wait(timeout=30)

    s = Hang()
    s.join_timeout_s = 0.5
    s.enqueue("t1")
    t0 = _time.monotonic()
    try:
        s.stop()
        assert False, "stop() should have timed out on the hung execute"
    except ServiceStopTimeout:
        pass
    assert _time.monotonic() - t0 < 5, "deadline not honored"

    # while still wedged, a second stop() re-raises honestly
    try:
        s.stop()
        assert False, "second stop() over a wedged worker must re-raise"
    except ServiceStopTimeout:
        pass

    s.release.set()                      # unhang; worker drains and exits
    s._worker.join(timeout=10)
    # recovered-after-timeout: the hung item finished and only the retire
    # sentinel was left — a later stop() must NOT report the worker as
    # wedged (the sentinel is excluded from the outstanding count)
    assert s.stop(raise_errors=False) == ["t1"]

    class Quick(AsyncInstantService):
        def _execute(self, instant_time):
            pass

    q = Quick(table=None)
    q.enqueue("a")
    assert q.stop() == ["a"]
    assert q.stop() == ["a"]             # idempotent second stop
    try:
        q.enqueue("b")
        assert False, "enqueue after stop must refuse"
    except RuntimeError:
        pass
