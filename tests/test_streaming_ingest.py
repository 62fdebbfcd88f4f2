"""Streaming sink/source + DeltaStreamer-style ingest tests — analogue of
TestHoodieDeltaStreamer.java invariants (checkpoints, resume, transforms)."""

import os
import tempfile

from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable
from incubator_hudi_spark.sources.ingest import (DFSSource, HudiIncrSource,
                                                 IngestJob, chained_transformer,
                                                 flatten_transformer,
                                                 sql_transformer)
from incubator_hudi_spark.streaming.sink import HudiStreamingSink
from incubator_hudi_spark.streaming.source import HudiStreamReader


def make_events(spark, path):
    return HudiTable.create(
        spark, path, name="events",
        recordkey_fields=["event_id"],
        partition_expr="date_format(ts,'yyyy-MM-dd')",
        precombine_field="ts")


def test_sink_micro_batches_exactly_once(spark, tmp_table_path, events):
    t = make_events(spark, tmp_table_path)
    sink = HudiStreamingSink(t, query_id="q1")
    b0 = events.filter("event_id % 3 = 0")
    b1 = events.filter("event_id % 3 = 1")
    sink(b0, 0)
    sink(b1, 1)
    n = t.read().count()
    assert n == b0.count() + b1.count()  # event_id unique in events
    # replay of batch 1 must be skipped (exactly-once)
    assert sink(b1, 1) is None
    assert t.read().count() == n
    assert sink.last_committed_batch() == 1


def test_sink_insert_crash_replay_no_duplicates(spark, tmp_table_path, events):
    """Atomic batch-id stamping (HoodieStreamingSink.scala:92-94): the stamp
    lands inside the commit JSON itself, so a crash AFTER the commit but
    before any post-commit work leaves a stamped commit and the replayed
    batch is skipped — even for operation='insert', where a re-run would
    duplicate rows."""
    from incubator_hudi_spark import timeline as tl
    t = make_events(spark, tmp_table_path)
    sink = HudiStreamingSink(t, operation="insert", query_id="qi")
    b0 = events.filter("event_id % 4 = 0")
    instant = sink(b0, 0)
    n = t.read().count()
    assert n == b0.count()
    # the stamp is IN the completed commit metadata — no post-hoc rewrite
    ins = [i for i in t.timeline.completed(tl.DATA_ACTIONS) if i.time == instant]
    extra = t.timeline.read_metadata(ins[0]).get("extra", {})
    assert extra.get("streaming.batch_id") == 0
    assert extra.get("streaming.query_id") == "qi"
    # simulate a driver crash + restart: a brand-new sink replays batch 0
    sink2 = HudiStreamingSink(t, operation="insert", query_id="qi")
    assert sink2.last_committed_batch() == 0
    assert sink2(b0, 0) is None
    assert t.read().count() == n  # insert replay did NOT duplicate


def test_sink_failed_batch_leaves_no_pending_stamp(spark, tmp_table_path, events):
    """A batch whose write fails all retries must not leak its batch-id
    extras into a later unrelated commit."""
    t = make_events(spark, tmp_table_path)
    sink = HudiStreamingSink(t, operation="no_such_op", query_id="qf", retries=0)
    try:
        sink(events.limit(5), 3)
        assert False, "expected failure"
    except AttributeError:
        pass
    instant = t.upsert(events.filter("event_id % 7 = 0"))
    from incubator_hudi_spark import timeline as tl
    ins = [i for i in t.timeline.completed(tl.DATA_ACTIONS) if i.time == instant]
    extra = t.timeline.read_metadata(ins[0]).get("extra", {})
    assert "streaming.batch_id" not in extra


def test_stream_reader_incremental_batches(spark, tmp_table_path, events):
    t = make_events(spark, tmp_table_path)
    t.upsert(events.filter("event_id % 2 = 0"))
    reader = HudiStreamReader(t)
    first = reader.next_batch()
    assert first.count() == events.filter("event_id % 2 = 0").count()
    assert reader.next_batch() is None  # caught up
    t.upsert(events.filter("event_id % 2 = 1"))
    second = reader.next_batch()
    assert second.count() == events.filter("event_id % 2 = 1").count()


def test_dfs_source_checkpointing(spark, tmp_table_path, events):
    t = make_events(spark, tmp_table_path)
    src_dir = tempfile.mkdtemp(prefix="ingest_src_")
    events.filter("event_id <= 300").write.mode("overwrite") \
          .parquet(os.path.join(src_dir, "f1"))
    job = IngestJob(t, DFSSource(spark, src_dir, "parquet"))
    i1 = job.sync_once()
    assert i1 is not None
    assert t.read().count() == events.filter("event_id <= 300").count()
    # no new files → no-op
    assert job.sync_once() is None
    # drop a second file → only its rows ingested
    events.filter("event_id > 300").write.mode("overwrite") \
          .parquet(os.path.join(src_dir, "f2"))
    i2 = job.sync_once()
    assert i2 is not None
    assert t.read().count() == events.count()


def test_sql_transformer_and_chain(spark, tmp_table_path, events):
    t = HudiTable.create(spark, tmp_table_path, name="agg",
                         recordkey_fields=["event_id"],
                         partition_expr=None, precombine_field="ts")
    tx = chained_transformer(
        sql_transformer(spark, "select *, value * 2 as value2 from src"),
    )
    src_dir = tempfile.mkdtemp(prefix="ingest_tx_")
    events.write.mode("overwrite").parquet(os.path.join(src_dir, "f"))
    job = IngestJob(t, DFSSource(spark, src_dir, "parquet"), transform=tx)
    job.sync_once()
    snap = t.read()
    assert "value2" in snap.columns
    assert snap.filter(F.abs(F.col("value2") - 2 * F.col("value")) > 1e-9).count() == 0


def test_flatten_transformer(spark):
    df = spark.createDataFrame(
        [(1, ("a", 2)), (2, ("b", 3))], "id int, s struct<x:string, y:int>")
    flat = flatten_transformer(df)
    assert set(flat.columns) == {"id", "s_x", "s_y"}
    assert flat.filter("s_y = 3").count() == 1


def test_table_to_table_incremental_pipeline(spark, events):
    d = tempfile.mkdtemp(prefix="pipe_")
    up = HudiTable.create(spark, d + "/up", name="up", recordkey_fields=["event_id"],
                          partition_expr=None, precombine_field="ts")
    down = HudiTable.create(spark, d + "/down", name="down", recordkey_fields=["event_id"],
                            partition_expr=None, precombine_field="ts")
    first_half = events.filter("event_id <= 500")
    up.upsert(first_half)
    job = IngestJob(down, HudiIncrSource(up))
    job.sync_once()
    assert down.read().count() == first_half.count()
    up.upsert(events.filter("event_id > 500"))
    job.sync_once()
    assert down.read().count() == events.count()
    assert job.sync_once() is None  # caught up


def test_writestream_foreachbatch_available_now(spark, tmp_path, events):
    """True Structured Streaming integration: file readStream →
    foreachBatch(HudiStreamingSink) with availableNow, then a second round
    with new files resumes exactly-once from the recorded batch ids."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    events.filter("event_id % 2 = 0").write.parquet(src + "/p0")
    t = make_events(spark, str(tmp_path / "tbl"))
    sink = HudiStreamingSink(t, query_id="ws")

    def run_round():
        stream = (spark.readStream.schema(events.schema)
                  .option("maxFilesPerTrigger", "4").parquet(src + "/*")
                  .writeStream.foreachBatch(lambda df, bid: sink(df, bid))
                  .option("checkpointLocation", ckpt)
                  .trigger(availableNow=True).start())
        stream.awaitTermination(120)

    run_round()
    n_half = events.filter("event_id % 2 = 0").count()
    assert t.read().count() == n_half
    events.filter("event_id % 2 = 1").write.parquet(src + "/p1")
    run_round()
    assert t.read().count() == events.count()
    assert sink.last_committed_batch() is not None


def test_sessionize_stream_matches_batch(spark, tmp_path, events):
    """applyInPandasWithState sessionization: state carries open sessions
    across micro-batches; closed sessions match the batch window version."""
    from incubator_hudi_spark.streaming.sessionize import (sessionize,
                                                           sessionize_stream)
    ev = events.filter("user_id < 20")
    src = str(tmp_path / "sess_src")
    ckpt = str(tmp_path / "sess_ckpt")
    # split by time so sessions genuinely span micro-batch boundaries
    cut = ev.selectExpr("percentile(cast(cast(ts as timestamp) as long), 0.5)").first()[0]
    ev.filter(F.col("ts").cast("timestamp").cast("long") <= cut).write.parquet(src + "/p0")
    ev.filter(F.col("ts").cast("timestamp").cast("long") > cut).write.parquet(src + "/p1")

    out = sessionize_stream(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(src + "/*"),
        gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("sess_out")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.table("sess_out").select("user_id", "session_start",
                                         "session_end", "n_events")

    ref = (sessionize(ev, gap_minutes=30)
           .select("user_id",
                   F.unix_micros(F.col("session_start").cast("timestamp"))
                   .alias("session_start"),
                   F.unix_micros(F.col("session_end").cast("timestamp"))
                   .alias("session_end"),
                   "n_events"))
    # the stream never emits each user's trailing open session — drop the
    # last session per user from the batch reference before comparing
    w_last = F.max("session_start").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window
        .partitionBy("user_id"))
    ref_closed = (ref.withColumn("_last", w_last)
                  .filter("session_start < _last").drop("_last"))
    assert got.count() == ref_closed.count()
    assert got.exceptAll(ref_closed).count() == 0
    assert ref_closed.exceptAll(got).count() == 0


def test_checkpoint_survives_archival(spark, tmp_path, events):
    """Checkpoint/batch-id lookups fall back to the archived timeline when
    the stamped commit has been archived past."""
    t = make_events(spark, str(tmp_path / "tbl"))
    t.cfg = t.cfg.with_(metadata_checkpoint_commits=0,
                        archive_min_commits=2, archive_max_commits=3)
    sink = HudiStreamingSink(t, query_id="arch")
    sink(events.filter("event_id % 5 = 0"), 7)
    # foreign writers advance the table without stamping batch ids
    for i in range(4):
        t.upsert(events.filter(f"event_id % 5 = {i % 4 + 1}"))
    t.write_metadata_checkpoint()
    assert t.archive() > 0
    # the stamped commit is now archived — the sink must still see batch 7
    assert sink.last_committed_batch() == 7
    assert sink(events.filter("event_id % 5 = 0"), 7) is None  # replay skipped

def test_windowed_agg_stream_matches_batch(spark, tmp_path, events):
    """Watermarked tumbling-window aggregation: append-mode stream emits
    exactly the finalized windows, matching the batch twin."""
    from incubator_hudi_spark.streaming.windowed import (windowed_agg,
                                                         windowed_agg_stream)
    ev = events.filter("user_id < 50").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "win_src")
    ckpt = str(tmp_path / "win_ckpt")
    cut = ev.selectExpr("percentile(cast(ts as long), 0.5)").first()[0]
    ev.filter(F.col("ts").cast("long") <= cut).write.parquet(src + "/p0")
    ev.filter(F.col("ts").cast("long") > cut).write.parquet(src + "/p1")

    out = windowed_agg_stream(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1").parquet(src + "/*"),
        window_minutes=60, watermark_minutes=10)
    q = (out.writeStream.format("memory").queryName("win_out")
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.table("win_out")

    ref = windowed_agg(ev, window_minutes=60)
    # append mode only emits windows the final watermark passed — every
    # emitted window must match the batch result exactly, and all but the
    # tail windows (>= max ts - watermark) must have been emitted
    assert got.count() > 0
    joined = got.join(ref.withColumnRenamed("n_events", "ref_n"),
                      ["event_type", "window_start"], "inner")
    assert joined.count() == got.count()
    assert joined.filter("n_events <> ref_n").count() == 0
    mx = ev.agg(F.max("ts").cast("long")).first()[0]
    closed_ref = ref.filter(
        F.col("window_end").cast("long") <= mx - 10 * 60)
    assert got.count() >= closed_ref.count()


def test_dfs_source_csv_and_json(spark, tmp_path, events):
    """CsvDFSSource / JsonDFSSource parity: the same checkpointed listing
    source reads MULTI-FILE csv and json drops with an explicit schema
    (multi-file pins the path-list calling convention — *args would bind
    the 2nd path to DataFrameReader's schema parameter)."""
    import os
    import shutil
    import time

    from incubator_hudi_spark import HudiTable
    sub = events.select("event_id", "user_id", "value")
    for fmt, writer in (("csv", lambda df, p: df.write.option("header", True).csv(p)),
                        ("json", lambda df, p: df.write.json(p))):
        src_dir = str(tmp_path / f"src_{fmt}")
        writer(sub.filter("event_id % 2 = 0").repartition(3), src_dir)
        t = HudiTable.create(spark, str(tmp_path / f"t_{fmt}"), name=f"ev_{fmt}",
                             recordkey_fields=["event_id"],
                             partition_expr=None, precombine_field="event_id")
        opts = {"header": "true"} if fmt == "csv" else {}
        job = IngestJob(t, DFSSource(spark, src_dir, fmt,
                                     schema=sub.schema, options=opts))
        assert job.sync_once() is not None
        assert t.read().count() == sub.filter("event_id % 2 = 0").count()
        # second multi-file drop → only the new files are ingested
        time.sleep(1.1)        # mtime granularity
        writer(sub.filter("event_id % 2 = 1").repartition(2), src_dir + "_b")
        for root, _d, files in os.walk(src_dir + "_b"):
            for fn in files:
                if not fn.startswith(("_", ".")):
                    shutil.copy(os.path.join(root, fn),
                                os.path.join(src_dir, "b_" + fn))
        assert job.sync_once() is not None
        assert t.read().count() == sub.count()
        assert job.sync_once() is None      # drained


def test_sink_retry_after_post_commit_failure_no_duplicate_insert(
        spark, tmp_table_path, events):
    """A post-commit hook failure after the data commit landed must NOT make
    the retry loop re-insert the batch: each retry re-probes the stamped
    batch id first (the reference's canSkipBatch re-check per attempt)."""
    t = make_events(spark, tmp_table_path)
    boom = {"armed": True}

    def exploding_cb(instant_time, md):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("post-commit service failure")
    t._commit_callbacks = [exploding_cb]

    sink = HudiStreamingSink(t, operation="insert", query_id="qr", retries=2)
    batch = events.limit(500)
    sink(batch, 0)                       # first attempt commits, cb explodes
    n = t.read().count()
    assert n == 500, "batch written exactly once despite the retry"
    # stamp landed with the data commit → replay is skipped too
    assert sink(batch, 0) is None
    assert t.read().count() == 500
