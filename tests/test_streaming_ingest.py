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
