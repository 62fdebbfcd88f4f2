"""Native Python DataSource write side (df.write.format("hudi_py")).

Reference behavior mirrored: HoodieSparkSqlWriter.scala:62-257 —
mode("append") = bulk_insert (new file groups, no dedup), mode("overwrite")
= insert_overwrite_table, first write auto-creates the table from hoodie.*
options."""

import os

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, pyds

OPTS = {
    "hoodie.table.name": "li",
    "hoodie.datasource.write.recordkey.field": "l_orderkey,l_linenumber",
    "hoodie.spark.partitionpath.expr": "date_format(l_shipdate,'yyyy-MM')",
    "hoodie.datasource.write.precombine.field": "l_shipdate",
}


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    pyds.register(spark)


@pytest.fixture(scope="module")
def li(lineitem):
    return lineitem.limit(2000).cache()


@pytest.mark.slow
def test_native_bulk_insert_and_keygen_parity(spark, tmp_table_path, li):
    (li.write.format("hudi_py").options(**OPTS).mode("append")
       .save(tmp_table_path))
    t = HudiTable(spark, tmp_table_path)
    snap = t.read()
    assert snap.count() == li.count()
    # key/partition formats match the engine's keygen exactly
    twin_path = tmp_table_path + "_twin"
    twin = HudiTable.create(
        spark, twin_path, name="li",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    twin.bulk_insert(li)
    a = snap.select("_hoodie_record_key", "_hoodie_partition_path").distinct()
    b = (twin.read()
         .select("_hoodie_record_key", "_hoodie_partition_path").distinct())
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the ENGINE can upsert on top of the natively-written table, and the
    # native READER round-trips it
    t.upsert(li.limit(50).withColumn("l_quantity", F.lit(9999.0)))
    nat = spark.read.format("hudi_py").load(tmp_table_path)
    assert nat.filter("l_quantity = 9999.0").count() > 0
    assert nat.count() == t.read().count()


def test_overwrite_mode_replaces_table(spark, tmp_table_path, li):
    (li.write.format("hudi_py").options(**OPTS).mode("append")
       .save(tmp_table_path))
    small = li.limit(10)
    (small.write.format("hudi_py").mode("overwrite").save(tmp_table_path))
    t = HudiTable(spark, tmp_table_path)
    assert t.read().count() == small.select(
        "l_orderkey", "l_linenumber").count()
    # append after overwrite accumulates again
    (small.write.format("hudi_py").mode("append").save(tmp_table_path))
    assert t.read().count() == 2 * small.count()


def test_unsupported_paths_raise(spark, tmp_table_path, li):
    with pytest.raises(Exception, match="index tagging"):
        (li.write.format("hudi_py").options(**OPTS)
           .option("hoodie.datasource.write.operation", "upsert")
           .mode("append").save(tmp_table_path))
    with pytest.raises(Exception, match="unsupported partition expr"):
        (li.write.format("hudi_py")
           .option("hoodie.table.name", "b")
           .option("hoodie.datasource.write.recordkey.field", "l_orderkey")
           .option("hoodie.spark.partitionpath.expr",
                   "substr(l_comment, 1, 2)")
           .mode("append").save(tmp_table_path + "_bad"))
    # failed writes leave no committed instant behind
    assert not os.path.exists(tmp_table_path) or not [
        i for i in HudiTable(spark, tmp_table_path)
        .timeline.completed_data_instants()]


@pytest.mark.slow
def test_stream_sink_exactly_once(spark, tmp_table_path, li):
    """writeStream.format("hudi_py"): per-batch bulk appends; the batch id
    is stamped atomically with the commit, so a replayed micro-batch (Spark
    wrote offsets but died before its checkpoint commit) adds no rows."""
    import shutil

    base = os.path.dirname(tmp_table_path)
    src_p, sink_p = tmp_table_path, os.path.join(base, "sink")
    ck = os.path.join(base, "ck")
    src = HudiTable.create(
        spark, src_p, name="s",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    src.bulk_insert(li)

    def run():
        q = (spark.readStream.format("hudi_py").load(src_p)
             .writeStream.format("hudi_py")
             .option("hoodie.table.name", "sink")
             .option("hoodie.datasource.write.recordkey.field",
                     "l_orderkey,l_linenumber")
             .option("hoodie.spark.partitionpath.expr",
                     "date_format(l_shipdate,'yyyy-MM')")
             .option("path", sink_p)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(240)

    run()
    sink = HudiTable(spark, sink_p)
    assert sink.read().count() == li.count()
    n_commits = len(sink.timeline.completed_data_instants())

    # force a replay: offsets say batch 0 ran, but the checkpoint commit is
    # gone — Spark re-executes the batch; the stamped batch id must keep the
    # sink exactly-once
    commits_dir = os.path.join(ck, "commits")
    for f in os.listdir(commits_dir):
        os.remove(os.path.join(commits_dir, f))
    run()
    assert sink.read().count() == li.count()
    assert len(sink.timeline.completed_data_instants()) == n_commits
    # the replay cleaned its own orphan instant dir and consumed the marker
    assert not os.path.exists(
        os.path.join(sink_p, ".hoodie", ".streaming_instant"))

    # new source commit → resume appends exactly the delta
    src.upsert(li.limit(70).withColumn("l_comment", F.lit("x")))
    run()
    assert sink.read().count() == li.count() + 70


def test_null_partition_and_key_fields(spark, tmp_table_path):
    """Rows with null partition values land in the default partition (never
    silently dropped); null key fields degrade like concat_ws (field name
    only), matching the engine's keygen."""
    df = spark.createDataFrame(
        [(1, 2, "2024-03-05"), (3, None, None), (None, 4, "2024-03-06")],
        "a long, b long, d string").withColumn("d", F.to_date("d"))
    (df.write.format("hudi_py")
       .option("hoodie.table.name", "n")
       .option("hoodie.datasource.write.recordkey.field", "a,b")
       .option("hoodie.spark.partitionpath.expr",
               "date_format(d,'yyyy-MM')")
       .mode("append").save(tmp_table_path))
    t = HudiTable(spark, tmp_table_path)
    rows = t.read().collect()
    assert len(rows) == 3                       # nothing dropped
    by_key = {r["_hoodie_record_key"]: r["_hoodie_partition_path"]
              for r in rows}
    assert by_key["a:3,b"] == "__HIVE_DEFAULT_PARTITION__"
    assert by_key["a,b:4"] == "2024-03"
    assert by_key["a:1,b:2"] == "2024-03"


def test_multilevel_partition_fg_ids_survive_engine_upsert(spark,
                                                           tmp_table_path):
    """fg ids minted from multi-level partitions must stay directory-safe:
    a later ENGINE upsert partitionBy's the fg id and a '/' would escape to
    %2F, forking a phantom file group (duplicate rows on read)."""
    df = spark.createDataFrame(
        [(i, "2024", f"{(i % 2) + 1:02d}", f"v{i}") for i in range(20)],
        "k long, y string, m string, payload string")
    (df.write.format("hudi_py")
       .option("hoodie.table.name", "ml")
       .option("hoodie.datasource.write.recordkey.field", "k")
       .option("hoodie.datasource.write.partitionpath.field", "y,m")
       .mode("append").save(tmp_table_path))
    t = HudiTable(spark, tmp_table_path)
    assert t.read().count() == 20
    assert {r[0] for r in
            t.read().select("_hoodie_partition_path").distinct().collect()} \
        == {"2024/01", "2024/02"}
    t.upsert(df.withColumn("payload", F.lit("updated")))
    snap = t.read()
    assert snap.count() == 20                   # no phantom duplicates
    assert snap.filter("payload = 'updated'").count() == 20


def test_unconvertible_date_format_rejected(spark, tmp_table_path, li):
    with pytest.raises(Exception, match="unsupported date format"):
        (li.write.format("hudi_py")
           .option("hoodie.table.name", "b")
           .option("hoodie.datasource.write.recordkey.field", "l_orderkey")
           .option("hoodie.spark.partitionpath.expr",
                   "date_format(l_shipdate,'MMM-yyyy')")
           .mode("append").save(tmp_table_path))


def test_keygen_parity_randomized(spark):
    """Randomized parity of the pandas keygen against the engine's column
    expressions (keygen.record_key_col / partition_path_col) — unicode,
    embedded separators, newlines, nulls, and negative/zero epochs all must
    produce byte-identical record keys and partition paths."""
    import random

    from incubator_hudi_spark.keygen import (partition_path_col,
                                             record_key_col)
    from incubator_hudi_spark.pyds_write import (_parse_partition_expr,
                                                 _record_key_series)

    rng = random.Random(20260815)
    alphabet = ["plain", "with space", "a:b", "x,y", "tab\there",
                "line\nbreak", "ünïcødé", "日本語", "", "trail/slash",
                None, "0", "-1"]
    rows = [(rng.choice(alphabet), rng.choice(alphabet),
             rng.randint(-10**9, 2 * 10**9)) for _ in range(200)]
    df = spark.createDataFrame(rows, "f1 string, f2 string, ts long")

    cases = [
        (["f1"], None),
        (["f1", "f2"], None),
        (["f1", "f2"], "f2"),
        (["f1"], "concat_ws('/', f1, f2)"),
        (["f1"], "date_format(timestamp_seconds(CAST(ts AS BIGINT)),"
                 "'yyyy-MM-dd')"),
        (["f1"], "date_format(timestamp_millis(CAST(ts AS BIGINT)),"
                 "'yyyy/MM')"),
    ]
    pdf = df.toPandas()
    for fields, pexpr in cases:
        eng = (df.withColumn("_k", record_key_col(fields))
                 .withColumn("_p", partition_path_col(pexpr))
                 .select("_k", "_p").collect())
        import pandas as pd
        keys = [None if pd.isna(k) else k
                for k in _record_key_series(pdf, fields)]
        parts_s = _parse_partition_expr(pexpr)(pdf)
        parts = [None if pd.isna(v) else v for v in parts_s]
        for i, r in enumerate(eng):
            assert keys[i] == r["_k"], (fields, pexpr, i, keys[i], r["_k"])
            # engine null partition-expr → NON_PARTITIONED constant; null
            # VALUES stay null on the engine side and map to the default
            # partition at write time (tested elsewhere)
            if r["_p"] is not None and pexpr is not None:
                assert parts[i] == r["_p"], (pexpr, i, parts[i], r["_p"])
