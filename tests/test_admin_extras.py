"""Admin log-file inspection, repair-deduplicate, and schema providers."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from incubator_hudi_spark import HudiTable, MERGE_ON_READ
from incubator_hudi_spark import admin
from incubator_hudi_spark.sources import schema as sp


@pytest.fixture()
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def test_log_files_df(spark, tmp_path, li):
    t = HudiTable.create(
        spark, str(tmp_path / "t"), "t",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", table_type=MERGE_ON_READ)
    t.cfg = t.cfg.with_(inline_compaction=False)
    t.upsert(li)
    t.upsert(li.limit(200).withColumn("l_quantity", F.lit(1.0)))
    logs = admin.log_files_df(t)
    assert logs.count() > 0
    assert logs.filter("num_records <= 0").count() == 0
    t.run_compaction()
    assert admin.log_files_df(t).count() == 0


def test_repair_deduplicate(spark, tmp_path, li):
    t = HudiTable.create(
        spark, str(tmp_path / "t"), "t",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    t.bulk_insert(li)
    # plant duplicates: insert (no combine) re-adds 100 existing keys
    t.insert(li.limit(100))
    dups_before = admin.duplicate_keys_df(t).count()
    assert dups_before >= 90   # some limit() rows may hit testdata dup keys
    c = admin.repair_deduplicate(t)
    assert c is not None
    assert admin.duplicate_keys_df(t).count() == 0
    assert admin.repair_deduplicate(t) is None  # idempotent


def test_schema_providers(spark, tmp_path, li):
    st = StructType.fromDDL("l_orderkey bigint, l_quantity double, extra string")
    p = tmp_path / "schema.json"
    p.write_text(json.dumps(json.loads(st.json())))
    assert sp.file_based_schema(str(p)) == st
    p2 = tmp_path / "schema.ddl"
    p2.write_text("l_orderkey bigint, l_quantity double, extra string")
    assert sp.file_based_schema(str(p2)) == st
    assert sp.registry_schema(lambda: st.json()) == st
    assert sp.row_based_schema(li) == li.schema
    out = sp.conform(li, st)
    assert [f.name for f in out.schema.fields] == ["l_orderkey", "l_quantity", "extra"]
    assert out.filter("extra IS NOT NULL").count() == 0
    assert out.count() == li.count()


def test_export_snapshot_roundtrip(spark, tmp_path, li):
    t = HudiTable.create(
        spark, str(tmp_path / "exp"), "exp",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    t.upsert(li)
    t.upsert(li.limit(500).withColumn("l_quantity", F.lit(-7.0)))
    dest = str(tmp_path / "out")
    n = admin.export_snapshot(t, dest)
    back = spark.read.parquet(dest)
    assert n == t.read().count() == back.count()
    # partitioned layout by hudi partition path, no meta columns in the data
    assert "_hoodie_partition_path" in back.columns
    assert not any(c.startswith("_hoodie_") and c != "_hoodie_partition_path"
                   for c in back.columns)
    n_upd = t.read().filter("l_quantity = -7.0").count()
    assert back.filter("l_quantity = -7.0").count() == n_upd > 0
    # as-of export reproduces the historical snapshot
    first = t.timeline.completed_data_instants()[0].time
    dest2 = str(tmp_path / "out2")
    admin.export_snapshot(t, dest2, as_of=first)
    assert spark.read.parquet(dest2).filter("l_quantity = -7.0").count() == 0


def test_cleans_rollbacks_wa_frames(spark, tmp_table_path, lineitem):
    from incubator_hudi_spark import HudiTable, WriteConfig, admin
    from pyspark.sql import functions as F
    t = HudiTable.create(spark, tmp_table_path, name="adm2",
                         recordkey_fields=["l_orderkey", "l_linenumber"],
                         partition_expr="date_format(l_shipdate,'yyyy-MM')",
                         precombine_field="l_shipdate",
                         write_config=WriteConfig(clean_retain_commits=1))
    li = lineitem
    t.upsert(li)
    bad = t.upsert(li.limit(100).withColumn("l_quantity", F.lit(-1.0)))
    t.rollback(bad)
    t.upsert(li.limit(200).withColumn("l_quantity", F.lit(5.0)))
    t.upsert(li.limit(200).withColumn("l_quantity", F.lit(6.0)))
    t.clean()
    rb = admin.rollbacks_df(t).collect()
    assert len(rb) == 1 and rb[0]["rolled_back_instant"] == bad
    cl = admin.cleans_df(t).collect()
    assert len(cl) >= 1 and sum(r["files_deleted"] for r in cl) > 0
    wa = admin.write_amplification_df(t)
    assert wa.filter("operation = 'upsert'").count() >= 3
    assert wa.agg(F.sum("records_written")).first()[0] > 0
