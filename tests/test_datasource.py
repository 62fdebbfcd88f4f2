"""``hoodie.*`` option-compatible write_hudi/read_hudi facade
(DataSourceOptions.scala / HoodieSparkSqlWriter.scala / DefaultSource.scala)."""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, read_hudi, write_hudi
from incubator_hudi_spark.fsview import FileSystemView


@pytest.fixture()
def li(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


BASE_OPTS = {
    "hoodie.table.name": "trips",
    "hoodie.datasource.write.recordkey.field": "l_orderkey,l_linenumber",
    "hoodie.spark.partitionpath.expr": "date_format(l_shipdate,'yyyy-MM')",
    "hoodie.datasource.write.precombine.field": "l_shipdate",
}


def test_write_read_roundtrip(spark, tmp_path, li):
    path = str(tmp_path / "t")
    c1 = write_hudi(li, path, {**BASE_OPTS,
                               "hoodie.datasource.write.operation": "bulk_insert"})
    n = read_hudi(spark, path).count()
    assert n == li.count()

    upd = li.limit(200).withColumn("l_quantity", F.lit(321.0))
    c2 = write_hudi(upd, path, BASE_OPTS)  # default operation = upsert
    assert read_hudi(spark, path).filter("l_quantity = 321.0").count() >= 200

    inc = read_hudi(spark, path, {
        "hoodie.datasource.query.type": "incremental",
        "hoodie.datasource.read.begin.instanttime": c1,
        "hoodie.datasource.read.end.instanttime": c2})
    assert inc.count() >= 200
    tt = read_hudi(spark, path, {
        "hoodie.datasource.read.as.of.instant": c1})
    assert tt.filter("l_quantity = 321.0").count() == 0


def test_mor_and_config_options(spark, tmp_path, li):
    path = str(tmp_path / "t")
    opts = {**BASE_OPTS,
            "hoodie.datasource.write.table.type": "MERGE_ON_READ",
            "hoodie.parquet.max.file.size": str(8 * 1024 * 1024),
            "hoodie.compact.inline": "false"}
    write_hudi(li, path, opts)
    write_hudi(li.limit(300).withColumn("l_quantity", F.lit(9.5)), path, opts)
    t = HudiTable.load(spark, path)
    assert t.tc.table_type == "MERGE_ON_READ"
    assert any(sl.log_files for sl in FileSystemView(t.meta).latest_slices())
    ro = read_hudi(spark, path, {"hoodie.datasource.query.type": "read_optimized"})
    assert ro.filter("l_quantity = 9.5").count() == 0
    snap = read_hudi(spark, path)
    assert snap.filter("l_quantity = 9.5").count() >= 300


def test_partitionpath_field_and_hive_style(spark, tmp_path, li):
    path = str(tmp_path / "t")
    opts = {"hoodie.table.name": "x",
            "hoodie.datasource.write.recordkey.field": "l_orderkey,l_linenumber",
            "hoodie.datasource.write.partitionpath.field": "l_returnflag",
            "hoodie.datasource.write.hive_style_partitioning": "true",
            "hoodie.datasource.write.operation": "bulk_insert"}
    write_hudi(li, path, opts)
    t = HudiTable.load(spark, path)
    parts = FileSystemView(t.meta).partitions()
    assert all(p.startswith("l_returnflag=") for p in parts) and len(parts) >= 2


def test_delete_partition_and_errors(spark, tmp_path, li):
    path = str(tmp_path / "t")
    opts = {**BASE_OPTS, "hoodie.datasource.write.operation": "bulk_insert"}
    write_hudi(li, path, opts)
    t = HudiTable.load(spark, path)
    victim = FileSystemView(t.meta).partitions()[0]
    write_hudi(li.limit(1), path, {
        **BASE_OPTS, "hoodie.datasource.write.operation": "delete_partition",
        "hoodie.datasource.write.partitions.to.delete": victim})
    assert victim not in FileSystemView(t.meta).partitions()

    with pytest.raises(ValueError):
        write_hudi(li, str(tmp_path / "e"), {
            **BASE_OPTS, "hoodie.datasource.write.operation": "nope"})
    with pytest.raises(ValueError):
        write_hudi(li, str(tmp_path / "e2"), {
            **BASE_OPTS,
            "hoodie.datasource.write.payload.class": "com.example.Custom"})
