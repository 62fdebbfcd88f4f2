"""Metastore-level catalog sync (sync_ddl) — partition DDL + manifest layer.

Reference behaviors mirrored: HiveSyncTool.syncHoodieTable (create table,
syncSchema ADD COLUMNS, syncPartitions add/update/drop), MOR dual-table
registration (_ro real table, _rt realtime view)."""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, WriteConfig
from incubator_hudi_spark.config import MERGE_ON_READ
from incubator_hudi_spark.sync import enable_auto_sync, sync_ddl


def _orders_table(spark, path, **kw):
    return HudiTable.create(
        spark, path, name="orders_sync",
        recordkey_fields=["o_orderkey"],
        partition_expr="o_orderpriority",
        precombine_field="o_orderdate",
        **kw)


def _data_cols(df):
    return [c for c in df.columns if not c.startswith("_hoodie")]


def test_sync_ddl_snapshot_correct_despite_old_versions(
        spark, tmp_table_path, orders):
    """External catalog table reads the exact snapshot even though the
    upserted table retains superseded file versions on disk (the manifest
    layer links only the latest slices — plain path-scan would double-read)."""
    t = _orders_table(spark, tmp_table_path)
    t.bulk_insert(orders)
    # update a slice so an old base-file version remains on disk
    upd = orders.limit(500).withColumn("o_comment", F.lit("synced"))
    t.upsert(upd)

    res = sync_ddl(t, name="t_sync_cow")
    assert res["tables"]["t_sync_cow"]["created"]
    ext = spark.table("t_sync_cow")
    snap = t.read()
    assert ext.count() == snap.count()          # no duplicate versions
    a = ext.select(*_data_cols(snap))
    b = snap.select(*_data_cols(snap))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # partition DDL half: SHOW PARTITIONS == live partitions
    parts = {r[0].split("=", 1)[1]
             for r in spark.sql("SHOW PARTITIONS t_sync_cow").collect()}
    live = {r[0] for r in snap.select("_hoodie_partition_path")
            .distinct().collect()}
    assert parts == live
    spark.sql("DROP TABLE IF EXISTS t_sync_cow")


def test_resync_moves_partitions_and_drops_gone(spark, tmp_table_path, orders):
    t = _orders_table(spark, tmp_table_path)
    t.bulk_insert(orders)
    sync_ddl(t, name="t_sync_resync")
    n_parts = spark.sql("SHOW PARTITIONS t_sync_resync").count()

    t.delete_partitions(["1-URGENT"])
    t.upsert(orders.filter("o_orderpriority = '2-HIGH'").limit(100)
             .withColumn("o_comment", F.lit("v2")))
    res = sync_ddl(t, name="t_sync_resync")
    st = res["tables"]["t_sync_resync"]
    assert not st["created"]                      # incremental DDL, no recreate
    assert "1-URGENT" in st["dropped"]
    assert "2-HIGH" in st["moved"]               # repointed to new manifest
    assert spark.sql("SHOW PARTITIONS t_sync_resync").count() == n_parts - 1
    ext = spark.table("t_sync_resync")
    snap = t.read()
    assert ext.count() == snap.count()
    assert ext.filter("o_orderpriority = '1-URGENT'").count() == 0
    spark.sql("DROP TABLE IF EXISTS t_sync_resync")


def test_schema_evolution_add_columns(spark, tmp_table_path, orders):
    t = _orders_table(spark, tmp_table_path)
    t.bulk_insert(orders.limit(1000))
    sync_ddl(t, name="t_sync_evolve")
    t.upsert(orders.limit(10).withColumn("o_flag", F.lit("new")))
    res = sync_ddl(t, name="t_sync_evolve")
    assert res["tables"]["t_sync_evolve"]["new_columns"] == ["o_flag"]
    ext = spark.table("t_sync_evolve")
    assert "o_flag" in ext.columns
    assert ext.filter("o_flag = 'new'").count() == 10
    # pre-evolution rows read as NULL through the catalog table
    assert ext.filter("o_flag IS NULL").count() == ext.count() - 10
    spark.sql("DROP TABLE IF EXISTS t_sync_evolve")


def test_mor_dual_registration(spark, tmp_table_path, orders):
    t = _orders_table(spark, tmp_table_path, table_type=MERGE_ON_READ)
    t.bulk_insert(orders.limit(2000))
    t.upsert(orders.limit(300).withColumn("o_comment", F.lit("delta")))
    res = sync_ddl(t, name="t_sync_mor")
    assert set(res["tables"]) == {"t_sync_mor_ro", "t_sync_mor_rt"}
    ro = spark.table("t_sync_mor_ro")
    # _ro = base files only: the delta is not visible (reference _ro parity)
    assert ro.filter("o_comment = 'delta'").count() == 0
    rt = spark.table("t_sync_mor_rt")      # realtime view: merged
    assert rt.filter("o_comment = 'delta'").count() == 300
    assert rt.count() == t.read().count()
    spark.sql("DROP TABLE IF EXISTS t_sync_mor_ro")


def test_multi_column_partition_values(spark, tmp_table_path, orders):
    t = HudiTable.create(
        spark, tmp_table_path, name="orders_mc",
        recordkey_fields=["o_orderkey"],
        partition_expr="concat_ws('/', date_format(o_orderdate,'yyyy'), "
                       "date_format(o_orderdate,'MM'))",
        precombine_field="o_orderdate")
    t.bulk_insert(orders.limit(3000))
    sync_ddl(t, name="t_sync_mc", partition_columns=["year", "month"])
    ext = spark.table("t_sync_mc")
    assert {"year", "month"} <= set(ext.columns)
    # partition pruning works on the extracted columns
    got = ext.filter("year = '1995' AND month = '03'") \
             .select("o_orderkey").count()
    want = t.read().filter("_hoodie_partition_path = '1995/03'").count()
    assert got == want
    spark.sql("DROP TABLE IF EXISTS t_sync_mc")


def test_auto_sync_commit_callback(spark, tmp_table_path, orders):
    t = _orders_table(spark, tmp_table_path)
    enable_auto_sync(t, name="t_sync_auto")
    t.bulk_insert(orders.limit(1000))
    assert spark.catalog.tableExists("t_sync_auto")
    before = spark.table("t_sync_auto").count()
    t.upsert(orders.limit(1500))                  # 500 new keys
    assert spark.table("t_sync_auto").count() == t.read().count() != before
    spark.sql("DROP TABLE IF EXISTS t_sync_auto")


def test_sanitize_collision_partitions_stay_distinct(spark, tmp_table_path,
                                                     orders):
    """Partition paths that sanitize to the same string ('X/1' vs 'X_1')
    must get distinct manifest dirs — merged dirs would double-read."""
    t = HudiTable.create(
        spark, tmp_table_path, name="orders_coll",
        recordkey_fields=["o_orderkey"],
        partition_expr="CASE WHEN o_orderkey % 2 = 0 THEN 'X/1' "
                       "ELSE 'X_1' END",
        precombine_field="o_orderdate")
    t.bulk_insert(orders.limit(1000))
    sync_ddl(t, name="t_sync_coll",
             partition_value_extractor=lambda p: [p])
    ext = spark.table("t_sync_coll")
    assert ext.count() == t.read().count()
    snap = t.read()
    for p in ("X/1", "X_1"):
        want = snap.filter(f"_hoodie_partition_path = '{p}'").count()
        got = ext.filter(f"partition_path = '{p}'").count()
        assert got == want, (p, got, want)
    spark.sql("DROP TABLE IF EXISTS t_sync_coll")


def test_resync_same_instant_issues_no_partition_ddl(spark, tmp_table_path,
                                                     orders):
    t = _orders_table(spark, tmp_table_path)
    t.bulk_insert(orders.limit(1000))
    first = sync_ddl(t, name="t_sync_idem")
    assert first["tables"]["t_sync_idem"]["created"]
    again = sync_ddl(t, name="t_sync_idem")
    st = again["tables"]["t_sync_idem"]
    assert st["moved"] == [] and st["added"] == [] and st["dropped"] == []
    # a new commit moves the manifest → partitions repoint again
    t.upsert(orders.limit(50).withColumn("o_comment2", F.lit("x")))
    moved = sync_ddl(t, name="t_sync_idem")["tables"]["t_sync_idem"]["moved"]
    assert moved
    assert spark.table("t_sync_idem").count() == t.read().count()
    spark.sql("DROP TABLE IF EXISTS t_sync_idem")


def test_multilevel_path_single_declared_column(spark, tmp_table_path,
                                                orders):
    """Default sync (one partition_path column) must accept multi-level
    partition paths like yyyy/MM — the whole path is the column's value."""
    from incubator_hudi_spark.sync import sync_ddl
    t = HudiTable.create(
        spark, tmp_table_path, name="ml_sync",
        recordkey_fields=["o_orderkey"],
        partition_expr="date_format(o_orderdate,'yyyy/MM')",
        precombine_field="o_orderdate")
    t.upsert(orders.limit(300))
    out = sync_ddl(t, name="ml_sync_t")
    assert out["tables"]
    got = spark.sql("SELECT count(*) AS n FROM ml_sync_t").first()["n"]
    assert got == t.read().count()
    parts = {r[0] for r in
             spark.sql("SHOW PARTITIONS ml_sync_t").collect()}
    assert all("%2F" in p or "/" in p or "-" in p for p in parts)
    spark.sql("DROP TABLE IF EXISTS ml_sync_t")


def test_prune_keeps_other_names_manifests(spark, tmp_table_path, orders):
    """The same table synced under two catalog names at different instants:
    pruning after the second sync must keep the first name's manifest dirs
    (its partition locations still point there)."""
    from incubator_hudi_spark.sync import sync_ddl
    t = _orders_table(spark, tmp_table_path)
    t.upsert(orders.limit(300))
    sync_ddl(t, name="sync_name_a")
    n_a = spark.sql("SELECT count(*) AS n FROM sync_name_a").first()["n"]
    t.upsert(orders.limit(100).withColumn("o_comment", F.lit("x")))
    sync_ddl(t, name="sync_name_b")
    # name_a was NOT re-synced; its locations must still resolve
    assert spark.sql("SELECT count(*) AS n FROM sync_name_a").first()["n"] \
        == n_a
    spark.sql("DROP TABLE IF EXISTS sync_name_a")
    spark.sql("DROP TABLE IF EXISTS sync_name_b")


def test_declared_real_column_still_validates(spark, tmp_table_path, orders):
    """A REAL declared partition column over a mismatched multi-level path
    must still raise (year='2024/07' silently matching nothing is worse)."""
    from incubator_hudi_spark.sync import sync_ddl
    t = HudiTable.create(
        spark, tmp_table_path, name="strict_sync",
        recordkey_fields=["o_orderkey"],
        partition_expr="date_format(o_orderdate,'yyyy/MM')",
        precombine_field="o_orderdate")
    t.upsert(orders.limit(200))
    with pytest.raises(ValueError, match="segments"):
        sync_ddl(t, name="strict_sync_t", partition_columns=["year"])
