"""Table version upgrade/downgrade (services/upgrade.py — reference:
hudi-client/hudi-client-common/.../table/upgrade/UpgradeDowngrade.java)."""

from dataclasses import replace

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import timeline as tl
from incubator_hudi_spark.config import CURRENT_TABLE_VERSION
from incubator_hudi_spark.fsview import base_key_range
from incubator_hudi_spark.services.upgrade import (TableVersionError,
                                                   upgrade_table)
from incubator_hudi_spark.table import HudiTable


def _make(spark, path, lineitem):
    t = HudiTable.create(
        spark, path, name="vt",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    t.bulk_insert(lineitem)
    t.upsert(lineitem.filter("l_orderkey % 11 = 0")
             .withColumn("l_quantity", F.lit(50.0)))
    return t


def _stats_present(t):
    slices = t.view().latest_slices()
    return all(base_key_range(sl) is not None for sl in slices), len(slices)


def test_downgrade_then_reopen_auto_upgrades(spark, tmp_table_path, lineitem):
    t = _make(spark, tmp_table_path, lineitem)
    assert t.tc.version == CURRENT_TABLE_VERSION
    ok, n = _stats_present(t)
    assert ok and n > 0
    before = t.read().count()

    # downgrade: manifests lose key ranges, version drops to 1
    assert upgrade_table(t, 1) == 1
    t1 = HudiTable.load(spark, tmp_table_path)
    assert t1.tc.version == 1
    ok, _ = _stats_present(t1)
    assert not ok, "v1 layout must have no per-file key ranges"
    # a v1 table still reads correctly
    assert t1.read().count() == before

    # first write auto-upgrades: ranges backfilled from footers, version 2
    t1.upsert(lineitem.limit(100).withColumn("l_quantity", F.lit(60.0)))
    assert t1.tc.version == CURRENT_TABLE_VERSION
    ok, _ = _stats_present(t1)
    assert ok, "upgrade must backfill every live base file's key range"
    assert t1.read().filter("l_quantity = 60.0").count() > 0


def test_explicit_upgrade_without_write(spark, tmp_table_path, lineitem):
    t = _make(spark, tmp_table_path, lineitem)
    upgrade_table(t, 1)
    t1 = HudiTable.load(spark, tmp_table_path)
    assert upgrade_table(t1) == CURRENT_TABLE_VERSION
    ok, _ = _stats_present(t1)
    assert ok
    # idempotent
    assert upgrade_table(t1) == CURRENT_TABLE_VERSION


def test_newer_table_refused_and_auto_upgrade_off(spark, tmp_table_path,
                                                  lineitem):
    t = _make(spark, tmp_table_path, lineitem)
    t.meta.update_config(replace(t.tc, version=CURRENT_TABLE_VERSION + 1))
    t_new = HudiTable.load(spark, tmp_table_path)
    with pytest.raises(TableVersionError, match="newer"):
        t_new.upsert(lineitem.limit(10))
    # back to v1 with auto_upgrade off → refuse with guidance
    t.meta.update_config(replace(t.tc, version=1))
    t_old = HudiTable.load(spark, tmp_table_path)
    t_old.cfg = t_old.cfg.with_(auto_upgrade=False)
    with pytest.raises(TableVersionError, match="auto_upgrade"):
        t_old.upsert(lineitem.limit(10))
