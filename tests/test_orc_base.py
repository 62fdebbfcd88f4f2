"""ORC base-file format (TableConfig.base_format) — format parity with
parquet across write/read/services.

Reference: HoodieFileFormat.java (PARQUET / ORC / HFILE) +
HoodieTableConfig.BASE_FILE_FORMAT.  Base files honor the configured format;
MOR delta files stay parquet (they replace the reference's
format-independent .log block format)."""

import os

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import (HudiTable, QUERY_INCREMENTAL,
                                  QUERY_READ_OPTIMIZED)


def _mk(spark, path, fmt, **kw):
    return HudiTable.create(
        spark, path, name="li",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", base_format=fmt, **kw)


@pytest.fixture(scope="module")
def li(lineitem):
    return lineitem.limit(3000).cache()


def _same(a, b):
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_cow_orc_matches_parquet_twin(spark, tmp_table_path, li):
    """Identical op sequence on an ORC table and a parquet table yields
    identical snapshots, incrementals, and point lookups."""
    tables = {}
    for fmt in ("parquet", "orc"):
        t = _mk(spark, f"{tmp_table_path}_{fmt}", fmt)
        c1 = t.upsert(li)
        c2 = t.upsert(li.filter("l_linenumber = 1")
                        .withColumn("l_quantity", F.col("l_quantity") + 1000.0))
        tables[fmt] = (t, c1, c2)
    tp, torc = tables["parquet"][0], tables["orc"][0]
    cols = [c for c in tp.read().columns if not c.startswith("_hoodie")]
    _same(tp.read().select(cols), torc.read().select(cols))
    _same(tp.read(QUERY_INCREMENTAL, begin=tables["parquet"][1]).select(cols),
          torc.read(QUERY_INCREMENTAL, begin=tables["orc"][1]).select(cols))
    # physical layout really is ORC
    assert all(f.path.endswith(".orc")
               for sl in torc.view().latest_slices() for f in sl.base_files)
    # manifests carry key ranges + column stats (data-skipping inputs) even
    # though pyarrow exposes no ORC stripe statistics
    stats = [f for sl in torc.view().latest_slices() for f in sl.base_files]
    assert all(s.min_key is not None and s.max_key is not None
               for s in stats if s.num_records)
    keys = sorted(r[0] for r in
                  torc.read().select("_hoodie_record_key").distinct()
                  .limit(5).collect())
    _same(tp.read_keys(keys).select(cols), torc.read_keys(keys).select(cols))


@pytest.mark.slow
def test_mor_orc_services_and_native_read(spark, tmp_table_path, li):
    t = _mk(spark, tmp_table_path, "orc", table_type="MERGE_ON_READ")
    t.bulk_insert(li)
    t.upsert(li.filter("l_linenumber = 2").withColumn("l_comment", F.lit("d")))
    t.delete(li.limit(40).select("l_orderkey", "l_linenumber", "l_shipdate"))
    snap = t.read()
    assert t.read(QUERY_READ_OPTIMIZED).count() == li.count()
    # delta files stay parquet; bases are orc
    slices = t.view().latest_slices()
    assert all(l.path.endswith(".parquet") for sl in slices
               for l in sl.log_files)
    # native Python DataSource reads the mixed layout
    from incubator_hudi_spark import pyds
    pyds.register(spark)
    _same(spark.read.format("hudi_py").load(tmp_table_path), snap)
    # compaction rewrites ORC bases without changing the snapshot
    before = snap.count()
    assert t.run_compaction() is not None
    assert t.read().count() == before
    assert all(not sl.log_files for sl in t.view().latest_slices())


def test_bad_format_rejected(spark, tmp_table_path):
    with pytest.raises(ValueError, match="base file format"):
        _mk(spark, tmp_table_path, "hfile")


def test_orc_codec_translation(spark, tmp_table_path, li):
    """parquet codec names are the config surface; gzip translates to ORC's
    zlib instead of failing inside the DataFrameWriter."""
    from incubator_hudi_spark import WriteConfig
    t = _mk(spark, tmp_table_path, "orc",
            write_config=WriteConfig(parquet_compression="gzip"))
    t.bulk_insert(li.limit(200))
    assert t.read().count() == 200
