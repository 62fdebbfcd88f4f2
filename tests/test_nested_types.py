"""Nested schema support end-to-end (SURVEY §1.5: the reference test schema
exercises map<string,string>, nested record, and array<record> — our engine
must round-trip and merge them through upsert/delete/MOR/compaction)."""

import os

import pytest
from pyspark.sql import Row, functions as F

from incubator_hudi_spark import MERGE_ON_READ, HudiTable, WriteConfig

SCHEMA = ("id long, ts long, fare struct<amount: double, currency: string>, "
          "tags map<string,string>, "
          "tip_history array<struct<amount: double, note: string>>")


def _rows(spark, version):
    data = [
        (1, version, Row(amount=10.0 + version, currency="USD"),
         {"k": f"v{version}"}, [Row(amount=1.0, note=f"n{version}")]),
        (2, version, Row(amount=20.0 + version, currency="EUR"),
         {"k": "x"}, []),
    ]
    return spark.createDataFrame(data, SCHEMA)


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", MERGE_ON_READ])
def test_nested_roundtrip_and_merge(spark, tmp_path, table_type):
    t = HudiTable.create(
        spark, os.path.join(tmp_path, "nested"), name="nested",
        recordkey_fields=["id"], partition_expr=None,
        precombine_field="ts", table_type=table_type,
        write_config=WriteConfig(inline_compaction=False))
    t.upsert(_rows(spark, 1))
    t.upsert(_rows(spark, 2))          # newer version wins per key
    got = {r["id"]: r for r in t.read().collect()}
    assert got[1]["fare"]["amount"] == 12.0
    assert got[1]["tags"]["k"] == "v2"
    assert got[1]["tip_history"][0]["note"] == "n2"
    assert got[2]["fare"]["currency"] == "EUR"

    if table_type == MERGE_ON_READ:
        t.run_compaction()
        got = {r["id"]: r for r in t.read().collect()}
        assert got[1]["fare"]["amount"] == 12.0 and got[1]["tags"]["k"] == "v2"

    # delete one key; nested columns survive on the remainder
    t.delete(spark.createDataFrame([(1,)], "id long"))
    rows = t.read().collect()
    assert [r["id"] for r in rows] == [2]
    assert rows[0]["fare"]["amount"] == 22.0


def test_nested_incremental_and_filter_pushdown(spark, tmp_path):
    t = HudiTable.create(
        spark, os.path.join(tmp_path, "nested2"), name="nested2",
        recordkey_fields=["id"], partition_expr=None, precombine_field="ts")
    c1 = t.upsert(_rows(spark, 1))
    c2 = t.upsert(_rows(spark, 2).filter("id = 1"))
    inc = t.read("incremental", begin=c1, end=c2)
    assert [r["id"] for r in inc.collect()] == [1]
    # nested field predicate still prunes/pushes on the parquet scan
    assert t.read().filter(F.col("fare.currency") == "EUR").count() == 1
