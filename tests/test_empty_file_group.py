"""A delete (or compaction of fully-tombstoned logs) that empties a file
group must still produce a new (empty) base-file version — otherwise the
commit manifest has no entry for the group and readers fall back to its
previous, undeleted version.  Found by the randomized workload DAG."""

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

from incubator_hudi_spark import HudiTable

SCHEMA = StructType([
    StructField("k", StringType(), False),
    StructField("p", StringType(), False),
    StructField("v", IntegerType(), False),
])


def _df(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows], SCHEMA)


def _mk(spark, path, **kw):
    return HudiTable.create(spark, path, name="efg", recordkey_fields=["k"],
                            partition_expr="p", precombine_field="v", **kw)


def test_cow_delete_empties_file_group(spark, tmp_table_path):
    t = _mk(spark, tmp_table_path)
    t.upsert(_df(spark, [dict(k="a", p="2024-01", v=1)]))
    # second commit lands "b" in its own file group (fresh partition)
    t.upsert(_df(spark, [dict(k="b", p="2024-02", v=2)]))
    t.delete(_df(spark, [dict(k="b", p="2024-02", v=3)]))
    rows = {(r["k"], r["p"]) for r in t.read().select("k", "p").collect()}
    assert rows == {("a", "2024-01")}
    # deleting the last row of the whole table must also round-trip
    t.delete(_df(spark, [dict(k="a", p="2024-01", v=4)]))
    assert t.read().count() == 0
    # and the table accepts new writes afterwards
    t.upsert(_df(spark, [dict(k="c", p="2024-01", v=5)]))
    assert t.read().count() == 1


def test_mor_compaction_of_fully_tombstoned_group(spark, tmp_table_path):
    t = _mk(spark, tmp_table_path, table_type="MERGE_ON_READ")
    t.cfg = t.cfg.with_(inline_compaction=False)
    t.upsert(_df(spark, [dict(k="a", p="2024-01", v=1),
                         dict(k="b", p="2024-02", v=1)]))
    t.delete(_df(spark, [dict(k="b", p="2024-02", v=2)]))
    assert {r["k"] for r in t.read().select("k").collect()} == {"a"}
    t.run_compaction()
    # after compaction the tombstoned group's base must be (empty-)rewritten,
    # not resurrected from its pre-delete base
    assert {r["k"] for r in t.read().select("k").collect()} == {"a"}
    assert {r["k"] for r in t.read("read_optimized").select("k").collect()} \
        == {"a"}
