"""sync_ddl against a REAL Hive metastore (embedded Derby), end-to-end.

VERDICT r5 Next #5: the catalog sync was design-complete but only ever
exercised against Spark's in-memory catalog.  This test spawns a separate
process (spark.sql.catalogImplementation is a static conf — the shared test
session can't switch) whose SparkSession runs `enableHiveSupport()` with an
embedded Derby metastore, then drives the full HiveSyncTool surface
(HiveSyncTool.java:117+): CREATE, ADD PARTITION, SET LOCATION repoint,
ADD COLUMNS, DROP PARTITION, and MOR `_ro`/`_rt` dual registration — and
queries everything back THROUGH the HMS catalog.
"""

import os
import subprocess
import sys

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

_SCRIPT = r"""
import os, sys, tempfile
work = tempfile.mkdtemp(prefix="hms_sync_")
os.chdir(work)                       # derby.log lands here, not in the repo
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.warehouse.dir", os.path.join(work, "wh"))
         .config("javax.jdo.option.ConnectionURL",
                 f"jdbc:derby:;databaseName={work}/metastore_db;create=true")
         .config("spark.ui.enabled", "false")
         .enableHiveSupport().getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.catalogImplementation") == "hive", \
    "test must run against the Hive catalog"

sys.path.insert(0, os.environ["REPO_ROOT"])
from incubator_hudi_spark import HudiTable, MERGE_ON_READ
from incubator_hudi_spark.config import QUERY_READ_OPTIMIZED
from incubator_hudi_spark.sync import sync_ddl

li = spark.read.parquet(os.path.join(os.environ["SF_DIR"], "lineitem.parquet"))
li = li.persist(); li.count()

# ---- COW: create + query-back through HMS --------------------------------
t = HudiTable.create(spark, os.path.join(work, "cow"), "hms_cow",
                     recordkey_fields=["l_orderkey", "l_linenumber"],
                     partition_expr="date_format(l_shipdate,'yyyy-MM')",
                     precombine_field="l_shipdate")
t.upsert(li)
s1 = sync_ddl(t, "hms_cow")
st = s1["tables"]["hms_cow"]
assert st["created"] and st["added"], st
n_engine = t.read().count()
n_hms = spark.sql("SELECT count(*) FROM hms_cow").first()[0]
assert n_hms == n_engine > 0, (n_hms, n_engine)
n_parts = spark.sql("SHOW PARTITIONS hms_cow").count()
assert n_parts == len(st["added"]), (n_parts, st["added"])
# partition pruning works through HMS partition specs
one = spark.sql("SHOW PARTITIONS hms_cow").first()[0].split("=", 1)[1]
n_one_hms = spark.sql(
    f"SELECT count(*) FROM hms_cow WHERE partition_path = '{one}'").first()[0]
n_one_eng = t.read(partitions=[one]).count()
assert n_one_hms == n_one_eng > 0, (n_one_hms, n_one_eng)

# metastore is REALLY Derby-backed HMS, not in-memory
assert os.path.isdir(os.path.join(work, "metastore_db")), "no Derby store"

# ---- new partition + repoint on a later instant ---------------------------
shifted = (li.limit(500)
           .withColumn("l_orderkey", F.col("l_orderkey") + 10_000_000)
           .withColumn("l_shipdate",
                       F.col("l_shipdate") + F.make_dt_interval(F.lit(4000))))
t.upsert(shifted)
s2 = sync_ddl(t, "hms_cow")
st2 = s2["tables"]["hms_cow"]
assert st2["added"], "date-shifted rows must add new HMS partitions"
assert st2["moved"], "existing partitions must repoint to the new manifest"
assert spark.sql("SELECT count(*) FROM hms_cow").first()[0] == t.read().count()

# ---- ADD COLUMNS schema evolution -----------------------------------------
t.add_columns("extra_note STRING")
t.upsert(li.limit(100).withColumn("extra_note", F.lit("hi")))
s3 = sync_ddl(t, "hms_cow")
assert "extra_note" in s3["tables"]["hms_cow"]["new_columns"], s3
assert "extra_note" in [f.name for f in spark.table("hms_cow").schema.fields]
n = spark.sql("SELECT count(*) FROM hms_cow WHERE extra_note = 'hi'").first()[0]
assert n == t.read().filter("extra_note = 'hi'").count() > 0

# ---- DROP PARTITION --------------------------------------------------------
drop_part = sorted(st["added"])[0]
t.delete_partitions([drop_part])
s4 = sync_ddl(t, "hms_cow")
assert drop_part in s4["tables"]["hms_cow"]["dropped"], s4
specs = [r[0].split("=", 1)[1]
         for r in spark.sql("SHOW PARTITIONS hms_cow").collect()]
assert drop_part not in specs
assert spark.sql("SELECT count(*) FROM hms_cow").first()[0] == t.read().count()

# ---- MOR dual registration (_ro table in HMS + _rt view) ------------------
m = HudiTable.create(spark, os.path.join(work, "mor"), "hms_mor",
                     recordkey_fields=["l_orderkey", "l_linenumber"],
                     partition_expr="date_format(l_shipdate,'yyyy-MM')",
                     precombine_field="l_shipdate",
                     table_type=MERGE_ON_READ)
m.cfg = m.cfg.with_(inline_compaction=False)
m.upsert(li)
m.upsert(li.filter("l_linenumber = 1").withColumn("l_quantity", F.lit(55.0)))
s5 = sync_ddl(m, "hms_mor")
assert s5["tables"]["hms_mor_ro"]["created"]
assert s5["tables"]["hms_mor_rt"] == {"view": True}
ro_hms = spark.sql("SELECT count(*) FROM hms_mor_ro").first()[0]
assert ro_hms == m.read(QUERY_READ_OPTIMIZED).count() > 0
rt_hms = spark.sql(
    "SELECT count(*) FROM hms_mor_rt WHERE l_quantity = 55.0").first()[0]
assert rt_hms == m.read().filter("l_quantity = 55.0").count() > 0
# the _ro table must NOT see the un-compacted delta update
assert spark.sql("SELECT count(*) FROM hms_mor_ro WHERE l_quantity = 55.0") \
            .first()[0] == 0

# ---- HMS table survives a NEW session against the same metastore ----------
final_cnt = spark.sql("SELECT count(*) FROM hms_cow").first()[0]
spark.stop()
spark2 = (SparkSession.builder.master("local[4]")
          .config("spark.sql.shuffle.partitions", "8")
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.warehouse.dir", os.path.join(work, "wh"))
          .config("javax.jdo.option.ConnectionURL",
                  f"jdbc:derby:;databaseName={work}/metastore_db;create=true")
          .config("spark.ui.enabled", "false")
          .enableHiveSupport().getOrCreate())
spark2.sparkContext.setLogLevel("ERROR")
assert spark2.catalog.tableExists("hms_cow"), \
    "synced table must persist in the Derby metastore across sessions"
assert spark2.sql("SELECT count(*) FROM hms_cow").first()[0] == final_cnt > 0
print("HMS_SYNC_OK")
"""


@pytest.mark.slow
def test_sync_ddl_against_embedded_derby_hms(tmp_path):
    env = dict(os.environ,
               REPO_ROOT=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))),
               SF_DIR=SF_DIR)
    proc = subprocess.run([sys.executable, "-c", _SCRIPT], env=env,
                          capture_output=True, text=True, timeout=870)
    assert proc.returncode == 0 and "HMS_SYNC_OK" in proc.stdout, (
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}")
