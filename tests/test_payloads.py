"""Payload semantics: OverwriteNonDefaultsWithLatest partial updates (COW
write merge, MOR read merge, compaction) and the AWS DMS Op-column flow.

Reference: OverwriteNonDefaultsWithLatestAvroPayload.java:50-75,
AWSDmsTransformer.java:39-51, AWSDmsAvroPayload.java:44-78.
"""

from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, MERGE_ON_READ
from incubator_hudi_spark.config import PAYLOAD_OVERWRITE_NON_DEFAULTS
from incubator_hudi_spark.sources.ingest import aws_dms_transformer


def _orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet")


def _make(spark, path, table_type="COPY_ON_WRITE"):
    t = HudiTable.create(
        spark, path, name="o", recordkey_fields=["o_orderkey"],
        partition_expr="date_format(o_orderdate,'yyyy')",
        precombine_field="o_orderdate", table_type=table_type,
        payload=PAYLOAD_OVERWRITE_NON_DEFAULTS)
    if table_type == MERGE_ON_READ:
        t.cfg = t.cfg.with_(inline_compaction=False)
    return t


def _null_update(o, pred, bump):
    keep = ("o_orderkey", "o_orderdate", "o_totalprice")
    return (o.filter(pred)
            .select(*[(F.col(c) if c in keep
                       else F.lit(None).cast(o.schema[c].dataType).alias(c))
                      for c in o.columns])
            .withColumn("o_totalprice", F.col("o_totalprice") + bump))


def test_partial_update_cow(spark, tmp_table_path):
    o = _orders(spark)
    t = _make(spark, tmp_table_path)
    t.upsert(o)
    t.upsert(_null_update(o, "o_orderkey % 4 = 0", 1000.0))
    snap = t.read()
    assert snap.count() == o.count()
    hit = snap.filter("o_orderkey % 4 = 0")
    assert hit.filter("o_orderstatus IS NULL").count() == 0   # kept stored
    assert hit.filter("o_orderpriority IS NULL").count() == 0
    # price did change
    joined = hit.alias("n").join(o.alias("b"), "o_orderkey")
    assert joined.filter("n.o_totalprice != b.o_totalprice + 1000.0").count() == 0


def test_partial_update_mor_read_and_compaction(spark, tmp_table_path):
    o = _orders(spark)
    t = _make(spark, tmp_table_path, MERGE_ON_READ)
    t.upsert(o)
    t.upsert(_null_update(o, "o_orderkey % 3 = 1", 77.0))
    # second partial update layered on the first (multi-version coalesce)
    t.upsert(_null_update(o, "o_orderkey % 6 = 1", 99.0))
    snap = t.read()
    assert snap.count() == o.count()
    hit = snap.filter("o_orderkey % 3 = 1")
    assert hit.filter("o_orderstatus IS NULL").count() == 0
    # %6=1 keys got the second bump, remaining %3=1 keys the first
    j = snap.alias("n").join(o.alias("b"), "o_orderkey")
    assert j.filter("n.o_orderkey % 6 = 1")\
            .filter("n.o_totalprice != b.o_totalprice + 99.0").count() == 0
    assert j.filter("n.o_orderkey % 3 = 1 AND n.o_orderkey % 6 != 1")\
            .filter("n.o_totalprice != b.o_totalprice + 77.0").count() == 0
    before = snap.orderBy("o_orderkey").collect()
    t.run_compaction()
    after = t.read().orderBy("o_orderkey").collect()
    assert before == after                      # compaction is read-neutral


def test_aws_dms_flow(spark, tmp_table_path):
    o = _orders(spark)
    t = HudiTable.create(
        spark, tmp_table_path, name="o", recordkey_fields=["o_orderkey"],
        partition_expr="date_format(o_orderdate,'yyyy')",
        precombine_field="o_orderdate")
    t.upsert(aws_dms_transformer(o))            # full load adds Op=''
    assert t.read().count() == o.count()
    cdc = (o.filter("o_orderkey % 9 = 4").withColumn("Op", F.lit("D"))
           .unionByName(o.filter("o_orderkey % 9 = 5")
                        .withColumn("o_totalprice", F.lit(1.0))
                        .withColumn("Op", F.lit("U"))))
    t.upsert(aws_dms_transformer(cdc))
    snap = t.read()
    assert snap.filter("o_orderkey % 9 = 4").count() == 0        # deleted
    assert snap.filter("o_orderkey % 9 = 5")\
               .filter("o_totalprice != 1.0").count() == 0       # updated
    exp = o.filter("o_orderkey % 9 != 4").count()
    assert snap.count() == exp


def test_partial_update_with_deletes_and_multiround(spark, tmp_table_path):
    """Partial updates interleaved with hard deletes: a delete wins over any
    coalesce; a later partial update of a deleted key re-inserts only the
    provided fields (stored values are gone)."""
    o = _orders(spark)
    t = _make(spark, tmp_table_path)
    t.upsert(o)
    victims = o.filter("o_orderkey % 10 = 2")
    t.delete(victims)
    assert t.read().filter("o_orderkey % 10 = 2").count() == 0
    # partial "update" of deleted keys: nothing stored to coalesce from →
    # row comes back with nulls in the unset fields
    back = _null_update(o, "o_orderkey % 20 = 2", 1.0)
    t.upsert(back)
    snap = t.read().filter("o_orderkey % 20 = 2")
    assert snap.count() == o.filter("o_orderkey % 20 = 2").count()
    assert snap.filter("o_orderstatus IS NOT NULL").count() == 0


def test_partial_update_respects_event_time_guard(spark, tmp_table_path):
    """DEFAULT-payload precombine guard composes with partial updates: an
    update whose precombine value is OLDER than stored must lose wholesale
    (no field-level mixing with a rejected version)."""
    from incubator_hudi_spark.config import PAYLOAD_DEFAULT
    from pyspark.sql import functions as F
    rows = [(1, "2024-06-01", 100.0, "A"), (2, "2024-06-01", 200.0, "B")]
    df = spark.createDataFrame(rows, "k int, ts string, price double, tag string") \
              .withColumn("ts", F.to_timestamp("ts"))
    t = HudiTable.create(
        spark, tmp_table_path, name="g", recordkey_fields=["k"],
        partition_expr=None, precombine_field="ts", payload=PAYLOAD_DEFAULT)
    t.upsert(df)
    # late-arriving update (older ts): must lose against stored
    late = spark.createDataFrame([(1, "2024-01-01", 1.0, None)],
                                 "k int, ts string, price double, tag string") \
                .withColumn("ts", F.to_timestamp("ts"))
    t.upsert(late)
    row = t.read().filter("k = 1").collect()[0]
    assert row.price == 100.0 and row.tag == "A"


def test_partial_update_never_resurrects_deleted_values_mor(
        spark, tmp_table_path):
    """Finding from review: the coalesce fill must treat a delete as a merge
    barrier — a partial update AFTER a delete must NOT pull field values
    from versions below the delete on the MOR read path, and COW / MOR /
    post-compaction answers must agree."""
    o = _orders(spark)
    t = _make(spark, tmp_table_path, MERGE_ON_READ)
    t.upsert(o)                                       # full rows (c1)
    victims = o.filter("o_orderkey % 10 = 2")
    t.delete(victims)                                 # delete (c2)
    back = _null_update(o, "o_orderkey % 20 = 2", 1.0)
    t.upsert(back)                                    # partial re-insert (c3)
    snap = t.read().filter("o_orderkey % 20 = 2")
    assert snap.count() == o.filter("o_orderkey % 20 = 2").count()
    # pre-delete o_orderstatus must NOT come back on the merged MOR read
    assert snap.filter("o_orderstatus IS NOT NULL").count() == 0
    before = sorted(map(tuple, snap.select(
        "o_orderkey", "o_totalprice", "o_orderstatus").collect()))
    t.run_compaction()
    after = sorted(map(tuple, t.read().filter("o_orderkey % 20 = 2").select(
        "o_orderkey", "o_totalprice", "o_orderstatus").collect()))
    assert before == after                            # compaction-neutral
