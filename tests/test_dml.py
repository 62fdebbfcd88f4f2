"""MERGE INTO / UPDATE / DELETE DML tests — analogue of the reference's
TestMergeIntoTable.scala / TestUpdateTable / TestDeleteTable."""

from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable


def make_orders(spark, path):
    return HudiTable.create(
        spark, path, name="orders",
        recordkey_fields=["o_orderkey"],
        partition_expr="date_format(o_orderdate,'yyyy')",
        precombine_field="o_orderdate")


def test_merge_update_insert_delete(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path)
    t.upsert(orders)
    n0 = t.read().count()

    # source: half existing keys (even → update or delete), plus new keys
    src = (orders.filter("o_orderkey % 2 = 0")
           .withColumn("o_totalprice", F.col("o_totalprice") * 10)
           .unionByName(orders.filter("o_orderkey % 2 = 1")
                        .withColumn("o_orderkey", F.col("o_orderkey") + 1_000_000)))

    t.merge(
        src, on="t.o_orderkey = s.o_orderkey",
        when_matched=[
            ("t.o_orderstatus = 'F'", "__DELETE__"),          # matched & F → delete
            (None, {"o_totalprice": "s.o_totalprice"}),       # else matched → update
        ],
        when_not_matched=[(None, None)],                      # insert source row
    )

    snap = t.read()
    ok = orders.select("o_orderkey", "o_orderstatus", "o_totalprice",
                       F.date_format("o_orderdate", "yyyy").alias("_p")).distinct()
    # deleted: even keys with status F
    deleted = ok.filter("o_orderkey % 2 = 0 and o_orderstatus = 'F'").count()
    inserted = src.filter("o_orderkey > 1000000") \
                  .select("o_orderkey", F.date_format("o_orderdate", "yyyy")) \
                  .distinct().count()
    assert snap.count() == n0 - deleted + inserted
    # updated: even keys, status != F → price * 10
    upd = snap.filter("o_orderkey % 2 = 0 and o_orderkey <= 1000000")
    assert upd.filter("o_orderstatus = 'F'").count() == 0
    joined = upd.select("o_orderkey", "o_totalprice").join(
        orders.select("o_orderkey", F.col("o_totalprice").alias("orig")).distinct(),
        on="o_orderkey")
    assert joined.filter(F.abs(F.col("o_totalprice") - F.col("orig") * 10) > 1e-6).count() == 0
    # inserted rows present
    assert snap.filter("o_orderkey > 1000000").count() == inserted


def test_merge_conditional_insert(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path)
    t.upsert(orders.filter("o_orderkey % 2 = 0"))
    src = orders.filter("o_orderkey % 2 = 1")
    t.merge(src, on="t.o_orderkey = s.o_orderkey",
            when_not_matched=[("s.o_totalprice > 100000", None)])
    snap = t.read()
    exp_ins = (src.filter("o_totalprice > 100000")
               .select("o_orderkey", F.date_format("o_orderdate", "yyyy"))
               .distinct().count())
    assert snap.filter("o_orderkey % 2 = 1").count() == exp_ins


def test_update_where(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path)
    t.upsert(orders)
    t.update({"o_orderpriority": "'0-RUSH'"}, where="o_totalprice > 200000")
    snap = t.read()
    assert snap.filter("o_totalprice > 200000 and o_orderpriority != '0-RUSH'").count() == 0
    assert snap.filter("o_totalprice <= 200000 and o_orderpriority = '0-RUSH'").count() == 0


def test_delete_where(spark, tmp_table_path, orders):
    t = make_orders(spark, tmp_table_path)
    t.upsert(orders)
    n = t.read().count()
    victims = t.read().filter("o_orderstatus = 'O'").count()
    t.delete_where("o_orderstatus = 'O'")
    snap = t.read()
    assert snap.filter("o_orderstatus = 'O'").count() == 0
    assert snap.count() == n - victims
