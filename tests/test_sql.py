"""SQL-string DML surface (sql.py — §2.6 statement router over dml.py).

Each DuckDB-style semantic is asserted via DataFrame state after the
statement, mirroring TestMergeIntoTable.scala / TestInsertTable.scala /
TestDeleteTable.scala at small scale.
"""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark.sql import HudiSqlSession


@pytest.fixture()
def hs(spark, tmp_path):
    hs = HudiSqlSession(spark)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    hs.sql(f"""CREATE TABLE trips USING hudi OPTIONS (
                 primaryKey = 'l_orderkey,l_linenumber',
                 preCombineField = 'l_shipdate',
                 partitionExpr = "date_format(l_shipdate, 'yyyy-MM')"
               ) LOCATION '{tmp_path}/trips'""")
    hs.tables["trips"].bulk_insert(li)
    return hs


def test_create_as_select_and_select(spark, tmp_path, hs):
    hs.sql(f"""CREATE TABLE big USING hudi OPTIONS (
                 primaryKey = 'l_orderkey,l_linenumber'
               ) LOCATION '{tmp_path}/big'
               AS SELECT * FROM trips WHERE l_quantity > 30""")
    n = hs.sql("SELECT count(*) AS n FROM big").collect()[0]["n"]
    exp = hs.sql("SELECT count(*) AS n FROM trips WHERE l_quantity > 30") \
            .collect()[0]["n"]
    assert n == exp > 0


def test_update_delete_where(spark, hs):
    hs.sql("UPDATE trips SET l_quantity = l_quantity + 100 WHERE l_orderkey % 7 = 0")
    assert hs.sql("SELECT count(*) AS n FROM trips WHERE l_quantity > 100") \
             .collect()[0]["n"] > 0
    before = hs.sql("SELECT count(*) AS n FROM trips").collect()[0]["n"]
    hs.sql("DELETE FROM trips WHERE l_orderkey % 7 = 0")
    after = hs.sql("SELECT count(*) AS n FROM trips").collect()[0]["n"]
    assert after < before
    assert hs.sql("SELECT count(*) AS n FROM trips WHERE l_orderkey % 7 = 0") \
             .collect()[0]["n"] == 0


def test_merge_into_full(spark, hs):
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet") \
         .filter("l_orderkey % 10 = 1") \
         .withColumn("l_quantity", F.lit(0.5)) \
         .createOrReplaceTempView("updates")
    hs.sql("""MERGE INTO trips t USING updates u
              ON t.l_orderkey = u.l_orderkey AND t.l_linenumber = u.l_linenumber
                 AND t._hoodie_partition_path = date_format(u.l_shipdate, 'yyyy-MM')
              WHEN MATCHED AND t.l_quantity > 25 THEN DELETE
              WHEN MATCHED THEN UPDATE SET l_quantity = u.l_quantity * 2
              WHEN NOT MATCHED THEN INSERT *""")
    got = hs.sql("SELECT count(*) AS n FROM trips WHERE l_quantity = 1.0") \
            .collect()[0]["n"]
    assert got > 0  # updated branch: 0.5 * 2
    # deleted branch removed the high-quantity matches
    assert hs.sql("""SELECT count(*) AS n FROM trips
                     WHERE l_orderkey % 10 = 1 AND l_quantity > 25""") \
             .collect()[0]["n"] == 0


def test_merge_insert_values_clause(spark, hs):
    hs.sql("""MERGE INTO trips t
              USING (SELECT 999999 AS k, 1 AS ln, DATE'1995-06-01' AS d) s
              ON t.l_orderkey = s.k AND t.l_linenumber = s.ln
              WHEN NOT MATCHED THEN
                INSERT (l_orderkey, l_linenumber, l_shipdate, l_quantity)
                VALUES (s.k, s.ln, s.d, 42.0)""")
    row = hs.sql("SELECT l_quantity FROM trips WHERE l_orderkey = 999999") \
            .collect()
    assert len(row) == 1 and row[0][0] == 42.0


def test_insert_values_and_overwrite(spark, tmp_path, hs):
    cols = [c for c in hs.tables["trips"].read().columns
            if not c.startswith("_hoodie_")]
    assert {"l_orderkey", "l_linenumber"} <= set(cols)
    n0 = hs.sql("SELECT count(*) AS n FROM trips").collect()[0]["n"]
    hs.sql("INSERT INTO trips SELECT * FROM trips WHERE l_orderkey = 1")
    n1 = hs.sql("SELECT count(*) AS n FROM trips").collect()[0]["n"]
    assert n1 > n0  # insert does NOT merge duplicate keys (reference semantics)


def test_truncate(spark, hs):
    hs.sql("TRUNCATE TABLE trips")
    assert hs.sql("SELECT count(*) AS n FROM trips").collect()[0]["n"] == 0


def test_show_commands(spark, tmp_table_path, orders):
    from incubator_hudi_spark.sql import HudiSqlSession
    hs = HudiSqlSession(spark)
    hs.sql(f"""CREATE TABLE showt USING hudi OPTIONS (
                 primaryKey = 'o_orderkey', preCombineField = 'o_orderdate',
                 partitionExpr = \"date_format(o_orderdate,'yyyy')\"
               ) LOCATION '{tmp_table_path}'""")
    t = hs.tables["showt"]
    t.upsert(orders)
    t.savepoint()
    assert hs.sql("SHOW PARTITIONS showt").count() > 0
    assert hs.sql("SHOW COMMITS FROM showt").count() == 1
    assert hs.sql("SHOW SAVEPOINTS showt").count() == 1
    assert hs.sql("SHOW FILES showt").count() > 0
    assert hs.sql("SHOW CLEANS showt").count() == 0


def test_merge_literal_containing_keywords(spark, hs):
    """A string literal containing ' WHEN MATCHED THEN ' must not split the
    clause list; literals containing WHERE/SET must not split UPDATE."""
    hs.sql("""MERGE INTO trips t
              USING (SELECT 888888 AS k, 1 AS ln, DATE'1995-06-01' AS d) s
              ON t.l_orderkey = s.k AND t.l_linenumber = s.ln
              WHEN NOT MATCHED THEN
                INSERT (l_orderkey, l_linenumber, l_shipdate, l_returnflag)
                VALUES (s.k, s.ln, s.d, 'x WHEN MATCHED THEN DELETE y')""")
    row = hs.sql("SELECT l_returnflag FROM trips WHERE l_orderkey = 888888") \
            .collect()
    assert len(row) == 1
    assert row[0][0] == "x WHEN MATCHED THEN DELETE y"
    # UPDATE with keyword-bearing literal in SET and a real WHERE
    hs.sql("""UPDATE trips SET l_returnflag = 'a WHERE b = c SET d'
              WHERE l_orderkey = 888888""")
    row = hs.sql("SELECT l_returnflag FROM trips WHERE l_orderkey = 888888") \
            .collect()
    assert row[0][0] == "a WHERE b = c SET d"
    # DELETE with a literal containing WHERE inside the predicate
    hs.sql("""DELETE FROM trips
              WHERE l_orderkey = 888888 AND l_returnflag != 'no WHERE here'""")
    assert hs.sql("SELECT count(*) AS n FROM trips WHERE l_orderkey = 888888") \
             .collect()[0]["n"] == 0


def test_merge_subquery_source_nested_parens(spark, hs):
    """USING (subquery with nested parens + IN-list + CASE) parses and the
    clause conditions with nested function calls route correctly."""
    hs.sql("""MERGE INTO trips t
              USING (SELECT l_orderkey, l_linenumber, l_shipdate,
                            CASE WHEN l_quantity IN (1, 2, 3)
                                 THEN l_quantity * 10 ELSE 0 END AS bonus
                     FROM trips
                     WHERE l_orderkey IN (SELECT l_orderkey FROM trips
                                          WHERE l_orderkey % 13 = 5)) s
              ON t.l_orderkey = s.l_orderkey
                 AND t.l_linenumber = s.l_linenumber
                 AND t._hoodie_partition_path = date_format(s.l_shipdate, 'yyyy-MM')
              WHEN MATCHED AND coalesce(s.bonus, 0) > 0
                THEN UPDATE SET l_quantity = s.bonus
              WHEN MATCHED THEN UPDATE SET l_quantity = -1""")
    # every key with l_orderkey % 13 = 5 got either bonus or -1
    assert hs.sql("""SELECT count(*) AS n FROM trips
                     WHERE l_orderkey % 13 = 5
                       AND NOT (l_quantity = -1 OR l_quantity >= 10)""") \
             .collect()[0]["n"] == 0
    assert hs.sql("""SELECT count(*) AS n FROM trips
                     WHERE l_orderkey % 13 = 5 AND l_quantity = -1""") \
             .collect()[0]["n"] > 0


def test_sql_comments_stripped_outside_literals(spark, hs):
    """-- and /* */ comments anywhere in the statement are inert, but the
    same character sequences inside string literals are preserved."""
    hs.sql("""MERGE INTO trips t
              -- comment with WHEN MATCHED THEN inside
              USING (SELECT 777777 AS k, 1 AS ln, DATE'1995-06-01' AS d,
                            'keep -- this /* and */ this' AS flag) s
              ON t.l_orderkey = s.k AND t.l_linenumber = s.ln /* on-comment */
              WHEN NOT MATCHED THEN
                INSERT (l_orderkey, l_linenumber, l_shipdate, l_returnflag)
                VALUES (s.k, s.ln, s.d, s.flag)""")
    row = hs.sql("SELECT l_returnflag FROM trips WHERE l_orderkey = 777777") \
            .collect()
    assert row[0][0] == "keep -- this /* and */ this"
    hs.sql("DELETE FROM trips WHERE l_orderkey = 777777 -- trailing comment")
    assert hs.sql("SELECT count(*) AS n FROM trips WHERE l_orderkey = 777777") \
             .collect()[0]["n"] == 0


def test_merge_unparseable_raises(spark, hs):
    import pytest as _pt
    with _pt.raises(ValueError, match="cannot parse MERGE"):
        hs.sql("MERGE INTO trips t SET x = 1")
    with _pt.raises(ValueError, match="bad MERGE clause"):
        hs.sql("""MERGE INTO trips t USING trips s ON t.l_orderkey = s.l_orderkey
                  WHEN MATCHED UPDATE SET l_quantity = 1""")


def test_merge_with_case_expression(spark, hs):
    """CASE WHEN inside a MERGE action or ON condition must not be mistaken
    for statement-level WHEN/THEN clause boundaries."""
    before = hs.sql(
        "SELECT max(l_quantity) FROM trips WHERE l_orderkey = 1"
    ).collect()[0][0]
    hs.sql("""
        MERGE INTO trips t
        USING (SELECT 1 AS k, 999.0 AS q) s
        ON t.l_orderkey = s.k
           AND CASE WHEN s.q > 0 THEN 1 ELSE 0 END = 1
        WHEN MATCHED THEN UPDATE SET
          l_quantity = CASE WHEN s.q > t.l_quantity THEN s.q
                            ELSE t.l_quantity END
    """)
    got = hs.sql(
        "SELECT min(l_quantity) FROM trips WHERE l_orderkey = 1"
    ).collect()[0][0]
    assert got == 999.0 and before != 999.0


def test_alter_drop_partition(spark, hs):
    parts = sorted(r[0] for r in hs.sql(
        "SELECT DISTINCT _hoodie_partition_path FROM trips").collect())
    victim = parts[0]
    before = hs.sql("SELECT count(*) AS n FROM trips").collect()[0]["n"]
    gone = hs.sql(
        f"SELECT count(*) AS n FROM trips "
        f"WHERE _hoodie_partition_path = '{victim}'").collect()[0]["n"]
    assert gone > 0
    hs.sql(f"ALTER TABLE trips DROP PARTITION (dt='{victim}')")
    assert hs.sql("SELECT count(*) AS n FROM trips") \
             .collect()[0]["n"] == before - gone
    assert hs.sql(
        f"SELECT count(*) AS n FROM trips "
        f"WHERE _hoodie_partition_path = '{victim}'").collect()[0]["n"] == 0


def test_update_where_with_case(spark, hs):
    hs.sql("""
        UPDATE trips SET l_returnflag = CASE WHEN l_quantity > 25
                                             THEN 'H' ELSE 'L' END
        WHERE l_orderkey = 3
    """)
    got = {r[0] for r in hs.sql(
        "SELECT DISTINCT l_returnflag FROM trips WHERE l_orderkey = 3"
    ).collect()}
    assert got <= {"H", "L"} and got


def test_backticked_identifiers_in_update_delete(spark, tmp_table_path,
                                                 lineitem):
    """UPDATE/DELETE with a backticked table name must resolve the ORIGINAL
    identifier, not the NUL-masked text (regression: quoted identifiers
    resolved to NUL garbage while MERGE handled them fine)."""
    from incubator_hudi_spark import HudiTable
    t = HudiTable.create(
        spark, tmp_table_path, name="bt",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate")
    t.upsert(lineitem.limit(500))
    sess = HudiSqlSession(spark)
    sess.register("bt", t)
    sess.sql("UPDATE `bt` SET l_quantity = 777.0 WHERE l_linenumber = 1")
    assert t.read().filter("l_quantity = 777.0").count() > 0
    sess.sql("DELETE FROM `bt` WHERE l_quantity = 777.0")
    assert t.read().filter("l_quantity = 777.0").count() == 0
