"""Scale-behavior smoke: on a many-partition table, writes must touch only
the file groups they change (write amplification bounded by the batch, not
the table), reads must resolve from the manifest without rescanning
untouched groups, and driver-side planning must stay O(touched groups).

These invariants are what make the design survive 1000× the data: a 1%
update of a 100 TB table that rewrote every file group would be a full
rewrite; here we pin that only dirty groups get new versions.
"""

import os
import time

from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, MERGE_ON_READ, QUERY_INCREMENTAL

N_PARTS = 240
ROWS = 12_000


def _df(spark):
    return (spark.range(ROWS)
            .select(F.col("id").alias("k"),
                    (F.col("id") % N_PARTS).cast("string").alias("p"),
                    (F.col("id") * 2).alias("v")))


def _make(spark, path, table_type="COPY_ON_WRITE"):
    t = HudiTable.create(spark, path, name="wide",
                         recordkey_fields=["k"], partition_expr="p",
                         precombine_field="v", table_type=table_type)
    if table_type == MERGE_ON_READ:
        t.cfg = t.cfg.with_(inline_compaction=False)
    return t


def _instant_files(t, instant):
    d = t.meta.instant_data_dir(instant)
    out = []
    for root, _dirs, files in os.walk(d):
        out += [f for f in files if f.endswith(".parquet")]
    return out


def test_cow_upsert_touches_only_dirty_groups(spark, tmp_table_path):
    t = _make(spark, tmp_table_path)
    t.bulk_insert(_df(spark))
    n_groups = len(t.view().latest_slices())
    assert n_groups >= N_PARTS  # at least one file group per partition

    # update rows in exactly 3 partitions
    upd = _df(spark).filter(F.col("p").isin("7", "42", "199")) \
                    .withColumn("v", F.col("v") + 1)
    c = t.upsert(upd)
    written = _instant_files(t, c)
    dirty = {sl.file_group for sl in t.view().latest_slices()
             if sl.partition in ("7", "42", "199")}
    assert len(written) == len(dirty), (len(written), len(dirty))

    # incremental pull of that commit reads only the changed rows
    inc = t.read(QUERY_INCREMENTAL, begin=None, end=c).filter(
        F.col("_hoodie_commit_time") == c)
    assert inc.count() == upd.count()


def test_mor_delta_files_bounded_by_batch(spark, tmp_table_path):
    t = _make(spark, tmp_table_path, MERGE_ON_READ)
    t.upsert(_df(spark))
    upd = _df(spark).filter(F.col("p").isin("3", "11")) \
                    .withColumn("v", F.col("v") + 5)
    c = t.upsert(upd)
    written = _instant_files(t, c)
    dirty = {sl.file_group for sl in t.view().latest_slices()
             if sl.partition in ("3", "11")}
    # grouped deltas: the batch writes a few AQE-sized shared files — file
    # count is bounded by the BATCH, not the touched-group count; the
    # manifest still carries one log reference per touched group
    assert 1 <= len(written) <= len(dirty)
    log_refs = sum(len(sl.log_files) for sl in t.view().latest_slices()
                   if sl.partition in ("3", "11"))
    assert log_refs == len(dirty)
    # snapshot still merges correctly
    got = t.read().filter(F.col("p") == "3").select(F.sum("v")).collect()[0][0]
    exp = _df(spark).filter(F.col("p") == "3") \
                    .select(F.sum(F.col("v") + 5)).collect()[0][0]
    assert got == exp


def test_driver_planning_stays_fast_with_many_groups(spark, tmp_table_path):
    t = _make(spark, tmp_table_path)
    t.bulk_insert(_df(spark))
    for i in range(3):  # a few more commits so the timeline has depth
        t.upsert(_df(spark).filter(F.col("k") % 80 == i)
                 .withColumn("v", F.col("v") + i))
    t0 = time.time()
    for _ in range(5):
        view = t.view()
        slices = view.latest_slices()
    per_resolve = (time.time() - t0) / 5
    assert len(slices) >= N_PARTS
    # file-slice resolution over ~240 groups is driver-side metadata work;
    # anything near a second here would be minutes at 100k file groups
    assert per_resolve < 1.0, f"slice resolution too slow: {per_resolve:.2f}s"


def test_point_lookup_skips_files(spark, tmp_table_path):
    """read_keys must open only the files whose key range can hold the
    requested keys.  A non-partitioned GLOBAL_SORT load with a small target
    file size yields many files with DISJOINT key ranges — the layout where
    stats skipping shines (a month-partitioned layout whose every file spans
    the full key space legitimately prunes nothing)."""
    from incubator_hudi_spark import WriteConfig
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    t = HudiTable.create(
        spark, tmp_table_path, name="li",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr=None,                 # non-partitioned
        precombine_field="l_shipdate",
        write_config=WriteConfig(target_file_size_bytes=64 * 1024))
    t.bulk_insert(li)                        # GLOBAL_SORT → sorted, disjoint
    n_files_total = len(t.read().inputFiles())
    assert n_files_total >= 8                # small target → many files
    some = li.limit(5).select("l_orderkey", "l_linenumber").collect()
    keys = [f"l_orderkey:{r[0]},l_linenumber:{r[1]}" for r in some]
    hit = t.read_keys(keys)
    # correctness: same rows as a direct key filter on the full snapshot
    full = t.read().filter(F.col("_hoodie_record_key").isin(keys))
    assert sorted(map(tuple, hit.collect())) == sorted(map(tuple, full.collect()))
    assert hit.count() >= 5
    # pruning: strictly fewer files than the full snapshot scan
    n_hit = len(hit.inputFiles())
    assert n_hit < n_files_total, (n_hit, n_files_total)
    # miss: absent keys → empty, not an error
    assert t.read_keys(["l_orderkey:0,l_linenumber:0"]).count() == 0


def test_column_stats_data_skipping(spark, tmp_table_path):
    """read_filtered prunes file slices by manifest column stats: on a
    shipdate-partitioned layout, an l_orderkey range conjunct skips files
    whose [min,max] cannot match, and the result equals a plain filter."""
    from incubator_hudi_spark import WriteConfig
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    t = HudiTable.create(
        spark, tmp_table_path, name="li",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr=None,
        precombine_field="l_shipdate",
        write_config=WriteConfig(target_file_size_bytes=64 * 1024,
                                 stats_columns=("l_orderkey", "l_shipdate")))
    t.bulk_insert(li)
    # cluster by the NUMERIC column: files then own disjoint l_orderkey
    # ranges (the lexicographic record-key sort of the bulk load does not
    # cluster numbers), which is what the stats skip feeds on
    t.cluster(sort_columns=["l_orderkey"])
    pred = [("l_orderkey", "between", (100, 300))]
    hit = t.read_filtered(pred)
    exp = t.read().filter("l_orderkey between 100 and 300")
    assert sorted(map(tuple, hit.collect())) == sorted(map(tuple, exp.collect()))
    n_hit, n_full = len(hit.inputFiles()), len(t.read().inputFiles())
    assert n_hit < n_full, (n_hit, n_full)
    # conjuncts over columns without collected stats must not skip
    # (conservative): l_quantity is not in stats_columns
    assert t.read_filtered([("l_quantity", ">=", 0.0)]).count() \
        == t.read().count()
    assert len(t.read_filtered([("l_quantity", "<", -1.0)]).inputFiles()) \
        == len(t.read().inputFiles())   # no pruning without stats


def test_zorder_clustering_skips_on_both_columns(spark, tmp_table_path):
    """Z-order layout: after clustering on (l_partkey, l_suppkey), a range
    predicate on EITHER column prunes files — the linear sort would only
    serve its leading column.  Content must be layout-invariant."""
    from incubator_hudi_spark import WriteConfig
    import pytest
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    t = HudiTable.create(
        spark, tmp_table_path, name="li",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr=None,
        precombine_field="l_shipdate",
        write_config=WriteConfig(target_file_size_bytes=48 * 1024,
                                 stats_columns=("l_partkey", "l_suppkey")))
    t.bulk_insert(li)
    before = sorted(map(tuple, t.read().drop("_hoodie_file_name",
                                             "_hoodie_commit_seqno",
                                             "_hoodie_commit_time").collect()))
    t.cluster(sort_columns=["l_partkey", "l_suppkey"], layout="zorder")
    after = sorted(map(tuple, t.read().drop("_hoodie_file_name",
                                            "_hoodie_commit_seqno",
                                            "_hoodie_commit_time").collect()))
    assert before == after                       # layout-only change
    n_total = len(t.read().inputFiles())
    assert n_total >= 8
    lo_p, hi_p = 1, 40
    n_p = len(t.read_filtered([("l_partkey", "between", (lo_p, hi_p))]).inputFiles())
    n_s = len(t.read_filtered([("l_suppkey", "between", (1, 4))]).inputFiles())
    assert n_p < n_total, (n_p, n_total)         # leading column prunes
    assert n_s < n_total, (n_s, n_total)         # AND the second column
    # string columns refuse the curve instead of silently hashing
    with pytest.raises(ValueError):
        t.cluster(sort_columns=["l_returnflag", "l_partkey"], layout="zorder")


def test_mor_compaction_unlocks_data_skipping(spark, tmp_table_path):
    """MOR slices with logs are never skipped (deltas may hold anything);
    compaction rewrites them into stat-carrying base files, after which
    read_filtered prunes again — data skipping degrades gracefully under
    ingest and recovers with the table service."""
    from incubator_hudi_spark import WriteConfig
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    t = HudiTable.create(
        spark, tmp_table_path, name="li",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr=None, precombine_field="l_shipdate",
        table_type=MERGE_ON_READ,
        write_config=WriteConfig(target_file_size_bytes=48 * 1024,
                                 stats_columns=("l_partkey",),
                                 inline_compaction=False))
    t.upsert(li)
    t.cluster(sort_columns=["l_partkey"])       # sorted base layout
    upd = li.filter("l_orderkey % 50 = 9").withColumn("l_quantity", F.lit(3.0))
    t.upsert(upd)                               # dirties slices with deltas
    pred = [("l_partkey", "between", (1, 30))]
    exp = t.read().filter("l_partkey between 1 and 30")
    dirty_files = len(t.read_filtered(pred).inputFiles())
    t.run_compaction()
    clean_files = len(t.read_filtered(pred).inputFiles())
    total = len(t.read().inputFiles())
    assert clean_files < total                   # skipping restored
    assert clean_files <= dirty_files
    got = t.read_filtered(pred)
    exp2 = t.read().filter("l_partkey between 1 and 30")
    assert got.count() == exp2.count()
    assert got.filter("l_orderkey % 50 = 9 AND l_quantity != 3.0").count() == 0
