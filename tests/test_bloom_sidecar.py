"""Bloom sidecar (second-stage point-lookup pruning) — reference BLOOM
index's footer blooms re-expressed as a metadata sidecar (bloom.py)."""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import HudiTable, WriteConfig
from incubator_hudi_spark.bloom import (load_blooms, might_contain,
                                        positions_py)
from incubator_hudi_spark.config import SORT_NONE


def make_hash_layout_table(spark, path, lineitem):
    """SORT_NONE bulk load with tiny files → many file groups whose key
    RANGES all overlap (range pruning is useless) — the bloom's home turf."""
    t = HudiTable.create(
        spark, path, name="li",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr=None, precombine_field="l_shipdate",
        write_config=WriteConfig(target_file_size_bytes=16 * 1024))
    # round-robin shuffle first: the source parquet is key-ordered, so even
    # SORT_NONE would otherwise produce chunked (prunable) ranges
    t.bulk_insert(lineitem.repartition(24), sort_mode=SORT_NONE)
    return t


def test_bloom_membership_roundtrip(spark, tmp_table_path, lineitem):
    """JVM-built bitsets agree with the driver-side hash mirror: every
    stored key tests positive; absent keys are mostly negative."""
    t = make_hash_layout_table(spark, tmp_table_path, lineitem)
    assert t.build_bloom_index() is not None
    blooms = load_blooms(t.meta)
    slices = t.view().latest_slices()
    assert len(blooms) == len(slices) > 5
    some = (t.read().select("_hoodie_record_key", "_hoodie_file_name")
            .limit(300).collect())
    for r in some:
        bi, m, k, bits = blooms[r[1]]
        assert might_contain(bits, m, k, r[0]), "stored key must test positive"
    fp = sum(1 for fg, (bi, m, k, bits) in blooms.items()
             if might_contain(bits, m, k, "l_orderkey:nope,l_linenumber:0"))
    assert fp <= max(2, len(blooms) // 5), "absent key should rarely pass"


def test_bloom_prunes_where_ranges_cannot(spark, tmp_table_path, lineitem):
    t = make_hash_layout_table(spark, tmp_table_path, lineitem)
    row = (t.read().select("l_orderkey", "l_linenumber",
                           "_hoodie_record_key").first())
    key = row["_hoodie_record_key"]
    range_only = t.read_keys([key])
    n_range = len(range_only.inputFiles())
    assert range_only.count() >= 1
    t.build_bloom_index()
    with_bloom = t.read_keys([key])
    n_bloom = len(with_bloom.inputFiles())
    assert with_bloom.count() == range_only.count()
    assert set(r["l_orderkey"] for r in with_bloom.collect()) == \
        set(r["l_orderkey"] for r in range_only.collect())
    assert n_bloom < n_range, \
        f"bloom must prune overlap-range files ({n_bloom} !< {n_range})"


def test_stale_bloom_never_hides_rows(spark, tmp_table_path, lineitem):
    """A file group rewritten AFTER the sidecar build carries new keys the
    old bloom doesn't know; the base-instant guard must keep that slice."""
    t = make_hash_layout_table(spark, tmp_table_path, lineitem)
    t.build_bloom_index()
    # rewrite: upsert a brand-new key (routes into a new or existing group)
    fresh = (lineitem.limit(1)
             .withColumn("l_orderkey", F.lit(99_999_991))
             .withColumn("l_linenumber", F.lit(1))
             .withColumn("l_quantity", F.lit(123.0)))
    t.upsert(fresh)
    key = "l_orderkey:99999991,l_linenumber:1"
    got = t.read_keys([key]).collect()
    assert len(got) == 1 and got[0]["l_quantity"] == 123.0
    # refresh → pruning returns and still finds the key
    t.build_bloom_index()
    got = t.read_keys([key]).collect()
    assert len(got) == 1


def test_positions_deterministic():
    a = positions_py("k1", 1 << 12, 7)
    assert a == positions_py("k1", 1 << 12, 7)
    assert a != positions_py("k2", 1 << 12, 7)
    assert all(0 <= p < (1 << 12) for p in a)


def test_bloom_bounds_small_upsert_rewrite_set(spark, tmp_table_path, lineitem):
    """On the hash layout, a 3-key delete with blooms must rewrite far fewer
    file groups than range pruning alone allows (ranges all overlap)."""
    import os
    t = make_hash_layout_table(spark, tmp_table_path, lineitem)
    n_groups = len(t.view().latest_slices())
    # MID-RANGE keys: almost every file's random-key range spans the median,
    # so range pruning alone cannot help (extreme-low/high keys it could)
    from pyspark.sql.window import Window
    ranked = (lineitem.select("l_orderkey", "l_linenumber").distinct()
              .withColumn("_rn", F.row_number().over(
                  Window.orderBy("l_orderkey", "l_linenumber"))))
    n_keys = ranked.count()
    victims = ranked.filter(F.col("_rn").between(n_keys // 2, n_keys // 2 + 2))

    def n_rewritten(inst):
        d = t.meta.instant_data_dir(inst)
        return sum(1 for x in os.listdir(d) if x.startswith("_fg="))

    # without blooms: ranges overlap → nearly the whole table rewrites
    c1 = t.delete(lineitem.join(victims.select("l_orderkey", "l_linenumber"),
                                ["l_orderkey", "l_linenumber"], "left_semi"))
    wide = n_rewritten(c1)
    assert wide > n_groups // 2
    t.build_bloom_index()
    more = ranked.filter(F.col("_rn").between(n_keys // 3, n_keys // 3 + 2))
    c2 = t.delete(lineitem.join(more.select("l_orderkey", "l_linenumber"),
                                ["l_orderkey", "l_linenumber"], "left_semi"))
    narrow = n_rewritten(c2)
    assert narrow < max(8, wide // 4), f"bloom should bound rewrites ({narrow} vs {wide})"
    # and nothing was lost
    assert t.read().join(more.select("l_orderkey", "l_linenumber"),
                         ["l_orderkey", "l_linenumber"], "left_semi").count() == 0
    n_exp = (lineitem.join(victims.unionByName(more)
                           .select("l_orderkey", "l_linenumber").distinct(),
                           ["l_orderkey", "l_linenumber"], "left_anti").count())
    assert t.read().count() == n_exp


def test_incremental_sidecar_refresh_carries_valid_blooms(spark, tmp_table_path, lineitem):
    """Rebuilding blooms for ONE commit's slices must keep still-valid
    blooms of untouched groups (partial refresh never drops coverage)."""
    t = make_hash_layout_table(spark, tmp_table_path, lineitem)
    t.build_bloom_index()
    n_before = len(load_blooms(t.meta))
    assert n_before > 5
    # touch a few groups
    one = (lineitem.orderBy("l_orderkey", "l_linenumber").limit(5)
           .withColumn("l_quantity", F.lit(77.0)))
    c = t.upsert(one)
    # refresh only the slices rebased at c
    t.build_bloom_index(instant_time=c)
    blooms = load_blooms(t.meta)
    cur = {sl.file_group: sl.base_instant for sl in t.view().latest_slices()}
    fresh = [fg for fg, (bi, *_rest) in blooms.items() if cur.get(fg) == bi]
    # every live group is covered by a FRESH bloom again
    assert set(fresh) == set(cur)
