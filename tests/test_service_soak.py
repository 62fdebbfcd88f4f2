"""Multi-service concurrency soak: continuous ingest with BOTH async
daemons (compaction + clustering) plus auto-clean and auto-archival live,
then an exact snapshot check against a driver-side model.

This is the integration pressure test for the round-5 coherence machinery:
the single-listing batch snapshot, the archival-insensitive cache token,
and the state-chasing plan reads (an async service may transition its
instant between a batch's listing and its metadata read).  Any lost
update, resurrected delete, duplicated key, or crashed batch fails the
final equality check.

Reference behaviors composed here: HoodieStreamingSink.scala:92-119
(async services under a streaming writer), SparkAsyncCompactService.java,
SparkAsyncClusteringService.java, rollback-on-start, auto clean/archive.
"""

import pytest
from pyspark.sql import functions as F

from incubator_hudi_spark import MERGE_ON_READ, HudiTable

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", MERGE_ON_READ])
def test_soak_ingest_with_all_services(spark, tmp_table_path, lineitem,
                                       table_type):
    from incubator_hudi_spark.config import INDEX_INMEMORY
    from incubator_hudi_spark.services.async_clustering import \
        AsyncClusteringService
    from incubator_hudi_spark.services.async_compaction import \
        AsyncCompactionService
    from incubator_hudi_spark.services.clustering import \
        ClusteringUpdateConflict

    t = HudiTable.create(
        spark, tmp_table_path, name="soak",
        recordkey_fields=["l_orderkey", "l_linenumber"],
        partition_expr="date_format(l_shipdate,'yyyy-MM')",
        precombine_field="l_shipdate", table_type=table_type)
    t.cfg = t.cfg.with_(index_type=INDEX_INMEMORY, inline_compaction=False,
                        clean_retain_commits=2,
                        archive_min_commits=3, archive_max_commits=5)

    t.upsert(lineitem)                              # base load
    # driver-side model seeded from the engine's own deduped base snapshot
    # (sidesteps re-deriving preCombine tie-breaks): (okey, lineno, m) → qty
    base = t.read().select(
        "l_orderkey", "l_linenumber",
        F.col("_hoodie_partition_path").alias("m"), "l_quantity").collect()
    model = {(r["l_orderkey"], r["l_linenumber"], r["m"]): r["l_quantity"]
             for r in base}
    keys = [(r["l_orderkey"], r["l_linenumber"], r["m"]) for r in base]

    comp = AsyncCompactionService(t)
    clus = AsyncClusteringService(t)

    def with_conflict_retry(op):
        """Realistic writer loop: a batch racing a pending clustering plan
        is REJECTED — drain the daemon and retry."""
        for _ in range(4):
            try:
                return op()
            except ClusteringUpdateConflict:
                clus.stop(raise_errors=False)
        raise AssertionError("clustering conflict never drained")

    try:
        for i in range(8):
            mod = i % 4
            if mod == 0:                            # spread update
                with_conflict_retry(lambda: t.upsert(
                    lineitem.filter(f"l_orderkey % 5 = {i % 5}")
                    .withColumn("l_quantity", F.lit(1000.0 + i))))
                for k in keys:
                    if k[0] % 5 == i % 5:
                        model[k] = 1000.0 + i
            elif mod == 1:                          # brand-new keys
                shift = 1_000_000 * (i + 1)
                t.upsert(lineitem.filter("l_orderkey % 11 = 3")
                         .withColumn("l_orderkey",
                                     F.col("l_orderkey") + shift)
                         .withColumn("l_quantity", F.lit(7.0 + i)))
                for k in keys:
                    if k[0] % 11 == 3:
                        model[(k[0] + shift, k[1], k[2])] = 7.0 + i
            elif mod == 2:                          # delete a stripe
                with_conflict_retry(lambda: t.delete(
                    lineitem.filter(f"l_orderkey % 13 = {i}")
                    .select("l_orderkey", "l_linenumber", "l_shipdate")))
                for k in keys:
                    if k[0] % 13 == i:
                        model.pop(k, None)
            else:                                   # partition-local update
                with_conflict_retry(lambda: t.upsert(
                    lineitem.filter("date_format(l_shipdate,'MM') = '03'")
                    .withColumn("l_quantity", F.lit(2000.0 + i))))
                for k in keys:
                    if k[2].endswith("-03"):
                        model[k] = 2000.0 + i
            if i % 3 == 0 and table_type == MERGE_ON_READ:
                comp.schedule_and_enqueue()
            if i == 4:
                clus.schedule_and_enqueue(sort_columns=["l_orderkey"])
    finally:
        comp.stop(raise_errors=False)
        clus.stop(raise_errors=False)
    assert not comp.errors, comp.errors
    assert not clus.errors, clus.errors

    got = {(r["l_orderkey"], r["l_linenumber"], r["_hoodie_partition_path"]):
           r["l_quantity"]
           for r in t.read().select("l_orderkey", "l_linenumber",
                                    "_hoodie_partition_path",
                                    "l_quantity").collect()}
    missing = set(model) - set(got)
    extra = set(got) - set(model)
    assert not missing, f"{len(missing)} rows lost, e.g. {sorted(missing)[:3]}"
    assert not extra, f"{len(extra)} resurrected, e.g. {sorted(extra)[:3]}"
    wrong = [k for k in model if got[k] != model[k]]
    assert not wrong, (f"{len(wrong)} stale values, e.g. "
                       f"{[(k, got[k], model[k]) for k in wrong[:3]]}")
    # the aggressive archival settings must have actually archived, and the
    # cache token machinery must have kept batches flowing through it
    assert t.timeline.archived_instants(), "soak never hit archival"
