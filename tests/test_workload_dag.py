"""Randomized workload-DAG test — the engine analogue of the reference's
hudi-integ-test suite (hudi-integ-test/.../testsuite/dag/nodes/: InsertNode,
UpsertNode, DeleteNode, CompactNode, ClusteringNode, RollbackNode,
ValidateDatasetNode): apply a seeded random op sequence and validate the full
table state against a driver-side model after EVERY op (stronger than the
reference's ValidateDatasetNode, which compares against the input dataset).

Model semantics mirror the engine's contracts:
  - record identity (k, p); precombine `v` max-wins within a batch;
    OverwriteWithLatest across batches (incoming always replaces stored);
  - delete removes the key; delete of an absent key is a no-op;
  - insert_overwrite replaces exactly the partitions present in the batch;
  - delete_partitions drops whole partitions (replacecommit);
  - rollback of the latest commit restores the previous state;
  - compaction / clustering / cleaning never change query results.
"""

import random

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

from incubator_hudi_spark import QUERY_INCREMENTAL, HudiTable

pytestmark = pytest.mark.slow

PARTS = ["2024-01", "2024-02", "2024-03"]
KEYS = [f"k{i:03d}" for i in range(40)]

SCHEMA = StructType([
    StructField("k", StringType(), False),
    StructField("p", StringType(), False),
    StructField("v", IntegerType(), False),
    StructField("payload", StringType(), True),
])


def _df(spark, rows):
    return spark.createDataFrame([Row(**r) for r in rows], SCHEMA)


def _snapshot(table):
    return {(r["k"], r["p"]): (r["v"], r["payload"])
            for r in table.read().select("k", "p", "v", "payload").collect()}


def _batch(rng, seq):
    """Random batch with unique (k, p) per batch → deterministic model."""
    n = rng.randint(1, 15)
    picked = rng.sample([(k, p) for k in KEYS for p in PARTS], n)
    return [dict(k=k, p=p, v=seq, payload=f"s{seq}-{k}") for k, p in picked]


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
@pytest.mark.parametrize("seed", [7, 46474747])
def test_random_workload_dag(spark, tmp_table_path, table_type, seed):
    rng = random.Random(seed)
    t = HudiTable.create(spark, tmp_table_path, name="dag",
                         recordkey_fields=["k"], partition_expr="p",
                         precombine_field="v", table_type=table_type)
    t.cfg = t.cfg.with_(inline_compaction=False)

    model: dict = {}
    history: list[tuple[str, dict]] = []   # (instant, model AFTER the commit)
    seq = 0

    def commit_model(instant):
        history.append((instant, dict(model)))

    ops = ["upsert", "upsert", "upsert", "delete", "reinsert",
           "insert_overwrite",
           "delete_partitions", "rollback", "compact_or_cluster", "clean",
           "savepoint", "restore"]
    recently_deleted: list[tuple[str, str]] = []
    savepoints: list[tuple[str, str, dict]] = []  # (sp_time, at_inst, model)
    # first op must populate the table
    seq += 1
    rows = _batch(rng, seq)
    commit_model_instant = t.upsert(_df(spark, rows))
    for r in rows:
        model[(r["k"], r["p"])] = (r["v"], r["payload"])
    commit_model(commit_model_instant)
    assert _snapshot(t) == model

    for step in range(14):
        op = rng.choice(ops)
        seq += 1
        if op == "upsert":
            rows = _batch(rng, seq)
            inst = t.upsert(_df(spark, rows))
            for r in rows:
                model[(r["k"], r["p"])] = (r["v"], r["payload"])
            commit_model(inst)
        elif op == "delete":
            targets = rng.sample(sorted(model) or [("k000", PARTS[0])],
                                 min(len(model), rng.randint(1, 6))) \
                if model else []
            if not targets:
                continue
            keys = [dict(k=k, p=p, v=seq, payload=None) for k, p in targets]
            inst = t.delete(_df(spark, keys))
            for k, p in targets:
                model.pop((k, p), None)
            recently_deleted.extend(targets)
            commit_model(inst)
        elif op == "reinsert":
            # deliberately resurrect deleted keys: a delete row in a MOR log
            # must lose to this NEWER version on merged reads (regression:
            # delete ranked above commit time made these keys vanish)
            if not recently_deleted:
                continue
            targets = recently_deleted[-rng.randint(1, len(recently_deleted)):]
            rows = [dict(k=k, p=p, v=seq, payload=f"re{seq}-{k}")
                    for k, p in targets]
            inst = t.upsert(_df(spark, rows))
            for r in rows:
                model[(r["k"], r["p"])] = (r["v"], r["payload"])
            recently_deleted.clear()
            commit_model(inst)
        elif op == "insert_overwrite":
            rows = _batch(rng, seq)
            inst = t.insert_overwrite(_df(spark, rows))
            hit = {r["p"] for r in rows}
            for k, p in list(model):
                if p in hit:
                    del model[(k, p)]
            for r in rows:
                model[(r["k"], r["p"])] = (r["v"], r["payload"])
            commit_model(inst)
        elif op == "delete_partitions":
            part = rng.choice(PARTS)
            live = {p for _, p in model}
            if part not in live:
                continue
            inst = t.delete_partitions([part])
            for k, p in list(model):
                if p == part:
                    del model[(k, p)]
            commit_model(inst)
        elif op == "rollback":
            if len(history) < 2:
                continue
            inst, _ = history[-1]
            try:
                t.rollback(inst)
            except ValueError:
                continue    # a service instant landed after it — not latest
            history.pop()
            model = dict(history[-1][1])
        elif op == "compact_or_cluster":
            if table_type == "MERGE_ON_READ" and rng.random() < 0.7:
                t.run_compaction()
            else:
                t.cluster(sort_columns=["k"])
            # table services must not change query results (no model change;
            # they add non-data instants, so rollback history stays aligned)
        elif op == "clean":
            t.clean()
            # cleaning removes obsolete file versions only — query results
            # (and savepointed snapshots, per cleaning.py's retention
            # contract) must be unaffected
        elif op == "savepoint":
            savepoints.append((t.savepoint(), history[-1][0], dict(model)))
        elif op == "restore":
            if not savepoints:
                continue
            sp, at, saved = savepoints.pop()   # latest → engine accepts
            t.restore(sp)
            t.delete_savepoint(sp)             # consumed — stop pinning
            history = [(i, m) for i, m in history if i <= at]
            model = dict(saved)
        assert _snapshot(t) == model, f"step {step} op {op} diverged"

    # final sanity: time travel to every recorded commit replays history
    for inst, snap in history[-3:]:
        got = {(r["k"], r["p"]): (r["v"], r["payload"])
               for r in t.read(as_of=inst)
               .select("k", "p", "v", "payload").collect()}
        assert got == snap, f"time travel to {inst} diverged"

    # incremental consistency: between adjacent surviving commits the
    # change stream is exactly the keys whose model value changed (deletes
    # and replaced partitions simply don't appear — reference semantics)
    for (a, ma), (b, mb) in zip(history[-4:-1], history[-3:]):
        expect = {kp: v for kp, v in mb.items() if ma.get(kp) != v}
        got = {(r["k"], r["p"]): (r["v"], r["payload"])
               for r in t.read(QUERY_INCREMENTAL, begin=a, end=b)
               .select("k", "p", "v", "payload").collect()}
        assert got == expect, f"incremental ({a}, {b}] diverged"


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_random_workload_event_time_guard(spark, tmp_table_path, table_type):
    """DEFAULT-payload DAG: random LATE-ARRIVING updates (precombine `v` may
    be lower than stored) must lose to the stored version — the event-time
    ordering guard (DefaultHoodieRecordPayload.java:41,93).  This payload
    disables the COW anti-join fast lane, so the randomized sequence drives
    the general window-merge lane.

    Model: absent key → insert; present key → replace iff v_new >= v_stored
    (ties: newer commit wins).  Deletes and re-inserts always carry the
    current max ordering value so COW and MOR agree (a lower-ordered delete
    or post-delete update is reference-ambiguous between table types)."""
    from incubator_hudi_spark.config import PAYLOAD_DEFAULT
    rng = random.Random(20260814)
    t = HudiTable.create(spark, tmp_table_path, name="dag_guard",
                         recordkey_fields=["k"], partition_expr="p",
                         precombine_field="v", table_type=table_type,
                         payload=PAYLOAD_DEFAULT)
    t.cfg = t.cfg.with_(inline_compaction=False)

    model: dict = {}
    seq = 100            # strictly above any random v
    recently_deleted: list[tuple[str, str]] = []

    def apply_upsert(rows):
        inst = t.upsert(_df(spark, rows))
        for r in rows:
            kp = (r["k"], r["p"])
            if kp not in model or r["v"] >= model[kp][0]:
                model[kp] = (r["v"], r["payload"])
        return inst

    # seed
    seq += 1
    rows = [dict(k=k, p=p, v=seq, payload=f"s{seq}-{k}")
            for k, p in rng.sample([(k, p) for k in KEYS for p in PARTS], 12)]
    apply_upsert(rows)
    assert _snapshot(t) == model

    for step in range(12):
        op = rng.choice(["late", "late", "fresh", "delete", "reinsert",
                         "compact_or_cluster", "clean"])
        seq += 1
        if op in ("late", "fresh"):
            picked = rng.sample([(k, p) for k in KEYS for p in PARTS],
                                rng.randint(1, 12))
            rows = []
            for k, p in picked:
                if (k, p) in model and op == "late":
                    v = rng.randint(0, 50)      # may lose to stored
                else:
                    v = seq                     # inserts always win
                rows.append(dict(k=k, p=p, v=v, payload=f"s{seq}-{k}-{v}"))
            apply_upsert(rows)
        elif op == "delete":
            if not model:
                continue
            targets = rng.sample(sorted(model),
                                 min(len(model), rng.randint(1, 5)))
            t.delete(_df(spark, [dict(k=k, p=p, v=seq, payload=None)
                                 for k, p in targets]))
            for kp in targets:
                model.pop(kp, None)
            recently_deleted.extend(targets)
        elif op == "reinsert":
            if not recently_deleted:
                continue
            rows = [dict(k=k, p=p, v=seq, payload=f"re{seq}-{k}")
                    for k, p in recently_deleted]
            recently_deleted.clear()
            apply_upsert(rows)
        elif op == "compact_or_cluster":
            if table_type == "MERGE_ON_READ" and rng.random() < 0.7:
                t.run_compaction()
            else:
                t.cluster(sort_columns=["k"])
        elif op == "clean":
            t.clean()
        assert _snapshot(t) == model, f"step {step} op {op} diverged"


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_random_workload_partial_update(spark, tmp_table_path, table_type):
    """OverwriteNonDefaults-payload DAG: a null field in the newest version
    is filled from the newest stored non-null value; a delete is a merge
    barrier (fills never resurrect pre-delete state).  Model: newest batch
    wins per key, None payload inherits the stored payload."""
    from incubator_hudi_spark.config import PAYLOAD_OVERWRITE_NON_DEFAULTS
    rng = random.Random(474747)
    t = HudiTable.create(spark, tmp_table_path, name="dag_partial",
                         recordkey_fields=["k"], partition_expr="p",
                         precombine_field="v", table_type=table_type,
                         payload=PAYLOAD_OVERWRITE_NON_DEFAULTS)
    t.cfg = t.cfg.with_(inline_compaction=False)

    model: dict = {}
    seq = 0

    def upsert(rows):
        t.upsert(_df(spark, rows))
        for r in rows:
            kp = (r["k"], r["p"])
            pay = r["payload"]
            if pay is None and kp in model:
                pay = model[kp][1]          # fill from stored
            model[kp] = (r["v"], pay)

    seq += 1
    upsert([dict(k=k, p=p, v=seq, payload=f"s{seq}-{k}")
            for k, p in rng.sample([(k, p) for k in KEYS for p in PARTS], 12)])
    assert _snapshot(t) == model

    for step in range(10):
        op = rng.choice(["partial", "partial", "full", "delete",
                         "compact_or_cluster"])
        seq += 1
        if op in ("partial", "full"):
            picked = rng.sample([(k, p) for k in KEYS for p in PARTS],
                                rng.randint(1, 10))
            upsert([dict(k=k, p=p, v=seq,
                         payload=(None if op == "partial"
                                  and rng.random() < 0.7
                                  else f"s{seq}-{k}"))
                    for k, p in picked])
        elif op == "delete":
            if not model:
                continue
            targets = rng.sample(sorted(model),
                                 min(len(model), rng.randint(1, 4)))
            t.delete(_df(spark, [dict(k=k, p=p, v=seq, payload=None)
                                 for k, p in targets]))
            for kp in targets:
                model.pop(kp, None)
            # delete barrier: a later partial update must NOT refill from
            # the pre-delete payload
            seq += 1
            refill = [dict(k=k, p=p, v=seq, payload=None)
                      for k, p in targets[:2]]
            if refill:
                upsert(refill)   # model fills None → None (key was gone)
        elif op == "compact_or_cluster":
            if table_type == "MERGE_ON_READ" and rng.random() < 0.7:
                t.run_compaction()
            else:
                t.cluster(sort_columns=["k"])
        assert _snapshot(t) == model, f"step {step} op {op} diverged"


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
def test_random_workload_orc_native_read_parity(spark, tmp_table_path,
                                                table_type):
    """Shorter DAG on an ORC-base table, validating BOTH read paths after
    every op: the DataFrame snapshot and the native Python DataSource
    (format("hudi_py")) — the per-slice pyarrow merge kernel must track the
    model through upserts, deletes, re-inserts, overwrites, compaction,
    clustering, and cleaning on the mixed ORC-base/parquet-delta layout."""
    from incubator_hudi_spark import pyds
    pyds.register(spark)
    rng = random.Random(20260815)
    t = HudiTable.create(spark, tmp_table_path, name="dag_orc",
                         recordkey_fields=["k"], partition_expr="p",
                         precombine_field="v", table_type=table_type,
                         base_format="orc")
    t.cfg = t.cfg.with_(inline_compaction=False)

    def native_snapshot():
        df = spark.read.format("hudi_py").load(tmp_table_path)
        return {(r["k"], r["p"]): (r["v"], r["payload"])
                for r in df.select("k", "p", "v", "payload").collect()}

    model: dict = {}
    seq = 0
    recently_deleted: list[tuple[str, str]] = []
    ops = ["upsert", "upsert", "delete", "reinsert", "insert_overwrite",
           "compact_or_cluster", "clean"]
    for step in range(10):
        op = rng.choice(ops) if step else "upsert"
        seq += 1
        if op == "upsert":
            rows = _batch(rng, seq)
            t.upsert(_df(spark, rows))
            for r in rows:
                model[(r["k"], r["p"])] = (r["v"], r["payload"])
        elif op == "delete":
            if not model:
                continue
            targets = rng.sample(sorted(model),
                                 min(len(model), rng.randint(1, 6)))
            t.delete(_df(spark, [dict(k=k, p=p, v=seq, payload=None)
                                 for k, p in targets]))
            for kp in targets:
                model.pop(kp, None)
            recently_deleted.extend(targets)
        elif op == "reinsert":
            if not recently_deleted:
                continue
            targets = recently_deleted[-rng.randint(1, len(recently_deleted)):]
            rows = [dict(k=k, p=p, v=seq, payload=f"re{seq}-{k}")
                    for k, p in targets]
            t.upsert(_df(spark, rows))
            for r in rows:
                model[(r["k"], r["p"])] = (r["v"], r["payload"])
            recently_deleted.clear()
        elif op == "insert_overwrite":
            rows = _batch(rng, seq)
            t.insert_overwrite(_df(spark, rows))
            hit = {r["p"] for r in rows}
            for k, p in list(model):
                if p in hit:
                    del model[(k, p)]
            for r in rows:
                model[(r["k"], r["p"])] = (r["v"], r["payload"])
        elif op == "compact_or_cluster":
            if table_type == "MERGE_ON_READ" and rng.random() < 0.7:
                t.run_compaction()
            else:
                t.cluster(sort_columns=["k"])
        elif op == "clean":
            t.clean()
        assert _snapshot(t) == model, f"step {step} op {op}: engine diverged"
        assert native_snapshot() == model, \
            f"step {step} op {op}: native hudi_py read diverged"
