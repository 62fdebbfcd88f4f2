"""Cross-process OCC soak (VERDICT r5 Next #6): two SEPARATE Python
processes — each with its own SparkSession and JVM — write the same table
under optimistic concurrency with the filesystem lock provider, plus a
cleaning-service loop on one writer.

What this pins, beyond the in-process thread soak (test_service_soak.py):
the lock file, the timeline, and the conflict check work through the real
filesystem with no shared Python state — the reference's
TransactionManager + SimpleConcurrentFileWritesConflictResolutionStrategy
deployment shape.

Protocol: each writer alternates a PRIVATE key stripe (l_orderkey%4==w)
with a SHARED stripe (%4==2).  Shared batches rendezvous INSIDE the
OccWriter scope (both writers snapshot the timeline BEFORE either commits),
so exactly one of each shared round is guaranteed to lose with
ConcurrentWriteConflict and retry on a fresh snapshot.  Every commit
carries (writer, batch, stripe) in commit_extras, so the parent replays
the COMPLETED timeline in instant order into an exact expected model — any
lost update, resurrected loser write, or unserialized commit fails the
equality check.

Instant minting is collision-safe cross-process: timeline.claim_instant
atomically claims the requested file (O_CREAT|O_EXCL) and re-mints on any
same-time instant, so same-millisecond writers can never share an instant
or a data/<instant>/ directory (test_claim_instant_collision below pins
the primitive; the writers' start stagger here just de-noises the
rendezvous).
"""

import json
import os
import subprocess
import sys
import time

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

_WRITER = r"""
import json, os, sys, time
w = int(os.environ["WRITER_ID"])
path = os.environ["TABLE_PATH"]
bdir = os.environ["BARRIER_DIR"]
N = int(os.environ["N_BATCHES"])
time.sleep(w * 0.35)                       # stagger instant-time minting
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[4]")
         .appName(f"occ-writer-{w}")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
sys.path.insert(0, os.environ["REPO_ROOT"])
from incubator_hudi_spark import HudiTable
from incubator_hudi_spark.concurrency import (ConcurrentWriteConflict,
                                              OccWriter)
from incubator_hudi_spark.services.cleaning import run_clean

t = HudiTable.load(spark, path)
li = spark.read.parquet(os.path.join(os.environ["SF_DIR"],
                                     "lineitem.parquet"))
li = li.persist(); li.count()

def barrier(tag):
    # rendezvous: both writers announce, then wait for the peer (bounded —
    # a crashed peer must not deadlock the survivor)
    open(os.path.join(bdir, f"{tag}_{w}"), "w").close()
    peer = os.path.join(bdir, f"{tag}_{1 - w}")
    deadline = time.time() + 90
    while not os.path.exists(peer) and time.time() < deadline:
        time.sleep(0.02)

committed, conflicts = [], 0
for k in range(N):
    shared = (k % 2 == 1)
    stripe = 2 if shared else w
    batch = (li.filter(f"l_orderkey % 4 = {stripe}")
             .withColumn("l_quantity", F.lit(float(10000 * w + k))))
    extras = {"occ_writer": w, "occ_batch": k, "occ_stripe": stripe}
    for attempt in (0, 1, 2):
        try:
            with OccWriter(t):
                if shared and attempt == 0:
                    barrier(f"b{k}")       # both snapshot before either commits
                    time.sleep(w * 0.25)   # stagger the same-ms instant window
                c = t.upsert(batch, commit_extras=extras)
            committed.append([k, stripe, c])
            break
        except ConcurrentWriteConflict:
            conflicts += 1
            time.sleep(0.1 * (w + 1))
    if w == 0 and k % 2 == 0:
        run_clean(t)                       # service loop beside a live writer
print("RESULT:" + json.dumps(
    {"writer": w, "committed": committed, "conflicts": conflicts}))
"""


def test_claim_instant_collision(tmp_path):
    """claim_instant must never hand two callers the same (time, action) —
    or the same time under ANY action (two actions would share one
    data/<instant>/ dir)."""
    from incubator_hudi_spark import timeline as tl

    t = tl.Timeline(str(tmp_path))
    os.makedirs(str(tmp_path), exist_ok=True)
    a = t.claim_instant(tl.COMMIT)
    # same (time, action): exclusive create refuses
    try:
        t.create_requested(a.time, tl.COMMIT, exclusive=True)
        raise AssertionError("exclusive re-claim must raise")
    except FileExistsError:
        pass
    # overwrite semantics stay available for replay/rollback callers
    t.create_requested(a.time, tl.COMMIT)
    # same time, different action: claim loop re-mints a fresh time
    b = t.claim_instant(tl.REPLACE_COMMIT)
    assert b.time != a.time and b.time > a.time
    # burst of claims: all unique, all monotonic
    times = [t.claim_instant(tl.COMMIT).time for _ in range(5)]
    assert len(set(times)) == 5 and times == sorted(times)


@pytest.mark.parametrize("table_type", ["COPY_ON_WRITE", "MERGE_ON_READ"])
@pytest.mark.slow
def test_two_process_occ_soak(spark, tmp_table_path, lineitem, table_type):
    from incubator_hudi_spark import MERGE_ON_READ, HudiTable
    from incubator_hudi_spark import timeline as tl

    t = HudiTable.create(spark, tmp_table_path, "occ",
                         recordkey_fields=["l_orderkey", "l_linenumber"],
                         partition_expr="date_format(l_shipdate,'yyyy-MM')",
                         precombine_field="l_shipdate",
                         table_type=table_type)
    if table_type == MERGE_ON_READ:
        t.cfg = t.cfg.with_(inline_compaction=False)
    t.bulk_insert(lineitem)

    bdir = os.path.join(tmp_table_path, "_barriers")
    os.makedirs(bdir, exist_ok=True)
    env_base = dict(os.environ,
                    REPO_ROOT=os.path.dirname(os.path.dirname(
                        os.path.abspath(__file__))),
                    SF_DIR=SF_DIR, TABLE_PATH=tmp_table_path,
                    BARRIER_DIR=bdir, N_BATCHES="4")
    procs = [subprocess.Popen([sys.executable, "-c", _WRITER],
                              env=dict(env_base, WRITER_ID=str(w)),
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for w in (0, 1)]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"writer failed:\n{out[-2000:]}\n{err[-2000:]}"
        r = json.loads(out.split("RESULT:")[1])
        results[r["writer"]] = r

    # every batch eventually committed; the rendezvoused shared rounds
    # produced at least one genuine loser across the run
    for w in (0, 1):
        assert [c[0] for c in results[w]["committed"]] == list(range(4)), \
            results[w]
    total_conflicts = sum(results[w]["conflicts"] for w in (0, 1))
    assert total_conflicts >= 1, (
        "rendezvoused shared batches must produce a conflict", results)

    # fresh handle: rollback-on-open reclaims any loser debris; for MOR,
    # compact the cross-process delta logs first — the model equality then
    # also proves the merged winners survive compaction intact
    t2 = HudiTable.load(spark, tmp_table_path)
    if table_type == MERGE_ON_READ:
        t2.run_compaction()
    snap = t2.read()

    # serialized, unique, strictly-ordered completed commits
    commits = t2.timeline.completed(tl.DATA_ACTIONS)
    times = [i.time for i in commits]
    assert len(times) == len(set(times)), "instant-time collision"
    assert times == sorted(times)

    # replay the committed extras in instant order → exact expected model
    expected = {}            # stripe -> l_quantity
    seen = set()
    for ins in commits:
        md = t2.timeline.read_metadata(ins)
        ex = md.get("extra", {})
        if "occ_writer" in ex:
            expected[ex["occ_stripe"]] = float(
                10000 * ex["occ_writer"] + ex["occ_batch"])
            seen.add((ex["occ_writer"], ex["occ_batch"]))
    # every reported success is on the timeline exactly once, and nothing
    # committed that a writer did not report (no resurrected losers)
    reported = {(w, c[0]) for w in (0, 1) for c in results[w]["committed"]}
    assert seen == reported, (seen ^ reported)

    for stripe, want in expected.items():
        got = (snap.filter(f"l_orderkey % 4 = {stripe}")
               .select("l_quantity").distinct().collect())
        assert [r[0] for r in got] == [want], (stripe, want, got)

    # untouched stripe 3 keeps its original values (no collateral rewrite)
    orig = {r[0] for r in lineitem.filter("l_orderkey % 4 = 3")
            .select("l_quantity").distinct().collect()}
    got3 = {r[0] for r in snap.filter("l_orderkey % 4 = 3")
            .select("l_quantity").distinct().collect()}
    assert got3 == orig
