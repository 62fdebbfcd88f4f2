"""Property-based tests (hypothesis) for the pure planning/merge kernels —
the reference's unit layer (TestUpsertPartitioner, TestDefaultHoodieRecordPayload)
as properties instead of examples.  These run WITHOUT Spark: they exercise
the driver-side planner logic directly, so they're fast enough for wide
random exploration.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from incubator_hudi_spark.config import WriteConfig
from incubator_hudi_spark.plans.buckets import InsertBucket, plan_insert_buckets


profiles = st.dictionaries(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    st.integers(min_value=0, max_value=5_000_000),
    max_size=8,
)


@given(profile=profiles,
       rec_size=st.integers(min_value=64, max_value=10_000),
       target=st.integers(min_value=1 << 20, max_value=1 << 28))
@settings(max_examples=300, deadline=None)
@pytest.mark.slow
def test_bucket_plan_covers_every_row_exactly_once(profile, rec_size, target):
    """The insert bucket plan must partition [0, n) per partition into
    disjoint, contiguous, covering ranges — otherwise rows are dropped or
    duplicated at assignment time."""
    cfg = WriteConfig(target_file_size_bytes=target)
    plan = plan_insert_buckets(profile, None, cfg, rec_size,
                               pack_small_files=False)
    by_part: dict[str, list[InsertBucket]] = {}
    for b in plan:
        by_part.setdefault(b.partition, []).append(b)
    for part, n in profile.items():
        buckets = sorted(by_part.get(part, []), key=lambda b: b.seq_start)
        if n == 0:
            assert not buckets
            continue
        # contiguous cover of [0, n)
        assert buckets[0].seq_start == 0
        assert buckets[-1].seq_end == n
        for a, b in zip(buckets, buckets[1:]):
            assert a.seq_end == b.seq_start
        # every new file respects the target size (within one record)
        rows_cap = max(1, target // rec_size)
        for b in buckets:
            assert b.seq_end - b.seq_start <= rows_cap
        # fresh ids unique
        ids = [b.file_group for b in buckets]
        assert len(ids) == len(set(ids))


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 50)), max_size=60))
@settings(max_examples=200, deadline=None)
def test_dup_cluster_model(pairs):
    """Model check for connected components: a brute-force union-find over
    the same edges must agree with iterative min-label propagation run as a
    pure-python mirror of operators/dedup.dup_clusters."""
    # union-find ground truth
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    truth = {v: find(v) for v in parent}

    # min-label propagation (the dup_clusters loop, driver-side)
    edges = set()
    for a, b in pairs:
        edges |= {(a, b), (b, a)}
    labels = {v: v for v in {x for e in edges for x in e}}
    for _ in range(200):
        new = dict(labels)
        for s, d in edges:
            if labels[s] < new[d]:
                new[d] = labels[s]
        if new == labels:
            break
        labels = new
    assert labels == truth


def test_timestamp_partition_expr_modes(spark):
    from incubator_hudi_spark.keygen import (TS_DATE_STRING, TS_EPOCHMILLIS,
                                             TS_SCALAR, TS_UNIX_SECONDS,
                                             timestamp_partition_expr)
    import pytest
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(1704067200000, 1704067200, 19723, "2024/01/01 00")],
        "ms long, s long, days long, str string")
    row = df.select(
        F.expr(timestamp_partition_expr("ms", TS_EPOCHMILLIS, "yyyy-MM-dd")).alias("a"),
        F.expr(timestamp_partition_expr("s", TS_UNIX_SECONDS, "yyyy-MM-dd")).alias("b"),
        F.expr(timestamp_partition_expr("days", TS_SCALAR, "yyyy-MM-dd",
                                        scalar_unit="DAYS")).alias("c"),
        F.expr(timestamp_partition_expr("str", TS_DATE_STRING, "yyyy-MM-dd",
                                        input_format="yyyy/MM/dd HH")).alias("d"),
    ).collect()[0]
    assert row.a == "2024-01-01" and row.b == "2024-01-01"
    assert row.c == "2024-01-01" and row.d == "2024-01-01"
    with pytest.raises(ValueError):
        timestamp_partition_expr("x", TS_DATE_STRING, "yyyy")  # no input fmt
    with pytest.raises(ValueError):
        timestamp_partition_expr("x", "BOGUS", "yyyy")


def test_instant_parse_rejects_non_action_files():
    """table_properties.json (and any stray dotted file) must never parse as
    a COMPLETED instant — a bogus 'table_properties' time sorts after every
    yyyyMMddHHmmssSSS instant and would hijack unfiltered last_completed()
    (the reference gates on VALID_EXTENSIONS_IN_ACTIVE_TIMELINE the same way)."""
    from incubator_hudi_spark import timeline as tl

    assert tl.Instant.parse("table_properties.json") is None
    assert tl.Instant.parse("20260101000000000.commit.tmp") is None
    assert tl.Instant.parse("notes.txt") is None
    assert tl.Instant.parse("archived") is None
    ok = tl.Instant.parse("20260101000000000.commit")
    assert ok is not None and ok.state == tl.COMPLETED
    req = tl.Instant.parse("20260101000000000.compaction.requested")
    assert req is not None and req.state == tl.REQUESTED
