"""Bucket (file-group) planning for inserts — the UpsertPartitioner.

Reference: hudi-client/hudi-spark-client/.../table/action/commit/
UpsertPartitioner.java:101-225 — updates go to their existing file group;
inserts first fill *small files* (bin-packing under the 100 MB limit using the
average record size recalculated from recent commits,
UpsertPartitioner.java:160-163), then spill into new file groups sized to the
120 MB target.

Our Spark mapping: the driver computes a per-partition bucket plan (a few rows
per partition) from the workload profile + file-system view; the plan becomes
a broadcast-joined range table so assignment is a vectorized join, never a UDF.
Plan size is O(#file groups touched) — at 100 TB that's the only driver state,
and it is bounded by the incoming batch's partitions, not the table.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import WriteConfig
from ..fsview import FileSystemView


@dataclass
class InsertBucket:
    partition: str
    file_group: str
    seq_start: int   # row_number range [start, end) within the partition
    seq_end: int
    is_new_fg: bool


def new_fg_id() -> str:
    return uuid.uuid4().hex[:16]


#: target number of sampled keys per planned bucket for GLOBAL_SORT range
#: split points.  Also used to derive the count-free sample fraction of the
#: fused profile pass (see range_split_points / table._write_inserts):
#: f = SAMPLES_PER_BUCKET * rec_size / target_file_size — since a partition
#: is planned k ≈ n·rec_size/target buckets, a uniform f yields ≈ this many
#: samples per bucket regardless of n, so ONE aggregation can collect counts
#: and split samples together without knowing the counts first.
SAMPLES_PER_BUCKET = 100


def avg_record_size(meta, timeline, default: int, active=None) -> int:
    """Recalculate average record size from recent commit stats
    (UpsertPartitioner.java:160-163).  ``active``: optional
    ``timeline.instants()`` snapshot so a write batch pays no extra
    timeline listing here."""
    from .. import timeline as tl
    if active is not None:
        data = tl.completed_from(active, tl.DATA_ACTIONS)
    else:
        data = timeline.completed_data_instants()
    total_b, total_r = 0, 0
    for ins in data[-5:]:
        md = timeline.read_metadata(ins)
        for st in md.get("write_stats", []):
            total_b += st.get("size") or 0
            total_r += st.get("num_records") or 0
    return max(64, total_b // total_r) if total_r else default


def plan_insert_buckets(
    profile: dict[str, int],
    view: Optional[FileSystemView],
    cfg: WriteConfig,
    rec_size: int,
    pack_small_files: bool = True,
    exclude_fgs: Optional[set] = None,
) -> list[InsertBucket]:
    """profile: partition → #insert rows.  Emits contiguous row-number ranges
    per partition: small existing file groups first (up to their remaining
    capacity), then new file groups at target size.  ``exclude_fgs``: never
    pack into these groups (pending-clustering targets stay frozen)."""
    plan: list[InsertBucket] = []
    rows_per_new_file = max(1, cfg.target_file_size_bytes // rec_size)
    for partition, n in sorted(profile.items()):
        if n <= 0:
            continue
        pos = 0
        if pack_small_files and view is not None:
            for sl in view.small_files(partition, cfg.small_file_limit_bytes):
                if pos >= n:
                    break
                if exclude_fgs and sl.file_group in exclude_fgs:
                    continue
                cap = max(0, (cfg.target_file_size_bytes - sl.base_size) // rec_size)
                if cap <= 0:
                    continue
                take = min(cap, n - pos)
                plan.append(InsertBucket(partition, sl.file_group, pos, pos + take, False))
                pos += take
        remaining = n - pos
        if remaining > 0:
            n_new = max(1, -(-remaining // rows_per_new_file))  # ceil
            per = -(-remaining // n_new)
            for i in range(n_new):
                take = min(per, remaining - i * per)
                if take <= 0:
                    break
                plan.append(InsertBucket(partition, new_fg_id(), pos, pos + take, True))
                pos += take
    return plan


def fused_profile_splits(src: DataFrame, partition_col: str, key_col: str,
                         rec_size: int, target_file_size_bytes: int,
                         samples_per_bucket: int = SAMPLES_PER_BUCKET
                         ) -> DataFrame:
    """ONE aggregation yielding, per partition: row count AND the GLOBAL_SORT
    range split points — (partition, _n, _splits).

    Sampling is a deterministic key-hash cut at a count-free uniform
    fraction f = samples_per_bucket·rec_size/target (a partition with n
    rows is planned k ≈ n·rec_size/target buckets, so f yields
    ≈ samples_per_bucket keys per bucket for ANY n); retried tasks
    re-derive the same sample (no rand() — the SPARK-38388 hazard class)
    and null keys drop out of the collect_list.

    Split-point SELECTION is distributed too (r7): a projection on the
    aggregated row sorts the sample and reduces it to the k-1 quantile
    points, where k is the EXACT bucket count plan_insert_buckets derives
    from the same count (both equal ceil(n / rows_per_new_file) on the
    no-packing path — the ceil(n/ceil(n/m)) filling identity keeps the
    plan's positive takes at exactly that k).  The driver therefore
    collects O(total buckets) keys, not O(total samples) — at the 100 TB
    bulk-load shape ~875k buckets × 100 samples of raw keys would be a
    multi-GB driver payload.  The selection expression mirrors the
    driver-side fallback in range_split_points index for index:
    idx = min(len(ks)-1, floor(len(ks)·i/k)), ks sorted (sort_array's
    UTF8 binary order = Python's code-point order, a UTF-8 property)."""
    frac = min(1.0, (samples_per_bucket * rec_size)
               / max(1, target_file_size_bytes))
    thresh = max(1, int(frac * (1 << 20)))
    rpnf = max(1, target_file_size_bytes // rec_size)
    return (src.groupBy(partition_col)
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.sort_array(F.collect_list(F.when(
                     F.pmod(F.xxhash64(F.col(key_col)),
                            F.lit(1 << 20)) < F.lit(thresh),
                     F.col(key_col)))).alias("_ks"))
            .withColumn("_k", F.expr(f"(_n + {rpnf - 1}) div {rpnf}"))
            .select(partition_col, "_n", F.expr(
                "CASE WHEN _k > 1 AND size(_ks) > 0 THEN "
                "transform(sequence(1, int(_k) - 1), i -> "
                "element_at(_ks, int(least(size(_ks) - 1, "
                "(size(_ks) * i) div _k)) + 1)) "
                "ELSE array() END").alias("_splits")))


def range_split_points(prepared: DataFrame, plan: list[InsertBucket],
                       profile: dict[str, int],
                       partition_col: str, key_col: str,
                       samples_per_bucket: int = SAMPLES_PER_BUCKET,
                       samples: Optional[dict[str, list[str]]] = None,
                       splits: Optional[dict[str, list[str]]] = None
                       ) -> dict[str, list[str]]:
    """Per-partition key split points for GLOBAL_SORT assignment
    (GlobalSortPartitioner.java:34-45 — ``records.sortBy``; Spark's own
    RangePartitioner uses the same sample-then-split technique).  Only
    partitions planned with >1 bucket are sampled — steady-state writes
    (one bucket per partition) pay nothing.

    ``splits``: split points already SELECTED distributed (r7 — the fused
    profile aggregation in table._write_inserts reduces each partition's
    sorted key sample to its k-1 quantile points executor-side, so the
    driver never sees raw sampled keys); NO Spark job runs here and this
    function only subsets to the >1-bucket partitions.

    ``samples``: raw key samples gathered by the caller (the r6 fused
    shape) — no Spark job runs, split selection happens here on the
    driver.  Kept for callers that fuse sampling but not selection.

    With neither, one sampling job runs (the pre-r6 shape, kept for
    callers that profile a different frame than they assign).  Note the
    ``max(samples_per_bucket·k, 50)`` per-partition sample floor applies
    only to this fallback path; the fused paths use a uniform count-free
    fraction (see SAMPLES_PER_BUCKET above)."""
    from collections import defaultdict
    k_of: dict[str, int] = defaultdict(int)
    for b in plan:
        k_of[b.partition] += 1
    need = {p: k for p, k in k_of.items() if k > 1}
    if not need:
        return {}
    if splits is not None:
        return {p: list(splits.get(p, [])) for p in need}
    by_p: dict[str, list[str]]
    if samples is not None:
        by_p = {p: list(samples.get(p, [])) for p in need}
    else:
        fracs = {p: min(1.0, max(samples_per_bucket * k, 50)
                        / max(1, profile.get(p, 1)))
                 for p, k in need.items()}
        frac_map = F.create_map(*[x for p, fr in fracs.items()
                                  for x in (F.lit(p), F.lit(fr))])
        sampled = (prepared
                   .select(F.col(partition_col).alias("_p"),
                           F.col(key_col).alias("_k"))
                   .filter(F.col("_p").isin(list(need)))
                   # null record keys would crash sorted() below (str/None);
                   # drop them like the fused path's when()→null does —
                   # assign_insert_buckets_range coalesces nulls into the
                   # first interval either way
                   .filter(F.col("_k").isNotNull())
                   .filter(F.rand(46474747) < frac_map[F.col("_p")])
                   .collect())
        by_p = defaultdict(list)
        for r in sampled:
            by_p[r[0]].append(r[1])
    out = {}
    for p, k in need.items():
        ks = sorted(by_p.get(p, []))
        if not ks:
            out[p] = []             # degenerate: everything → first bucket
            continue
        out[p] = [ks[min(len(ks) - 1, int(len(ks) * i / k))]
                  for i in range(1, k)]
    return out


def assign_insert_buckets_range(spark: SparkSession, inserts: DataFrame,
                                plan: list[InsertBucket],
                                partition_col: str, key_col: str,
                                fg_col: str,
                                splits: dict[str, list[str]]) -> DataFrame:
    """GLOBAL_SORT assignment: bucket b of a partition owns the key interval
    [split[b-1], split[b]) — intervals chain (-inf … +inf), are disjoint,
    and cover every key, so each row matches exactly one bucket and the
    written files carry DISJOINT min/max key ranges (what makes manifest
    stats skipping and the BLOOM-style index prune decisively).  Duplicate
    keys land in one bucket, preserving the in-bucket preCombine contract."""
    from collections import defaultdict
    by_part: dict[str, list[InsertBucket]] = defaultdict(list)
    for b in plan:
        by_part[b.partition].append(b)
    rows = []
    for p, bs in by_part.items():
        pts = splits.get(p, [])
        for i, b in enumerate(bs):
            if i > len(pts):
                break               # fewer sample points than buckets: unused
            lo = pts[i - 1] if i > 0 else None
            hi = pts[i] if i < len(pts) else None
            rows.append((p, b.file_group, lo, hi))
    plan_df = spark.createDataFrame(
        rows, schema=(f"{partition_col} string, {fg_col} string, "
                      "_lo string, _hi string"))
    # null record keys sort with '' (first interval) instead of vanishing
    # through three-valued comparison logic in the inner join
    k = F.coalesce(inserts[key_col], F.lit(""))
    out = inserts.join(
        F.broadcast(plan_df),
        on=[inserts[partition_col] == plan_df[partition_col],
            plan_df["_lo"].isNull() | (k >= plan_df["_lo"]),
            plan_df["_hi"].isNull() | (k < plan_df["_hi"])],
        how="inner",
    ).drop(plan_df[partition_col]).drop("_lo", "_hi")
    return out


def assign_insert_buckets(spark: SparkSession, inserts: DataFrame,
                          plan: list[InsertBucket],
                          partition_col: str, key_col: str,
                          fg_col: str) -> DataFrame:
    """Assign each insert row a file group by spreading a deterministic key
    hash uniformly over ``[0, N_partition)`` and range-joining the broadcast
    plan.  Fully parallel — no per-partition sequencing, no window, no skewed
    task (the reference's UpsertPartitioner achieves the same with a custom
    shuffle Partitioner; a row_number window would funnel each table partition
    through one task at 100 TB).  Capacity enforcement is statistical
    (binomial noise ≪ file-size targets, which are estimates anyway).
    """
    totals: dict[str, int] = {}
    buckets_per_part: dict[str, int] = {}
    for b in plan:
        totals[b.partition] = max(totals.get(b.partition, 0), b.seq_end)
        buckets_per_part[b.partition] = buckets_per_part.get(b.partition, 0) + 1
    if buckets_per_part and all(n == 1 for n in buckets_per_part.values()):
        # common case (steady-state upserts, partition-sized bulk loads): one
        # target bucket per partition — assignment is a pure map lookup, no
        # join, no hash column (the range join below costs a broadcast +
        # per-row range probe; a literal map is a codegen'd lookup)
        fg_of = F.create_map(*[x for b in plan
                               for x in (F.lit(b.partition), F.lit(b.file_group))])
        return (inserts.withColumn(fg_col, fg_of[F.col(partition_col)])
                .filter(F.col(fg_col).isNotNull()))  # match inner-join drops
    plan_df = spark.createDataFrame(
        [(b.partition, b.file_group, b.seq_start, b.seq_end, totals[b.partition])
         for b in plan],
        schema=(f"{partition_col} string, {fg_col} string, "
                "_seq_start long, _seq_end long, _seq_total long"),
    )
    hashed = inserts.withColumn("_h", F.abs(F.xxhash64(F.col(key_col))))
    assigned = hashed.join(
        F.broadcast(plan_df),
        on=[hashed[partition_col] == plan_df[partition_col],
            F.pmod(hashed["_h"], plan_df["_seq_total"]) >= plan_df["_seq_start"],
            F.pmod(hashed["_h"], plan_df["_seq_total"]) < plan_df["_seq_end"]],
        how="inner",
    ).drop(plan_df[partition_col]).drop("_h", "_seq_start", "_seq_end", "_seq_total")
    return assigned
