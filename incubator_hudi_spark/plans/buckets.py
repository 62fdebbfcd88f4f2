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


def avg_record_size(meta, timeline, default: int) -> int:
    """Recalculate average record size from recent commit stats
    (UpsertPartitioner.java:160-163)."""
    total_b, total_r = 0, 0
    for ins in timeline.completed_data_instants()[-5:]:
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
) -> list[InsertBucket]:
    """profile: partition → #insert rows.  Emits contiguous row-number ranges
    per partition: small existing file groups first (up to their remaining
    capacity), then new file groups at target size."""
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
