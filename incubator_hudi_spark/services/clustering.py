"""Clustering: rewrite small file slices into fewer, larger, sorted files.

Reference parity:
  - plan: SparkRecentDaysClusteringPlanStrategy.java:54-123 /
    PartitionAwareClusteringPlanStrategy (group small slices per partition).
  - run: SparkSortAndSizeExecutionStrategy.java:68-87 — bulk-insert-style
    rewrite sorted by user columns; a ``replacecommit`` swaps the file groups
    atomically (SparkRDDWriteClient.java:335-348).

Record meta columns are preserved (layout change only — snapshot identical).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import functions as F

from .. import timeline as tl
from ..config import CLUSTER, META_FILE_NAME, META_PARTITION_PATH, META_RECORD_KEY
from ..plans.buckets import new_fg_id
from ..writer import API_DELETE, FG, drop_deleted, write_instant_files


def plan_clustering(table, partitions: Optional[Sequence[str]] = None,
                    small_file_limit: Optional[int] = None,
                    recent_partitions: Optional[int] = None) -> dict[str, list]:
    """Small slices grouped per partition (PartitionAwareClusteringPlanStrategy);
    ``recent_partitions`` keeps only the N newest partitions
    (SparkRecentDaysClusteringPlanStrategy.java:54-123)."""
    limit = small_file_limit or table.cfg.small_file_limit_bytes
    view = table.view()
    groups: dict[str, list] = {}
    for sl in view.latest_slices(partitions):
        if sl.base_size + sl.log_size < limit:
            groups.setdefault(sl.partition, []).append(sl)
    groups = {p: sls for p, sls in groups.items() if len(sls) >= 2}
    if recent_partitions is not None:
        keep = sorted(groups, reverse=True)[:recent_partitions]
        groups = {p: groups[p] for p in keep}
    return groups


def zorder_value(df, cols: Sequence[str], bits: int = 16):
    """Z-order (Morton) curve value over 2..4 numeric/date/timestamp
    columns as a pure Column expression: each column is min/max-normalized
    to ``bits`` bits (one agg job supplies the bounds as literals), then the
    bits are interleaved.  Sorting by the z-value gives every column
    locality simultaneously, so per-file [min, max] column stats prune
    range predicates on ANY of the columns — the standard multi-dimensional
    data-skipping layout (Morton 1966; the linear sort only serves its
    leading column).  Strings are unsupported (a hash would destroy the
    locality the curve exists to provide)."""
    if not 2 <= len(cols) <= 4:
        raise ValueError("zorder needs 2..4 columns")
    # interleaved positions must stay below bit 63 (long sign bit): a set
    # sign bit would sort those rows BEFORE everything and break the curve
    bits = min(bits, 63 // len(cols))
    for c in cols:
        t = df.schema[c].dataType.typeName()
        if t in ("string", "binary", "boolean", "map", "array", "struct"):
            raise ValueError(f"zorder column {c!r} has unsupported type {t}")
    bounds = df.agg(*[f for c in cols for f in
                      (F.min(F.col(c).cast("double")).alias(f"mn_{c}"),
                       F.max(F.col(c).cast("double")).alias(f"mx_{c}"))]
                    ).collect()[0]
    n = len(cols)
    top = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        if mn is None or mx is None or mx == mn:
            continue                     # constant/empty column adds nothing
        scaled = F.least(F.lit(top), F.greatest(F.lit(0), F.floor(
            (F.col(c).cast("double") - F.lit(float(mn)))
            / F.lit(float(mx - mn)) * top))).cast("long")
        for i in range(bits):
            z = z + F.shiftleft(F.shiftright(scaled, i).bitwiseAND(1),
                                i * n + j)
    return z


def run_clustering(table, sort_columns: Optional[Sequence[str]] = None,
                   partitions: Optional[Sequence[str]] = None,
                   small_file_limit: Optional[int] = None,
                   recent_partitions: Optional[int] = None,
                   layout: str = "linear") -> Optional[str]:
    groups = plan_clustering(table, partitions, small_file_limit,
                             recent_partitions)
    if not groups:
        return None

    instant = table._start(tl.REPLACE_COMMIT)
    slices = [sl for sls in groups.values() for sl in sls]
    replaced = [(sl.partition, sl.file_group) for sl in slices]
    df = table._read_slices(slices, read_optimized=False, raw=True)
    df = drop_deleted(df).drop(API_DELETE)

    # SparkSortAndSizeExecutionStrategy.java:68-87: rewrite each partition
    # group sorted by the user columns into ceil(total/target) file groups.
    # The ntile window funnels one partition group through one task — at
    # cluster scale that group is itself <= a handful of target-size files
    # (recent_partitions bounds the batch), so the funnel is the planned unit
    # of work, exactly like the reference's one-Spark-task-per-group rewrite.
    sort_cols = list(sort_columns) if sort_columns else [META_RECORD_KEY]
    if layout == "zorder":
        # files are ASSIGNED by z-value range (inter-file locality on every
        # sort column); rows inside a file keep the linear sort so row-group
        # stats stay tight on the leading column
        df = df.withColumn("_hoodie_zv", zorder_value(df, sort_cols))
        order_cols: list = ["_hoodie_zv"]
    elif layout == "linear":
        order_cols = sort_cols
    else:
        raise ValueError(f"unknown clustering layout {layout!r} "
                         "(linear | zorder)")
    fg_map: dict[str, str] = {}
    tiles = []
    for p, sls in sorted(groups.items()):
        total = sum(sl.base_size + sl.log_size for sl in sls)
        n_out = max(1, -(-total // table.cfg.target_file_size_bytes))
        fgs = [new_fg_id() for _ in range(n_out)]
        for fg in fgs:
            fg_map[fg] = p
        tiles.append((p, fgs))
    from pyspark.sql.window import Window
    w = Window.partitionBy(META_PARTITION_PATH).orderBy(*order_cols)
    fg_arrays = F.create_map(*[x for p, fgs in tiles
                               for x in (F.lit(p), F.array(*[F.lit(g) for g in fgs]))])
    n_map = F.create_map(*[x for p, fgs in tiles
                           for x in (F.lit(p), F.lit(len(fgs)))])
    # ntile percentile of the sort order → file-group index 0..n-1 per partition
    df = (df.withColumn("_nt", F.ntile(100).over(w))
            .withColumn(FG, fg_arrays[F.col(META_PARTITION_PATH)][
                F.floor(((F.col("_nt") - 1) * n_map[F.col(META_PARTITION_PATH)])
                        / 100).cast("int")])
            .drop("_nt"))
    df = df.withColumn(META_FILE_NAME, F.col(FG))
    schema = table._read_schema()
    stats = write_instant_files(
        df.select(*[c for c in df.columns if c in schema.names or c == FG]),
        table.meta, instant.time, fg_map, table.cfg, sort_cols=sort_cols)
    table._complete(instant, CLUSTER, stats, schema, replaced=replaced)
    return instant.time
