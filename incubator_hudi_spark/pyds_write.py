"""Native Python DataSource WRITE side: ``df.write.format("hudi_py")``.

Reference surface: HoodieSparkSqlWriter.scala:62-257 dispatch behind
``df.write.format("hudi")``.  The full write surface (upsert/delete with
index tagging, merge planning, bin-packing) needs engine-side Spark plans and
stays on ``datasource.write_hudi`` / ``HudiTable``; what a per-partition
writer CAN do faithfully is the load path:

- ``mode("append")``  → bulk_insert semantics (BulkInsertSortMode.NONE:
  new file groups, incoming partitioning preserved, no dedup —
  HoodieSparkSqlWriter bulkInsertAsRow path).
- ``mode("overwrite")`` → insert_overwrite_table (all live file groups
  replaced in the same replacecommit —
  SparkInsertOverwriteTableCommitActionExecutor.java).

Auto-creates the table on first write from ``hoodie.*`` options (name,
recordkey field, partition expr, precombine, table type, base format), like
the reference's first ``save(path)``.

Execution model: the driver-side writer opens the instant
(requested→inflight) before tasks run; each task splits its rows by hoodie
partition and writes one new file group per (task, partition) under the
instant's immutable directory; ``commit()`` folds the per-task stats into
the commit manifest (schema evolved via HudiTable._evolve); ``abort()``
rolls the instant back.  A crash that skips both leaves a dangling inflight
the engine's next write recovers (table._recover_dangling) — identical to an
engine-side crash.

Key generation runs per Arrow batch in pandas and supports the practical
keygen subset (Simple/Complex record keys; partition exprs: field refs,
``concat_ws('/', ...)``, ``date_format(ts_or_conversion, 'fmt')`` with the
timestamp_partition_expr conversions).  Anything else raises with a pointer
to ``write_hudi`` — the engine evaluates arbitrary SQL exprs, a Python
worker must not half-implement them.

Concurrency: these writers do NOT take the engine's OCC lock
(concurrency.OccWriter wraps HudiTable methods, not this surface).
``mode("append")`` mints only NEW file groups, so it cannot conflict with a
concurrent engine upsert at the file-group level; ``mode("overwrite")``
replaces groups and must be the sole writer — same single-writer contract
the reference's bulk loads assume.
"""

from __future__ import annotations

import json
import os
import re
import uuid
from dataclasses import dataclass, field
from typing import Iterator, Optional

from pyspark.sql.datasource import (DataSourceArrowWriter,
                                    DataSourceStreamArrowWriter,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType

from . import timeline as tl
from .config import (META_COMMIT_SEQNO, META_COMMIT_TIME, META_FILE_NAME,
                     META_PARTITION_PATH, META_RECORD_KEY, TableConfig)
from .keygen import NON_PARTITIONED
from .metaclient import TableMetaClient

# Java SimpleDateFormat → strftime, longest-first (TimestampBasedKeyGenerator
# output formats; the subset date_format shares with strftime losslessly)
_FMT = [("yyyy", "%Y"), ("MM", "%m"), ("dd", "%d"), ("HH", "%H"),
        ("mm", "%M"), ("ss", "%S")]


def _java_fmt_to_strftime(fmt: str) -> str:
    out = fmt
    for j, s in _FMT:
        out = out.replace(j, s)
    # any alphabetic residue OUTSIDE a %X directive is an unconverted Java
    # token (e.g. 'MMM' → '%mM'): silently wrong partitions — refuse instead
    if re.search("[A-Za-z]", re.sub("%[A-Za-z]", "", out)):
        raise NotImplementedError(
            f"hudi_py writer: unsupported date format {fmt!r} — "
            "use datasource.write_hudi for arbitrary formats")
    return out


def _parse_partition_expr(expr: Optional[str]):
    """Compile the supported partition-expr subset to a pandas evaluator
    pdf -> Series[str].  Raises NotImplementedError beyond the subset."""
    import pandas as pd

    if not expr:
        return lambda pdf: pd.Series([NON_PARTITIONED] * len(pdf),
                                     index=pdf.index, dtype="object")
    e = expr.strip()
    m = re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", e)
    if m:
        return lambda pdf: pdf[e].astype("string").astype(object)
    m = re.fullmatch(r"concat_ws\('/'\s*,\s*([A-Za-z0-9_,\s]+)\)", e)
    if m:
        cols = [c.strip() for c in m.group(1).split(",")]

        def concat_fn(pdf):
            # vectorized left fold with concat_ws null semantics: a null
            # field is skipped, and ALL-null rows yield '' (concat_ws never
            # returns null — byte parity with the engine's keygen column)
            out = None
            for c in cols:
                piece = pdf[c].astype("string")
                if out is None:
                    out = piece
                else:
                    joined = out.str.cat(piece, sep="/")
                    out = joined.fillna(out).fillna(piece)
            return out.fillna("").astype(object)

        return concat_fn
    m = re.fullmatch(r"date_format\((.+),\s*'([^']+)'\)", e, re.DOTALL)
    if m:
        inner, fmt = m.group(1).strip(), _java_fmt_to_strftime(m.group(2))

        def to_ts(pdf):
            im = re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", inner)
            if im:
                return pd.to_datetime(pdf[inner])
            im = re.fullmatch(
                r"timestamp_millis\(CAST\(([A-Za-z0-9_]+) AS BIGINT\)\)",
                inner)
            if im:
                return pd.to_datetime(pdf[im.group(1)].astype("int64"),
                                      unit="ms")
            im = re.fullmatch(
                r"timestamp_seconds\(CAST\(([A-Za-z0-9_]+) AS BIGINT\)"
                r"(?:\s*\*\s*(\d+))?\)", inner)
            if im:
                mult = int(im.group(2) or 1)
                return pd.to_datetime(
                    pdf[im.group(1)].astype("int64") * mult, unit="s")
            im = re.fullmatch(r"to_timestamp\(([A-Za-z0-9_]+),\s*'([^']+)'\)",
                              inner)
            if im:
                return pd.to_datetime(pdf[im.group(1)],
                                      format=_java_fmt_to_strftime(
                                          im.group(2)))
            raise NotImplementedError(
                f"hudi_py writer: unsupported partition expr {expr!r} — "
                "use datasource.write_hudi (the engine evaluates any SQL "
                "expression)")

        return lambda pdf: to_ts(pdf).dt.strftime(fmt).astype(object)
    raise NotImplementedError(
        f"hudi_py writer: unsupported partition expr {expr!r} — "
        "use datasource.write_hudi (the engine evaluates any SQL expression)")


def _record_key_series(pdf, fields):
    """keygen.record_key_col in pandas: Simple (raw string) or Complex
    (``f1:v1,f2:v2``).  Null key-field values follow concat_ws semantics —
    the piece degrades to just the field name (``f2``), never propagating
    NA into the whole key (the engine's record_key_col does the same)."""
    if len(fields) == 1:
        return pdf[fields[0]].astype("string").astype(object)
    out = None
    for f in fields:
        vals = pdf[f].astype("string")
        piece = (f + ":" + vals).fillna(f)
        out = piece if out is None else out + "," + piece
    return out.astype(object)


@dataclass
class _FileStats(WriterCommitMessage):
    stats: list = field(default_factory=list)   # WriteStat-shaped dicts


def _write_task_files(meta: TableMetaClient, instant: str,
                      schema: StructType, fields: list,
                      partition_expr: Optional[str], base_format: str,
                      iterator: Iterator) -> list[dict]:
    """Executor-side kernel shared by batch and streaming writers: key the
    rows, split by hoodie partition, write one new file group per
    (task, partition) under the instant's directory, return WriteStat dicts.
    Task retries are safe: the manifest (assembled at commit) is the source
    of truth; files from failed attempts are ignorable orphans."""
    import pyarrow as pa
    from pyspark import TaskContext

    tid = TaskContext.get().partitionId()
    batches = list(iterator)
    if not batches:
        return []
    return _write_table(meta, instant, tid, schema, fields,
                        partition_expr, base_format,
                        pa.Table.from_batches(batches))


def _write_table(meta: TableMetaClient, instant: str, tid: int,
                 schema: StructType, fields: list,
                 partition_expr: Optional[str], base_format: str,
                 tbl) -> list[dict]:
    """Arrow-native task kernel (r7).  The r6 kernel round-tripped the WHOLE
    task batch through pandas (``to_pandas`` → groupby → ``from_pandas``),
    boxing every payload string into Python objects twice; now only the
    key/partition INPUT columns take the pandas path (through the exact
    evaluators the randomized keygen-parity test pins), and the payload
    moves batch-at-a-time in Arrow: per-partition row selection is a
    vectorized ``Table.filter`` and files are written straight from the
    original Arrow columns — which also ends the int64→float64→int64
    round-trip pandas imposed on nullable integer columns."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    part_fn = _parse_partition_expr(partition_expr)
    # decide with small rows: the pandas evaluators see ONLY the columns
    # they read (key fields + identifiers in the partition expr — the expr
    # grammar is closed, identifiers appear verbatim, so a word-boundary
    # scan over the schema names finds every referenced column; a false
    # positive just converts one extra narrow column)
    need = list(dict.fromkeys(
        list(fields)
        + [c for c in tbl.column_names
           if partition_expr
           and re.search(rf"\b{re.escape(c)}\b", partition_expr)]))
    pdf = tbl.select(need).to_pandas()
    keys = _record_key_series(pdf, fields)
    # null / unparseable partition values land in the default partition —
    # a group-by would silently DROP NA keys otherwise, breaking the
    # "every input row preserved" bulk_insert contract
    ppath = pd.Series(part_fn(pdf), index=pdf.index, dtype="object")
    ppath = ppath.where(ppath.notna(), NON_PARTITIONED)

    n = len(tbl)
    meta_cols = [META_COMMIT_TIME, META_COMMIT_SEQNO, META_RECORD_KEY,
                 META_PARTITION_PATH, META_FILE_NAME]
    data_cols = [f.name for f in schema.fields
                 if not f.name.startswith("_hoodie")]
    part_arr = pa.array(ppath, type=pa.string(), from_pandas=True)
    combined = pa.Table.from_arrays(
        [pa.array([instant] * n, pa.string()),
         pa.array([f"{instant}_{tid}_{i}" for i in range(n)], pa.string()),
         pa.array(keys, type=pa.string(), from_pandas=True),
         part_arr]
        + [tbl.column(c) for c in data_cols],
        schema=pa.schema(
            [pa.field(c, pa.string()) for c in meta_cols[:4]]
            + [tbl.schema.field(c) for c in data_cols]))
    out_dir = meta.instant_data_dir(instant)
    stats: list[dict] = []
    # One stable sort by partition code, then zero-copy slices per group —
    # O(n log n) once instead of one O(n) filter pass PER partition.
    # dictionary_encode assigns codes in first-appearance order and
    # sort_indices is stable, so group order matches the old pandas
    # groupby(sort=False) and rows keep their input order within a group
    # (the _hoodie_commit_seqno sequence per file is unchanged).
    dic = pc.dictionary_encode(part_arr)
    codes = dic.indices
    order = pc.sort_indices(codes)
    sorted_tbl = combined.take(order)
    keys_sorted = keys.iloc[order.to_numpy()]
    parts_in_order = dic.dictionary.to_pylist()
    counts = {vc["values"]: vc["counts"]
              for vc in pc.value_counts(codes).to_pylist()}
    off = 0
    for code, part in enumerate(parts_in_order):
        cnt = counts[code]
        # fg ids become partitionBy directory names on later ENGINE writes:
        # '/' or other specials would be %-escaped there and round-trip as a
        # DIFFERENT fg id than the manifest's — keep ids dir-safe
        safe = re.sub(r"[^A-Za-z0-9_.\-]", "_", str(part))
        fg = f"{safe}-{tid}-{uuid.uuid4().hex[:8]}"
        d = os.path.join(out_dir, f"_fg={fg}")
        os.makedirs(d, exist_ok=True)
        suffix = ".orc" if base_format == "orc" else ".parquet"
        fpath = os.path.join(d, f"part-{tid:05d}-0{suffix}")
        sub = sorted_tbl.slice(off, cnt)
        otbl = sub.add_column(
            4, pa.field(META_FILE_NAME, pa.string()),
            pa.array([fg] * cnt, pa.string()))
        if suffix == ".orc":
            import pyarrow.orc as orc
            orc.write_table(otbl, fpath)
        else:
            import pyarrow.parquet as pq
            pq.write_table(otbl, fpath, compression="snappy")
        # min/max through the same pandas series as r6 (object-compare
        # semantics preserved, keys are narrow)
        grp_keys = keys_sorted.iloc[off:off + cnt]
        stats.append({
            "partition": part, "file_group": fg,
            "path": meta.rel_path(fpath),
            "size": os.path.getsize(fpath),
            "num_records": int(cnt),
            "min_key": str(grp_keys.min()), "max_key": str(grp_keys.max()),
            "log": False, "base_instant": instant,
        })
        off += cnt
    return stats


class HudiBulkWriter(DataSourceArrowWriter):
    def __init__(self, schema: StructType, options, overwrite: bool):
        self._schema = schema
        from .pyds import _norm_path
        self._path = _norm_path(options.get("path"))
        if not self._path:
            raise ValueError("hudi_py: .save(path) required")
        op = options.get("hoodie.datasource.write.operation", "bulk_insert")
        if op != "bulk_insert":
            # "insert" would silently differ too: the engine's insert runs
            # preCombine dedup + small-file bin-packing, which need a plan
            raise NotImplementedError(
                f"hudi_py writer: operation {op!r} needs index tagging / "
                "merge planning — use datasource.write_hudi or HudiTable")
        self._overwrite = overwrite
        if not TableMetaClient.exists(self._path):
            self._meta = _create_from_options(self._path, options)
        else:
            self._meta = TableMetaClient(self._path)
        cfgt = self._meta.config
        self._fields = list(cfgt.recordkey_fields)
        missing = [f for f in self._fields if f not in schema.names]
        if not self._fields or missing:
            raise ValueError(
                f"hudi_py writer: record key fields {missing or '(none)'} "
                "absent from the frame")
        self._part_fn_probe = _parse_partition_expr(cfgt.partition_expr)
        self._partition_expr = cfgt.partition_expr
        self._base_format = getattr(cfgt, "base_format", "parquet")
        # open the instant BEFORE tasks write under its directory — same
        # 3-state protocol as the engine (timeline.py); a crash leaves a
        # dangling inflight the next engine write rolls back
        action = tl.REPLACE_COMMIT if overwrite else tl.COMMIT
        # atomic cross-process claim — see timeline.claim_instant
        ins = self._meta.timeline.claim_instant(
            action, {"operation": "insert_overwrite_table"
                     if overwrite else op})
        self._instant = ins.time
        self._meta.timeline.transition_to_inflight(ins)
        self._action = action

    # -- executor side -----------------------------------------------------
    def write(self, iterator: Iterator) -> _FileStats:
        return _FileStats(_write_task_files(
            self._meta, self._instant, self._schema, self._fields,
            self._partition_expr, self._base_format, iterator))

    # -- driver side -------------------------------------------------------
    def commit(self, messages) -> None:
        from .table import HudiTable

        stats = [s for m in messages if m is not None for s in m.stats]
        md = {
            "operation": ("insert_overwrite_table" if self._overwrite
                          else "bulk_insert"),
            "write_stats": stats,
            "schema": json.dumps(self._full_schema_json()),
        }
        if self._overwrite:
            # replace every PRE-EXISTING live file group (view folded as of
            # now excludes this pending instant's own files)
            from .fsview import FileSystemView
            view = FileSystemView(self._meta)
            new_fgs = {s["file_group"] for s in stats}
            md["replaced_file_groups"] = [
                [sl.partition, sl.file_group]
                for sl in view.latest_slices()
                if sl.file_group not in new_fgs]
        ins = tl.Instant(self._instant, self._action, tl.INFLIGHT)
        self._meta.timeline.transition_to_completed(ins, md)

    def _full_schema_json(self) -> dict:
        return _evolved_schema_json(self._meta, self._schema)

    def abort(self, messages) -> None:
        import shutil
        shutil.rmtree(self._meta.instant_data_dir(self._instant),
                      ignore_errors=True)
        for st in (tl.INFLIGHT, tl.REQUESTED):
            try:
                self._meta.timeline.delete_instant(
                    tl.Instant(self._instant, self._action, st))
            except Exception:
                pass


def _create_from_options(path: str, options) -> TableMetaClient:
    """First-write auto-create (HoodieSparkSqlWriter table bootstrap)."""
    name = options.get("hoodie.table.name")
    keyf = options.get("hoodie.datasource.write.recordkey.field")
    if not name or not keyf:
        raise ValueError(
            "hudi_py writer: first write must carry hoodie.table.name and "
            "hoodie.datasource.write.recordkey.field")
    expr = options.get("hoodie.spark.partitionpath.expr")
    if not expr:
        flds = [f.strip() for f in
                options.get("hoodie.datasource.write.partitionpath.field",
                            "").split(",") if f.strip()]
        expr = (flds[0] if len(flds) == 1
                else f"concat_ws('/', {', '.join(flds)})" if flds else None)
    tc = TableConfig(
        name=name,
        table_type=options.get("hoodie.datasource.write.table.type",
                               "COPY_ON_WRITE"),
        recordkey_fields=tuple(k.strip() for k in keyf.split(",")),
        partition_expr=expr,
        precombine_field=options.get(
            "hoodie.datasource.write.precombine.field"),
        base_format=options.get("hoodie.table.base.file.format", "parquet"),
    )
    _parse_partition_expr(tc.partition_expr)   # fail fast if unsupported
    return TableMetaClient.initialize(path, tc)


def _evolved_schema_json(meta: TableMetaClient, schema: StructType) -> dict:
    """Stored schema for the new commit = meta columns + incoming data
    columns, widened against the previous commit (HudiTable._evolve)."""
    from pyspark.sql.types import StringType, StructField

    from .table import HudiTable

    meta_f = [META_COMMIT_TIME, META_COMMIT_SEQNO, META_RECORD_KEY,
              META_PARTITION_PATH, META_FILE_NAME]
    fields = [StructField(n, StringType()) for n in meta_f] + \
             [f for f in schema.fields if not f.name.startswith("_hoodie")]
    new = StructType(fields)
    try:
        last = meta.timeline.last_completed(tl.DATA_ACTIONS)
        prev = None
        if last is not None:
            sj = meta.timeline.read_metadata(last).get("schema")
            prev = StructType.fromJson(json.loads(sj)) if sj else None
    except Exception:
        prev = None
    return json.loads(HudiTable._evolve(prev, new).json())


# ---------------------------------------------------------------------------
# streaming sink: writeStream.format("hudi_py") — per-micro-batch appends
# ---------------------------------------------------------------------------
_STREAM_MARKER = ".streaming_instant"


def _acquire_batch_instant(meta: TableMetaClient) -> str:
    """All tasks of one micro-batch must stamp the SAME instant into their
    rows, but the Python streaming write API hands the batch id only to the
    driver-side ``commit``.  Coordinate through an atomically-created marker
    file: first task mints the instant, the rest read it.  The marker lives
    exactly one micro-batch (deleted at the START of commit, before the
    instant completes, so a committed instant time can never be reused; a
    crash in between dangles an inflight the engine's next write rolls
    back).  Single concurrent streaming writer per table — same contract as
    the reference's HoodieStreamingSink."""
    import time

    path = os.path.join(meta.meta_path, _STREAM_MARKER)
    for _ in range(200):
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, tl.new_instant_time().encode())
            finally:
                os.close(fd)
        except FileExistsError:
            pass
        try:
            with open(path) as f:
                t = f.read().strip()
            if t:
                return t
        except FileNotFoundError:
            pass      # another batch's commit just consumed it — re-mint
        time.sleep(0.02)
    raise RuntimeError("hudi_py stream writer: could not coordinate a "
                       "batch instant (marker contention)")


class HudiStreamBulkWriter(DataSourceStreamArrowWriter):
    """``df.writeStream.format("hudi_py")`` — per-micro-batch bulk appends
    with exactly-once replay protection (HoodieStreamingSink.scala:41-119):
    the batch id lands in the commit metadata ``extra`` atomically with the
    commit (same keys as streaming/sink.py, so the foreachBatch sink and
    this one recognize each other's stamps).  A replayed batch whose id is
    already stamped commits nothing and cleans its own orphan files.

    Append-only (bulk_insert per batch): upsert/delete streams need index
    tagging — use writeStream.foreachBatch(HudiStreamingSink(table)).
    """

    def __init__(self, schema: StructType, options, overwrite: bool):
        if overwrite:
            raise NotImplementedError(
                "hudi_py stream writer: outputMode overwrite/complete is not "
                "a table semantics — use append mode")
        self._schema = schema
        from .pyds import _norm_path
        self._path = _norm_path(options.get("path"))
        if not self._path:
            raise ValueError("hudi_py: .option('path', …) required")
        self._query_id = options.get("hoodie.datasource.write.streaming.query.id",
                                     "hudi_py_stream")
        if not TableMetaClient.exists(self._path):
            self._meta = _create_from_options(self._path, options)
        else:
            self._meta = TableMetaClient(self._path)
        cfgt = self._meta.config
        self._fields = list(cfgt.recordkey_fields)
        missing = [f for f in self._fields if f not in schema.names]
        if not self._fields or missing:
            raise ValueError(
                f"hudi_py stream writer: record key fields "
                f"{missing or '(none)'} absent from the frame")
        _parse_partition_expr(cfgt.partition_expr)    # fail fast
        self._partition_expr = cfgt.partition_expr
        self._base_format = getattr(cfgt, "base_format", "parquet")

    # -- executor side -----------------------------------------------------
    def write(self, iterator: Iterator) -> _FileStats:
        instant = _acquire_batch_instant(self._meta)
        return _FileStats(_write_task_files(
            self._meta, instant, self._schema, self._fields,
            self._partition_expr, self._base_format, iterator))

    # -- driver side -------------------------------------------------------
    def commit(self, messages, batchId: int) -> None:
        import shutil

        from .streaming.sink import (BATCH_ID_KEY, QUERY_ID_KEY,
                                     last_stamped_batch)

        stats = [s for m in messages if m is not None for s in m.stats]
        marker = os.path.join(self._meta.meta_path, _STREAM_MARKER)
        instant = None
        try:
            with open(marker) as f:
                instant = f.read().strip() or None
        except FileNotFoundError:
            pass
        last = last_stamped_batch(self._meta.timeline, self._query_id)
        if last is not None and batchId <= last:
            # replayed batch already committed before a crash — drop the
            # replay's orphan files and keep exactly-once
            try:
                os.remove(marker)
            except FileNotFoundError:
                pass
            if instant:
                shutil.rmtree(self._meta.instant_data_dir(instant),
                              ignore_errors=True)
            return
        if instant is None:
            return                      # empty batch: nothing to commit
        # 1) open the instant on the timeline FIRST, so the batch's data
        #    files are always covered by a requested/inflight and a crash at
        #    any point below degrades to a dangling inflight (recovered by
        #    the engine's rollback-on-start), never untracked orphans;
        # 2) only THEN consume the marker — a marker whose instant is
        #    already on the timeline is safely re-consumed by a replay
        #    (create_requested/transition are idempotent overwrites), and a
        #    completed instant's time can never be re-minted because the
        #    marker is gone before completion.
        ins = self._meta.timeline.create_requested(
            instant, tl.COMMIT, {"operation": "bulk_insert"})
        self._meta.timeline.transition_to_inflight(ins)
        try:
            os.remove(marker)
        except FileNotFoundError:
            pass
        md = {
            "operation": "bulk_insert",
            "write_stats": stats,
            "schema": json.dumps(_evolved_schema_json(self._meta,
                                                      self._schema)),
            "extra": {BATCH_ID_KEY: int(batchId),
                      QUERY_ID_KEY: self._query_id},
        }
        self._meta.timeline.transition_to_completed(
            tl.Instant(instant, tl.COMMIT, tl.INFLIGHT), md)

    def abort(self, messages, batchId: int) -> None:
        import shutil

        marker = os.path.join(self._meta.meta_path, _STREAM_MARKER)
        try:
            with open(marker) as f:
                instant = f.read().strip() or None
            os.remove(marker)
        except FileNotFoundError:
            instant = None
        if instant:
            shutil.rmtree(self._meta.instant_data_dir(instant),
                          ignore_errors=True)
