"""HudiTable — the public table API (write operators × read operators).

The programmatic surface mirrors the reference's SparkRDDWriteClient
(hudi-client/hudi-spark-client/.../client/SparkRDDWriteClient.java:118-348)
and datasource read dispatch (hudi-spark-datasource/.../DefaultSource.scala:
111-137), re-expressed as DataFrame transforms over plain Parquet plus the
JSON timeline.  Every operator below cites its reference twin.

Scale design (what survives 1000 executors / 100 TB):
  - reads resolve O(#file-groups) paths driver-side from the commit manifest —
    zero filesystem listing — and hand Spark a plain parquet scan (Catalyst
    pushdown/pruning/codegen all apply);
  - upsert shuffles only the incoming batch + the rewritten file groups,
    never the table;
  - merges are key-hash windows (map-side combine, AQE skew handling);
  - all planning state on the driver is O(#touched file groups).
"""

from __future__ import annotations

import json
import os
from typing import Iterable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (BooleanType, StringType, StructField,
                               StructType)

from . import timeline as tl
from .config import (BULK_INSERT, COPY_ON_WRITE, DELETE, DELETE_MARKER,
                     DELETE_PARTITION, INDEX_INMEMORY, INDEX_SIMPLE, INSERT,
                     INSERT_OVERWRITE,
                     INSERT_OVERWRITE_TABLE, MERGE_ON_READ, META_COLUMNS,
                     META_COMMIT_SEQNO, META_COMMIT_TIME, META_FILE_NAME,
                     META_PARTITION_PATH,
                     META_RECORD_KEY, PAYLOAD_DEFAULT, QUERY_INCREMENTAL,
                     QUERY_READ_OPTIMIZED,
                     QUERY_SNAPSHOT, SORT_GLOBAL, SORT_PARTITION, UPSERT,
                     TableConfig, WriteConfig)
from .fsview import FileSlice, FileSystemView, WriteStat
from .indexing import FG_COL, load_key_index, tag_locations
from .keygen import partition_path_col, record_key_col
from .metaclient import TableMetaClient
from .plans.buckets import (assign_insert_buckets, avg_record_size,
                            new_fg_id, plan_insert_buckets)
from .writer import (API_DELETE, FG, MERGE_KEY, NEW_FLAG, collect_write_stats,
                     drop_deleted, merge_latest, ordered_meta_projection,
                     precombine_dedup_in_bucket,
                     precombine_dedup, with_commit_meta, with_key_columns,
                     write_instant_files)

from .scan import scan_parquet
from .services.clustering import ClusteringUpdateConflict as _ClusteringConflict
from .timing import _stage


class HudiTable:
    def __init__(self, spark: SparkSession, base_path: str,
                 write_config: Optional[WriteConfig] = None):
        self.spark = spark
        self.meta = TableMetaClient(base_path)
        self.cfg = write_config or WriteConfig()
        # OCC pre-commit guard (concurrency.OccWriter installs a context
        # manager factory: _pre_commit_hook(instant_time, touched_fgs))
        self._pre_commit_hook = None
        # INMEMORY index state (SparkInMemoryHashIndex.java): a persisted
        # (key, partition, fg) DataFrame cached across write batches.
        # Validity token = the SET of completed data-action instant times at
        # validation (plus a ("pending", instant) sentinel while a seeding
        # write is inflight).  Comparing the whole set — not just the newest
        # time — catches commits that complete at a buried instant time:
        # executing a scheduled clustering/compaction plan completes a
        # replacecommit at its old SCHEDULED time, which can sort before the
        # cache's validation point while replacing file groups the cache
        # still maps keys to (stale routing there silently loses rows).
        self._key_index: Optional[DataFrame] = None
        self._key_index_parts: set = set()
        self._key_index_valid_token = None
        # NOTE: commit bookkeeping (streaming batch-id stamps, ingest
        # checkpoints) is threaded through the write ops as an explicit
        # ``commit_extras`` argument into _complete() — never a mutable
        # table-level slot.  A table-level "next commit" slot raced with
        # table services committing on daemon threads (async compaction's
        # commit could steal the streaming stamp → silent data loss on
        # crash replay).  HoodieStreamingSink.scala:92-94 /
        # DeltaSync.java:311-360 likewise record these in the same commit.

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    @staticmethod
    def create(spark: SparkSession, base_path: str, name: str,
               recordkey_fields: Sequence[str],
               partition_expr: Optional[str] = None,
               precombine_field: Optional[str] = None,
               table_type: str = COPY_ON_WRITE,
               payload: Optional[str] = None,
               write_config: Optional[WriteConfig] = None,
               base_format: str = "parquet") -> "HudiTable":
        """CREATE TABLE (CreateHoodieTableCommand.scala equivalent)."""
        from .config import PAYLOAD_OVERWRITE_LATEST
        if base_format not in ("parquet", "orc"):
            raise ValueError(f"unsupported base file format {base_format!r} "
                             "(parquet, orc; reference HoodieFileFormat.java)")
        tc = TableConfig(
            name=name, table_type=table_type,
            recordkey_fields=tuple(recordkey_fields),
            partition_expr=partition_expr,
            precombine_field=precombine_field,
            payload=payload or PAYLOAD_OVERWRITE_LATEST,
            base_format=base_format)
        TableMetaClient.initialize(base_path, tc)
        t = HudiTable(spark, base_path, write_config)
        t._recover_dangling()
        return t

    @staticmethod
    def load(spark: SparkSession, base_path: str,
             write_config: Optional[WriteConfig] = None) -> "HudiTable":
        if not TableMetaClient.exists(base_path):
            raise FileNotFoundError(f"not a table (no .hoodie): {base_path}")
        t = HudiTable(spark, base_path, write_config)
        return t

    @property
    def tc(self) -> TableConfig:
        return self.meta.config

    @property
    def timeline(self) -> tl.Timeline:
        return self.meta.timeline

    def view(self, as_of: Optional[str] = None,
             active_instants: Optional[list] = None) -> FileSystemView:
        return FileSystemView(self.meta, as_of=as_of,
                              active_instants=active_instants)

    # ------------------------------------------------------------------
    # INMEMORY index cache (SparkInMemoryHashIndex.java — generalised to a
    # persisted DataFrame so it scales past driver memory; the reference's
    # ConcurrentHashMap is test-only)
    # ------------------------------------------------------------------
    def _invalidate_key_index(self) -> None:
        if self._key_index is not None:
            try:
                self._key_index.unpersist()
            except Exception:
                pass
        self._key_index = None
        self._key_index_parts = set()
        self._key_index_valid_token = None

    def _data_instants_token(self, active: Optional[list] = None) -> frozenset:
        """Cache-validity token: every completed data-action instant time.
        Pass ``active`` (a ``timeline.instants()`` snapshot) to derive the
        token from an existing listing instead of paying a fresh one."""
        if active is None:
            active = self.timeline.instants()
        return frozenset(i.time for i in
                         tl.completed_from(active, tl.DATA_ACTIONS))

    def _token_still_valid(self, stored, current: frozenset) -> bool:
        """Is a cached key index stamped with ``stored`` still trustworthy
        when the active timeline now shows ``current``?

        - equal → yes (nothing committed since the stamp).
        - ``current`` has an instant ``stored`` never saw → no (a foreign
          commit may have remapped keys).
        - ``current`` only SHRANK → yes iff every missing instant now sits
          in the archive dir: archival moves an oldest prefix of completed
          instants out of the active timeline without touching key→file-
          group mappings (services/archival.py).  Safe because archival
          retains ≥ archive_min_commits newest instants — a foreign commit
          can never vanish into the archive without an even newer foreign
          instant staying active (which fails the superset check above).
          Anything else missing (a restore deleting commits) → no.
        One archive-dir listing, paid only on the rare shrink; callers
        re-stamp the cache with ``current`` on success so the next batch
        compares equal again."""
        if stored == current:
            return True
        if not isinstance(stored, frozenset):   # None / ("pending", t)
            return False
        if not (current <= stored):
            return False
        missing = stored - current
        archived = {i.time for i in self.timeline.archived_instants()}
        return missing <= archived

    @property
    def _index_cache_on(self) -> bool:
        """Session key-index cache applies to INMEMORY (always — that IS the
        index) and to SIMPLE when cfg.cache_simple_index (an optimization
        over the reference's per-batch re-scan; timeline-validated, so
        semantics are identical)."""
        return (self.cfg.index_type == INDEX_INMEMORY
                or (self.cfg.index_type == INDEX_SIMPLE
                    and self.cfg.cache_simple_index))

    def _load_index(self, view: FileSystemView,
                    partitions: Optional[list],
                    key_range: Optional[tuple],
                    only_fgs: Optional[set] = None,
                    token: Optional[frozenset] = None) -> DataFrame:
        """Key→location index for tagging.  INMEMORY (and SIMPLE with
        cache_simple_index) keeps the scan result persisted across batches
        (valid while no commit has changed any key→file-group mapping;
        update-only upserts extend validity), loading only partitions not
        yet covered — repeated upserts into hot partitions skip the
        table-sized key-column scan entirely."""
        it = self.cfg.index_type
        if not self._index_cache_on:
            return load_key_index(self.spark, self.meta, view, it,
                                  partitions, key_range, tc=self.tc,
                                  only_fgs=only_fgs)
        # `token` must be captured BEFORE the caller built `view` (the same
        # read-ordering rule as pending-compaction-before-view below): a
        # commit completing between token capture and view build makes the
        # token MISS an instant the view saw — the next batch then safely
        # over-invalidates.  Computing the token here, AFTER the view, has
        # the loss-shaped failure: a rebuild from the pre-commit view would
        # be stamped with a post-commit token and trusted forever.
        tok = token if token is not None else self._data_instants_token()
        if self._key_index is not None:
            if self._token_still_valid(self._key_index_valid_token, tok):
                # archival may have shrunk the active set without touching
                # mappings — re-stamp so the next batch compares equal
                self._key_index_valid_token = tok
            else:
                self._invalidate_key_index()  # out-of-band commit → stale
        need = set(partitions or [])
        if self._key_index is None:
            df = load_key_index(self.spark, self.meta, view, INDEX_SIMPLE,
                                sorted(need), None, tc=self.tc).persist()
            df.count()  # materialize now so every later job hits the cache
            self._key_index = df
            self._key_index_parts = set(need)
            self._key_index_valid_token = tok
        else:
            missing = sorted(need - self._key_index_parts)
            if missing:
                add = load_key_index(self.spark, self.meta, view,
                                     INDEX_SIMPLE, missing, None, tc=self.tc)
                old, merged = self._key_index, None
                merged = old.unionByName(add).persist()
                merged.count()
                old.unpersist()
                self._key_index = merged
                self._key_index_parts |= set(missing)
        return self._key_index

    def _recover_dangling(self) -> None:
        """Crash recovery on open: roll back inflight/requested *data* writes
        left behind by a failed writer (reference: rollback-on-start,
        BaseRollbackActionExecutor + marker files; our manifest design means
        dangling files are invisible anyway — we just clear the instants)."""
        from .services.rollback import rollback_pending
        rollback_pending(self)

    # ------------------------------------------------------------------
    # schema bookkeeping (TableSchemaResolver.java:55,154-179 — schema rides
    # in the last commit's metadata; evolution = compatible adds)
    # ------------------------------------------------------------------
    def stored_schema(self, active: Optional[list] = None) -> Optional[StructType]:
        if active is not None:
            comp = tl.completed_from(active, tl.DATA_ACTIONS)
            last = comp[-1] if comp else None
        else:
            last = self.timeline.last_completed(tl.DATA_ACTIONS)
        if last is None:
            # degenerate corner: every data instant archived (deep restore
            # after heavy archival) — the schema still rides in the newest
            # archived commit's metadata
            archived = sorted((i for i in self.timeline.archived_instants()
                               if i.action in tl.DATA_ACTIONS),
                              key=lambda i: i.time)
            if not archived:
                return None
            last = archived[-1]
        md = self.timeline.read_metadata(last)
        sj = md.get("schema")
        return StructType.fromJson(json.loads(sj)) if sj else None

    @staticmethod
    def _is_widening(old, new) -> bool:
        """Avro-promotion-style compatible type widening (the reference's
        schema resolution allows int→long and float→double; Spark 4's parquet
        reader reads old narrow files directly with the widened schema).
        Decimal: precision growth at the same scale."""
        from pyspark.sql.types import (ByteType, DecimalType, DoubleType,
                                       FloatType, IntegerType, LongType,
                                       ShortType)
        ints = (ByteType, ShortType, IntegerType, LongType)
        if isinstance(old, ints) and isinstance(new, ints):
            return ints.index(type(new)) > ints.index(type(old))
        if isinstance(old, FloatType) and isinstance(new, DoubleType):
            return True
        if isinstance(old, DecimalType) and isinstance(new, DecimalType):
            return new.scale == old.scale and new.precision >= old.precision
        return False

    @classmethod
    def _evolve(cls, prev: Optional[StructType], new: StructType) -> StructType:
        if prev is None:
            return new
        by_name = {f.name: f for f in prev.fields}
        widened: dict[str, StructField] = {}
        for f in new.fields:
            old = by_name.get(f.name)
            if old is None:
                by_name[f.name] = f  # backwards-compatible add
            elif old.dataType.simpleString() != f.dataType.simpleString():
                if cls._is_widening(old.dataType, f.dataType):
                    widened[f.name] = StructField(f.name, f.dataType,
                                                  old.nullable or f.nullable)
                elif cls._is_widening(f.dataType, old.dataType):
                    pass  # incoming is narrower — stored type wins, union casts up
                else:
                    raise ValueError(
                        f"incompatible schema change for column {f.name}: "
                        f"{old.dataType.simpleString()} -> {f.dataType.simpleString()}")
        # preserve previous order (applying widenings), append new fields
        fields = [widened.get(f.name, f) for f in prev.fields]
        fields += [f for f in new.fields if f.name not in
                   {p.name for p in prev.fields}]
        return StructType(fields)

    def _read_schema(self, extra_bool_cols: Sequence[str] = (),
                     active: Optional[list] = None) -> StructType:
        s = self.stored_schema(active)
        if s is None:
            raise ValueError("table has no completed commits")
        fields = list(s.fields)
        names = {f.name for f in fields}
        for c in extra_bool_cols:
            if c not in names:
                fields.append(StructField(c, BooleanType()))
        return StructType(fields)

    # ------------------------------------------------------------------
    # commit protocol helpers
    # ------------------------------------------------------------------
    def _start(self, action: str) -> tl.Instant:
        # eager rollback of failed writes at write start (the reference's
        # rollback-on-start) — single-writer mode only: with OCC another
        # writer's inflight instant is live work, not a crash (the reference
        # likewise defers to heartbeat-based lazy cleaning under OCC)
        if action in tl.DATA_ACTIONS:
            # refuse newer-version tables / auto-upgrade older ones BEFORE
            # any instant exists (UpgradeDowngrade at write-client init)
            from .services.upgrade import check_write_version
            check_write_version(self)
        # once per table instance, like the reference (rollback-on-start
        # happens at WRITE-CLIENT init, not per commit — a live writer's own
        # COMPLETED batches can't be crash debris, and under single-writer
        # mode nobody else writes); saves a timeline listing + metadata
        # reads on every steady-state batch.  A data write that STARTED but
        # never completed on this instance (exception after _start) IS
        # debris, so _last_started re-arms recovery for the next write.
        if action in tl.DATA_ACTIONS \
                and getattr(self, "_last_started", None) is not None:
            self._recovered_on_start = False
        if action in tl.DATA_ACTIONS and self._pre_commit_hook is None \
                and not getattr(self, "_recovering", False) \
                and not getattr(self, "_recovered_on_start", False):
            self._recovering = True
            try:
                self._recover_dangling()
                self._recovered_on_start = True
            finally:
                self._recovering = False
        # atomic cross-process claim: two writers minting the same
        # millisecond can never share an instant (timeline.claim_instant)
        ins = self.timeline.claim_instant(action)
        if action in tl.DATA_ACTIONS and not getattr(self, "_recovering", False):
            self._last_started = ins.time
        return self.timeline.transition_to_inflight(ins)

    def _complete(self, instant: tl.Instant, operation: str,
                  stats: list[WriteStat],
                  schema: Optional[StructType],
                  replaced: Optional[Iterable[tuple[str, str]]] = None,
                  extra: Optional[dict] = None,
                  completed_action: Optional[str] = None) -> tl.Instant:
        md = {
            "instant": instant.time,
            "operation": operation,
            "schema": schema.json() if schema is not None else None,
            "write_stats": [s.to_json() for s in stats],
            "replaced_file_groups": [list(x) for x in (replaced or [])],
            "num_records_written": sum(s.num_records for s in stats),
            "total_bytes_written": sum(s.size for s in stats),
            "extra": dict(extra or {}),
        }
        if self._pre_commit_hook is not None:
            touched = {(s.partition, s.file_group) for s in stats}
            touched |= {tuple(x) for x in (replaced or [])}
            with self._pre_commit_hook(instant.time, touched):
                done = self.timeline.transition_to_completed(instant, md,
                                                             completed_action)
        else:
            done = self.timeline.transition_to_completed(instant, md,
                                                         completed_action)
        if getattr(self, "_last_started", None) == instant.time:
            self._last_started = None    # batch completed — not debris
        for cb in getattr(self, "_commit_callbacks", []):
            cb(done.time, md)  # HoodieWriteCommitCallback equivalent
        return done

    # ------------------------------------------------------------------
    # write preparation
    # ------------------------------------------------------------------
    def _prepare(self, df: DataFrame, instant_time: str, combine: bool) -> DataFrame:
        from .indexing import is_global
        out = with_key_columns(df, self.tc)
        if combine:
            out = precombine_dedup(out, self.tc,
                                   global_index=is_global(self.cfg.index_type))
        out = with_commit_meta(out, instant_time)
        return ordered_meta_projection(out, [f.name for f in df.schema.fields])

    def _commit_schema(self, prepared: DataFrame,
                       active: Optional[list] = None) -> StructType:
        drop = {FG, API_DELETE}
        new = StructType([f for f in prepared.schema.fields if f.name not in drop])
        return self._evolve(self.stored_schema(active), new)

    # ==================================================================
    # WRITE OPERATORS
    # ==================================================================
    def bulk_insert(self, df: DataFrame, sort_mode: Optional[str] = None,
                    commit_extras: Optional[dict] = None) -> str:
        """First-load path (SparkRDDWriteClient.java:223-244,
        SparkBulkInsertHelper.java + sort modes §2.4).  No index lookup; sizes
        new files to target; GLOBAL_SORT default → key-sorted files whose
        min/max ranges make the BLOOM-style index prune hard."""
        instant = self._start(tl.COMMIT)
        prepared = self._prepare(df, instant.time, self.cfg.combine_before_insert)
        stats, fg_map, schema = self._write_inserts(
            prepared, instant.time, pack_small_files=False,
            sort_mode=sort_mode or self.cfg.bulk_insert_sort_mode,
            profile_df=with_key_columns(df, self.tc))
        self._complete(instant, BULK_INSERT, stats, schema,
                       extra=commit_extras)
        self._post_commit()
        return instant.time

    def insert(self, df: DataFrame,
               commit_extras: Optional[dict] = None) -> str:
        """Insert with small-file bin packing (SparkRDDWriteClient.java:172-178;
        packing = UpsertPartitioner small-file handling).  No key-based
        routing: duplicate keys are *not* merged (reference semantics)."""
        instant = self._start(tl.COMMIT)
        prepared = self._prepare(df, instant.time, self.cfg.combine_before_insert)
        stats, fg_map, schema = self._write_inserts(
            prepared, instant.time,
            pack_small_files=(self.tc.table_type == COPY_ON_WRITE),
            sort_mode=SORT_PARTITION,
            profile_df=with_key_columns(df, self.tc))
        self._complete(instant, INSERT, stats, schema, extra=commit_extras)
        self._post_commit()
        return instant.time

    def _write_inserts(self, prepared: DataFrame, instant_time: str,
                       pack_small_files: bool, sort_mode: str,
                       action_view: Optional[FileSystemView] = None,
                       profile_df: Optional[DataFrame] = None,
                       combine_in_write: bool = False,
                       seed_key_index: bool = False,
                       frozen_fgs: Optional[set] = None):
        """Shared insert path: profile → bucket plan → assign → write.
        Packed small file groups are rewritten (old ∪ new) — COW semantics.
        ``profile_df``: cheaper pre-combine frame to count (same partitions,
        counts ≥ the written rows — bucket sizing is statistical anyway).
        ``combine_in_write``: caller skipped preCombine; fold it into the
        write shuffle (one exchange total — see precombine_dedup_in_bucket).
        Requires non-global keys; disabled when small-file packing unions
        stored rows (those must not dedup against the batch)."""
        view = action_view if action_view is not None else self.view()
        # validate evolution on the raw batch BEFORE any union coerces types
        self._commit_schema(prepared)
        rec_size = avg_record_size(self.meta, self.timeline,
                                   self.cfg.record_size_estimate)
        # GLOBAL_SORT all-new-bucket loads (bulk_insert / insert_overwrite*)
        # fold the range-split key sampling AND split-point selection into
        # the profile aggregation (r6 fused the sampling — 3 input scans →
        # 2; r7 distributes the selection — the driver collects O(buckets)
        # split points, never raw sampled keys; see fused_profile_splits).
        # Requires a keyed profile frame: a keyless profile_df (no current
        # caller) must NOT silently switch the counted frame to `prepared`
        # (ADVICE r6) — it falls back to the unfused count + legacy
        # sampling of `prepared` below.
        sample_splits = None
        with _stage("insert.profile"):
            src = profile_df if profile_df is not None else prepared
            if (sort_mode == SORT_GLOBAL and not pack_small_files
                    and META_RECORD_KEY in src.columns):
                from .plans.buckets import fused_profile_splits
                rows = fused_profile_splits(
                    src, META_PARTITION_PATH, META_RECORD_KEY, rec_size,
                    self.cfg.target_file_size_bytes).collect()
                profile = {r[0]: r[1] for r in rows}
                sample_splits = {r[0]: r[2] for r in rows}
            else:
                profile = {r[0]: r[1] for r in
                           src.groupBy(META_PARTITION_PATH).count().collect()}
        if frozen_fgs is None and pack_small_files:
            from .services.clustering import pending_clustering_fgs
            frozen_fgs = set(pending_clustering_fgs(self))
        plan = plan_insert_buckets(profile, view if pack_small_files else None,
                                   self.cfg, rec_size,
                                   pack_small_files=pack_small_files,
                                   exclude_fgs=frozen_fgs
                                   if pack_small_files else None)
        # GLOBAL_SORT into all-new buckets (bulk loads): assign by key RANGE
        # (sampled split points) instead of key hash — each written file then
        # owns a disjoint key interval, so manifest min/max stats make the
        # BLOOM-style write index and read_keys point lookups maximally
        # selective.  Steady one-bucket-per-partition plans skip the sample.
        if (sort_mode == SORT_GLOBAL
                and plan and all(b.is_new_fg for b in plan)):
            from .plans.buckets import (assign_insert_buckets_range,
                                        range_split_points)
            splits = range_split_points(prepared, plan, profile,
                                        META_PARTITION_PATH, META_RECORD_KEY,
                                        splits=sample_splits)
            assigned = assign_insert_buckets_range(
                self.spark, prepared, plan,
                META_PARTITION_PATH, META_RECORD_KEY, FG, splits)
        else:
            assigned = assign_insert_buckets(self.spark, prepared, plan,
                                             META_PARTITION_PATH,
                                             META_RECORD_KEY, FG)
        assigned = assigned.withColumn(META_FILE_NAME, F.col(FG))
        fg_map = {b.file_group: b.partition for b in plan}

        packed = [b for b in plan if not b.is_new_fg]
        if combine_in_write:
            # single-exchange dedup+write: cluster the batch by file group
            # once, dedup inside those partitions (twins collocate — bucket
            # assignment hashes the record key), write pre-partitioned.
            par = self.spark.sparkContext.defaultParallelism
            n = max(1, min(len(fg_map), self.cfg.write_parallelism or par))
            assigned = assigned.repartition(n, F.col(FG))
            assigned = precombine_dedup_in_bucket(assigned, self.tc, FG)
        if packed:
            # stored rows must NOT dedup against the batch (insert keeps
            # duplicate twins) — union after the fused dedup; the union
            # breaks the clustering, so the write re-exchanges below
            old = self._read_fg_files(view, {b.file_group for b in packed})
            assigned = old.unionByName(assigned, allowMissingColumns=True)

        sort_cols = self._sort_cols(sort_mode)
        schema = self._commit_schema(assigned)
        # INMEMORY index bootstrap: a write into an EMPTY table IS the whole
        # table — the batch's (key, partition, fg) columns are exactly what
        # load_key_index would re-scan from the just-written files.  Persist
        # the write frame so the index projection comes off the cache instead
        # of a table-sized parquet re-scan on the next upsert (the reference
        # similarly feeds write locations back into its index,
        # HoodieIndex.updateLocation).  Empty-table-only (otherwise stored
        # rows outside the batch would be missing), and only when the caller
        # opts in: the persist adds columnar-cache encode cost to the write
        # job, which pays off on upsert-style ingests (the next op is almost
        # certainly another upsert) but not on one-shot bulk loads.
        seed_index = (seed_key_index
                      and self._index_cache_on
                      and not view.latest_slices())
        if seed_index:
            assigned = assigned.persist()
        with _stage("insert.write"):
            if combine_in_write and not packed:
                stats = write_instant_files(
                    assigned, self.meta, instant_time, fg_map, self.cfg,
                    sort_cols=[FG] + (sort_cols or []), pre_partitioned=True)
            else:
                stats = write_instant_files(assigned, self.meta, instant_time,
                                            fg_map, self.cfg,
                                            sort_cols=sort_cols)
        if seed_index:
            from .indexing import CUR_PART_COL
            self._invalidate_key_index()
            idx = assigned.select(
                F.col(META_RECORD_KEY),
                F.col(META_PARTITION_PATH).alias(CUR_PART_COL),
                F.col(FG).alias(FG_COL)).persist()
            idx.count()
            assigned.unpersist()
            self._key_index = idx
            self._key_index_parts = {b.partition for b in plan}
            # commit not completed yet — the caller revalidates the sentinel
            # into a real token right after its _complete()
            self._key_index_valid_token = ("pending", instant_time)
        return stats, fg_map, schema

    def _sort_cols(self, sort_mode: str) -> Optional[list[str]]:
        if sort_mode == SORT_GLOBAL:
            return [META_PARTITION_PATH, META_RECORD_KEY]
        if sort_mode == SORT_PARTITION:
            return [META_RECORD_KEY]
        return None

    def upsert_prepped(self, df: DataFrame,
                       commit_extras: Optional[dict] = None) -> str:
        """upsertPreppedRecords (SparkRDDWriteClient.java:162-167): caller
        already deduplicated — skip the preCombine window."""
        saved = self.cfg
        self.cfg = self.cfg.with_(combine_before_upsert=False)
        try:
            return self._upsert_impl(df, UPSERT, commit_extras=commit_extras)
        finally:
            self.cfg = saved

    def bulk_insert_prepped(self, df: DataFrame,
                            commit_extras: Optional[dict] = None) -> str:
        """bulkInsertPreppedRecords (SparkRDDWriteClient.java:238-244)."""
        saved = self.cfg
        self.cfg = self.cfg.with_(combine_before_insert=False)
        try:
            return self.bulk_insert(df, commit_extras=commit_extras)
        finally:
            self.cfg = saved

    def insert_prepped(self, df: DataFrame,
                       commit_extras: Optional[dict] = None) -> str:
        """insertPreppedRecords (SparkRDDWriteClient.java:182-188): caller
        already combined — skip the optional pre-insert dedup."""
        saved = self.cfg
        self.cfg = self.cfg.with_(combine_before_insert=False)
        try:
            return self.insert(df, commit_extras=commit_extras)
        finally:
            self.cfg = saved

    def delete_prepped(self, keys_df: DataFrame,
                       commit_extras: Optional[dict] = None) -> str:
        """deletePreppedRecords: keys already unique — skip the dedup stage."""
        saved = self.cfg
        self.cfg = self.cfg.with_(combine_before_upsert=False)
        try:
            return self._upsert_impl(
                keys_df.withColumn(API_DELETE, F.lit(True)), DELETE,
                commit_extras=commit_extras)
        finally:
            self.cfg = saved

    def upsert(self, df: DataFrame,
               commit_extras: Optional[dict] = None) -> str:
        """The heart (SparkRDDWriteClient.java:149-159 →
        BaseSparkCommitActionExecutor.java:112-145): preCombine → index tag →
        partition into update/insert buckets → COW merge-rewrite of affected
        file groups / MOR delta append."""
        return self._upsert_impl(df, UPSERT, commit_extras=commit_extras)

    def delete(self, keys_df: DataFrame,
               commit_extras: Optional[dict] = None) -> str:
        """Hard delete by key (SparkRDDWriteClient.java:248-253,
        SparkDeleteHelper.java:49-105): dedup keys → tag → keep only existing
        → merge that drops them (COW) or delete-marker delta rows (MOR)."""
        return self._upsert_impl(keys_df.withColumn(API_DELETE, F.lit(True)),
                                 DELETE, commit_extras=commit_extras)

    def _upsert_impl(self, df: DataFrame, operation: str,
                     commit_extras: Optional[dict] = None) -> str:
        is_delete = operation == DELETE
        action = (tl.DELTA_COMMIT if self.tc.table_type == MERGE_ON_READ
                  else tl.COMMIT)
        instant = self._start(action)
        prepared = self._prepare(df, instant.time,
                                 combine=self.cfg.combine_before_upsert)
        # THE batch's single active-timeline listing (shared by the schema
        # check, the validity token, the pending sets, and the view below)
        active = self.timeline.instants()
        # validate evolution on the raw batch BEFORE any union coerces types
        self._commit_schema(prepared, active)
        # workload profiles run on the RAW keyed batch, not the deduped one:
        # identical partition set, conservative (≥) counts and key ranges —
        # so the preCombine shuffle never materializes just to be counted
        profile_src = with_key_columns(df, self.tc)
        persisted = False
        tagged = None
        try:
            # ONE active-timeline listing per batch: the cache-validity
            # token, the pending-compaction set, and the file-system view
            # are all derived from this single snapshot, so token ≡ view
            # state by construction — no capture-ordering argument between
            # them, and no stability re-check.  A daemon commit landing
            # after this listing is invisible to ALL THREE consistently;
            # the next batch's fresh listing sees it and over-invalidates
            # the cache (safe direction).
            with _stage("upsert.view"):
                tok0 = (self._data_instants_token(active)
                        if self._index_cache_on else None)
                # pending compactions from the SAME snapshot as the view:
                # every compaction is either (a) pending in the snapshot →
                # logs get bumped to its instant, or (b) completed in it →
                # the view's latest slice IS its new base.  (A mixed read
                # order loses writes: stale view base + empty pending →
                # orphaned log.)
                pending_compaction: dict[str, str] = {}
                if self.tc.table_type == MERGE_ON_READ:
                    for p in tl.pending_from(active):
                        if p.action != tl.COMPACTION:
                            continue
                        # the async compactor may TRANSITION this instant
                        # between our listing and this read (requested →
                        # inflight deletes the requested file; completion
                        # lands as a .commit).  Chase the plan through the
                        # states; a compaction that completed AFTER the
                        # snapshot must still bump logs to its instant —
                        # the snapshot view predates its new base, so (a)
                        # of the invariant applies, with the fgs taken
                        # from the completed commit's write stats.
                        plan = None
                        for st in (p.state, tl.REQUESTED, tl.INFLIGHT):
                            try:
                                plan = self.timeline.read_metadata(
                                    tl.Instant(p.time, tl.COMPACTION, st))
                                break
                            except FileNotFoundError:
                                continue
                        if plan is not None:
                            fgs = [op["file_group"]
                                   for op in plan.get("operations", [])]
                        else:
                            try:
                                done_md = self.timeline.read_metadata(
                                    tl.Instant(p.time, tl.COMMIT,
                                               tl.COMPLETED))
                            except FileNotFoundError:
                                continue  # rolled back/unscheduled mid-race
                            fgs = [s["file_group"] for s in
                                   done_md.get("write_stats", [])]
                        for fg in fgs:
                            pending_compaction[fg] = max(
                                pending_compaction.get(fg, ""), p.time)
                # file groups frozen by a scheduled clustering plan:
                # updates/deletes that touch them are rejected
                # (SparkRejectUpdateStrategy) — checked exactly against the
                # tagged batch in each lane below
                from .services.clustering import pending_clustering_fgs
                frozen_fgs = set(pending_clustering_fgs(self, active))
                view = self.view(active_instants=active)
            if self._index_cache_on and self._key_index is not None:
                if self._token_still_valid(self._key_index_valid_token, tok0):
                    # archival-only shrink keeps the cache; re-stamp so the
                    # equality checks below (cache_covers, _load_index) and
                    # the own-commit extension all work from tok0
                    self._key_index_valid_token = tok0
                else:
                    self._invalidate_key_index()
            if not is_delete and not view.latest_slices():
                # first commit into an empty table: every record is an
                # insert — skip index load, tagging, and the merge window
                # (tagging against an empty index yields the same routing,
                # one table scan and one shuffle more expensive).  With
                # non-global keys the preCombine dedup also folds into the
                # write's own file-group exchange (one shuffle total).
                from .indexing import is_global
                fuse = (self.cfg.combine_before_upsert
                        and not is_global(self.cfg.index_type))
                if fuse:
                    prepared = self._prepare(df, instant.time, combine=False)
                stats, fg_map, schema = self._write_inserts(
                    prepared, instant.time,
                    pack_small_files=(self.tc.table_type == COPY_ON_WRITE),
                    sort_mode=SORT_PARTITION, action_view=view,
                    profile_df=profile_src, combine_in_write=fuse,
                    seed_key_index=True, frozen_fgs=frozen_fgs)
                self._complete(instant, operation, stats, schema,
                               extra=commit_extras)
                if self._index_cache_on:
                    if (self._key_index_valid_token
                            == ("pending", instant.time)):
                        # the index _write_inserts just seeded from this very
                        # commit's write frame reflects exactly the pre-write
                        # timeline plus our own commit — NOT a fresh listing,
                        # which would absorb concurrent daemon commits the
                        # cache knows nothing about
                        self._key_index_valid_token = tok0 | {instant.time}
                    else:
                        self._invalidate_key_index()
                self._post_commit()
                return instant.time
            # ---- COW fast-update lane: one pre-write action total --------
            from .indexing import is_global as _is_global
            fast_lane = (self.tc.table_type == COPY_ON_WRITE
                         and not _is_global(self.cfg.index_type)
                         and self._new_version_wins()
                         and self.cfg.combine_before_upsert
                         and self.cfg.cow_broadcast_merge is not False)
            if fast_lane and any(f.external for sl in view.latest_slices()
                                 for f in sl.base_files):
                fast_lane = False       # bootstrap groups need the general lane
            prof = None
            probe_bc = None
            if fast_lane:
                cap = self.cfg.index_broadcast_max_rows
                # "warm_tag" probe strategy: with a warm covering cached
                # index the per-batch workload-profile collect is replaced
                # by a bounded limit(cap+1) size probe here plus one
                # tag-profile action over the PINNED index inside
                # _upsert_cow_fast (exact touched-group set).  Default
                # "profile" keeps the fused single-write-job shape, which
                # measures faster on small-file-bound layouts (see
                # BASELINE.md probe-strategy A/B).
                probe_mode = self.cfg.fast_lane_probe
                if probe_mode == "auto":
                    # carried spread signal: with fewer batch KEYS than
                    # HALF the file groups, the exact warm_tag rewrite set
                    # beats the stats superset (point-fix shape); at or
                    # above it, every group is touched anyway and the
                    # fused profile shape is cheaper (full-spread shape).
                    # Skip the group count when warm_tag is impossible.
                    n_last = getattr(self, "_last_batch_keys", None)
                    if (n_last is None or not self._index_cache_on
                            or self._key_index is None):
                        probe_mode = "profile"
                    else:
                        probe_mode = ("warm_tag"
                                      if n_last < 0.5 * max(1, view.group_count())
                                      else "profile")
                # no coverage precondition: the warm lane's _load_index
                # call requests every view partition and extends the
                # pinned index incrementally (one catch-up load on the
                # first warm batch of a partition-sparse workload; full
                # coverage thereafter — the INMEMORY design point anyway)
                warm_index = (
                    probe_mode == "warm_tag"
                    and self._index_cache_on
                    and self._key_index is not None
                    and self._key_index_valid_token == tok0)
                self._last_probe_mode = ("warm_tag" if warm_index
                                         else "profile")
                if warm_index:
                    prepared = prepared.persist()
                    persisted = True
                    with _stage("upsert.bc_probe"):
                        n_probe = prepared.limit(cap + 1).count()
                        bc_fast = n_probe <= cap
                    probe_bc = bc_fast   # reused by the fall-through lanes
                    # prepared is preCombined in this lane → rows == keys.
                    # Recorded unconditionally: over the cap it is a lower
                    # bound (cap+1) that correctly flips big-batch
                    # workloads back toward profile routing.
                    self._last_batch_keys = n_probe
                    if not bc_fast:
                        self._last_probe_mode = "general"
                else:
                    with _stage("upsert.profile"):
                        prof = profile_src.groupBy(META_PARTITION_PATH).agg(
                            F.count(F.lit(1)).alias("n"),
                            F.min(META_RECORD_KEY).alias("mn"),
                            F.max(META_RECORD_KEY).alias("mx"),
                            F.approx_count_distinct(
                                META_RECORD_KEY).alias("nk")).collect()
                    # spread signal in KEY units (the profile scans the raw
                    # multi-version batch; per-partition distinct sums are
                    # exact for non-global keys, approx per partition) —
                    # raw row count stays the broadcast-size gate
                    self._last_batch_keys = sum(r[4] for r in prof)
                    bc_fast = sum(r[1] for r in prof) <= cap
                if bc_fast:
                    if not persisted:
                        prepared = prepared.persist()
                        persisted = True
                    with _stage("upsert.write"):
                        stats, fg_map, schema, wrote_inserts = \
                            self._upsert_cow_fast(view, instant.time,
                                                  prepared, prof, is_delete,
                                                  frozen_fgs=frozen_fgs,
                                                  token=tok0, active=active)
                    with _stage("upsert.complete"):
                        self._complete(instant, operation, stats, schema,
                                       extra=commit_extras)
                    if self._index_cache_on:
                        if (not is_delete and not wrote_inserts
                                and self._key_index is not None):
                            # pre-write token + our own commit (see seed lane)
                            self._key_index_valid_token = \
                                tok0 | {instant.time}
                        else:
                            self._invalidate_key_index()
                    prepared.unpersist()
                    persisted = False
                    with _stage("upsert.post_commit"):
                        self._post_commit()
                    return instant.time
                # batch too large to broadcast — fall through to the general
                # lanes (the window merge handles table-sized batches)
            # fast lane: a warm cached index (INMEMORY, or SIMPLE with
            # cache_simple_index) covering every table partition makes the
            # pre-tag workload profile redundant — any batch partition is
            # either covered or brand-new (no stored records → a null-fg tag
            # is already the correct routing).  Saves the full-scan profile
            # action per steady-state batch; only the short-circuiting
            # broadcast-size probe below remains.
            cache_covers = (
                self._index_cache_on
                and self._key_index is not None
                and self._key_index_valid_token == tok0
                and set(view.partitions()) <= self._key_index_parts)
            if cache_covers:
                # broadcast-size guard (shared with the cold lane): stops
                # after cap+1 rows, so it never scans a big batch
                cap = self.cfg.index_broadcast_max_rows
                index_df = self._key_index
                if prof is not None:    # fast-lane fall-through: size known
                    bc = sum(r[1] for r in prof) <= cap
                elif probe_bc is not None:
                    bc = probe_bc       # warm fall-through: probe already ran
                else:
                    with _stage("upsert.bc_probe"):
                        bc = prepared.limit(cap + 1).count() <= cap
            elif self._index_cache_on:
                # cold cached index: load the whole-table key index in one go —
                # it gets pinned for every later batch anyway, so the
                # pre-tag workload-profile action (whose only INMEMORY use
                # is picking which partitions to load) is pure overhead.
                # The broadcast-size guard stays: a cold first batch can be
                # arbitrarily large, and limit(cap+1).count() short-circuits
                # after cap+1 rows instead of scanning the batch.
                with _stage("upsert.load_index"):
                    index_df = self._load_index(
                        view, sorted(view.partitions()), None, token=tok0)
                cap = self.cfg.index_broadcast_max_rows
                if prof is not None:    # fast-lane fall-through: size known
                    bc = sum(r[1] for r in prof) <= cap
                elif probe_bc is not None:
                    bc = probe_bc       # warm fall-through: probe already ran
                else:
                    bc = prepared.limit(cap + 1).count() <= cap
            else:
                # workload profile (BaseSparkCommitActionExecutor.java:122-127)
                # + key range for BLOOM-style pruning — one Spark action over
                # the raw keyed batch (no dedup shuffle); reused from the
                # fast-lane gate when that already ran it
                if prof is None:
                    with _stage("upsert.profile"):
                        prof = profile_src.groupBy(META_PARTITION_PATH).agg(
                            F.count(F.lit(1)).alias("n"),
                            F.min(META_RECORD_KEY).alias("mn"),
                            F.max(META_RECORD_KEY).alias("mx")).collect()
                partitions = [r[0] for r in prof]
                key_range = (min(r[2] for r in prof), max(r[3] for r in prof)) if prof else None

                with _stage("upsert.load_index"):
                    index_df = self._load_index(view, partitions, key_range,
                                                token=tok0)
                n_rows = sum(r[1] for r in prof)
                bc = n_rows <= self.cfg.index_broadcast_max_rows
            # the tagging join consumes prepared twice (broadcast probe +
            # stream side) and the write again via tagged — cache it now that
            # the profile no longer forces early materialization
            prepared = prepared.persist()
            persisted = True
            if bc:
                # broadcast path pre-dedups the pruned index side per file
                # group — the join can't multiply rows per (input row, fg)
                tagged = tag_locations(
                    prepared, index_df, self.cfg.index_type,
                    broadcast_incoming=True,
                    update_partition_path=self.cfg.global_index_update_partition_path)
            else:
                # shuffle path: the index may map one key to the same file
                # group several times (MOR base+log, duplicate keys in a
                # file); collapse the join-induced multiplication per
                # (input row, file group) — keyed by uid so genuine
                # duplicate input rows survive when preCombine is off
                uid = "_hoodie_row_uid"
                tagged = tag_locations(
                    prepared.withColumn(uid, F.monotonically_increasing_id()),
                    index_df, self.cfg.index_type,
                    broadcast_incoming=False,
                    update_partition_path=self.cfg.global_index_update_partition_path,
                ).dropDuplicates([uid, FG_COL]).drop(uid)
            # MOR fast lane: updates already carry their file-group routing
            # in the data, and delta appends read nothing — so no pre-write
            # profile action is needed at all.  The delta write materializes
            # the tagging cache; inserts are then probed on that cache
            # (~free).  Not applicable when bootstrap (external) file groups
            # exist: those updates must re-route through a COW rewrite,
            # which needs the per-file-group profile.
            mor_sls = (view.latest_slices()
                       if self.tc.table_type == MERGE_ON_READ else [])
            has_ext = any(f.external for sl in mor_sls for f in sl.base_files)
            mor_fast = self.tc.table_type == MERGE_ON_READ and not has_ext

            # fold the insert-existence probe into the delta-write action:
            # a CollectMetrics node under the tagging cache counts untagged
            # rows while the delta write materializes it, so the
            # steady-state update-only batch (zero inserts) skips the
            # per-partition insert-probe job entirely.  UNSAFE when a
            # pending clustering plan exists: _check_frozen's bounded
            # limit().count() probe is then the FIRST action on the cache
            # and completes the observation from a PARTIAL scan — the
            # undercounted metric could claim "no inserts" while inserts
            # exist, so the fold is disabled and the probe runs as before.
            tag_obs = None
            if mor_fast and not is_delete and not frozen_fgs:
                from pyspark.sql import Observation
                tag_obs = Observation()
                tagged = tagged.observe(
                    tag_obs,
                    F.count(F.when(F.col(FG_COL).isNull(), True))
                     .alias("n_inserts"))
            tagged = tagged.persist()

            updates = tagged.filter(F.col(FG_COL).isNotNull()) \
                            .withColumn(FG, F.col(FG_COL)).drop(FG_COL)
            inserts = tagged.filter(F.col(FG_COL).isNull()).drop(FG_COL)
            if is_delete:
                inserts = inserts.limit(0)  # deletes of absent keys are no-ops

            if mor_fast:
                self._check_frozen(updates, FG, frozen_fgs)
                with _stage("upsert.write"):
                    stats, fg_map, schema = self._upsert_mor_fast(
                        mor_sls, instant.time, updates, inserts,
                        pending_compaction, is_delete, tag_obs=tag_obs)
                # MOR inserts only ever open NEW file groups, so base files
                # in the stats ⇔ insert rows landed
                wrote_inserts = any(not s.log for s in stats)
            else:
                # per-file-group update counts + per-partition insert counts
                with _stage("upsert.tag_profile"):
                    fg_prof = tagged.groupBy(META_PARTITION_PATH, FG_COL).count().collect()
                update_fgs = {r[1]: r[0] for r in fg_prof if r[1] is not None}
                if frozen_fgs & set(update_fgs):
                    from .services.clustering import ClusteringUpdateConflict
                    raise ClusteringUpdateConflict(
                        f"update touches file groups "
                        f"{sorted(frozen_fgs & set(update_fgs))[:3]} in a "
                        "pending clustering plan; run_clustering() first or "
                        "roll the plan back")
                insert_profile = {} if is_delete else \
                    {r[0]: r[2] for r in fg_prof if r[1] is None}
                wrote_inserts = any(v > 0 for v in insert_profile.values())

                with _stage("upsert.write"):
                    if self.tc.table_type == MERGE_ON_READ:
                        stats, fg_map, schema = self._upsert_mor(
                            view, instant.time, updates, inserts,
                            update_fgs, insert_profile, pending_compaction)
                    else:
                        n_new = sum(r[2] for r in fg_prof)
                        stats, fg_map, schema = self._upsert_cow(
                            view, instant.time, updates, inserts,
                            update_fgs, insert_profile, n_new_rows=n_new,
                            frozen_fgs=frozen_fgs)
            with _stage("upsert.complete"):
                self._complete(instant, operation, stats, schema,
                               extra=commit_extras)
            if self._index_cache_on:
                update_only = not is_delete and not wrote_inserts
                if update_only and self._key_index is not None:
                    # an update-only commit rewrites/appends WITHIN existing
                    # file groups — every cached location stays correct, so
                    # the cache survives its own commit.  Pre-write token +
                    # our own instant: a daemon commit that completed DURING
                    # the write stays missing from the token, so the next
                    # batch invalidates instead of trusting a cache that
                    # never saw it.
                    self._key_index_valid_token = tok0 | {instant.time}
                else:
                    self._invalidate_key_index()
        except _ClusteringConflict:
            # nothing was written — drop the started instant instead of
            # leaving crash debris for rollback-on-open
            for st in (tl.REQUESTED, tl.INFLIGHT):
                self.timeline.delete_instant(
                    tl.Instant(instant.time, action, st))
            if getattr(self, "_last_started", None) == instant.time:
                self._last_started = None    # cleaned up here — not debris
            raise
        finally:
            if persisted:
                prepared.unpersist()
            if tagged is not None:
                tagged.unpersist()
        with _stage("upsert.post_commit"):
            self._post_commit()
        return instant.time

    @staticmethod
    def _check_frozen(tagged_updates: DataFrame, fg_col: str,
                      frozen_fgs: set) -> None:
        """Reject updates targeting file groups frozen by a pending
        clustering plan (SparkRejectUpdateStrategy.java:41-62).  Exact: a
        bounded probe on the tagged batch, run only when a plan is pending."""
        if not frozen_fgs:
            return
        from .services.clustering import ClusteringUpdateConflict
        hit = (tagged_updates
               .filter(F.col(fg_col).isin(list(frozen_fgs)))
               .select(fg_col).limit(1).collect())
        if hit:
            raise ClusteringUpdateConflict(
                f"update touches file group {hit[0][0]} which is in a "
                "pending clustering plan; run_clustering() first or roll "
                "the plan back")

    def _new_version_wins(self) -> bool:
        """True when the arriving batch's version wins unconditionally per
        key (OVERWRITE_LATEST semantics) — the payloads that need old-vs-new
        comparison (DEFAULT's event-time guard, OverwriteNonDefaults' field
        fills) disqualify the anti-join rewrite lanes."""
        from .config import PAYLOAD_OVERWRITE_NON_DEFAULTS
        return not ((self.tc.payload == PAYLOAD_DEFAULT
                     and self.tc.precombine_field)
                    or self.tc.payload == PAYLOAD_OVERWRITE_NON_DEFAULTS)

    def _anti_join_rewrite(self, view: FileSystemView, instant_time: str,
                           fresh: DataFrame, batch_keys: DataFrame,
                           rewrite_fgs: set, fg_map: dict,
                           active: Optional[list] = None):
        """Shared COW broadcast anti-join rewrite kernel: stored rows of the
        rewrite set pass through IN THEIR SCAN PARTITIONS minus the batch's
        keys (broadcast LEFT ANTI — the table side never shuffles); only the
        small ``fresh`` side is clustered by file group.  The write-
        parallelism guard re-spreads tiny rewrite sets so encoding stays
        parallel early in table life; at scale groups approach target size
        and the table side streams untouched.  Exactly one exchange."""
        if API_DELETE in fresh.columns:
            fresh = fresh.drop(API_DELETE)
        parts = []
        if rewrite_fgs:
            old = self._read_fg_files(view, rewrite_fgs, active=active)
            parts.append(drop_deleted(
                old.join(F.broadcast(batch_keys), on=MERGE_KEY,
                         how="left_anti")))
        rewrite_slices = [sl for sl in view.latest_slices()
                          if sl.file_group in rewrite_fgs]
        rewrite_bytes = sum(sl.base_size + sl.log_size
                            for sl in rewrite_slices)
        n_rewrite_files = sum(len(sl.base_files) for sl in rewrite_slices)
        par = self.spark.sparkContext.defaultParallelism
        n_buckets = max(1, min(len(fg_map) or 1, par))
        if self.cfg.write_parallelism:
            n_buckets = min(n_buckets, self.cfg.write_parallelism)
        # Re-spread (one exchange over old ∪ fresh) only when it buys
        # something: (a) the rewrite set is so few files that the scan side
        # alone can't keep the executors busy, (b) passthrough batches
        # have accumulated extra per-group files (each passthrough write may
        # add ~1 file/group) and a consolidating shuffle restores the
        # one-file-per-group layout, or (c) the rewrite set is SMALL-FILE
        # BOUND (avg group ≪ target): passthrough would write TWO part
        # files per touched group per batch (scan-side task + fresh-side
        # task land in the same _fg dir separately), and with tiny groups
        # the per-file open/footer overhead — not bytes — dominates the
        # write, so halving the file count beats avoiding a cheap exchange
        # (measured: 10×1% batches over 83 ~0.5 MB groups drop ~25% wall).
        # Otherwise the table side passes through in its scan partitions —
        # zero exchanges on the big side — which is the only shape that
        # survives 100×: at scale groups approach target_file_size, (c) is
        # false and rewrite_bytes trips the first guard anyway, so the big
        # side never shuffles.
        small_file_bound = (n_rewrite_files > 0
                            and rewrite_bytes / n_rewrite_files
                            < self.cfg.target_file_size_bytes // 8)
        respread = (rewrite_bytes < par * 24 * 1024 * 1024
                    and (small_file_bound
                         or n_rewrite_files < min(par, 2 * len(rewrite_fgs)
                                                  if rewrite_fgs else par)
                         or n_rewrite_files >= 3 * max(1, len(rewrite_fgs))))
        if not respread:
            fresh = fresh.repartition(n_buckets, F.col(FG))
        merged = fresh
        for p in parts:
            merged = p.unionByName(merged, allowMissingColumns=True)
        if respread:
            merged = merged.repartition(n_buckets, F.col(FG))
        merged = merged.withColumn(META_FILE_NAME, F.col(FG))
        schema = self._commit_schema(merged, active)
        stats = write_instant_files(merged, self.meta, instant_time, fg_map,
                                    self.cfg,
                                    sort_cols=[FG, META_RECORD_KEY],
                                    pre_partitioned=True,
                                    ensure_fgs=rewrite_fgs)
        return stats, schema

    def _upsert_cow_fast(self, view: FileSystemView, instant_time: str,
                         prepared: DataFrame, prof: list, is_delete: bool,
                         frozen_fgs: Optional[set] = None,
                         token: Optional[frozenset] = None,
                         active: Optional[list] = None):
        """COW fast-update lane: one pre-write Spark action in the common
        case; the bloom-prune branch below adds a second, bounded action (a
        distinct key-collect gated to ≤ ``bloom_prune_max_batch_keys``
        batch rows).

        Two entry shapes:

        - ``prof`` given (cold / uncached index): the caller's per-partition
          batch profile drives driver-side key-range pruning of the manifest
          stats (the BLOOM index's min/max ranges, fsview.base_key_range — a
          superset of the touched groups by construction: a stored key is
          always inside its file's key range).  Exact key→file-group routing
          still happens through the index join, lazily, fused into the
          single write job.
        - ``prof is None`` (WARM covering cached index): no batch profile
          ran at all.  One tag-profile action over the PINNED index
          (broadcast batch ⋈ in-memory key index — no table scan, no batch
          re-scan: ``prepared`` is persisted by the caller) yields the
          EXACT touched-group set, exact per-partition insert counts, and
          materializes ``tagged`` for reuse inside the write job.  Strictly
          tighter than the stats superset, so the bloom second stage is
          unnecessary.

        Inserts open new hash-bucketed file groups planned from the
        per-partition counts (raw counts are an upper bound in the prof
        shape — over-planned buckets stay empty and write no files);
        small-file packing is skipped in this lane (clustering restores
        layout), which keeps the plan free of phantom rewrites.

        At 100 TB this is the steady-state writer shape: scan only the
        touched slice set, broadcast the (small) batch key set for the
        anti-join, zero full-table shuffles, one file per touched group.
        """
        tagged_pinned = False
        if prof is None:
            # warm lane: exact routing from the pinned index
            index_df = self._load_index(view, sorted(view.partitions()),
                                        None, token=token)
            tagged = tag_locations(prepared, index_df, self.cfg.index_type,
                                   broadcast_incoming=True).persist()
            tagged_pinned = True
            with _stage("upsert.tag_profile"):
                tag_prof = tagged.groupBy(
                    META_PARTITION_PATH, FG_COL).count().collect()
            rewrite_fgs = {r[1] for r in tag_prof if r[1] is not None}
            fg_map = {r[1]: r[0] for r in tag_prof if r[1] is not None}
            insert_counts: dict[str, int] = {}
            for r in tag_prof:
                if r[1] is None:
                    insert_counts[r[0]] = insert_counts.get(r[0], 0) + r[2]
        else:
            from .fsview import base_key_range
            by_part = {r[0]: (r[2], r[3]) for r in prof}
            rewrite: list[FileSlice] = []
            for sl in view.latest_slices():
                rng_b = by_part.get(sl.partition)
                if rng_b is None:
                    continue
                lo, hi = rng_b
                rng = base_key_range(sl)
                if rng is None or lo is None \
                        or not (hi < rng[0] or lo > rng[1]):
                    rewrite.append(sl)
            # bloom second stage (write side): for SMALL batches on tables
            # with a bloom sidecar, collect the batch's keys and drop range-
            # surviving slices whose bloom proves none present — on hash/
            # unsorted layouts ranges all overlap and this is what bounds
            # the rewrite set.  A fresh bloom has no false negatives (stale/
            # logged slices are kept), so the set stays a superset of the
            # touched groups.
            n_batch = sum(r[1] for r in prof)
            bloom_fgs = None
            if (len(rewrite) > 8
                    and n_batch <= self.cfg.bloom_prune_max_batch_keys):
                from .bloom import load_blooms, prune_slices_by_bloom
                blooms = load_blooms(self.meta)
                if blooms:
                    ks = [r[0] for r in
                          prepared.select(META_RECORD_KEY).distinct().collect()]
                    rewrite = prune_slices_by_bloom(rewrite, blooms, ks)
                    # every stored location of a batch (key, partition) is
                    # in a bloom-positive slice — the tagging scan can skip
                    # the rest
                    bloom_fgs = {sl.file_group for sl in rewrite}
            rewrite_fgs = {sl.file_group for sl in rewrite}
            fg_map = {sl.file_group: sl.partition for sl in rewrite}
            insert_counts = {r[0]: r[1] for r in prof}

            partitions = sorted(by_part)
            mns = [r[2] for r in prof if r[2] is not None]
            mxs = [r[3] for r in prof if r[3] is not None]
            key_range = (min(mns), max(mxs)) if mns else None
            index_df = self._load_index(view, partitions, key_range,
                                        only_fgs=bloom_fgs, token=token)
            # tagged stays UNPERSISTED in this shape: the routing below
            # consumes it exactly once (a single coalesce projection), so
            # the whole tag pipeline — broadcast the batch, semi-prune the
            # index scan, broadcast the locations back — fuses into the one
            # write job instead of paying a separate materialization
            # round-trip per batch.  Only the paths with a second consumer
            # (the frozen-group probe, the multi-bucket range-join
            # assignment) persist it.
            tagged = tag_locations(prepared, index_df, self.cfg.index_type,
                                   broadcast_incoming=True)
        try:
            if frozen_fgs and (frozen_fgs & rewrite_fgs):
                if prof is None:
                    # warm lane: rewrite_fgs is EXACT — a batch key provably
                    # lives in a frozen group (SparkRejectUpdateStrategy)
                    from .services.clustering import ClusteringUpdateConflict
                    raise ClusteringUpdateConflict(
                        f"update touches file groups "
                        f"{sorted(frozen_fgs & rewrite_fgs)[:3]} in a "
                        "pending clustering plan; run_clustering() first or "
                        "roll the plan back")
                # the stats-pruned rewrite superset may overlap a pending
                # clustering plan spuriously — probe the exact tagged
                # locations; once the probe proves no batch key lives in a
                # frozen group, the frozen groups are dropped from the
                # rewrite set (no-op pass-through rewrites would version
                # them and waste IO)
                tagged = tagged.persist()
                tagged_pinned = True
                self._check_frozen(tagged, FG_COL, frozen_fgs)
                rewrite_fgs -= frozen_fgs
                for fg in frozen_fgs:
                    fg_map.pop(fg, None)
            if is_delete:
                plan = []
                fresh = drop_deleted(
                    tagged.filter(F.col(FG_COL).isNotNull())
                          .withColumn(FG, F.col(FG_COL)).drop(FG_COL))
            elif not insert_counts:
                # update-only batch, known exactly (warm lane): every row
                # already carries its tagged group — no bucket planning
                plan = []
                fresh = drop_deleted(
                    tagged.filter(F.col(FG_COL).isNotNull())
                          .withColumn(FG, F.col(FG_COL)).drop(FG_COL))
            else:
                rec_size = avg_record_size(self.meta, self.timeline,
                                           self.cfg.record_size_estimate,
                                           active=active)
                plan = plan_insert_buckets(
                    insert_counts, view, self.cfg, rec_size,
                    pack_small_files=False)
                for b in plan:
                    fg_map[b.file_group] = b.partition
                per_part: dict[str, int] = {}
                for b in plan:
                    per_part[b.partition] = per_part.get(b.partition, 0) + 1
                if per_part and all(n == 1 for n in per_part.values()):
                    # steady-state shape (one insert bucket per partition):
                    # update-vs-insert routing is ONE projection — tagged fg
                    # if the key exists, else the partition's planned bucket
                    # (mirrors assign_insert_buckets' map-lookup fast case;
                    # the null filter mirrors its inner-join drops)
                    fg_of = F.create_map(*[x for b in plan
                                           for x in (F.lit(b.partition),
                                                     F.lit(b.file_group))])
                    fresh = drop_deleted(
                        tagged.withColumn(
                            FG, F.coalesce(F.col(FG_COL),
                                           fg_of[F.col(META_PARTITION_PATH)]))
                        .drop(FG_COL)
                        .filter(F.col(FG).isNotNull()))
                else:
                    if not tagged_pinned:
                        tagged = tagged.persist()
                        tagged_pinned = True
                    updates = tagged.filter(F.col(FG_COL).isNotNull()) \
                                    .withColumn(FG, F.col(FG_COL)).drop(FG_COL)
                    inserts = tagged.filter(F.col(FG_COL).isNull()).drop(FG_COL)
                    assigned = assign_insert_buckets(
                        self.spark, inserts, plan,
                        META_PARTITION_PATH, META_RECORD_KEY, FG)
                    fresh = drop_deleted(
                        updates.unionByName(assigned, allowMissingColumns=True))
            # no dropDuplicates: the fast lane requires combine_before_upsert,
            # so prepared is already unique per MERGE_KEY — skipping the
            # dedup drops one exchange+aggregate pair from the broadcast
            # build (the hash build collapses duplicates anyway)
            batch_keys = prepared.select(*MERGE_KEY)
            stats, schema = self._anti_join_rewrite(
                view, instant_time, fresh, batch_keys, rewrite_fgs, fg_map,
                active=active)
            wrote_inserts = any(s.file_group not in rewrite_fgs for s in stats)
            return stats, fg_map, schema, wrote_inserts
        finally:
            if tagged_pinned:
                tagged.unpersist()

    def _upsert_cow(self, view: FileSystemView, instant_time: str,
                    updates: DataFrame, inserts: DataFrame,
                    update_fgs: dict[str, str], insert_profile: dict[str, int],
                    n_new_rows: Optional[int] = None,
                    frozen_fgs: Optional[set] = None):
        """COW merge: rewrite exactly the affected file groups.

        Two physical strategies, same semantics:

        - **broadcast anti-join fast path** (batch ≪ table, OVERWRITE_LATEST
          payload, batch preCombined): stored rows whose key appears in the
          batch are dropped by a broadcast LEFT ANTI join; everything else
          passes through *in its scan partition* — the table-sized side is
          never shuffled and never sorted.  Only the batch itself (already
          tiny) is clustered by file group before the write.  At cluster
          scale this turns a COW rewrite into scan → codegen filter → write,
          embarrassingly parallel per file, zero exchanges on the big side.
        - **window merge** (large batches, or DEFAULT payload whose
          precombine guard needs old-vs-new comparison): old ∪ new →
          per-file-group latest-wins window → write, one shuffle keyed by
          file group.
        """
        with _stage("cow.plan"):
            if frozen_fgs is None:
                from .services.clustering import pending_clustering_fgs
                frozen_fgs = set(pending_clustering_fgs(self))
            rec_size = avg_record_size(self.meta, self.timeline,
                                       self.cfg.record_size_estimate)
            plan = plan_insert_buckets(insert_profile, view, self.cfg, rec_size,
                                       pack_small_files=True,
                                       exclude_fgs=frozen_fgs)
        assigned = assign_insert_buckets(self.spark, inserts, plan,
                                         META_PARTITION_PATH, META_RECORD_KEY, FG)
        new_raw = updates.unionByName(assigned, allowMissingColumns=True)

        fg_map = {b.file_group: b.partition for b in plan}
        fg_map.update(update_fgs)
        rewrite_fgs = set(update_fgs) | {b.file_group for b in plan if not b.is_new_fg}

        # new-commit-always-wins payload → the winner per touched key is known
        # without comparing against stored rows (merge_order_columns puts the
        # precombine guard first only for PAYLOAD_DEFAULT; the partial-update
        # payload must read stored values to fill null fields)
        semantically_ok = (bool(rewrite_fgs) and self._new_version_wins()
                           and self.cfg.combine_before_upsert)  # 1 row/key
        if self.cfg.cow_broadcast_merge is None:      # auto: add size guard
            fast = (semantically_ok and n_new_rows is not None
                    and n_new_rows <= self.cfg.index_broadcast_max_rows)
        elif self.cfg.cow_broadcast_merge:            # forced: skip the size
            fast = semantically_ok                    # guard, never safety
        else:
            fast = False
        if fast:
            # every stored version of a batch key dies (incl. duplicate-key
            # twins from insert/bulk_insert) — the preCombined batch row is
            # the slice's single new version; the anti-join kernel also drops
            # tombstoned-at-rest rows on rewrite (matching the window path's
            # global drop_deleted)
            # fast requires combine_before_upsert → new_raw (deduped updates ∪
            # their insert complement) is already unique per MERGE_KEY; the
            # broadcast hash build collapses any residue, so skip the
            # dedup's exchange+aggregate pair
            batch_keys = new_raw.select(*MERGE_KEY)
            stats, schema = self._anti_join_rewrite(
                view, instant_time, drop_deleted(new_raw), batch_keys,
                rewrite_fgs, fg_map)
            return stats, fg_map, schema

        new_rows = new_raw.withColumn(NEW_FLAG, F.lit(True))
        if rewrite_fgs:
            old = self._read_fg_files(view, rewrite_fgs) \
                      .withColumn(NEW_FLAG, F.lit(False))
            merged = old.unionByName(new_rows, allowMissingColumns=True)
        else:
            merged = new_rows
        # single shuffle: cluster by file group once; the per-file-group merge
        # window (the reference merges per MergeHandle = per file group too)
        # and the one-file-per-group write both reuse that partitioning
        n_buckets = max(1, len(fg_map))
        if self.cfg.write_parallelism:
            n_buckets = min(n_buckets, self.cfg.write_parallelism)
        merged = merged.repartition(n_buckets, F.col(FG))
        merged = merge_latest(merged, self.tc, bucket_col=FG)
        merged = drop_deleted(merged).drop(API_DELETE)
        merged = merged.withColumn(META_FILE_NAME, F.col(FG))
        schema = self._commit_schema(merged)
        stats = write_instant_files(merged, self.meta, instant_time, fg_map,
                                    self.cfg, sort_cols=[META_RECORD_KEY],
                                    pre_partitioned=True,
                                    ensure_fgs=rewrite_fgs)
        return stats, fg_map, schema

    def _upsert_mor(self, view: FileSystemView, instant_time: str,
                    updates: DataFrame, inserts: DataFrame,
                    update_fgs: dict[str, str], insert_profile: dict[str, int],
                    pending_compaction: Optional[dict[str, str]] = None):
        """MOR: updates/deletes append parquet *delta* files to their file
        group's latest slice (HoodieAppendHandle.java:71,336-390 — Spark has
        no appendable row format, so one small columnar delta file per
        (commit, file group) replaces the avro log block); inserts create new
        base files."""
        stats: list[WriteStat] = []
        fg_map: dict[str, str] = {}
        schema = None

        # updates hitting METADATA_ONLY-bootstrapped groups rewrite them into
        # engine-owned base files (the reference likewise falls back to a
        # merge handle for bootstrap file groups) — logs can't attach to a
        # file the engine doesn't own the layout of
        ext_fgs = {sl.file_group for sl in view.latest_slices()
                   if any(f.external for f in sl.base_files)}
        ext_updates = {fg: p for fg, p in update_fgs.items() if fg in ext_fgs}
        if ext_updates:
            upd_ext = updates.filter(F.col(FG).isin(*ext_updates))
            updates = updates.filter(~F.col(FG).isin(*ext_updates))
            update_fgs = {fg: p for fg, p in update_fgs.items()
                          if fg not in ext_updates}
            s, m, schema = self._upsert_cow(view, instant_time, upd_ext,
                                            inserts.limit(0), ext_updates, {})
            stats += s
            fg_map.update(m)

        if update_fgs:
            base_of = {sl.file_group: sl.base_instant
                       for sl in view.latest_slices()}
            # a file group with a PENDING compaction gets its new logs tagged
            # with the compaction instant (the future base) — the compactor's
            # plan won't cover them, so they survive as logs of the new slice
            # instead of being orphaned (HoodieAppendHandle's pending-
            # compaction routing).  the pending map was snapshotted BEFORE
            # the view in _upsert_impl — see the ordering comment there.
            for fg, ctime in (pending_compaction or {}).items():
                if fg in update_fgs:
                    base_of[fg] = max(base_of.get(fg) or "", ctime)
            upd = updates.withColumn(META_FILE_NAME, F.col(FG))
            schema = self._commit_schema(upd)
            if self.cfg.mor_grouped_deltas:
                from .writer import write_grouped_log_files
                stats += write_grouped_log_files(
                    upd, self.meta, instant_time, dict(update_fgs),
                    {fg: base_of.get(fg) for fg in update_fgs},
                    compression=self.cfg.parquet_compression)
            else:
                stats += write_instant_files(
                    upd, self.meta, instant_time, dict(update_fgs), self.cfg,
                    sort_cols=[META_RECORD_KEY], log=True,
                    fg_base_instant={fg: base_of.get(fg) for fg in update_fgs},
                    subdir="log")
            fg_map.update(update_fgs)

        has_inserts = bool(insert_profile) and any(v > 0 for v in insert_profile.values())
        if has_inserts:
            s, m, schema = self._mor_write_new_fgs(inserts, insert_profile,
                                                   instant_time)
            stats += s
            fg_map.update(m)

        if schema is None:
            schema = self.stored_schema()
        return stats, fg_map, schema

    def _mor_write_new_fgs(self, inserts: DataFrame,
                           insert_profile: dict[str, int], instant_time: str):
        """MOR insert rows → brand-new base file groups (never packed into
        existing groups — logs may only attach to bases the engine owns the
        full key-set of)."""
        rec_size = avg_record_size(self.meta, self.timeline,
                                   self.cfg.record_size_estimate)
        plan = plan_insert_buckets(insert_profile, None, self.cfg, rec_size,
                                   pack_small_files=False)
        assigned = assign_insert_buckets(self.spark, inserts, plan,
                                         META_PARTITION_PATH,
                                         META_RECORD_KEY, FG)
        assigned = assigned.drop(API_DELETE) \
                           .withColumn(META_FILE_NAME, F.col(FG))
        schema = self._commit_schema(assigned)
        fg_map = {b.file_group: b.partition for b in plan}
        stats = write_instant_files(assigned, self.meta, instant_time,
                                    fg_map, self.cfg,
                                    sort_cols=[META_RECORD_KEY])
        return stats, fg_map, schema

    def _upsert_mor_fast(self, latest_sls: list, instant_time: str,
                         updates: DataFrame, inserts: DataFrame,
                         pending_compaction: Optional[dict[str, str]],
                         is_delete: bool, tag_obs=None):
        """Profile-free MOR upsert: the delta append needs no pre-write
        counts — each update row already carries its file group from the
        tagging join, and appends read nothing.  One Spark job writes the
        delta files (materializing the tagging cache); the insert side is
        then probed on that cache for ~free.  Saves one full action per
        steady-state batch vs the profiled path (the reference pays the same
        profile job per batch, WorkloadProfile.java:33-50).

        ``tag_obs``: Observation attached under the tagging cache counting
        untagged (insert) rows.  The delta-write action evaluates every
        cache partition (the observe node sits below the persist, the
        update filter above it), so by the time the write returns the
        metric is the EXACT insert count — an update-only batch skips the
        insert-probe job entirely, folding it into the delta write the way
        the reference folds sizing into the append handle's observed stats
        (HoodieAppendHandle.java:336-390)."""
        # ONE latest_slices materialization per batch, shared with the
        # caller's has_ext probe (the walk+sort is O(file groups) driver
        # work — at the 100k-group scale the driver probe targets, paying
        # it three times per batch was a real cost)
        base_of = {sl.file_group: sl.base_instant for sl in latest_sls}
        fg_part = {sl.file_group: sl.partition for sl in latest_sls}
        # pending-compaction log routing — see _upsert_mor for the contract
        for fg, ctime in (pending_compaction or {}).items():
            base_of[fg] = max(base_of.get(fg) or "", ctime)
        upd = updates.withColumn(META_FILE_NAME, F.col(FG))
        schema = self._commit_schema(upd)
        with _stage("mor.delta_write"):
            if self.cfg.mor_grouped_deltas:
                from .writer import write_grouped_log_files
                stats = write_grouped_log_files(
                    upd, self.meta, instant_time, fg_part, base_of,
                    compression=self.cfg.parquet_compression)
            else:
                stats = write_instant_files(
                    upd, self.meta, instant_time, fg_part, self.cfg,
                    sort_cols=[META_RECORD_KEY], log=True,
                    fg_base_instant=base_of, subdir="log")
        fg_map = {s.file_group: s.partition for s in stats}

        if not is_delete:
            n_ins = None
            if tag_obs is not None:
                try:
                    n_ins = tag_obs.get.get("n_inserts")
                except Exception:
                    # When the update side is EMPTY (pure-insert batch), AQE
                    # empty-relation propagation collapses the delta-write
                    # plan and the CollectMetrics results vanish — the
                    # Observation completes with an empty row that the
                    # py4j row conversion rejects.  Metrics lost ⟺ the
                    # batch had no updates ⟺ inserts exist, so falling
                    # back to the probe is exactly the pre-fold behavior.
                    n_ins = None
            if n_ins == 0 and stats:
                # the delta write's observed metrics prove the batch was
                # update-only — no probe job needed.  The `stats` guard is
                # a positive invariant, not belt-and-braces: the write
                # paths return [] exactly when the update side was empty,
                # and an empty update side means the observation CANNOT
                # have come from a full scan of the tagging cache (AQE may
                # collapse the plan) — so a 0 metric is only trusted when
                # a non-empty delta write proves the full scan happened.
                insert_profile = {}
            else:
                # one action doubles as existence probe and bucket profile
                # (tagged is already cached by the delta write above)
                with _stage("mor.insert_probe"):
                    insert_profile = {r[0]: r[1] for r in
                                      inserts.groupBy(META_PARTITION_PATH)
                                             .count().collect()}
            if insert_profile:
                with _stage("mor.new_fg_write"):
                    s, m, schema = self._mor_write_new_fgs(
                        inserts, insert_profile, instant_time)
                stats += s
                fg_map.update(m)
        if schema is None:
            schema = self.stored_schema()
        return stats, fg_map, schema

    # ------------------------------------------------------------------
    def insert_overwrite(self, df: DataFrame,
                         commit_extras: Optional[dict] = None) -> str:
        """Atomically replace only the partitions present in the input
        (SparkInsertOverwriteCommitActionExecutor — replacecommit, NOT Spark's
        mode=overwrite)."""
        instant = self._start(tl.REPLACE_COMMIT)
        prepared = self._prepare(df, instant.time, self.cfg.combine_before_insert)
        view = self.view()
        parts = [r[0] for r in prepared.select(META_PARTITION_PATH).distinct().collect()]
        replaced = [(sl.partition, sl.file_group)
                    for sl in view.latest_slices(parts)]
        stats, fg_map, schema = self._write_inserts(
            prepared, instant.time, pack_small_files=False,
            sort_mode=self.cfg.bulk_insert_sort_mode, action_view=view)
        self._complete(instant, INSERT_OVERWRITE, stats, schema,
                       replaced=replaced, extra=commit_extras)
        self._post_commit()
        return instant.time

    def insert_overwrite_table(self, df: DataFrame,
                               commit_extras: Optional[dict] = None) -> str:
        """Replace every partition (SparkInsertOverwriteTableCommitActionExecutor)."""
        instant = self._start(tl.REPLACE_COMMIT)
        prepared = self._prepare(df, instant.time, self.cfg.combine_before_insert)
        view = self.view()
        replaced = [(sl.partition, sl.file_group) for sl in view.latest_slices()]
        stats, fg_map, schema = self._write_inserts(
            prepared, instant.time, pack_small_files=False,
            sort_mode=self.cfg.bulk_insert_sort_mode, action_view=view)
        self._complete(instant, INSERT_OVERWRITE_TABLE, stats, schema,
                       replaced=replaced, extra=commit_extras)
        self._post_commit()
        return instant.time

    # ------------------------------------------------------------------
    # schema commands (§2.6 AlterHoodieTable*Command equivalents)
    # ------------------------------------------------------------------
    def add_columns(self, ddl: str) -> str:
        """ALTER TABLE ADD COLUMNS (AlterHoodieTableAddColumnsCommand): a
        metadata-only commit carrying the evolved schema; existing files are
        untouched (readers project the new columns as typed nulls)."""
        new_fields = StructType.fromDDL(ddl).fields
        cur = self.stored_schema()
        if cur is None:
            raise ValueError("table has no schema yet — write data first")
        clash = {f.name for f in new_fields} & {f.name for f in cur.fields}
        if clash:
            raise ValueError(f"columns already exist: {sorted(clash)}")
        instant = self._start(tl.COMMIT)
        self._complete(instant, "alter_add_columns", [],
                       StructType(list(cur.fields) + list(new_fields)))
        return instant.time

    def change_column(self, name: str, new_type_ddl: str) -> str:
        """ALTER TABLE CHANGE COLUMN (AlterHoodieTableChangeColumnCommand):
        compatible type widening only (int→long, float→double, decimal
        precision growth — Avro promotion rules).  Metadata-only commit; old
        narrow files are read directly with the widened schema (Spark 4
        parquet widening), so no rewrite happens."""
        from pyspark.sql.types import _parse_datatype_string
        cur = self.stored_schema()
        if cur is None:
            raise ValueError("table has no schema yet — write data first")
        by_name = {f.name: f for f in cur.fields}
        if name not in by_name:
            raise ValueError(f"no such column: {name}")
        new_t = _parse_datatype_string(new_type_ddl)
        old_t = by_name[name].dataType
        if old_t.simpleString() != new_t.simpleString() \
                and not self._is_widening(old_t, new_t):
            raise ValueError(
                f"only widening type changes are supported: "
                f"{old_t.simpleString()} -> {new_t.simpleString()}")
        fields = [StructField(f.name, new_t if f.name == name else f.dataType,
                              f.nullable) for f in cur.fields]
        instant = self._start(tl.COMMIT)
        self._complete(instant, "alter_change_column", [], StructType(fields))
        return instant.time

    def rename_table(self, new_name: str) -> None:
        """AlterHoodieTableRenameCommand: table name lives in table config."""
        from dataclasses import replace
        self.meta.update_config(replace(self.tc, name=new_name))

    def truncate(self) -> str:
        """TRUNCATE TABLE (TruncateHoodieTableCommand.scala): drop every file
        group via one replacecommit — metadata survives, the cleaner reclaims
        the files once out of retention."""
        instant = self._start(tl.REPLACE_COMMIT)
        replaced = [(sl.partition, sl.file_group)
                    for sl in self.view().latest_slices()]
        self._complete(instant, "truncate", [], self.stored_schema(),
                       replaced=replaced)
        self._post_commit()
        return instant.time

    def delete_partitions(self, partitions: Sequence[str]) -> str:
        """Logical partition drop via replacecommit
        (SparkDeletePartitionCommitActionExecutor) — readers skip the replaced
        file groups immediately; the cleaner reclaims files later."""
        instant = self._start(tl.REPLACE_COMMIT)
        view = self.view()
        replaced = [(sl.partition, sl.file_group)
                    for sl in view.latest_slices(partitions)]
        self._complete(instant, DELETE_PARTITION, [], self.stored_schema(),
                       replaced=replaced)
        self._post_commit()
        return instant.time

    def bootstrap(self, source_path: str, mode: str = "full_record") -> str:
        """Adopt an existing parquet dataset
        (SparkBootstrapCommitActionExecutor.java:104-146,161,277).

        - ``full_record``: rewrite everything via bulk_insert.
        - ``metadata_only``: zero data rewrite.  The reference writes skeleton
          files (meta columns only) and stitches them to the originals at
          read time; our skeleton is *virtual* — each source file becomes a
          file group whose base file is marked ``external``, and the meta
          columns are derived by the keygen expressions during the scan
          (pure Catalyst projection, no extra I/O).  External files are never
          cleaned; the first upsert touching a group rewrites it into a
          normal engine-owned file.
        """
        if mode == "full_record":
            return self.bulk_insert(self.spark.read.parquet(source_path))
        if mode != "metadata_only":
            raise ValueError(f"unknown bootstrap mode {mode!r}")

        import glob as _glob
        files = sorted(
            p for p in _glob.glob(os.path.join(source_path, "**", "*.parquet"),
                                  recursive=True))
        if os.path.isfile(source_path):
            files = [source_path]
        if not files:
            raise FileNotFoundError(f"no parquet files under {source_path}")

        # one small Spark job maps file → partition value (scans only the
        # partition-expression inputs); a file spanning two partitions cannot
        # be adopted as a single file group
        src = scan_parquet(self.spark, files)
        pcol = partition_path_col(self.tc.partition_expr)
        fp = (src.withColumn("_hoodie_src_file",
                             F.regexp_replace(F.input_file_name(), "^file:", ""))
                 .withColumn(META_PARTITION_PATH, pcol)
                 .groupBy("_hoodie_src_file")
                 .agg(F.collect_set(META_PARTITION_PATH).alias("parts"),
                      F.count(F.lit(1)).alias("n")).collect())
        instant = self._start(tl.COMMIT)
        stats = []
        for r in fp:
            if len(r["parts"]) != 1:
                raise ValueError(
                    f"{r['_hoodie_src_file']} spans partitions {r['parts']}; "
                    "use mode='full_record'")
            path = r["_hoodie_src_file"]
            stats.append(WriteStat(
                partition=r["parts"][0], file_group=new_fg_id(),
                path=os.path.abspath(path), size=os.path.getsize(path),
                num_records=r["n"], base_instant=instant.time, external=True))
        meta_fields = [StructField(c, StringType()) for c in META_COLUMNS]
        schema = self._evolve(self.stored_schema(),
                              StructType(meta_fields + list(src.schema.fields)))
        self._complete(instant, "bootstrap", stats, schema)
        self._post_commit()
        return instant.time

    def filter_exists(self, df: DataFrame) -> DataFrame:
        """Keep only records NOT already in the table
        (HoodieReadClient/SparkRDDWriteClient.java:131-141 → left_anti)."""
        from .indexing import CUR_PART_COL, is_global
        keyed = with_key_columns(df, self.tc)
        view = self.view()
        index_df = load_key_index(self.spark, self.meta, view,
                                  self.cfg.index_type, tc=self.tc)
        if is_global(self.cfg.index_type):
            idx = index_df.select(META_RECORD_KEY).distinct()
            on = [META_RECORD_KEY]
        else:
            idx = index_df.select(
                META_RECORD_KEY,
                F.col(CUR_PART_COL).alias(META_PARTITION_PATH)).distinct()
            on = [META_RECORD_KEY, META_PARTITION_PATH]
        return keyed.join(idx, on=on, how="left_anti") \
                    .drop(META_RECORD_KEY, META_PARTITION_PATH)

    # ==================================================================
    # READ OPERATORS (DefaultSource.scala:111-137 dispatch)
    # ==================================================================
    def read(self, query_type: str = QUERY_SNAPSHOT,
             begin: Optional[str] = None, end: Optional[str] = None,
             as_of: Optional[str] = None,
             partitions: Optional[Sequence[str]] = None,
             merge_type: str = "payload_combine",
             path_glob: Optional[str] = None) -> DataFrame:
        """``merge_type`` (MOR snapshot only, DataSourceOptions.scala:54-61):
        ``payload_combine`` (default) key-merges logs against the base;
        ``skip_merge`` concatenates base + log rows without merging — the
        cheap mode for pipelines that re-aggregate by key anyway.
        ``path_glob`` (incremental only, DataSourceOptions.scala:87-99
        INCR_PATH_GLOB): restrict the pull to slices whose
        ``partition/file`` path matches ``*<glob>`` (Hadoop GlobPattern
        semantics — ``*`` crosses ``/``).  Filtering is slice-granular on
        the base file's path (newest log file for log-only slices), the
        same file-group coarseness as MergeOnReadIncrementalRelation:
        the glob selects partitions/file groups, not individual rows —
        a matching slice returns ALL its rows, including ones that
        arrived via log files whose own names don't match."""
        if query_type == QUERY_INCREMENTAL:
            return self._read_incremental(begin, end, partitions, path_glob)
        if path_glob is not None:
            raise ValueError("path_glob applies to incremental queries only "
                             "(INCR_PATH_GLOB); use partitions=[...] to "
                             "restrict snapshot reads")
        view = self.view(as_of=as_of or end)
        slices = view.latest_slices(partitions)
        return self._read_slices(slices,
                                 read_optimized=(query_type == QUERY_READ_OPTIMIZED),
                                 skip_merge=(merge_type == "skip_merge"),
                                 view=view)

    def read_keys(self, keys: Sequence, partitions: Optional[Sequence[str]] = None) -> DataFrame:
        """Point-lookup read with manifest-stats file skipping — the
        read-side twin of the BLOOM index's min/max pruning
        (SparkHoodieBloomIndex.java:119-140; HoodieFileIndex data skipping):
        only file slices whose [min_key, max_key] stats can contain one of
        the requested record keys are scanned.  On key-sorted layouts
        (GLOBAL_SORT bulk loads, clustered tables) the ranges are disjoint,
        so a point lookup opens O(#keys) files out of a 100 TB table instead
        of scanning it.  Slices with log files or missing stats are included
        conservatively (MOR inserts live in deltas the base stats don't
        see).  For key sets beyond a few thousand use
        ``read().join(keys_df, ...)`` — ``filterExists``-style — instead."""
        import bisect

        from .fsview import base_key_range
        ks = sorted({str(k) for k in keys})
        view = self.view()
        cand = []
        for sl in view.latest_slices(partitions):
            rng = base_key_range(sl)
            if rng is None:
                cand.append(sl)          # incomplete stats → cannot skip
                continue
            lo, hi = rng
            i = bisect.bisect_left(ks, lo)
            if i < len(ks) and ks[i] <= hi:
                cand.append(sl)
        # second-stage pruning: bloom sidecars (build_bloom_index) catch the
        # range-overlap cases a hash/unsorted layout leaves behind
        from .bloom import load_blooms, prune_slices_by_bloom
        blooms = load_blooms(self.meta)
        if blooms:
            cand = prune_slices_by_bloom(cand, blooms, ks)
        df = self._read_slices(cand, read_optimized=False, view=view)
        return df.filter(F.col(META_RECORD_KEY).isin(ks))

    def read_filtered(self, conjuncts: Sequence[tuple],
                      partitions: Optional[Sequence[str]] = None) -> DataFrame:
        """Snapshot read with column-stats data skipping: ``conjuncts`` is a
        list of ``(column, op, value)`` with op in =, <, <=, >, >=, between
        (value a (lo, hi) pair for between), ANDed together.  File slices
        whose manifest [min, max] stats (WriteConfig.stats_columns) prove a
        conjunct impossible are skipped before the scan — on a clustered /
        sorted layout a selective predicate opens a handful of files out of
        a 100 TB table.  The surviving frame is re-filtered exactly, so the
        result is identical to ``read().filter(...)`` regardless of layout.
        Slices with log files or missing stats are never skipped."""
        def excludes(lo, hi, op, v) -> bool:
            try:
                if op == "=":
                    return v < lo or v > hi
                if op == "<":
                    return lo >= v
                if op == "<=":
                    return lo > v
                if op == ">":
                    return hi <= v
                if op == ">=":
                    return hi < v
                if op == "between":
                    vlo, vhi = v
                    return vhi < lo or vlo > hi
            except TypeError:
                return False              # incomparable → cannot skip
            return False

        view = self.view()
        kept = []
        for sl in view.latest_slices(partitions):
            skip = False
            for col, op, v in conjuncts:
                stats = [f.col_stats[col] for f in sl.base_files
                         if f.col_stats and col in f.col_stats]
                if sl.log_files or len(stats) != len(sl.base_files) or not stats:
                    continue              # incomplete stats for this conjunct
                if all(excludes(lo, hi, op, v) for lo, hi in stats):
                    skip = True
                    break
            if not skip:
                kept.append(sl)
        df = self._read_slices(kept, read_optimized=False, view=view)
        for col, op, v in conjuncts:
            c = F.col(col)
            if op == "=":
                df = df.filter(c == v)
            elif op == "between":
                df = df.filter(c.between(v[0], v[1]))
            else:
                df = df.filter({"<": c < v, "<=": c <= v,
                                ">": c > v, ">=": c >= v}[op])
        return df

    def _read_fg_files(self, view: FileSystemView, fgs: set[str],
                       active: Optional[list] = None) -> DataFrame:
        slices = [sl for sl in view.latest_slices() if sl.file_group in fgs]
        return self._read_slices(slices, read_optimized=False, raw=True,
                                 view=view, active=active)

    def _read_slices(self, slices: list[FileSlice], read_optimized: bool,
                     raw: bool = False, skip_merge: bool = False,
                     cluster_by_fg: bool = False, view=None,
                     active: Optional[list] = None) -> DataFrame:
        """Clean slices (no logs) → plain parquet scan; dirty slices →
        base ∪ deltas → latest-wins window → drop deletes
        (MergeOnReadSnapshotRelation.scala:94-138 / HoodieMergeOnReadRDD.scala
        merged iterator, vectorized).  Only dirty file groups pay the merge
        shuffle — at scale that's the set compaction hasn't reached yet.

        ``cluster_by_fg`` (compaction): keep the output clustered by file
        group so the caller can write with ``pre_partitioned=True`` — in the
        broadcast-split path only the small merged side is shuffled (the base
        passes through in scan partitions, zero full-table exchange, like the
        reference compactor's one-task-per-file-group merge); in the window
        fallback the merge window partitions by file group so the window
        shuffle doubles as the write clustering."""
        schema = self._read_schema(active=active)
        out_cols = [f.name for f in schema.fields]

        def is_ext(sl):
            return any(f.external for f in sl.base_files)

        clean = [sl for sl in slices if not sl.log_files or read_optimized]
        dirty = [] if read_optimized else [sl for sl in slices if sl.log_files]
        parts = []
        int_clean = [sl for sl in clean if not is_ext(sl)]
        ext_clean = [sl for sl in clean if is_ext(sl)]
        if int_clean:
            paths = [self.meta.abs_path(f.path) for sl in int_clean
                     for f in sl.base_files]
            parts.append(scan_parquet(self.spark, paths, schema,
                                      fmt=self.tc.base_format))
        if ext_clean:
            parts.append(self._scan_external(ext_clean, schema))
        if dirty:
            dschema = self._read_schema(extra_bool_cols=[API_DELETE, DELETE_MARKER],
                                        active=active)
            int_dirty = [sl for sl in dirty if not is_ext(sl)]
            ext_dirty = [sl for sl in dirty if is_ext(sl)]
            bases = []
            if int_dirty:
                base_paths = [self.meta.abs_path(f.path) for sl in int_dirty
                              for f in sl.base_files]
                bases.append(scan_parquet(self.spark, base_paths, dschema,
                                          fmt=self.tc.base_format))
            if ext_dirty:
                bases.append(self._scan_external(ext_dirty, dschema))
            b = bases[0]
            for x in bases[1:]:
                b = b.unionByName(x)
            log_entries = [(l.path, sl.file_group)
                           for sl in dirty for l in sl.log_files]
            # grouped delta files are shared across file groups: scan each
            # path once, and when sharing is present restrict rows to the
            # selected groups — a shared file may also hold rows of groups
            # NOT being read (another partition, or a since-replaced group
            # whose rows must not resurrect)
            log_rel = list(dict.fromkeys(p for p, _ in log_entries))
            log_paths = [self.meta.abs_path(p) for p in log_rel]
            logs = scan_parquet(self.spark, log_paths, dschema) \
                       .withColumn(NEW_FLAG, F.lit(True))
            # validity filter: a grouped (shared) delta file may hold rows of
            # groups that are not part of this read — a group that was since
            # compacted or replaced, or simply not selected.  The valid unit
            # is the (file, group) PAIR exactly as the slices reference it: a
            # group-set filter alone would keep stale rows of a still-dirty
            # group sitting in an old shared file.  Skipped — keeping the
            # plan join-free — when ownership is PROVEN covered: per-group
            # dir layout, or the view's fold-complete owner map shows every
            # scanned file's groups are all selected.
            uniq_pairs = sorted({(self.meta.abs_path(p), fg)
                                 for p, fg in log_entries})
            sel_by_path: dict[str, set] = {}
            for p, fg in log_entries:
                sel_by_path.setdefault(p, set()).add(fg)
            if all(f"/{FG}=" in p for p in log_rel):
                covered = True      # per-group files hold only their own rows
            elif view is not None:
                owners = [view.log_path_owners(p) for p in log_rel]
                covered = all(o is not None and o <= sel_by_path[p]
                              for p, o in zip(log_rel, owners))
            else:
                covered = False
            if not covered:
                pair_df = self.spark.createDataFrame(
                    uniq_pairs, schema=f"_hoodie_log_path string, "
                                       f"{META_FILE_NAME} string")
                norm = F.regexp_replace(F.input_file_name(), "^file:/*", "/")
                logs = (logs.withColumn("_hoodie_log_path", norm)
                        .join(F.broadcast(pair_df),
                              ["_hoodie_log_path", META_FILE_NAME],
                              "left_semi")
                        .drop("_hoodie_log_path"))
            log_bytes = sum(l.size for sl in dirty for l in sl.log_files)
            if log_bytes <= self.cfg.mor_merge_broadcast_max_log_bytes \
                    and not skip_merge:
                # the broadcast-split branch consumes the log side three
                # times (key set in two joins + the merged union); delta
                # files are many and tiny (one per file group per commit),
                # so re-opening them dominates the merged read.  Persist —
                # bounded by the branch's own ≤ max_log_bytes gate — so one
                # scan feeds all three subtrees; a one-slot table-level
                # cache unpersists the previous read's log block.
                logs = logs.persist()
                prev = getattr(self, "_mor_log_persist", None)
                if prev is not None and prev is not logs:
                    try:
                        prev.unpersist()
                    except Exception:
                        pass
                self._mor_log_persist = logs
            if skip_merge:
                # REALTIME_SKIP_MERGE: plain concatenation, no key merge —
                # the window shuffle disappears entirely
                d = b.unionByName(logs.drop(NEW_FLAG))
            elif log_bytes <= self.cfg.mor_merge_broadcast_max_log_bytes:
                # broadcast-split merge: logs are (by design) small deltas, so
                # broadcast their key set and split the base — keys without a
                # log row pass through IN THEIR SCAN PARTITIONS (the 100 TB
                # base side is never shuffled, mirroring the COW anti-join
                # rewrite), and only touched keys pay the latest-wins window,
                # over base-twin ∪ log rows a few MB in size.
                # no dedup on the key set: semi/anti hash builds collapse
                # duplicate keys anyway, and a dropDuplicates here would cost
                # an extra (small-side) exchange
                from .config import PAYLOAD_OVERWRITE_LATEST
                split_key = [META_FILE_NAME, *MERGE_KEY]
                if self.tc.payload == PAYLOAD_OVERWRITE_LATEST:
                    # single-base-scan split (OVERWRITE_LATEST only): a log
                    # row is always newer than its slice's base (log instants
                    # > base_instant, and base rows' commit times never
                    # exceed it), so the per-(group, key) log winner beats
                    # any base twin unconditionally.  Resolve winners on the
                    # log side alone (small window), then ONE pass over the
                    # base drops superseded rows via broadcast anti-join —
                    # the semi-join subtree of the general split re-scanned
                    # the whole dirty base a second time, doubling base read
                    # amplification; at 100 TB that second scan IS the cost.
                    # The join keys include the file group: a duplicate-key
                    # twin in another group is untouched by this group's
                    # logs (reference merges per split,
                    # RealtimeCompactedRecordReader).
                    winners = merge_latest(logs, self.tc,
                                           bucket_col=META_FILE_NAME)
                    if cluster_by_fg:
                        n = max(1, min(len(dirty),
                                       self.spark.sparkContext
                                       .defaultParallelism))
                        winners = winners.repartition(n,
                                                      F.col(META_FILE_NAME))
                    # anti-join on the RAW log key set, not the winners: a
                    # winner exists exactly when any log row does, and the
                    # raw projection keeps the window subtree out of the
                    # broadcast build (one log-side exchange total; the
                    # broadcast hash build collapses duplicate keys free)
                    lk = logs.select(*split_key)
                    d = (b.join(F.broadcast(lk), split_key, "left_anti")
                          .unionByName(winners, allowMissingColumns=True))
                else:
                    lk = logs.select(*MERGE_KEY)
                    untouched = b.join(F.broadcast(lk), MERGE_KEY,
                                       "left_anti")
                    touched = (b.join(F.broadcast(lk), MERGE_KEY,
                                      "left_semi")
                                .withColumn(NEW_FLAG, F.lit(False)))
                    small = touched.unionByName(logs)
                    if cluster_by_fg:
                        # every row carries its file group in
                        # _hoodie_file_name; cluster just the small side so
                        # the whole output can be written pre-partitioned
                        # (one new file per group from this side,
                        # scan-partition passthrough from the other).
                        # bucket_col makes the merge window's required
                        # distribution start with the file group, so the
                        # window reuses this exchange instead of adding a
                        # key shuffle.
                        n = max(1, min(len(dirty),
                                       self.spark.sparkContext
                                       .defaultParallelism))
                        small = small.repartition(n, F.col(META_FILE_NAME))
                    # per-file-group window — the reference merges per split
                    # (RealtimeCompactedRecordReader), so a duplicate-key
                    # twin in another file group is untouched by this
                    # group's logs
                    merged_small = merge_latest(small, self.tc,
                                                bucket_col=META_FILE_NAME)
                    d = untouched.unionByName(merged_small)
            else:
                bl = b.withColumn(NEW_FLAG, F.lit(False)).unionByName(logs)
                if cluster_by_fg:
                    n = max(1, min(len(dirty),
                                   self.spark.sparkContext.defaultParallelism))
                    bl = bl.repartition(n, F.col(META_FILE_NAME))
                d = merge_latest(bl, self.tc, bucket_col=META_FILE_NAME)
            if not raw and not skip_merge:
                d = drop_deleted(d)
            parts.append(d.select(*[c for c in dschema.names
                                    if c in out_cols or (raw and c == API_DELETE)]))
        if not parts:
            return self.spark.createDataFrame([], schema)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p, allowMissingColumns=True)
        if raw:
            df = df.withColumn(FG, F.col(META_FILE_NAME))
        elif not read_optimized:
            df = drop_deleted(df)
        return df

    def _scan_external(self, slices: list[FileSlice],
                       schema: StructType) -> DataFrame:
        """Scan METADATA_ONLY-bootstrapped source files, deriving the virtual
        skeleton — the meta columns the reference stitches from skeleton
        files (HoodieBootstrapRelation.scala / HoodieBootstrapRDD.scala) are
        pure expressions here: key/partition via the keygen, commit time from
        the bootstrap instant, file name from a path→file-group map."""
        files = [(f.path, sl.file_group, sl.base_instant)
                 for sl in slices for f in sl.base_files]
        src = scan_parquet(self.spark, [p for p, _, _ in files])
        norm = F.regexp_replace(F.input_file_name(), "^file:/*", "/")
        fg_map = F.create_map(*[x for p, fg, _ in files
                                for x in (F.lit(p), F.lit(fg))])
        it_map = F.create_map(*[x for p, _, it in files
                                for x in (F.lit(p), F.lit(it))])
        out = (src
               .withColumn(META_RECORD_KEY,
                           record_key_col(self.tc.recordkey_fields))
               .withColumn(META_PARTITION_PATH,
                           partition_path_col(self.tc.partition_expr))
               .withColumn(META_COMMIT_TIME, it_map[norm])
               .withColumn(META_COMMIT_SEQNO,
                           F.concat_ws("_", it_map[norm],
                                       F.monotonically_increasing_id()
                                       .cast("string")))
               .withColumn(META_FILE_NAME, fg_map[norm]))
        cols = [F.col(f.name).cast(f.dataType).alias(f.name)
                if f.name in out.columns
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields]
        return out.select(*cols)

    def _read_incremental(self, begin: Optional[str], end: Optional[str],
                          partitions: Optional[Sequence[str]],
                          path_glob: Optional[str] = None) -> DataFrame:
        """Change-stream in (begin, end]: latest value of every key changed in
        the range (IncrementalRelation.scala:64-181 /
        MergeOnReadIncrementalRelation.scala:95-111).  File set = commits'
        manifests, so the scan touches only file groups with changes; the
        ``_hoodie_commit_time`` range filter additionally prunes parquet row
        groups via min/max (free pushdown — it's a leading stored column)."""
        # active ∪ archived: an incremental pull whose range reaches behind
        # the archival boundary must still see those commits' file groups
        # (the view already folds archived instants; enumerate them here
        # too).  The window resolution is shared with the native DataSource
        # planner (fsview.incremental_window) so the two cannot desync.
        from .fsview import incremental_window
        instants, hi, touched = incremental_window(self.timeline, begin, end)
        if not instants:
            return self.spark.createDataFrame([], self._read_schema())
        from .fsview import filter_slices_by_glob
        view = self.view(as_of=hi)
        slices = [sl for sl in view.latest_slices(partitions)
                  if sl.file_group in touched]
        slices = filter_slices_by_glob(slices, path_glob)
        df = self._read_slices(slices, read_optimized=False, view=view)
        cond = F.col(META_COMMIT_TIME) <= F.lit(hi)
        if begin is not None:
            cond = cond & (F.col(META_COMMIT_TIME) > F.lit(begin))
        return df.filter(cond)

    # ==================================================================
    # table services (delegate to services/)
    # ==================================================================
    def _post_commit(self) -> None:
        """Post-commit services (SparkRDDWriteClient.java:263-281): inline
        compaction trigger + auto-clean/archival when configured."""
        # one listing feeds every eligibility gate below; the services that
        # actually FIRE re-list for themselves (rare vs the steady state)
        data = tl.completed_from(self.timeline.instants(), tl.DATA_ACTIONS)
        if self.cfg.inline_compaction and self.tc.table_type == MERGE_ON_READ:
            from .services.compaction import maybe_inline_compact
            maybe_inline_compact(self)
        if self.cfg.metadata_checkpoint_commits:
            from . import metadata_table as mt
            last = mt.latest_checkpoint_time(self.meta)
            fresh = [i for i in data if last is None or i.time > last]
            if len(fresh) >= self.cfg.metadata_checkpoint_commits:
                mt.write_checkpoint(self)
        # hoodie.clean.automatic / archival after write (postWrite,
        # SparkRDDWriteClient.java:263-281) — both no-ops until the table
        # exceeds retention, so the steady-state driver cost is one listing
        if self.cfg.auto_clean and len(data) > self.cfg.clean_retain_commits:
            self.clean()
        if self.cfg.auto_archive and len(data) > self.cfg.archive_max_commits:
            self.archive()

    def schedule_compaction(self, **kw) -> Optional[str]:
        from .services.compaction import schedule_compaction
        return schedule_compaction(self, **kw)

    def build_bloom_index(self, instant_time: Optional[str] = None,
                          bits_per_key: int = 10, k: int = 7) -> Optional[str]:
        """Build/refresh the per-file-group bloom sidecar (the reference
        BLOOM index's footer blooms, SURVEY §2.2) used by ``read_keys`` as
        a second pruning stage after min/max ranges."""
        from .bloom import build_bloom_sidecar
        return build_bloom_sidecar(self, instant_time, bits_per_key, k)

    def validate_compaction_plan(self, instant_time: str) -> list:
        from .services.compaction import validate_compaction_plan
        return validate_compaction_plan(self, instant_time)

    def unschedule_compaction(self, instant_time: str) -> bool:
        from .services.compaction import unschedule_compaction
        return unschedule_compaction(self, instant_time)

    def run_compaction(self, instant_time: Optional[str] = None) -> Optional[str]:
        from .services.compaction import run_compaction
        return run_compaction(self, instant_time)

    def cluster(self, sort_columns: Optional[Sequence[str]] = None,
                partitions: Optional[Sequence[str]] = None,
                layout: str = "linear") -> Optional[str]:
        """``layout="zorder"`` interleaves the sort columns on a Morton
        curve so column-stats skipping serves range predicates on every
        sort column, not just the leading one."""
        from .services.clustering import run_clustering
        return run_clustering(self, sort_columns, partitions, layout=layout)

    def schedule_clustering(self, sort_columns: Optional[Sequence[str]] = None,
                            partitions: Optional[Sequence[str]] = None,
                            layout: str = "linear", **kw) -> Optional[str]:
        """Park a clustering plan as ``replacecommit.requested``; its file
        groups are frozen (updates rejected, insert packing avoids them)
        until ``cluster()`` / ``run_clustering`` executes the plan."""
        from .services.clustering import schedule_clustering
        return schedule_clustering(self, sort_columns, partitions,
                                   layout=layout, **kw)

    def pending_clustering(self) -> dict[str, str]:
        """file_group → pending clustering instant time."""
        from .services.clustering import pending_clustering_fgs
        return pending_clustering_fgs(self)

    def clean(self) -> dict:
        from .services.cleaning import run_clean
        return run_clean(self)

    def rollback(self, instant_time: str) -> str:
        from .services.rollback import rollback_instant
        return rollback_instant(self, instant_time)

    def savepoint(self) -> str:
        from .services.savepoint import create_savepoint
        return create_savepoint(self)

    def restore(self, savepoint_time: str) -> str:
        from .services.savepoint import restore_to_savepoint
        return restore_to_savepoint(self, savepoint_time)

    def delete_savepoint(self, savepoint_time: str) -> None:
        from .services.savepoint import delete_savepoint
        return delete_savepoint(self, savepoint_time)

    def archive(self) -> int:
        from .services.archival import run_archival
        return run_archival(self)

    def write_metadata_checkpoint(self) -> Optional[str]:
        """Force a metadata-table sync (HoodieBackedTableMetadataWriter)."""
        from . import metadata_table as mt
        return mt.write_checkpoint(self)

    def metadata_files(self) -> DataFrame:
        """The metadata table's ``files`` view as a DataFrame."""
        from . import metadata_table as mt
        return mt.files_df(self)

    # ==================================================================
    # SQL-DML style API (MergeIntoHoodieTableCommand.scala re-expressed as
    # DataFrame algebra) lives in dml.py; re-exported here for ergonomics.
    # ==================================================================
    def merge(self, source: DataFrame, on: str, **kw) -> str:
        from .dml import merge_into
        return merge_into(self, source, on, **kw)

    def update(self, set_exprs: dict[str, str], where: Optional[str] = None) -> str:
        from .dml import update_table
        return update_table(self, set_exprs, where)

    def delete_where(self, where: str) -> str:
        from .dml import delete_where
        return delete_where(self, where)
