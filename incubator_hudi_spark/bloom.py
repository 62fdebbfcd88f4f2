"""Per-file-group bloom filters — the reference BLOOM index's second stage.

Reference: HoodieParquetWriter stores a bloom of the record keys in every
base file's footer; SparkHoodieBloomIndex prunes candidate (file, key) pairs
with min/max ranges first, then the blooms, then verifies against actual
keys (SparkHoodieBloomIndex.java:70-140).  Our manifests already carry the
ranges; this module adds the bloom stage as a **sidecar parquet** under
``.hoodie/bloom/<ts>.parquet`` (one row per file group: base_instant, m, k,
bitset) — parquet footers aren't writable from PySpark, and a bitset inside
the commit JSON would bloat it, but a columnar sidecar is itself readable
as a DataFrame for distributed checks (the metadata-table pattern,
SURVEY §2.5).

Hash family: position_i(key) = md5("<key>:<i>") low 60 bits mod m —
computed JVM-side (``F.md5``) when building over written files, and
reproduced bit-for-bit driver-side with ``hashlib`` when testing point
lookups.  Ranges stay the first-stage pruner; blooms sharpen the cases
ranges can't (hash/unsorted layouts, where every file's range overlaps).

Staleness safety: each bloom records the ``base_instant`` of the slice it
was built from; a slice whose base has since been rewritten ignores the
stale bloom (and slices with newer log files are never bloom-skipped) — a
bloom may only ACCELERATE, never decide membership.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterable, Optional

from pyspark.sql import functions as F

DEFAULT_BITS_PER_KEY = 10      # ~1% FPR at k=7
DEFAULT_K = 7


def positions_py(key: str, m: int, k: int) -> list[int]:
    """Driver-side positions; mirrors the JVM md5 formula bit-for-bit."""
    out = []
    for i in range(k):
        h = hashlib.md5(f"{key}:{i}".encode()).hexdigest()[:15]
        out.append(int(h, 16) % m)
    return out


def might_contain(bloom: bytes, m: int, k: int, key: str,
                  _pos_cache: Optional[dict] = None) -> bool:
    """``_pos_cache``: optional {(key, m, k): positions} memo — positions
    depend only on (key, m, k), so callers probing many file groups with the
    same key set should share one cache (avoids re-hashing per group)."""
    if _pos_cache is None:
        positions = positions_py(key, m, k)
    else:
        positions = _pos_cache.get((key, m, k))
        if positions is None:
            positions = _pos_cache[(key, m, k)] = positions_py(key, m, k)
    for pos in positions:
        if not (bloom[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def sidecar_dir(meta) -> str:
    return os.path.join(meta.meta_path, "bloom")


def build_bloom_sidecar(table, instant_time: Optional[str] = None,
                        bits_per_key: int = DEFAULT_BITS_PER_KEY,
                        k: int = DEFAULT_K) -> Optional[str]:
    """Build blooms for the latest base files (optionally only those based
    at ``instant_time``) and write the sidecar parquet.  One column-pruned
    scan of the record-key column → JVM md5 position arrays (per-row m via
    a broadcast literal map) → per-file-group bitset assembly in an
    Arrow-batched ``applyInPandas`` (executor-side, parallel per group).
    m is sized from each group's manifest row count (power of two)."""
    import pandas as pd

    from .config import META_RECORD_KEY
    from .writer import FG

    view = table.view()
    slices = [sl for sl in view.latest_slices()
              if (instant_time is None or sl.base_instant == instant_time)]
    m_of, base_of, all_paths = {}, {}, []
    for sl in slices:
        n = sum(f.num_records for f in sl.base_files)
        paths = [table.meta.abs_path(f.path) for f in sl.base_files
                 if not f.external]
        # a slice with ANY external (bootstrap) base file gets no bloom: a
        # bitset missing that file's keys would be a false negative
        if n > 0 and paths and len(paths) == len(sl.base_files):
            m_of[sl.file_group] = 1 << max(8, (n * bits_per_key).bit_length())
            base_of[sl.file_group] = sl.base_instant
            all_paths += paths
    if not m_of:
        return None

    from .scan import scan_parquet
    spark = table.spark
    m_map = F.create_map(*[x for fg, m in m_of.items()
                           for x in (F.lit(fg), F.lit(m))])
    key_c = F.col(META_RECORD_KEY)
    pos = (scan_parquet(spark, all_paths,
                        fmt=getattr(table.meta.config, "base_format",
                                    "parquet"))
           .select(F.col("_hoodie_file_name").alias(FG),
                   F.explode(F.array(*[
                       F.pmod(F.conv(F.substring(
                           F.md5(F.concat(key_c, F.lit(f":{i}"))),
                           1, 15), 16, 10).cast("long"),
                           m_map[F.col("_hoodie_file_name")])
                       for i in range(k)])).alias("_pos")))

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        fg = pdf[FG].iloc[0]
        m = m_of[fg]
        bits = bytearray(m >> 3)
        for p in pdf["_pos"]:
            p = int(p)
            bits[p >> 3] |= 1 << (p & 7)
        return pd.DataFrame({"file_group": [fg],
                             "base_instant": [base_of[fg]],
                             "m": [m], "k": [k], "bloom": [bytes(bits)]})

    built = pos.groupBy(FG).applyInPandas(
        assemble,
        schema="file_group string, base_instant string, m long, k int, "
               "bloom binary")
    d = sidecar_dir(table.meta)
    os.makedirs(d, exist_ok=True)
    # incremental refresh: carry forward previous blooms that are still
    # valid for their slice (same base instant) and weren't rebuilt — a
    # partial rebuild must not silently drop coverage of untouched groups
    if instant_time is not None:
        prev = load_blooms(table.meta)
        cur_base = {sl.file_group: sl.base_instant
                    for sl in view.latest_slices()}
        carry = [(fg, bi, m, kk, bl) for fg, (bi, m, kk, bl) in prev.items()
                 if fg not in m_of and cur_base.get(fg) == bi]
        if carry:
            carry_df = table.spark.createDataFrame(
                carry, schema="file_group string, base_instant string, "
                              "m long, k int, bloom binary")
            built = built.unionByName(carry_df)
    last = table.timeline.last_completed()
    tag = last.time if last else "0"
    out = os.path.join(d, f"{tag}.parquet")
    built.coalesce(1).write.mode("overwrite").parquet(out)
    # superseded snapshots are dead weight (load_blooms only reads the
    # newest); retire them now that the refresh is durable
    _prune_old_snapshots(d, keep=1)
    return out


def _prune_old_snapshots(d: str, keep: int = 1) -> None:
    import shutil
    snaps = sorted(x for x in os.listdir(d) if x.endswith(".parquet"))
    for stale in snaps[:-keep] if keep else snaps:
        shutil.rmtree(os.path.join(d, stale), ignore_errors=True)


def load_blooms(meta) -> dict[str, tuple[str, int, int, bytes]]:
    """Newest sidecar → {fg: (base_instant, m, k, bitset)} (driver, tiny)."""
    d = sidecar_dir(meta)
    if not os.path.isdir(d):
        return {}
    snaps = sorted(x for x in os.listdir(d) if x.endswith(".parquet"))
    if not snaps:
        return {}
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(d, snaps[-1]))
    out = {}
    for fg, bi, m, kk, bl in zip(
            t["file_group"].to_pylist(), t["base_instant"].to_pylist(),
            t["m"].to_pylist(), t["k"].to_pylist(), t["bloom"].to_pylist()):
        out[fg] = (bi, int(m), int(kk), bytes(bl))
    return out


def prune_slices_by_bloom(slices, blooms: dict, keys: Iterable[str]):
    """Drop slices whose bloom proves NONE of ``keys`` present.  Kept
    regardless: slices without a bloom, with log files (MOR records the
    bloom doesn't cover), or whose base was rewritten after the bloom was
    built (stale)."""
    keep = []
    ks = list(keys)
    pos_cache: dict = {}  # (key, m, k) → positions, shared across slices
    for sl in slices:
        b = blooms.get(sl.file_group)
        if b is None or sl.log_files or b[0] != sl.base_instant:
            keep.append(sl)
            continue
        _bi, m, k, bits = b
        if any(might_contain(bits, m, k, key, pos_cache) for key in ks):
            keep.append(sl)
    return keep
