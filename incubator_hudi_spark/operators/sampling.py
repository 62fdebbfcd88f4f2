"""Deterministic sampling / splitting operators for training-data pipelines.

Random sampling (``df.sample``) is not reproducible across runs, engines, or
partitionings — a training pipeline needs the SAME sample every run so
ablations are comparable and oracle checks are possible.  These operators
therefore sample by *content hash*: a record is in the sample iff
``hash(id) mod D < rate*D``, which is

  - deterministic (pure function of the row, independent of partitioning),
  - cheap (one codegen hash per row, zero shuffles, fully pushable),
  - composable (disjoint buckets → train/eval split is leak-free by
    construction).

Two hash families: ``xxhash64`` (JVM codegen, the fast path) and ``md5``
(bit-identical in any engine — used by the DuckDB oracle checks, same plan).
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DENOM = 10_000  # rate granularity: 1/10000


def _bucket(id_col: Column, hash_family: str, salt: str) -> Column:
    """Stable per-record bucket in [0, DENOM)."""
    if hash_family == "md5":
        # low 15 hex digits → non-negative bigint, same in DuckDB
        h = F.conv(F.substring(F.md5(F.concat(F.lit(salt),
                                              id_col.cast("string"))), 1, 15),
                   16, 10).cast("bigint")
    else:
        h = F.abs(F.xxhash64(F.concat(F.lit(salt), id_col.cast("string"))))
    return h % DENOM


def sample_fraction(df: DataFrame, rate: float, id_col: str = "doc_id",
                    hash_family: str = "xxhash64",
                    salt: str = "s0") -> DataFrame:
    """Deterministic ``rate`` sample: keep rows whose hash bucket falls below
    ``rate * DENOM``.  A pure filter — no shuffle, survives any scale."""
    return df.filter(_bucket(F.col(id_col), hash_family, salt)
                     < int(rate * DENOM))


def sample_stratified(df: DataFrame, strata_col: str,
                      rates: Mapping[str, float],
                      default_rate: float = 0.0,
                      id_col: str = "doc_id",
                      hash_family: str = "xxhash64",
                      salt: str = "s0") -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language mixing ratios
    when assembling a training corpus).  ``rates`` maps stratum value →
    fraction; strata absent from the map get ``default_rate``.

    Implementation: one codegen CASE over the stratum column — no join, no
    shuffle, no collect; the plan is a single filtered scan at any scale.
    """
    thresh: Column = F.lit(int(default_rate * DENOM))
    for value, rate in sorted(rates.items()):
        thresh = F.when(F.col(strata_col) == value,
                        F.lit(int(rate * DENOM))).otherwise(thresh)
    return df.filter(_bucket(F.col(id_col), hash_family, salt) < thresh)


def split_train_eval(df: DataFrame, eval_fraction: float = 0.01,
                     id_col: str = "doc_id", hash_family: str = "xxhash64",
                     salt: str = "split") -> tuple[DataFrame, DataFrame]:
    """Leak-free (train, eval) split: the bucket space is partitioned, so no
    record can appear in both sides regardless of run or partitioning."""
    b = _bucket(F.col(id_col), hash_family, salt)
    cut = int(eval_fraction * DENOM)
    return df.filter(b >= cut), df.filter(b < cut)


def cap_per_group(df: DataFrame, group_col: str, cap: int,
                  id_col: str = "doc_id", salt: str = "cap") -> DataFrame:
    """Keep at most ``cap`` records per group, chosen deterministically —
    the per-domain / per-source cap every crawl-derived corpus applies so
    one prolific source cannot dominate the training mix (the CCNet /
    RefinedWeb-style "head cap").

    Selection order is the md5 of (salt, id): stable across runs, engines,
    and partitionings, so the kept set is reproducible and oracle-checkable.
    One window shuffle keyed by the group column; no collect, no join —
    at 100 TB the shuffle carries only (group, rank-key) ordering work and
    skewed groups are bounded by the cap itself on output.
    """
    from pyspark.sql.window import Window
    rank_key = F.md5(F.concat_ws("|", F.lit(salt),
                                 F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(id_col))
    return (df.withColumn("_cap_rn", F.row_number().over(w))
              .filter(F.col("_cap_rn") <= cap).drop("_cap_rn"))


def sample_token_budget(df: DataFrame, weights: Mapping[str, float],
                        total_budget: int,
                        source_col: str = "source",
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        hash_family: str = "md5",
                        salt: str = "mix") -> DataFrame:
    """Training-corpus source mixing: sample each source down so its
    expected token mass matches ``weights[source] * total_budget`` (sources
    absent from ``weights`` get weight 0 and drop).  Selection is
    deterministic content-hash Bernoulli — no per-source ordering, no
    window funnel — so the plan is one tiny per-source aggregate (collected
    to the driver: O(#sources) rows) plus a single codegen'd filtered scan;
    the big side never shuffles at any scale.  Whitespace tokenization
    stands in for the BPE count (swap ``token_expr`` ideas via text.py's
    token counters if needed)."""
    toks = F.size(F.split(F.col(text_col), r"\s+"))
    totals = {r[0]: r[1] for r in
              (df.groupBy(source_col).agg(F.sum(toks).alias("t")).collect())}
    rates = {src: min(1.0, weights[src] * total_budget
                      / max(totals[src] or 0, 1))
             for src in sorted(set(weights) & set(totals))}
    return sample_stratified(df, source_col, rates, default_rate=0.0,
                             id_col=id_col, hash_family=hash_family,
                             salt=salt)
