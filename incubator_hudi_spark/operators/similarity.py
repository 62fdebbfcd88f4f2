"""Similarity search over embedding columns (array<float>).

BASELINE.json extension goals: brute-force cosine top-k as the exactness
baseline; LSH-bucketed and IVF (coarse-quantizer) variants as the 100 TB
scale path.  All vector math is JVM-side (``zip_with`` + ``aggregate`` fold);
no Python touches row data.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a, b) -> Column:
    # cast elements (not products) to double: full f64 accumulation, matching
    # an oracle that computes over DOUBLE[] exactly
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k per query: broadcast the (small) query set against
    the corpus — an embarrassingly parallel scan, the right baseline even at
    100 TB when the query batch fits in a broadcast (norms precomputed once
    per side).  Ties broken by id for determinism.
    Returns (query_id, vec_id, cosine_sim, rank)."""
    from ._util import ensure_min_parallelism
    corpus = ensure_min_parallelism(corpus)
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("_cv"),
                      l2_norm(F.col(vec_col)).alias("_cn"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"),
                       l2_norm(F.col(vec_col)).alias("_qn"))
    scored = (c.join(F.broadcast(q))
               .withColumn("cosine_sim", dot("_cv", "_qv") / (F.col("_cn") * F.col("_qn"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "vec_id", "cosine_sim", "rank"))


# ---------------------------------------------------------------------------
# LSH (random hyperplanes) — sub-linear candidate generation
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, planes: int, seed: int = 42) -> list[list[float]]:
    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def lsh_bucket(vec: Column, hyperplanes: Sequence[Sequence[float]]) -> Column:
    """Sign-bit bucket id from fixed random hyperplanes (deterministic seed).
    The projection is rounded to 9 decimals before the sign test so bucket
    ids are reproducible across engines regardless of float summation
    order (the DuckDB oracle computes the same rounded sign)."""
    bits = []
    for p, plane in enumerate(hyperplanes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in plane]),
                       lambda v, h: (v * h).cast("double")),
            F.lit(0.0), lambda acc, v: acc + v)
        bits.append(F.when(F.round(proj, 9) >= 0, F.lit(1 << p))
                     .otherwise(F.lit(0)))
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out


def lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id",
             dim: Optional[int] = None, planes: int = 8,
             seed: int = 42) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's hyperplane
    bucket.  At 100 TB the corpus is bucketed once (a write-time partition /
    cluster column), so each query touches ~1/2^planes of the data."""
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    hp = _hyperplanes(dim, planes, seed)
    c = corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("_cv"),
                      l2_norm(F.col(vec_col)).alias("_cn"),
                      lsh_bucket(F.col(vec_col), hp).alias("_bkt"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).alias("_qv"),
                       l2_norm(F.col(vec_col)).alias("_qn"),
                       lsh_bucket(F.col(vec_col), hp).alias("_bkt"))
    scored = (c.join(F.broadcast(q), on="_bkt")
               .withColumn("cosine_sim", dot("_cv", "_qv") / (F.col("_cn") * F.col("_qn"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "vec_id", "cosine_sim", "rank"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) — k-means-lite coarse quantizer
# ---------------------------------------------------------------------------

def ivf_assign(corpus: DataFrame, centroids: Sequence[Sequence[float]],
               vec_col: str = "embedding",
               round_to: Optional[int] = None) -> DataFrame:
    """Assign each vector to its nearest centroid (one pass; centroids are a
    literal array — at scale they come from a sampled k-means job and are
    broadcast).  Adds ``_ivf_cell``.  ``round_to``: round the centroid
    similarity before the argmax compare (cross-engine float determinism —
    the DuckDB oracle computes the same rounded argmax); ties keep the
    lowest cell id."""
    best = None
    for ci, cent in enumerate(centroids):
        carr = F.array(*[F.lit(x) for x in cent])
        d = dot(F.col(vec_col), carr) / (l2_norm(F.col(vec_col)) * F.lit(
            math.sqrt(sum(x * x for x in cent)) or 1.0))
        if round_to is not None:
            d = F.round(d, round_to)
        cell = F.struct(d.alias("sim"), F.lit(ci).alias("cell"))
        best = cell if best is None else F.when(cell["sim"] > best["sim"], cell).otherwise(best)
    return corpus.withColumn("_ivf_cell", best["cell"])


def ivf_topk(corpus: DataFrame, queries: DataFrame,
             centroids: Sequence[Sequence[float]], k: int = 10,
             nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding",
             query_id_col: str = "query_id",
             round_to: Optional[int] = None) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    their nearest coarse centroid once (at 100 TB that's a write-time
    cluster/partition column); each query probes only its ``nprobe`` nearest
    cells.  Everything is JVM expressions — centroids are literals (from a
    sampled k-means job at scale), probing is an explode + co-partitioned
    join on the cell id, never a cross product."""
    c = ivf_assign(corpus, centroids, vec_col, round_to=round_to).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"),
        l2_norm(F.col(vec_col)).alias("_cn"), "_ivf_cell")

    # per query: rank all cells by centroid similarity, keep nprobe
    sims = []
    for ci, cent in enumerate(centroids):
        carr = F.array(*[F.lit(x) for x in cent])
        norm = math.sqrt(sum(x * x for x in cent)) or 1.0
        sim = dot(F.col(vec_col), carr) / (l2_norm(F.col(vec_col)) * F.lit(norm))
        if round_to is not None:
            sim = F.round(sim, round_to)
        sims.append(F.struct(sim.alias("sim"), F.lit(ci).alias("cell")))
    probe_cells = F.slice(F.reverse(F.array_sort(F.array(*sims))), 1, nprobe)
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        l2_norm(F.col(vec_col)).alias("_qn"),
        F.explode(F.transform(probe_cells, lambda s: s["cell"])).alias("_ivf_cell"))

    scored = (c.join(F.broadcast(q), on="_ivf_cell")
               .withColumn("cosine_sim",
                           dot("_cv", "_qv") / (F.col("_cn") * F.col("_qn"))))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select("query_id", "vec_id", "cosine_sim", "rank"))


def sample_centroids(corpus: DataFrame, n: int = 16, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic coarse centroids: the ``n`` lowest-id vectors (a stand-in
    for a sampled k-means job; the IVF math is identical)."""
    rows = corpus.orderBy(id_col).limit(n).select(vec_col).collect()
    return [list(r[0]) for r in rows]


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95,
                            planes: int = 8, seed: int = 42,
                            dim: Optional[int] = None,
                            round_to: Optional[int] = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket self-join + exact
    cosine verify (≥ threshold).  Near-identical vectors agree on all sign
    bits with high probability, so the self-join is per-bucket.
    ``round_to``: round the cosine before the threshold test (cross-engine
    float determinism for oracle checking)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    from ._util import ensure_min_parallelism
    df = ensure_min_parallelism(df)
    hp = _hyperplanes(dim, planes, seed)
    d = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                  l2_norm(F.col(vec_col)).alias("_n"),
                  lsh_bucket(F.col(vec_col), hp).alias("_bkt"))
    a = d.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                 F.col("_n").alias("na"), "_bkt")
    b = d.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                 F.col("_n").alias("nb"), "_bkt")
    out = (a.join(b, on="_bkt")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("cosine_sim",
                        dot("va", "vb") / (F.col("na") * F.col("nb"))))
    cmp = (F.round(F.col("cosine_sim"), round_to) if round_to is not None
           else F.col("cosine_sim"))
    return (out.filter(cmp >= threshold)
               .select("id_a", "id_b", "cosine_sim"))


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup-style) + k-means coarse quantizer
# ---------------------------------------------------------------------------

def kmeans_centroids(corpus: DataFrame, k: int = 16, iters: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     round_to: Optional[int] = None) -> list[list[float]]:
    """Lloyd's k-means over an embedding column — the "sampled k-means job"
    the IVF/semantic-dedup operators take their centroids from.

    Deterministic: init = the ``k`` lowest-id vectors; fixed ``iters``
    rounds.  Each round is ONE Spark job: assign (broadcast centroid
    literals, pure expressions) → per-(cell, dim) mean via posexplode +
    hash aggregate (map-side combine; shuffle is k×dim rows per task, never
    corpus-sized).  Driver holds only the k×dim centroid matrix.  Empty
    cells keep their previous centroid."""
    cents = sample_centroids(corpus, n=k, id_col=id_col, vec_col=vec_col)
    k = len(cents)              # corpus smaller than k → fewer centroids
    if k == 0:
        return []
    for _ in range(iters):
        assigned = ivf_assign(corpus, cents, vec_col, round_to=round_to)
        means = (assigned
                 .select("_ivf_cell", F.posexplode(F.col(vec_col))
                         .alias("_pos", "_val"))
                 .groupBy("_ivf_cell", "_pos")
                 .agg(F.avg("_val").alias("_m"))
                 .collect())
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r[0], {})[r[1]] = r[2]
        cents = [
            [by_cell[ci][p] for p in sorted(by_cell[ci])]
            if ci in by_cell else cents[ci]
            for ci in range(k)
        ]
    return cents


def semantic_dedup(df: DataFrame, centroids: Sequence[Sequence[float]],
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   threshold: float = 0.95,
                   round_to: Optional[int] = None,
                   assign_round_to: Optional[int] = None) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023: cluster
    embeddings, drop near-identical members within each cluster): assign
    every vector to its nearest centroid (deterministic rounded argmax,
    ties → lowest cell), self-join WITHIN cells only, and drop any vector
    whose cosine to a lower-id cell-mate reaches ``threshold``.

    Scale shape: the self-join is per cell (k centroids bound the quadratic
    blow-up to cell sizes; at 100 TB the assignment is a write-time
    partition column and each cell joins co-partitioned), centroids are
    broadcast literals, everything JVM expressions.  Returns the surviving
    rows of ``df`` unchanged."""
    from ._util import ensure_min_parallelism
    d = ivf_assign(ensure_min_parallelism(df), centroids, vec_col,
                   round_to=(assign_round_to if assign_round_to is not None
                             else round_to))
    d = d.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                 l2_norm(F.col(vec_col)).alias("_n"), "_ivf_cell")
    a = d.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                 F.col("_n").alias("na"), "_ivf_cell")
    b = d.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                 F.col("_n").alias("nb"), "_ivf_cell")
    cos = dot("va", "vb") / (F.col("na") * F.col("nb"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    losers = (a.join(b, on="_ivf_cell")
               .filter(F.col("id_a") < F.col("id_b"))
               .filter(cos >= F.lit(threshold))
               .select(F.col("id_b").alias(id_col))
               .distinct())
    return df.join(losers, on=id_col, how="left_anti")
