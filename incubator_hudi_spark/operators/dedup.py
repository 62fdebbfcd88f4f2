"""Deduplication operators for large-scale text corpora.

Beyond the reference's own surface (BASELINE.json extension goals): exact
dedup, MinHash+LSH, SimHash, and n-gram Jaccard near-dup detection — all as
DataFrame transforms designed for 100 TB corpora:

  - everything stays JVM-side (xxhash64 / higher-order array functions; no
    Python UDFs in any hot path);
  - candidate generation is *blocked* (LSH bands / simhash chunks), so the
    pairwise stage shuffles only same-bucket groups, never the cross product;
  - outputs are deterministic (fixed hash seeds via salt strings).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     normalize: bool = True) -> DataFrame:
    """Groups of byte-identical (optionally whitespace/case-normalized) docs.
    Returns (content_hash, group_size, doc_ids, keep_id).  A hash groupBy —
    one shuffle on a 32-char key regardless of document size."""
    c = F.col(text_col)
    if normalize:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return (df.withColumn("content_hash", F.md5(c))
              .groupBy("content_hash")
              .agg(F.count(F.lit(1)).alias("group_size"),
                   F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
                   F.min(id_col).alias("keep_id"))
              .filter(F.col("group_size") > 1))


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalize: bool = True) -> DataFrame:
    """Keep one representative (min id) per identical-content group."""
    c = F.col(text_col)
    if normalize:
        c = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    w = Window.partitionBy(F.md5(c)).orderBy(F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


# ---------------------------------------------------------------------------
# shingling + minhash
# ---------------------------------------------------------------------------

def tokenize(text: Column) -> Column:
    """Lowercased whitespace tokens — materialize this through a projection
    BEFORE deriving shingles from it: referencing the split() expression
    inside the per-shingle lambda makes Catalyst inline (recompute) it per
    shingle, ~4.7× slower at corpus scale (measured, interleaved A/B)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_shingles_from(words: Column, w: int = 3) -> Column:
    """Array of w-word shingles from an ALREADY-TOKENIZED array column."""
    n = F.greatest(F.size(words) - F.lit(w - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, w)))


def word_shingles(text: Column, w: int = 3) -> Column:
    """Array of w-word shingles (lowercased, whitespace-tokenized).
    Column-form convenience — bulk paths should tokenize() into a projected
    column first and use word_shingles_from (see tokenize's note)."""
    return word_shingles_from(tokenize(text), w)


def minhash_signature(shingles: Column, k: int = 16) -> Column:
    """k-permutation MinHash as an array<long>.

    Two-phase for speed: hash every shingle ONCE (string → long), then derive
    the k permutations by re-hashing the longs — so the expensive string pass
    happens once, and the k transforms fold cheap fixed-width longs.  Pure JVM
    higher-order functions, no overflow, no UDF.

    NB: pyspark HOF lambdas must be unary here — a captured default arg would
    change the inspected arity and bind the array *index* instead."""
    base = F.transform(shingles, lambda s: F.xxhash64(s))

    def rehash(salt: str):
        return lambda h: F.xxhash64(h, F.lit(salt))
    return F.array(*[
        F.array_min(F.transform(base, rehash(f"mh{i}")))
        for i in range(k)])


def minhash_signatures_df(df: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id", k: int = 16,
                          shingle_w: int = 3,
                          hash_family: str = "xxhash64") -> DataFrame:
    """(id, mh0..mh{k-1}) via explode + groupBy with k ``min`` aggregates —
    the 100 TB shape: whole-stage-codegen aggregates with map-side partial
    combine (nested higher-order-function trees are interpreted and get
    re-evaluated per permutation; this form hashes each shingle string once,
    CSE'd across the k aggregates).

    ``hash_family``: "xxhash64" (fast path, long signatures) or "md5"
    (portable path — hex-string signatures any ANSI-SQL engine reproduces;
    identical plan shape, used by the oracle-checked query)."""
    from ._util import ensure_min_parallelism
    df = ensure_min_parallelism(df, key=id_col)
    ex = (df.select(F.col(id_col).alias("_id"),
                    tokenize(F.col(text_col)).alias("_w"))
            .select("_id", F.explode(F.array_distinct(
                word_shingles_from(F.col("_w"), shingle_w))).alias("_s")))
    if hash_family == "md5":
        base = F.md5(F.col("_s"))
        perms = [F.min(F.md5(F.concat(F.lit(str(i)), base))).alias(f"mh{i}")
                 for i in range(k)]
    else:
        base = F.xxhash64(F.col("_s"))
        perms = [F.min(F.xxhash64(base, F.lit(i))).alias(f"mh{i}")
                 for i in range(k)]
    return ex.groupBy("_id").agg(*perms)


#: per-task bucket-slice target for the banded self-join: buckets larger
#: than this are salted into ceil(n / HOT_BUCKET_ROWS) groups so no single
#: task owns a whole hot bucket's pair generation (guide §2.5 — AQE skew
#: join cannot split a single enormous key).  Inert when every bucket is
#: smaller (g = 1: the salt column is constant 0 and the b-side explode
#: yields exactly one row).
HOT_BUCKET_ROWS = 1024


def minhash_lsh_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", k: int = 16, bands: int = 8,
                      shingle_w: int = 3,
                      verify_threshold: float | None = 0.5,
                      hash_family: str = "xxhash64",
                      max_bucket_size: int | None = None) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding.

    shingle → k minhashes → ``bands`` band-hashes → bucket self-join carrying
    the signature ARRAY → similarity computed in place → distinct pairs.

    Single-pass design: the (expensive) shingle-explode + k-min aggregation
    runs exactly once — Spark has no cross-subtree exchange reuse for the
    sig table, so the slim-rows-then-verify-join alternative recomputes it
    three times.  Carrying the k-element signature array fattens the banding
    shuffle by ~8×k bytes/doc, but deletes two sig-table joins (each of
    which would shuffle the sig table again) — strictly fewer bytes moved
    and one aggregation instead of three.

    ``max_bucket_size`` (r7, guide §2.5/§3 — default None = off) BOUNDS the
    per-(band, band_hash) bucket self-join for skewed corpora:
      * a count window partitioned by the join key (riding the join's own
        exchange and sort on the big-data sort-merge shape) drops
        singleton buckets (no possible pair — results unaffected) and
        buckets larger than the cap;
      * surviving multi-member buckets are SALTED — side a cut into
        g = ceil(n/HOT_BUCKET_ROWS) deterministic id-hash groups, side b
        replicated g ways — so one hot bucket's pair generation spreads
        over g tasks instead of funnelling into one (AQE skew-join cannot
        split a single key).  Pair (a,b) meets in exactly one salt group,
        so salting never changes the pair set.  The CAP does change
        results: a bucket of n near-identical boilerplate docs
        contributes n(n-1)/2 pairs — at degenerate sizes the OUTPUT is
        the explosion and no partitioning fixes O(n²) output (run exact
        dedup first to collapse identical content).  Off by default and
        unused by the oracle-checked queries.  The default path keeps the
        r6 single-exchange shape on purpose: an always-on singleton
        prefilter was A/B-measured at sf0.1 and rejected (see the inline
        note below).
    Returns (id_a, id_b, sig_similarity)."""
    r = k // bands
    sigs = minhash_signatures_df(df, text_col, id_col, k, shingle_w,
                                 hash_family)
    if hash_family == "md5":
        def band_hash(b):
            return F.md5(F.concat(*[F.col(f"mh{b * r + j}")
                                    for j in range(r)]))
    else:
        def band_hash(b):
            return F.xxhash64(*[F.col(f"mh{b * r + j}") for j in range(r)])
    sig_arr = F.array(*[F.col(f"mh{i}") for i in range(k)])
    banded = sigs.select(
        "_id", sig_arr.alias("_sig"),
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"), band_hash(b).alias("bh"))
            for b in range(bands)])).alias("bk")
    ).select("_id", "_sig", "bk.band", "bk.bh")
    if max_bucket_size is not None:
        # bounded mode: the bucket-size window partitions by the join key,
        # so on the big-data (sort-merge) shape it rides the join's own
        # exchange and sort; singleton buckets (no possible pair) and
        # over-cap buckets are dropped, survivors are salted
        counted = (banded.withColumn(
            "_n", F.count(F.lit(1)).over(Window.partitionBy("band", "bh")))
            .filter((F.col("_n") > 1) & (F.col("_n") <= max_bucket_size)))
        g = F.greatest(F.lit(1),
                       F.ceil(F.col("_n") / F.lit(HOT_BUCKET_ROWS))) \
             .cast("int")
        side_a = counted.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("_id")), g).cast("int"))
        side_b = counted.withColumn(
            "_salt", F.explode(F.sequence(F.lit(0), g - F.lit(1))))
        join_keys = ["band", "bh", "_salt"]
    else:
        # unbounded default: plain single-exchange self-join (broadcast at
        # small inputs, SMJ + AQE skew split at scale).  An always-on
        # singleton-bucket window prefilter was A/B-measured at sf0.1 and
        # REJECTED: it forces an Exchange+Sort the broadcast-join plan
        # never needed (0.93 s → 1.11 s, tools/ab_minhash_bound.py).
        side_a = side_b = banded
        join_keys = ["band", "bh"]
    sim = (F.aggregate(
        F.zip_with(F.col("a._sig"), F.col("b._sig"),
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v) / F.lit(float(k)))
    out = (side_a.alias("a")
           .join(side_b.alias("b"), on=join_keys)
           .filter(F.col("a._id") < F.col("b._id"))
           .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                   sim.alias("sig_similarity"))
           .dropDuplicates(["id_a", "id_b"]))
    if verify_threshold is not None:
        out = out.filter(F.col("sig_similarity") >= verify_threshold)
    return out


def dedup_minhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  k: int = 16, bands: int = 8,
                  threshold: float = 0.7,
                  hash_family: str = "xxhash64") -> DataFrame:
    """Drop near-duplicates: every doc similar (≥ threshold) to a lower-id doc
    is removed (greedy union-find approximation — one anti-join, no iteration;
    exact connected components would add an iterative step, unnecessary for
    dedup-keep-one semantics)."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, k, bands,
                              verify_threshold=threshold,
                              hash_family=hash_family)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
               bits: int = 64, hash_family: str = "xxhash64") -> DataFrame:
    """(id, simhash) via explode + groupBy: per token one hash, per bit a
    signed-majority ``sum`` aggregate (codegen + map-side combine — the same
    scale argument as minhash_signatures_df).

    ``hash_family`` "md5": 60-bit token hashes from the md5 hex prefix —
    reproducible in any ANSI-SQL engine (the oracle-checked path); caps
    ``bits`` at 60 so every mask stays positive."""
    from ._util import ensure_min_parallelism
    df = ensure_min_parallelism(df, key=id_col)
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                     r"\s+")).alias("_t"))
    if hash_family == "md5":
        bits = min(bits, 60)
        h = F.conv(F.substring(F.md5(F.col("_t")), 1, 15), 16, 10) \
             .cast("long")
    else:
        h = F.xxhash64(F.col("_t"))
    votes = []
    for b in range(bits):
        mask = (1 << b) if b < 63 else -(1 << 63)
        votes.append(F.sum(
            F.when(h.bitwiseAND(F.lit(mask)) != 0, 1).otherwise(-1))
            .alias(f"v{b}"))
    agg = ex.groupBy("_id").agg(*votes)
    out = F.lit(0).cast("long")
    for b in range(bits):
        bitval = (1 << b) if b < 63 else -(1 << 63)
        out = out + F.when(F.col(f"v{b}") > 0, F.lit(bitval)).otherwise(F.lit(0))
    return agg.select("_id", out.alias("_sh"))


def simhash(text: Column, bits: int = 64) -> Column:
    """Column-form SimHash (HOF fold) — use simhash_df for bulk scoring."""
    tokens = F.split(F.lower(F.trim(text)), r"\s+")
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def vote(b: int):
        mask = (1 << b) if b < 63 else -(1 << 63)
        return lambda acc, h: acc + F.when(
            h.bitwiseAND(F.lit(mask)) != 0, F.lit(1)).otherwise(F.lit(-1))

    votes = [F.aggregate(hashes, F.lit(0), vote(b)) for b in range(bits)]
    out = F.lit(0).cast("long")
    for b, v in enumerate(votes):
        bitval = F.lit(1 << b) if b < 63 else F.lit(-(1 << 63))
        out = out + F.when(v > 0, bitval).otherwise(F.lit(0))
    return out


def simhash_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3,
                  hash_family: str = "xxhash64") -> DataFrame:
    """Near-dup pairs by SimHash: candidates must share one of 4 16-bit chunks
    (pigeonhole: hamming ≤ 3 ⇒ some chunk is identical — also true for the
    60-bit md5 family, whose last chunk holds 12 bits), verified by exact
    hamming distance (bit_count of xor)."""
    docs = simhash_df(df, text_col, id_col, hash_family=hash_family)
    chunked = docs.select(
        "_id", "_sh",
        F.explode(F.array(*[
            F.struct(F.lit(c).alias("chunk"),
                     F.shiftright("_sh", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("ck"))
            for c in range(4)])).alias("c")
    ).select("_id", "_sh", "c.chunk", "c.ck")
    a = chunked.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"),
                       "chunk", "ck")
    b = chunked.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"),
                       "chunk", "ck")
    return (a.join(b, on=["chunk", "ck"])
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"])
             .withColumn("hamming", F.bit_count(
                 F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
             .filter(F.col("hamming") <= max_hamming)
             .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------------
# exact n-gram jaccard (the verify-grade metric; also usable standalone with
# a blocking column)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        block_col: str | None = None,
                        n: int = 3, threshold: float = 0.5) -> DataFrame:
    """Exact Jaccard similarity of word n-gram sets for candidate pairs within
    a blocking group (cross product *within* blocks only — supply a cheap
    block like language or LSH bucket at scale).  Returns (id_a, id_b, jaccard)."""
    from ._util import ensure_min_parallelism
    df = ensure_min_parallelism(df, key=id_col)
    docs = (df.select(F.col(id_col).alias("_id"),
                      tokenize(F.col(text_col)).alias("_w"),
                      (F.col(block_col) if block_col
                       else F.lit(1)).alias("_blk"))
              .select("_id",
                      F.array_distinct(
                          word_shingles_from(F.col("_w"), n)).alias("_sh"),
                      "_blk"))
    a = docs.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"), "_blk")
    b = docs.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"), "_blk")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (a.join(b, on="_blk")
             .filter(F.col("id_a") < F.col("id_b"))
             .withColumn("jaccard", inter / union)
             .filter(F.col("jaccard") >= threshold)
             .select("id_a", "id_b", "jaccard"))


def dup_clusters(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                 max_iterations: int = 20,
                 checkpoint_dir: str | None = None) -> DataFrame:
    """Connected components over a near-duplicate pair list → cluster ids
    (min member id wins), the step that turns pairwise dup detection into
    keep-one-per-cluster corpus pruning.

    Iterative min-label propagation: each round joins current labels across
    the (symmetrized) edge list and keeps the per-vertex minimum — the
    standard alternating-join approach that scales as O(E) work per round
    with O(log n) rounds on realistic dup graphs (chains are rare; dup
    clusters are near-cliques).  Each round is one shuffle; frames are
    persisted and the fixpoint check piggybacks on the aggregation.
    Returns (doc_id, cluster_id) for every vertex that appears in a pair.

    ``checkpoint_dir``: directory for a RELIABLE checkpoint of the result
    (survives executor loss on long-lived clusters); default None pins it
    with ``localCheckpoint`` — cheaper, but executor-local blocks lost to
    failure are unrecoverable.  Results are identical either way.
    """
    a, b = F.col(id_a), F.col(id_b)
    edges = (pairs.select(a.alias("src"), b.alias("dst"))
             .unionByName(pairs.select(b.alias("src"), a.alias("dst")))
             .distinct().persist())
    labels = (edges.select(F.col("src").alias("v"))
              .distinct().withColumn("label", F.col("v")).persist())
    try:
        converged = False
        for _ in range(max_iterations):
            # candidate labels flowing along edges, then per-vertex min
            prop = (edges.join(labels.withColumnRenamed("v", "src"), "src")
                    .select(F.col("dst").alias("v"), "label"))
            new_labels = (labels.unionByName(prop)
                          .groupBy("v").agg(F.min("label").alias("label"))
                          .persist())
            changed = (new_labels.join(labels.withColumnRenamed("label", "old"), "v")
                       .filter("label < old").limit(1).count())
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            raise RuntimeError(
                f"dup_clusters did not converge in {max_iterations} rounds — "
                f"a component's propagation diameter exceeds the cap; raise "
                f"max_iterations (chains this long usually indicate a "
                f"too-loose pair threshold)")
        # pin the result off the iterative lineage (re-evaluating the joined
        # chain without a cache is exponential), then release the cache —
        # localCheckpoint blocks are reclaimed with the DataFrame, unlike a
        # persist the caller can never unpersist
        from ._util import checkpoint
        out = checkpoint(
            labels.select(F.col("v").alias("doc_id"),
                          F.col("label").alias("cluster_id")),
            checkpoint_dir, eager=True)
        labels.unpersist()
        return out
    finally:
        edges.unpersist()


# ---------------------------------------------------------------------------
# train/eval contamination (n-gram overlap against a benchmark probe set)
# ---------------------------------------------------------------------------

def contamination_report(docs: DataFrame, probes: DataFrame,
                         n: int = 13, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Per-document n-gram overlap with a probe (benchmark/eval) corpus —
    the standard decontamination pass for LLM training data (13-gram overlap
    was popularized by the GPT-3 paper's dedup appendix; any public n works).

    Returns (id, n_contam_grams, n_grams, contam_milli) where contam_milli =
    floor(1000 · overlap/total), an integer so results hash stably across
    engines.  Scale shape: docs explode to distinct n-grams with map-side
    combine; the probe side (benchmark sets are tiny vs the corpus) is
    aggregated to a distinct gram set and broadcast into a hash join — the
    100 TB corpus is never shuffled, one scan + one broadcast probe."""
    d = (docs.select(F.col(id_col).alias("_id"),
                     tokenize(F.col(text_col)).alias("_w"))
             .select("_id", F.explode(F.array_distinct(
                 word_shingles_from(F.col("_w"), n))).alias("_g")))
    p = (probes.select(tokenize(F.col(text_col)).alias("_w"))
         .select(F.explode(F.array_distinct(
             word_shingles_from(F.col("_w"), n))).alias("_g"))
         .dropDuplicates(["_g"])
         .withColumn("_hit", F.lit(1)))
    # single corpus pass: broadcast-mark probe grams, one aggregate yields
    # both the gram total and the hit count (the shingle scan is by far the
    # dominant cost — never run it twice)
    return (d.join(F.broadcast(p), "_g", "left")
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.count(F.col("_hit")).alias("n_contam_grams"))
            .select(F.col("_id").alias(id_col),
                    F.col("n_contam_grams"), F.col("n_grams"),
                    F.floor(F.lit(1000.0) * F.col("n_contam_grams")
                            / F.col("n_grams")).cast("long")
                     .alias("contam_milli")))


def decontaminate(docs: DataFrame, probes: DataFrame, n: int = 13,
                  max_contam_milli: int = 0, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Drop documents whose probe-set n-gram overlap exceeds the threshold.
    The default (0) means ANY overlapping gram drops the document — checked
    on the raw gram count, since contam_milli's floor would round overlaps
    under 0.1%% of a large doc down to zero.  Anti-join on the flagged id
    set — the corpus passes through in its scan partitions."""
    rep = contamination_report(docs, probes, n, text_col, id_col)
    if max_contam_milli <= 0:
        flagged = rep.filter(F.col("n_contam_grams") > 0).select(id_col)
    else:
        flagged = rep.filter(F.col("contam_milli") > max_contam_milli) \
                     .select(id_col)
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
