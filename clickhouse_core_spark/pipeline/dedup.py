"""Deduplication operators for web-scale text corpora.

Exact dedup is a hash-groupBy; near-dup families (MinHash+LSH, SimHash,
n-gram Jaccard) follow the standard shingle → signature → band → bucket
equi-join shape so candidate generation is a shuffle on band keys, never
an all-pairs cross join.  Everything — including SimHash's bit-vote
fingerprint fold — is built-in JVM expressions; no Python in any hot path.

At 100 TB: the only shuffles are (a) the band-key groupBy whose
fan-out is bands × docs, and (b) the final representative join — both
linear in corpus size.  Candidate verification is per-bucket.
"""

from __future__ import annotations

import re

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: universal-hash modulus; keeps (a*x+b) % p exact
# in signed 64-bit after pmod on the xxhash base values.
_MERSENNE = (1 << 61) - 1


def _seeded_hash(seed: int):
    """One-arg lambda factory for the i-th hash function: xxhash64 with
    the seed mixed in as a leading column — stays in 64-bit JVM ops
    (a decimal-modulus universal hash was ~50× slower here).

    Must be a factory (not a default-arg capture): pyspark dispatches on
    lambda arity, and a second defaulted parameter would make it receive
    the array *index* as that argument.
    """
    def h(x):
        return F.xxhash64(F.lit(seed), x)
    return h


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    input arrives under-split (a small corpus in few parquet files
    would otherwise run the signature/fingerprint expressions in one
    task).  At real scale inputs already carry >= defaultParallelism
    splits and this is a no-op — no exchange is added.

    Probes ``inputFiles()`` (metadata-only) rather than
    ``rdd.getNumPartitions()``: materializing the RDD under AQE can
    eagerly execute upstream query stages."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < target:
        return df.repartition(target)
    return df


def _normalized(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]+", " "))


def _tokens(text: Column) -> Column:
    return F.split(_normalized(text), r"\s+")


def _shingle_hash_table(df: DataFrame, text_col: str, id_col: str,
                        k: int) -> DataFrame:
    """(id, __shingles: array<long>) — xxhash64 of each distinct word
    k-shingle per document.

    Single-pass construction: tokenize once behind a Generate barrier,
    then a transform over shingle offsets hashing ``slice(tokens, i,
    k)``.  The barrier is load-bearing: without it CollapseProject
    inlines the tokenizer regexp into every transform element — O(len²)
    regexp work per document.  ``explode(array(tokens))`` emits exactly
    one row per document but is a Generate node Catalyst cannot collapse
    projections through — the same fence a ``repartition(id)`` Exchange
    gives, with ZERO shuffle (the Exchange variant moved the whole
    corpus once; at 100 TB that was the dominant cost of signature
    construction).  Documents with fewer than k tokens hash the whole
    normalized text as their single shingle (concat_ws of all tokens ==
    normalized text, so the fallback needs no second scan).
    """
    toks = _ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.explode(F.array(_tokens(F.col(text_col)))).alias("__toks"))
    n = F.size("__toks")
    full = F.array_distinct(F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice("__toks", i + 1, k)))))
    fallback = F.array(F.xxhash64(F.concat_ws(" ", "__toks")))
    return toks.select(
        "__id", F.when(n >= k, full).otherwise(fallback).alias("__shingles"))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", normalize: bool = True) -> DataFrame:
    """Exact dedup: keep the lowest-id row per (normalized) text.

    groupBy on a 64-bit content hash — map-side partial agg, one shuffle
    keyed by hash so hot texts don't skew worse than their duplicate
    count.  Hash collisions across different texts are disambiguated by
    grouping on the text itself alongside the hash (cheap: the hash
    dominates partitioning).
    """
    content = _normalized(F.col(text_col)) if normalize else F.col(text_col)
    # hash aggregation, not a window: min_by partial-aggregates
    # map-side, so duplicate rows collapse BEFORE the shuffle — on a
    # duplicate-heavy corpus the exchange carries one row per distinct
    # text, not one per input row (the former row_number window
    # shuffled and sorted everything)
    return (df.groupBy(F.xxhash64(content).alias("__h"),
                       content.alias("__c"))
            .agg(F.min_by(F.struct(*df.columns), F.col(id_col)).alias("__r"))
            .select("__r.*"))


def _signature_expr(shingles_col: str, num_hashes: int, seed: int) -> Column:
    """All num_hashes minima in ONE pass over the shingle array: fold
    with an array<long> accumulator, zip_with against the seed array.
    ~3x faster than num_hashes separate transform+array_min scans
    (measured at sf0.1) and bit-identical: the seed literals stay
    IntegerType, matching _seeded_hash's xxhash64(int, x) input type."""
    rng = np.random.RandomState(seed)
    seeds = rng.randint(1, 1 << 31, size=num_hashes)
    seed_arr = F.array(*[F.lit(int(s)) for s in seeds])
    return F.aggregate(
        F.col(shingles_col),
        F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes),
        lambda acc, s: F.zip_with(acc, seed_arr,
                                  lambda a, sd: F.least(a, F.xxhash64(sd, s))))


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       num_hashes: int = 64, shingle_k: int = 3,
                       seed: int = 42, id_col: str = "doc_id",
                       out_col: str = "minhash") -> DataFrame:
    """Add an array<bigint> MinHash signature column.

    num_hashes independent seeded xxhash64 functions over the shingle
    hash values; min per function.  All built-in expressions
    (transform/array_min), fully codegen'd — no Python in the hot path.
    """
    sh = _shingle_hash_table(df, text_col, id_col, shingle_k)
    sig = sh.select("__id", _signature_expr("__shingles", num_hashes, seed).alias(out_col))
    return df.join(sig, on=df[id_col] == sig["__id"]).drop("__id")


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      num_hashes: int = 64, bands: int = 16,
                      shingle_k: int = 3, jaccard_threshold: float = 0.8,
                      seed: int = 42, transitive: bool = False) -> DataFrame:
    """MinHash + LSH near-duplicate removal.

    1. signatures (built-in exprs);
    2. band keys: xxhash64 of each band's slice → explode → candidate
       buckets (equi-join blocking, no cross join);
    3. verify candidate pairs with true Jaccard over distinct shingles;
    4. map every doc to a representative: by default the min id of its
       DIRECT similar-neighborhood (single pass); with
       ``transitive=True`` the min id of its full duplicate cluster via
       :func:`pipeline.graphs.connected_components` (large-star/
       small-star), so chains A~B~C with A≁C keep exactly one doc.

    Returns the deduplicated DataFrame (original columns).
    """
    rows_per_band = num_hashes // bands
    sh = _shingle_hash_table(df, text_col, id_col, shingle_k)
    with_sig = sh.withColumn("minhash", _signature_expr("__shingles", num_hashes, seed))
    # the shingle/signature table feeds four consumers (band lhs/rhs,
    # verify lhs/rhs): persist so the signature chain computes once
    with_sig = with_sig.persist()

    band_keys = F.array(*[
        F.xxhash64(F.lit(bi), F.concat_ws(",", F.transform(
            F.slice("minhash", bi * rows_per_band + 1, rows_per_band),
            lambda c: c.cast("string"))))
        for bi in range(bands)])
    # Band join on NARROW rows (id, band) — never duplicate the shingle
    # arrays across candidate pairs; with skewed buckets (duplicate
    # clusters) the wide variant materializes |bucket|² array copies.
    banded = with_sig.select("__id", F.explode(band_keys).alias("__band"))
    pairs = (banded.alias("l").join(banded.alias("r"), on="__band")
             .select(F.col("l.__id").alias("id_a"),
                     F.col("r.__id").alias("id_b"))
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))  # narrow: 16-byte rows

    # verification payload joined back by id (linear shuffles)
    sh_only = with_sig.select("__id", "__shingles")
    pairs = (pairs
             .join(sh_only.select(F.col("__id").alias("id_a"),
                                  F.col("__shingles").alias("sh_a")), "id_a")
             .join(sh_only.select(F.col("__id").alias("id_b"),
                                  F.col("__shingles").alias("sh_b")), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    similar = (pairs
               .withColumn("__j", F.when(union > 0, inter / union).otherwise(F.lit(1.0)))
               .filter(F.col("__j") >= jaccard_threshold)
               .select("id_a", "id_b"))

    if transitive:
        from clickhouse_core_spark.pipeline.graphs import connected_components
        rep = (connected_components(similar, src="id_a", dst="id_b")
               .select(F.col("node").alias("__id"),
                       F.col("label").alias("__rep")))
    else:
        # Representative: min neighbor id (including self); applied via a
        # left join so isolated docs keep themselves.
        rep = (_undirected(similar)
               .groupBy("__id").agg(F.min("__n").alias("__rep")))
    out = (df.join(rep, on=df[id_col] == rep["__id"], how="left")
           .withColumn("__keep", F.col("__rep").isNull() |
                       (F.col("__rep") >= F.col(id_col)))
           .filter(F.col("__keep"))
           .select(*df.columns))
    return out


def _undirected(similar: DataFrame) -> DataFrame:
    """(id, n) rows for BOTH directions of each similar pair, emitted by
    ONE explode (a narrow op) rather than a union of two projections.
    r14: the union shape planned and executed the ENTIRE candidate
    pipeline (band self-join, pair dedup, both verification joins) once
    per branch — no common-subexpression reuse across union arms — and
    accounted for ~30% of dedup_minhash_lsh's runtime (interleaved
    driver-protocol A/B: 3.163 s -> 2.231 s median of 7)."""
    return (similar.select(F.explode(F.array(
        F.struct(F.col("id_b").alias("__id"), F.col("id_a").alias("__n")),
        F.struct(F.col("id_a").alias("__id"), F.col("id_b").alias("__n"))
    )).alias("__e")).select("__e.__id", "__e.__n"))


def md5_hash60(c: Column) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as a long.
    Slower than xxhash64 but exactly re-computable in any SQL engine
    (DuckDB: ``('0x' || substr(md5(x), 1, 15))::BIGINT``) — used by
    oracle entries to make hash-derived operators cross-checkable."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def simhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", hamming_threshold: int = 3,
                  n_blocks: int | None = None,
                  token_hash=None) -> DataFrame:
    """SimHash near-dup removal: 64-bit fingerprints, candidate pairs
    from agreeing on any of ``n_blocks`` disjoint bit blocks (standard
    Charikar pigeonhole blocking: ≤d differing bits spread over d+1
    disjoint blocks leave ≥1 block diff-free, so recall is total at
    ``n_blocks = hamming_threshold + 1`` — the default), verified with
    exact hamming distance.  More blocks ⇒ narrower keys ⇒ more
    candidate pairs; fewer blocks forfeits the recall guarantee.

    Fingerprinting is pure JVM expressions (no Python in the hot path):
    token hashes via ``transform(tokens, xxhash64)``, then ONE
    ``F.aggregate`` fold whose accumulator is the 64-slot bit-vote
    array — each token updates all 64 votes via ``zip_with`` with a
    column-typed shift amount (``call_function('shiftright', h, i)``;
    the PySpark wrapper restricts numBits to a literal but the Catalyst
    ShiftRight expression accepts any int expression).  Single pass
    over each document's tokens, whole-stage-codegen friendly.
    """
    sh = _ensure_parallelism(df).withColumn(
        "__simhash", simhash64_expr(_tokens(F.col(text_col)),
                                    token_hash=token_hash))

    if n_blocks is None:
        n_blocks = hamming_threshold + 1
    width = max(64 // n_blocks, 1)
    block_key = [
        F.struct(F.lit(bi).alias("b"),
                 F.shiftrightunsigned(F.col("__simhash"), bi * width)
                 .bitwiseAND(F.lit((1 << width) - 1)).alias("v"))
        for bi in range(n_blocks)]
    banded = sh.select(F.col(id_col).alias("__id"), "__simhash",
                       F.explode(F.array(*block_key)).alias("__blk"))
    banded = banded.persist()  # self-join diamond: simhash UDF runs once
    lhs = banded.select(F.col("__id").alias("id_a"), F.col("__simhash").alias("h_a"), "__blk")
    rhs = banded.select(F.col("__id").alias("id_b"), F.col("__simhash").alias("h_b"), "__blk")
    # no pair-level distinct: hamming verify is map-side on two longs,
    # and the representative groupBy().min() absorbs duplicate pairs
    pairs = (lhs.join(rhs, on="__blk")
             .filter(F.col("id_a") < F.col("id_b")))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    similar = pairs.filter(hamming <= hamming_threshold).select("id_a", "id_b")

    # same single-explode expansion as minhash (r14): the union shape
    # ran the block self-join + hamming verify once per direction
    rep = (_undirected(similar)
           .groupBy("__id").agg(F.min("__n").alias("__rep")))
    return (df.join(rep, on=df[id_col] == rep["__id"], how="left")
            .filter(F.col("__rep").isNull() | (F.col("__rep") >= F.col(id_col)))
            .select(*df.columns))


def simhash64_expr(tokens: Column, token_hash=None) -> Column:
    """64-bit Charikar SimHash of a token array as a single Catalyst
    expression: per token t, hash h = token_hash(t) (default xxhash64)
    votes +1/-1 on each bit position; the fingerprint sets bit i when
    the vote sum is positive.  One fold over the tokens with an
    array<int> accumulator; bit extraction uses ShiftRight with a
    column shift amount via call_function (exact for 64-bit longs,
    unlike float pow tricks).  Pass ``token_hash=md5_hash60`` for a
    fingerprint re-computable outside Spark (oracle entries)."""
    if token_hash is None:
        token_hash = F.xxhash64
    idx = F.sequence(F.lit(0), F.lit(63))

    def vote(acc, t):
        h = token_hash(t)
        return F.zip_with(
            acc, idx,
            lambda a, i: a + (F.call_function("shiftright", h, i)
                              .bitwiseAND(F.lit(1)) * 2 - 1).cast("int"))

    def pack(acc):
        return F.aggregate(
            F.zip_with(acc, idx,
                       lambda a, i: F.when(
                           a > 0, F.call_function("shiftleft",
                                                  F.lit(1).cast("long"), i))
                       .otherwise(F.lit(0).cast("long"))),
            F.lit(0).cast("long"), lambda s, x: s.bitwiseOR(x))

    fp = F.aggregate(tokens, F.array_repeat(F.lit(0).cast("int"), 64),
                     vote, pack)
    return F.coalesce(fp, F.lit(0).cast("long"))


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", ngram: int = 3,
                        threshold: float = 0.5,
                        bands: int = 8, num_hashes: int = 32) -> DataFrame:
    """Character-n-gram Jaccard similar pairs (id_a, id_b, jaccard).

    Blocking via MinHash bands over char n-grams (not all-pairs), then
    exact Jaccard verification on the distinct n-gram sets.
    """
    # Linear char-gram construction entirely within each document row:
    # normalize once behind a Generate barrier (one row per doc — the
    # barrier stops CollapseProject from inlining the normalizer regexp
    # into every gram), then hash each offset's substring with a
    # transform.  The previous shape exploded one row PER GRAM and
    # re-assembled with groupBy/collect_set — a full shuffle of every
    # gram occurrence (~8 bytes × corpus characters); this shape needs
    # no shuffle at all before banding.
    normed = _ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.explode(F.array(_normalized(F.col(text_col)))).alias("__norm"))
    base = normed.select(
        "__id",
        F.array_distinct(F.transform(
            F.sequence(F.lit(1),
                       F.greatest(F.length("__norm") - (ngram - 1), F.lit(1))),
            lambda i: F.xxhash64(
                F.call_function("substring", F.col("__norm"), i,
                                F.lit(int(ngram)))))).alias("__grams"))
    rows_per_band = num_hashes // bands
    base = base.withColumn("__sig", _signature_expr("__grams", num_hashes, 7))
    band_keys = F.array(*[
        F.xxhash64(F.lit(bi), F.concat_ws(",", F.transform(
            F.slice("__sig", bi * rows_per_band + 1, rows_per_band),
            lambda c: c.cast("string"))))
        for bi in range(bands)])
    base = base.persist()  # feeds band lhs/rhs + verify lhs/rhs
    # Narrow band join (id, band only) → dedupe 16-byte pair rows →
    # join gram arrays back by id for verification.  Keeps the skewed
    # bucket self-join from materializing |bucket|² gram-array copies.
    banded = base.select("__id", F.explode(band_keys).alias("__band"))
    pairs = (banded.alias("l").join(banded.alias("r"), on="__band")
             .select(F.col("l.__id").alias("id_a"),
                     F.col("r.__id").alias("id_b"))
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    grams = base.select("__id", "__grams")
    pairs = (pairs
             .join(grams.select(F.col("__id").alias("id_a"),
                                F.col("__grams").alias("g_a")), "id_a")
             .join(grams.select(F.col("__id").alias("id_b"),
                                F.col("__grams").alias("g_b")), "id_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size("g_a") + F.size("g_b") - inter
    return (pairs.withColumn("jaccard",
                             F.when(union > 0, inter / union).otherwise(F.lit(1.0)))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", sep: str = "\n\n",
                    out_col: str = "text_deduped") -> DataFrame:
    """Paragraph-level exact dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", at paragraph
    granularity — the RefinedWeb/Falcon recipe): each distinct
    paragraph survives ONLY at its first corpus occurrence (lowest
    (doc, position)); repeats vanish from every other document, and
    documents reassemble in original paragraph order (possibly empty).

    Shape: posexplode → groupBy(paragraph hash) min (map-side partial
    agg collapses repeats before the shuffle) → equi-join winners back
    → groupBy(doc) reassemble.  Two hash-keyed shuffles, both linear
    in the paragraph count; hot paragraphs (boilerplate) collapse
    map-side so they cannot skew the exchange."""
    esc = re.escape(sep)
    paras = (df.select(F.col(id_col).alias("__d"),
                       F.posexplode(F.split(F.col(text_col), esc))
                       .alias("__p", "__para"))
             .filter(F.length(F.trim("__para")) > 0))
    # first occurrence = min (doc, pos) under STRUCT ordering — works for
    # string ids too (an arithmetic key like id*1e6+pos silently casts a
    # string id to NULL and collapses every document to "")
    key = F.struct(F.col("__d"), F.col("__p"))
    winners = (paras.groupBy(F.xxhash64("__para").alias("__h"))
               .agg(F.min(key).alias("__k")))
    kept = (paras.join(winners,
                       (F.xxhash64(F.col("__para")) == F.col("__h"))
                       & (key == F.col("__k")), "left_semi"))
    rebuilt = (kept.groupBy("__d")
               .agg(F.concat_ws(sep, F.transform(
                   F.array_sort(F.collect_list(
                       F.struct(F.col("__p"), F.col("__para")))),
                   lambda s: s["__para"])).alias(out_col)))
    return (df.join(rebuilt, df[id_col] == rebuilt["__d"], "left")
            .drop("__d")
            .withColumn(out_col, F.coalesce(F.col(out_col), F.lit(""))))
