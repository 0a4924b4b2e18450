"""Corpus sampling and shard packing for training-data pipelines.

Beyond the reference's operator set (like the dedup/ANN family): the
two data motions every pretraining pipeline needs between cleaning and
tokenization —

- **Deterministic (stratified) sampling**: keep a per-stratum fraction
  of documents, reproducibly.  ``rand()`` resamples differently per
  retry/run; hashing the document id is stable across runs, engines
  and cluster layouts, and is exactly reproducible in any SQL engine
  (portable md5 arithmetic — the same contract as
  :func:`pipeline.dedup.md5_hash60`).
- **Token-budget packing**: assign documents to training shards so
  each shard carries ≈ ``budget`` tokens.  A global running total
  would serialize on one sort; instead documents hash into
  ``n_buckets`` independent streams and the running total runs per
  bucket — shard ids are (bucket, seq) pairs, the cumsum window sorts
  only within buckets (parallelism = n_buckets, each a bounded
  partition), and every shard still lands within one document of the
  budget.  At 100 TB: one hash-partition shuffle + per-bucket window,
  no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _unit_hash(id_col: Column, seed: int) -> Column:
    """Uniform [0, 1) from the first 15 hex digits of md5 — portable
    (DuckDB: ('0x' || substr(md5(x), 1, 15))::BIGINT / 2^60)."""
    h = F.conv(F.substring(F.md5(F.concat(id_col.cast("string"),
                                          F.lit(f"#{seed}"))), 1, 15),
               16, 10).cast("decimal(20,0)").cast("double")
    return h / F.lit(float(1 << 60))


def deterministic_sample(df: DataFrame, fraction: float,
                         id_col: str = "doc_id",
                         seed: int = 42) -> DataFrame:
    """Keep ``fraction`` of rows, chosen by id hash — stable across
    runs/engines/partitionings (unlike df.sample)."""
    return df.filter(_unit_hash(F.col(id_col), seed) < F.lit(fraction))


def stratified_sample(df: DataFrame, fractions: dict,
                      strata_col: str, id_col: str = "doc_id",
                      default_fraction: float = 0.0,
                      seed: int = 42) -> DataFrame:
    """Per-stratum deterministic sampling: ``fractions`` maps stratum
    value -> keep fraction (e.g. language quotas).  One scan, no
    shuffle — the fraction lookup is a CASE chain, the keep decision a
    hash compare."""
    frac = F.lit(float(default_fraction))
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))) \
                .otherwise(frac)
    return df.filter(_unit_hash(F.col(id_col), seed) < frac)


def pack_token_budget(df: DataFrame, budget: int,
                      token_col: str = "n_tokens",
                      id_col: str = "doc_id",
                      n_buckets: int = 64,
                      bucket: Column | None = None) -> DataFrame:
    """Assign a ``shard`` label so each shard holds ≈ ``budget`` tokens.

    Documents hash into ``n_buckets`` independent streams; within each
    stream a running token total (window cumsum ordered by id) cuts a
    new shard every ``budget`` tokens.  Oversized single documents get
    their own shard.  Output adds ``shard`` =
    '<bucket>-<seq>' (string, stable)."""
    if bucket is None:
        bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets))
    w = Window.partitionBy("__bucket").orderBy(id_col)
    out = (df.withColumn("__bucket", bucket)
           .withColumn("__cum", F.sum(F.col(token_col)).over(w))
           .withColumn("__seq", F.floor((F.col("__cum") - 1)
                                        / F.lit(int(budget))).cast("long"))
           .withColumn("shard", F.concat_ws(
               "-", F.col("__bucket").cast("string"),
               F.greatest(F.col("__seq"), F.lit(0)).cast("string")))
           .drop("__cum", "__seq", "__bucket"))
    return out


def mixture_sample(df: DataFrame, domain_col: str, weights: dict,
                   total_tokens: int, token_col: str = "n_tokens",
                   id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Domain-mixture sampling for training-data composition (the
    DoReMi / Pile recipe class — public: Xie et al. 2023
    arXiv:2305.10429, Gao et al. 2020 arXiv:2101.00027): each domain
    gets a token budget ``weights[domain] * total_tokens``; within a
    domain, documents are ranked by the deterministic id hash (a
    reproducible shuffle) and kept until the running token total
    reaches the budget.  The first document crossing the budget line
    is kept (budgets are met-or-slightly-exceeded, never starved —
    the usual mixing contract).

    Domains absent from ``weights`` are dropped.  Deterministic across
    runs, engines and partitionings (hash order, not randomness); one
    window per domain partition — shuffle keyed by domain, linear.
    """
    entries = [kv for w in [weights] for kv in w.items()]
    wmap = F.create_map(*[F.lit(v) for kv in entries
                          for v in (kv[0], float(kv[1]))])
    budget = wmap[F.col(domain_col)] * F.lit(float(total_tokens))
    order = _unit_hash(F.col(id_col), seed)
    w = Window.partitionBy(domain_col).orderBy(order.asc(),
                                               F.col(id_col).asc())
    cum = F.sum(F.col(token_col)).over(w)
    prev = cum - F.col(token_col)
    return (df.filter(budget.isNotNull())
            .withColumn("__prev", prev)
            .filter(F.col("__prev") < budget)
            .drop("__prev"))
