"""Large-scale training-data pipeline operators.

Beyond the reference's own operator inventory: deduplication (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
search over embedding columns, text analysis (language id, quality
scoring, token counting, fingerprinting) and multimodal binary-column
plumbing.  All designed shuffle-light for the 100 TB case: banding/LSH
turns all-pairs comparison into equi-joins on bucket keys; candidate
verification happens only within buckets.
"""

from clickhouse_core_spark.pipeline.dedup import (
    exact_dedup,
    paragraph_dedup,
    md5_hash60,
    minhash_signatures,
    minhash_lsh_dedup,
    simhash_dedup,
    ngram_jaccard_pairs,
)
from clickhouse_core_spark.pipeline.graphs import (
    connected_components,
    dedup_clusters,
)
from clickhouse_core_spark.pipeline.sampling import (
    deterministic_sample,
    stratified_sample,
    pack_token_budget,
    mixture_sample,
)
from clickhouse_core_spark.pipeline.similarity import (
    cosine_topk,
    embedding_near_duplicates,
    ivf_topk,
    build_ivf_index,
    ivf_index_search,
    lsh_ann_topk,
    semantic_dedup,
)
from clickhouse_core_spark.pipeline.text import (
    with_token_count,
    with_quality_score,
    with_language_id,
    with_fingerprint,
    with_pii_redacted,
    with_gopher_signals,
    train_ngram_lm,
    score_ngram_lm,
    benchmark_contamination,
    chunk_documents,
)

__all__ = [
    "exact_dedup", "paragraph_dedup", "md5_hash60", "minhash_signatures",
    "minhash_lsh_dedup",
    "simhash_dedup", "ngram_jaccard_pairs",
    "connected_components", "dedup_clusters",
    "deterministic_sample", "stratified_sample", "pack_token_budget",
    "mixture_sample",
    "cosine_topk", "embedding_near_duplicates", "ivf_topk",
    "build_ivf_index", "ivf_index_search", "lsh_ann_topk",
    "semantic_dedup",
    "with_token_count", "with_quality_score", "with_language_id",
    "with_fingerprint", "with_pii_redacted", "with_gopher_signals",
    "train_ngram_lm", "score_ngram_lm",
    "benchmark_contamination", "chunk_documents",
]
