"""Text-analysis operators for training-data pipelines.

Analogs of the reference's text-classification functions
(reference src/Functions/FunctionsLanguageClassification.cpp,
FunctionsCharsetClassification.cpp) plus quality/token statistics —
all deterministic built-in-expression implementations (no model files,
no Python in the hot path) so they hold up at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists per language for the n-gram/stopword
# heuristic language id.  Intentionally small: the contract is a
# deterministic heuristic, not model-grade accuracy.
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "des", "est", "et", "dans", "que", "pour", "une"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]+", " ")), r"\s+")


def with_token_count(df: DataFrame, text_col: str = "text",
                     out_col: str = "token_count") -> DataFrame:
    """Whitespace/punctuation token count (the BPE-ish proxy: splits on
    non-letter/digit runs, so contractions and hyphenations count per
    piece)."""
    toks = _tokens(F.col(text_col))
    cnt = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(F.size(toks))
    return df.withColumn(out_col, cnt.cast("long"))


def with_quality_score(df: DataFrame, text_col: str = "text",
                       out_col: str = "quality") -> DataFrame:
    """Deterministic document quality heuristics, each in [0,1]:

    - length_score: saturating chars/500
    - alpha_ratio: letters / chars
    - stopword_score: saturating english-stopword hits / tokens * 5
    - word_len_score: 1 when mean word length in [3, 10]

    quality = mean of the four.  All built-in expressions.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    toks = _tokens(text)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    letters = F.length(F.regexp_replace(text, r"[^\p{L}]", ""))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    mean_wl = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_toks

    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n_chars > 0, letters / n_chars).otherwise(F.lit(0.0))
    stopword_score = F.least(stop_hits * F.lit(5.0) / n_toks, F.lit(1.0))
    word_len_score = F.when((mean_wl >= 3) & (mean_wl <= 10), F.lit(1.0)).otherwise(F.lit(0.0))
    q = (length_score + alpha_ratio + stopword_score + word_len_score) / F.lit(4.0)
    return df.withColumn(out_col, q)


def with_language_id(df: DataFrame, text_col: str = "text",
                     out_col: str = "lang_pred") -> DataFrame:
    """Stopword-vote language id over the deterministic lists above;
    'und' (undetermined) when no list scores a hit.

    Implemented as a max-over-structs so the whole vote stays one
    expression tree: array of (hits, -priority, lang) structs →
    array_max → lang field."""
    toks = _tokens(F.col(text_col))

    def contains_in(arr):
        # one-arg factory: a defaulted second lambda param would be
        # interpreted by pyspark as the element-index argument.
        return lambda t: F.array_contains(arr, t)

    entries = []
    for prio, (lang, words) in enumerate(sorted(_STOPWORDS.items())):
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, contains_in(arr)))
        entries.append(F.struct(hits.alias("hits"),
                                F.lit(-prio).alias("prio"),
                                F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*entries))
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    return df.withColumn(out_col, pred)


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    """60-bit content fingerprint of the normalized text (whitespace
    collapsed, lowercased, punctuation stripped) — the exact-dedup key,
    exposed as a column for incremental pipelines.

    Derived from md5 (first 15 hex digits as a BIGINT) rather than an
    engine-private hash so the same document fingerprints identically
    on any engine — the cross-system handoff a training pipeline needs
    (and what makes the operator oracle-checkable)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^\p{L}\p{N}]+", " "))
    return df.withColumn(
        out_col, F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long"))
