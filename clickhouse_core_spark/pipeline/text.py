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


# PII patterns: RE2-compatible subset (no lookaround) so the same
# pattern strings run identically on Java regex (Spark) and RE2
# (DuckDB/ripgrep-class engines) — cross-engine portability is part of
# the redaction contract.
PII_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+\d{1,3}[-. ]\d{2,4}[-. ]\d{3,4}[-. ]\d{3,4}\b", "<PHONE>"),
}


def with_pii_redacted(df: DataFrame, text_col: str = "text",
                      out_col: str = "text_redacted",
                      kinds=("email", "ip", "phone")) -> DataFrame:
    """Redact PII spans (emails, IPv4s, international-format phones)
    with typed placeholder tokens — the standard pre-training scrub
    pass.  A chain of regexp_replace expressions: JVM-side, streaming
    through codegen, no Python.  Order matters (emails before phones so
    digit runs inside addresses aren't half-redacted)."""
    out = F.col(text_col)
    for kind in kinds:
        pat, repl = PII_PATTERNS[kind]
        out = F.regexp_replace(out, pat, repl)
    return df.withColumn(out_col, out)


def with_gopher_signals(df: DataFrame, text_col: str = "text",
                        prefix: str = "gq_") -> DataFrame:
    """Gopher-style document quality signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1 repetition/quality filters),
    computed as pure built-in expressions:

    - ``{prefix}n_words``          tokens
    - ``{prefix}mean_word_len``    mean token length
    - ``{prefix}alpha_word_frac``  fraction of tokens containing a letter
    - ``{prefix}symbol_ratio``     (# of '#' or '...' occurrences) / tokens
    - ``{prefix}dup_line_frac``    1 - distinct lines / lines
    - ``{prefix}bullet_line_frac`` fraction of lines starting with a bullet

    Filters (e.g. keep 3 <= mean_word_len <= 10, dup_line_frac < 0.3)
    stay user-side predicates over these columns.
    """
    # regexp strip: F.trim removes only spaces, not newlines/tabs
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    words = F.split(stripped, r"\s+")
    n_words = F.when(F.length(stripped) == 0, F.lit(0)) \
        .otherwise(F.size(words)).cast("long")
    mean_len = F.when(n_words > 0,
                      F.aggregate(words, F.lit(0.0),
                                  lambda acc, w: acc + F.length(w))
                      / n_words).otherwise(F.lit(0.0))
    alpha_frac = F.when(n_words > 0,
                        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
                        .cast("double") / n_words).otherwise(F.lit(0.0))
    n_hash = F.size(F.split(F.col(text_col), "#", -1)) - 1
    n_ellipsis = F.size(F.split(F.col(text_col), r"\.\.\.", -1)) - 1
    symbol_ratio = F.when(n_words > 0,
                          (n_hash + n_ellipsis).cast("double") / n_words) \
        .otherwise(F.lit(0.0))
    lines = F.split(F.col(text_col), "\n", -1)
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines) \
        .otherwise(F.lit(0.0))
    bullet_frac = F.when(
        n_lines > 0,
        F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"^[-*•]")))
        .cast("double") / n_lines).otherwise(F.lit(0.0))
    return (df.withColumn(f"{prefix}n_words", n_words)
            .withColumn(f"{prefix}mean_word_len", mean_len)
            .withColumn(f"{prefix}alpha_word_frac", alpha_frac)
            .withColumn(f"{prefix}symbol_ratio", symbol_ratio)
            .withColumn(f"{prefix}dup_line_frac", dup_line_frac)
            .withColumn(f"{prefix}bullet_line_frac", bullet_frac))


_QUALITY_FEATURES = ("gq_mean_word_len", "gq_alpha_word_frac",
                     "gq_symbol_ratio", "gq_dup_line_frac",
                     "gq_bullet_line_frac")


def train_quality_classifier(labeled: DataFrame, text_col: str = "text",
                             label_col: str = "label",
                             learning_rate: float = 0.5,
                             iterations: int = 10):
    """End-to-end quality-classifier training for a data pipeline:
    Gopher signal extraction (with_gopher_signals) feeding the
    deterministic full-batch logistic GD
    (operators.stats.gradient_logistic_regression — the order-free
    refinement of the reference's stochasticLogisticRegression).
    Returns the trained one-row DataFrame of raw-space (weights, bias).

    Scale shape: signal extraction is per-row expressions;
    each GD iteration is one map-side-combinable aggregation; driver
    state is len(features)+1 floats.
    """
    from pyspark.sql import functions as _F

    from clickhouse_core_spark.operators.stats import (
        gradient_logistic_regression)
    feats = with_gopher_signals(labeled, text_col)
    cols = list(_QUALITY_FEATURES)
    model = gradient_logistic_regression(
        feats, cols, label_col,
        learning_rate=learning_rate, iterations=iterations).first()
    # de-standardize (the GD trains in standardized feature space):
    # w_raw_i = w_i / s_i ; bias_raw = bias - sum(w_i * m_i / s_i)
    stats = feats.agg(
        *[_F.avg(c).alias(f"m{i}") for i, c in enumerate(cols)],
        *[_F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(cols)]).first()
    n = len(cols)
    w_raw, shift = [], 0.0
    for i in range(n):
        s = float(stats[f"s{i}"]) or 1.0
        w_raw.append(float(model[f"w{i}"]) / s)
        shift += float(model[f"w{i}"]) * float(stats[f"m{i}"]) / s
    bias_raw = float(model["bias"]) - shift
    row = tuple(float(model[f"w{i}"]) for i in range(n)) \
        + (float(model["bias"]),) + tuple(w_raw) + (bias_raw,)
    schema = (", ".join(f"w{i} double" for i in range(n)) + ", bias double, "
              + ", ".join(f"w{i}_raw double" for i in range(n))
              + ", bias_raw double")
    return labeled.sparkSession.createDataFrame([row], schema)


def score_quality_classifier(df: DataFrame, weights, bias: float | None = None,
                             text_col: str = "text",
                             out_col: str = "quality_prob") -> DataFrame:
    """Score documents with a trained quality classifier: the same
    Gopher signal expressions + evalMLMethod's logistic dot product —
    the whole scoring path is one Catalyst projection, no Python per
    row and no shuffle (the 100 TB-right shape for corpus filtering).
    ``weights`` is the feature-ordered coefficient list (or the row
    returned by train_quality_classifier)."""
    from clickhouse_core_spark.operators.stats import eval_ml_method
    if hasattr(weights, "asDict"):      # trained row passthrough
        row = weights.asDict()
        bias = float(row.get("bias_raw", row.get("bias")))
        weights = [float(row[f"w{i}_raw"] if f"w{i}_raw" in row
                         else row[f"w{i}"])
                   for i in range(len(_QUALITY_FEATURES))]
    feats = with_gopher_signals(df, text_col)
    score = eval_ml_method(list(weights), float(bias),
                           list(_QUALITY_FEATURES), kind="logistic")
    keep = df.columns
    return feats.withColumn(out_col, score).select(*keep, out_col)


def benchmark_contamination(df: DataFrame, bench: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            bench_text_col: str = "text",
                            shingle_k: int = 4,
                            out_col: str = "contamination") -> DataFrame:
    """Benchmark-contamination score: fraction of each document's
    distinct word ``shingle_k``-shingles that appear anywhere in the
    benchmark corpus (the n-gram-overlap decontamination check run
    before training; GPT-3 appendix C / PaLM §7 style).

    Scale shape: documents shingle to 64-bit hashes (one pass, built-in
    expressions — pipeline.dedup's shingle table); the benchmark's
    distinct shingle set is collected as a DataFrame and BROADCAST to
    the probe side (benchmarks are ~10^5-10^7 shingles — dimension-table
    sized next to a 100 TB corpus), so the probe is a map-side semi
    join: no shuffle of the corpus.
    """
    from .dedup import _shingle_hash_table

    doc_sh = _shingle_hash_table(df, text_col, id_col, shingle_k)
    bench_set = (_shingle_hash_table(
        bench.select(F.col(bench_text_col).alias("__bt"),
                     F.monotonically_increasing_id().alias("__bid")),
        "__bt", "__bid", shingle_k)
        .select(F.explode("__shingles").alias("__h")).distinct())
    probe = doc_sh.select("__id", F.size("__shingles").alias("__n"),
                          F.explode("__shingles").alias("__h"))
    hits = (probe.join(F.broadcast(bench_set), on="__h", how="left_semi")
            .groupBy("__id", "__n").agg(F.count("*").alias("__hits")))
    # r14: docs with zero hits are restored by the LEFT join to df +
    # fillna below — the former extra join against a re-derived
    # doc_sh.select("__id") ran the whole shingle table a SECOND time
    # (0/n is 0 regardless of n) for nothing.  One shingle pass, one
    # fewer join.
    frac = hits.select(
        "__id",
        (F.col("__hits") / F.coalesce(F.col("__n"), F.lit(1)))
        .alias(out_col))
    return df.join(frac, on=df[id_col] == frac["__id"], how="left") \
        .drop("__id").fillna({out_col: 0.0})


def chunk_documents(df: DataFrame, max_tokens: int, overlap: int = 0,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split each document into whitespace-token windows of
    ``max_tokens`` with ``overlap`` tokens of left-context carry-over —
    the standard context-window chunking step of an LLM training
    pipeline (documents longer than the model context are windowed, not
    truncated).

    Pure Catalyst: split → sequence of window starts → per-start
    slice + rejoin → posexplode.  One Generate per document, no Python,
    no shuffle (map-side; chunk_id is deterministic so downstream
    dedup/shuffles key cleanly).

    Output: original columns (minus ``text_col``) + ``chunk_id`` (long,
    0-based), ``chunk_text``, ``chunk_tokens`` (long).
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    step = max_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # window starts: 0, step, 2*step, ... while start < n (>=1 window)
    n_windows = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(step)),
        F.lit(1)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(toks, i * step + 1, max_tokens))
            .alias("t"),
            F.least(n - i * step, F.lit(max_tokens)).cast("long")
            .alias("k")))
    other = [c for c in df.columns if c != text_col]
    return (df.withColumn("__chunks", chunks)
            .select(*other, F.posexplode("__chunks").alias("chunk_id", "__c"))
            .select(*other, F.col("chunk_id").cast("long"),
                    F.col("__c.t").alias("chunk_text"),
                    F.col("__c.k").alias("chunk_tokens")))


def train_ngram_lm(docs: DataFrame, text_col: str = "text",
                   order: int = 1, alpha: float = 1.0,
                   tokens: DataFrame | None = None):
    """CCNet-style corpus language model: add-alpha-smoothed n-gram
    counts trained with plain aggregations (Wenzek et al., "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"
    — the quality signal there is a KenLM perplexity; this is the same
    statistic from an in-corpus n-gram model, no external model file).

    Returns (counts DataFrame, totals dict).  order=1: counts are
    (tok, c).  order=2: additionally (prev, tok, c2) bigram rows in a
    second DataFrame.  All shuffles key on tokens — the vocabulary —
    so state is vocab-sized, not corpus-sized; at 100 TB the counts
    table shards fine and the scoring join is a plain equi-join
    (broadcast when the vocab is small)."""
    if order not in (1, 2):
        raise ValueError("order must be 1 or 2")
    # ``tokens``: an optional prebuilt (…, tok) table — pass a persisted
    # one to share the tokenize pass with score_ngram_lm (one corpus
    # scan instead of three)
    toks = tokens if tokens is not None else (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
        .filter(F.col("tok") != ""))
    uni = toks.groupBy("tok").agg(F.count("*").alias("c"))
    agg = uni.agg(F.sum("c").alias("n"), F.count("*").alias("v")).first()
    totals = {"n": int(agg["n"] or 0), "v": int(agg["v"] or 0),
              "alpha": float(alpha)}
    if order == 1:
        return uni, totals
    pairs = (docs.select(_tokens(F.col(text_col)).alias("ts"))
             .select(F.explode(F.expr(
                 "transform(sequence(1, size(ts) - 1), "
                 "i -> struct(ts[i-1] as prev, ts[i] as tok))")).alias("p"))
             .select("p.prev", "p.tok")
             .filter((F.col("prev") != "") & (F.col("tok") != "")))
    bi = pairs.groupBy("prev", "tok").agg(F.count("*").alias("c2"))
    return (uni, bi), totals


def score_ngram_lm(docs: DataFrame, model, totals: dict,
                   text_col: str = "text", id_col: str = "doc_id",
                   out_col: str = "nll",
                   tokens: DataFrame | None = None) -> DataFrame:
    """Per-document mean negative log-likelihood under the trained
    model (lower = more fluent under the corpus distribution — the
    CCNet head/middle/tail quality split statistic).  Unigram:
    -ln((c+a)/(n+a*v)) averaged over tokens; bigram model conditions
    on the previous token with add-alpha backoff to the unigram
    denominator.  One explode + one equi-join + one groupBy — all
    JVM-side."""
    a = float(totals["alpha"])
    n, v = totals["n"], totals["v"]
    if isinstance(model, tuple):
        uni, bi = model
        pairs = (docs.select(id_col, _tokens(F.col(text_col)).alias("ts"))
                 .select(id_col, F.explode(F.expr(
                     "transform(sequence(1, size(ts) - 1), "
                     "i -> struct(ts[i-1] as prev, ts[i] as tok))"))
                     .alias("p"))
                 .select(id_col, "p.prev", "p.tok")
                 .filter((F.col("prev") != "") & (F.col("tok") != "")))
        joined = (pairs
                  .join(bi, ["prev", "tok"], "left")
                  .join(uni.withColumnRenamed("tok", "prev")
                        .withColumnRenamed("c", "cprev"), ["prev"], "left"))
        p = ((F.coalesce(F.col("c2"), F.lit(0)) + a)
             / (F.coalesce(F.col("cprev"), F.lit(0)) + a * v))
    else:
        uni = model
        toksd = tokens if tokens is not None else (
            docs.select(id_col, F.explode(_tokens(F.col(text_col)))
                        .alias("tok"))
            .filter(F.col("tok") != ""))
        joined = toksd.join(uni, ["tok"], "left")
        p = (F.coalesce(F.col("c"), F.lit(0)) + a) / (n + a * v)
    return (joined.groupBy(id_col)
            .agg(F.avg(-F.log(p)).alias(out_col)))
