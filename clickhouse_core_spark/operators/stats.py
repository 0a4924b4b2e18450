"""Statistical aggregate functions.

Reference:
- simpleLinearRegression (reference
  src/AggregateFunctions/AggregateFunctionSimpleLinearRegression.cpp)
- studentTTest / welchTTest (reference
  src/AggregateFunctions/AggregateFunctionTTest.h)
- mannWhitneyUTest (reference
  src/AggregateFunctions/AggregateFunctionMannWhitney.cpp)
- largestTriangleThreeBuckets downsampling (reference
  src/AggregateFunctions/AggregateFunctionLargestTriangleThreeBuckets.cpp)
- sessionization: the reference models sessions via window funnel /
  LIMIT BY patterns; gap-based session ids are the standard OLAP form.

All are moment/rank compositions of built-in aggregates — fully
partial-aggregatable groupBy work (the t-tests reduce to per-group
count/mean/variance; Mann-Whitney to a rank sum), so they scale exactly
like any other hash aggregation.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def simple_linear_regression(df: DataFrame, keys: Sequence[str],
                             x_col: str, y_col: str) -> DataFrame:
    """simpleLinearRegression(x, y) -> (k, b) least-squares fit per key.

    slope = cov(x,y)/var(x), intercept = mean(y) - slope*mean(x) —
    single groupBy over four moments.
    """
    keys = list(keys)
    out = (df.groupBy(*keys)
           .agg(F.covar_pop(x_col, y_col).alias("__cov"),
                F.var_pop(x_col).alias("__var"),
                F.avg(x_col).alias("__mx"), F.avg(y_col).alias("__my")))
    return (out.withColumn("k", F.col("__cov") / F.col("__var"))
            .withColumn("b", F.col("__my") - F.col("k") * F.col("__mx"))
            .drop("__cov", "__var", "__mx", "__my"))


def welch_t_test(df: DataFrame, keys: Sequence[str], value_col: str,
                 group_col: str | Column) -> DataFrame:
    """welchTTest(value, sample_index): t statistic (and degrees of
    freedom) for the two samples selected by boolean/0-1 ``group_col``.

    t = (m0 - m1) / sqrt(s0²/n0 + s1²/n1);
    df = (s0²/n0 + s1²/n1)² / ((s0²/n0)²/(n0-1) + (s1²/n1)²/(n1-1)).
    One groupBy with conditional aggregates — no second pass.
    """
    keys = list(keys)
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    v = F.col(value_col)
    v0 = F.when(g == 0, v)
    v1 = F.when(g == 1, v)
    out = (df.groupBy(*keys)
           .agg(F.count(v0).alias("__n0"), F.count(v1).alias("__n1"),
                F.avg(v0).alias("__m0"), F.avg(v1).alias("__m1"),
                F.var_samp(v0).alias("__s0"), F.var_samp(v1).alias("__s1")))
    se0 = F.col("__s0") / F.col("__n0")
    se1 = F.col("__s1") / F.col("__n1")
    t = (F.col("__m0") - F.col("__m1")) / F.sqrt(se0 + se1)
    dof = ((se0 + se1) ** 2
           / (se0 ** 2 / (F.col("__n0") - 1) + se1 ** 2 / (F.col("__n1") - 1)))
    return (out.withColumn("t_stat", t).withColumn("dof", dof)
            .drop("__n0", "__n1", "__m0", "__m1", "__s0", "__s1"))


def student_t_test(df: DataFrame, keys: Sequence[str], value_col: str,
                   group_col: str | Column) -> DataFrame:
    """studentTTest(value, sample_index) (reference
    src/AggregateFunctions/AggregateFunctionTTest.h StudentTTestData):
    equal-variance two-sample t — pooled variance
    sp² = ((n0-1)s0² + (n1-1)s1²) / (n0+n1-2),
    t = (m0-m1)/sqrt(sp²(1/n0 + 1/n1)), dof = n0+n1-2.
    Same one-pass conditional-aggregate shape as welch_t_test."""
    keys = list(keys)
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    v = F.col(value_col)
    v0 = F.when(g == 0, v)
    v1 = F.when(g == 1, v)
    out = (df.groupBy(*keys)
           .agg(F.count(v0).alias("__n0"), F.count(v1).alias("__n1"),
                F.avg(v0).alias("__m0"), F.avg(v1).alias("__m1"),
                F.var_samp(v0).alias("__s0"), F.var_samp(v1).alias("__s1")))
    n0, n1 = F.col("__n0"), F.col("__n1")
    sp2 = ((n0 - 1) * F.col("__s0") + (n1 - 1) * F.col("__s1")) \
        / (n0 + n1 - 2)
    t = (F.col("__m0") - F.col("__m1")) \
        / F.sqrt(sp2 * (1.0 / n0 + 1.0 / n1))
    return (out.withColumn("t_stat", t)
            .withColumn("dof", (n0 + n1 - 2).cast("double"))
            .drop("__n0", "__n1", "__m0", "__m1", "__s0", "__s1"))


def avg_weighted(df: DataFrame, keys: Sequence[str], value_col: str,
                 weight_col: str, alias: str = "avg_weighted") -> DataFrame:
    """avgWeighted(x, w) = sum(x*w)/sum(w) (reference
    src/AggregateFunctions/AggregateFunctionAvgWeighted.cpp); NULL when
    the weight sum is zero, matching the reference's NaN contract class
    (carrier divergence documented: Spark emits NULL where CH emits
    NaN)."""
    num = F.sum(F.col(value_col) * F.col(weight_col))
    den = F.sum(F.col(weight_col))
    return (df.groupBy(*list(keys))
            .agg(F.when(den != 0, num / den).alias(alias)))


def mann_whitney_u(df: DataFrame, keys: Sequence[str], value_col: str,
                   group_col: str | Column) -> DataFrame:
    """mannWhitneyUTest(value, sample_index): U statistic for sample 0
    vs sample 1 per key, with average ranks for ties (the reference's
    continuity-corrected z is derivable from U; we emit U and both n's).

    rank via a window over (key, value) — one shuffle on keys; rank sums
    are then a plain groupBy.
    """
    keys = list(keys)
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    # average rank for ties: avg of row_number over equal values =
    # (rank + (count_in_tie - 1)/2)
    w_all = Window.partitionBy(*keys).orderBy(value_col)
    w_tie = Window.partitionBy(*keys, value_col)
    ranked = df.withColumn(
        "__r", F.rank().over(w_all) + (F.count("*").over(w_tie) - 1) / 2.0)
    out = (ranked.groupBy(*keys)
           .agg(F.sum(F.when(g == 0, F.col("__r"))).alias("__r0"),
                F.count(F.when(g == 0, F.lit(1))).alias("n0"),
                F.count(F.when(g == 1, F.lit(1))).alias("n1")))
    u = F.col("__r0") - F.col("n0") * (F.col("n0") + 1) / 2.0
    return out.withColumn("u_stat", u).drop("__r0")


def mean_z_test(df: DataFrame, keys: Sequence[str], value_col: str,
                group_col: str | Column,
                pop_var0: float, pop_var1: float) -> DataFrame:
    """meanZTest(pop_var_x, pop_var_y)(value, sample_index): z statistic
    for the mean difference of the two samples given known population
    variances (reference src/AggregateFunctions/AggregateFunctionMeanZTest.h).

    z = (m0 - m1) / sqrt(v0/n0 + v1/n1) — one conditional groupBy.
    """
    keys = list(keys)
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    v = F.col(value_col)
    out = (df.groupBy(*keys)
           .agg(F.count(F.when(g == 0, v)).alias("__n0"),
                F.count(F.when(g == 1, v)).alias("__n1"),
                F.avg(F.when(g == 0, v)).alias("__m0"),
                F.avg(F.when(g == 1, v)).alias("__m1")))
    z = ((F.col("__m0") - F.col("__m1"))
         / F.sqrt(F.lit(pop_var0) / F.col("__n0")
                  + F.lit(pop_var1) / F.col("__n1")))
    return (out.withColumn("z_stat", z)
            .drop("__n0", "__n1", "__m0", "__m1"))


def kolmogorov_smirnov(df: DataFrame, keys: Sequence[str], value_col: str,
                       group_col: str | Column) -> DataFrame:
    """kolmogorovSmirnovTest(value, sample_index): two-sample KS
    D statistic per key (reference
    src/AggregateFunctions/AggregateFunctionKolmogorovSmirnovTest.cpp).

    D = max over x of |ECDF0(x) - ECDF1(x)|.  Cumulative counts via a
    RANGE window ordered by value (ties collapse correctly because RANGE
    includes all peers), then one groupBy for the max — a single shuffle
    on (keys) that scales like any windowed aggregate.
    """
    keys = list(keys)
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    w = (Window.partitionBy(*keys).orderBy(value_col)
         .rangeBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy(*keys)
    is0 = F.when(g == 0, 1).otherwise(0)
    is1 = F.when(g == 1, 1).otherwise(0)
    cum = (df.withColumn("__c0", F.sum(is0).over(w))
           .withColumn("__c1", F.sum(is1).over(w))
           .withColumn("__n0", F.sum(is0).over(w_all))
           .withColumn("__n1", F.sum(is1).over(w_all)))
    d = F.abs(F.col("__c0") / F.col("__n0") - F.col("__c1") / F.col("__n1"))
    return (cum.withColumn("__d", d).groupBy(*keys)
            .agg(F.max("__d").alias("d_stat"),
                 F.first("__n0").alias("n0"), F.first("__n1").alias("n1")))


def _cell_counts(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Contingency cells with row/column totals attached via windows
    (no joins): one groupBy shuffle + two light window passes over the
    already-tiny cell table."""
    cells = df.groupBy(a_col, b_col).agg(F.count("*").alias("__o"))
    ra = F.sum("__o").over(Window.partitionBy(a_col))
    cb = F.sum("__o").over(Window.partitionBy(b_col))
    n = F.sum("__o").over(Window.partitionBy())
    return (cells.withColumn("__ra", ra).withColumn("__cb", cb)
            .withColumn("__n", n))


def cramers_v(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """cramersV(a, b): association between two categorical columns
    (reference src/AggregateFunctions/AggregateFunctionsStatisticsSimple...
    /CrossTab.h family, cramersV registration).

    chi2 over observed cells only, using
    chi2 = n * sum(o^2 / (row_total * col_total)) - n  (algebraically
    equal to the all-cells sum), then V = sqrt(chi2 / (n*(min(R,C)-1))).
    """
    cells = _cell_counts(df, a_col, b_col)
    agg = cells.agg(
        (F.first("__n") * F.sum(F.col("__o") * F.col("__o")
                                / (F.col("__ra") * F.col("__cb")))
         - F.first("__n")).alias("__chi2"),
        F.countDistinct(a_col).alias("__r"),
        F.countDistinct(b_col).alias("__c"),
        F.first("__n").alias("__nn"))
    v = F.sqrt(F.col("__chi2")
               / (F.col("__nn") * (F.least("__r", "__c") - F.lit(1))))
    return agg.select(v.alias("cramers_v"))


def contingency(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """contingency(a, b): Pearson contingency coefficient
    sqrt(chi2 / (chi2 + n)) (reference cross-tab family, contingency
    registration in src/AggregateFunctions/registerAggregateFunctions.cpp)."""
    cells = _cell_counts(df, a_col, b_col)
    agg = cells.agg(
        (F.first("__n") * F.sum(F.col("__o") * F.col("__o")
                                / (F.col("__ra") * F.col("__cb")))
         - F.first("__n")).alias("__chi2"),
        F.first("__n").alias("__nn"))
    c = F.sqrt(F.col("__chi2") / (F.col("__chi2") + F.col("__nn")))
    return agg.select(c.alias("contingency"))


def cramers_v_bias_corrected(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """cramersVBiasCorrected(a, b): Bergsma-Wicher corrected V
    (reference AggregateFunctionCramersVBiasCorrected.cpp):
    phi2' = max(0, phi2 - (R-1)(C-1)/(n-1)), R' = R - (R-1)^2/(n-1),
    C' = C - (C-1)^2/(n-1), V = sqrt(phi2' / min(R'-1, C'-1))."""
    cells = _cell_counts(df, a_col, b_col)
    agg = cells.agg(
        (F.first("__n") * F.sum(F.col("__o") * F.col("__o")
                                / (F.col("__ra") * F.col("__cb")))
         - F.first("__n")).alias("__chi2"),
        F.countDistinct(a_col).alias("__r"),
        F.countDistinct(b_col).alias("__c"),
        F.first("__n").alias("__nn"))
    n, r, c = F.col("__nn"), F.col("__r"), F.col("__c")
    phi2 = F.col("__chi2") / n
    phi2c = F.greatest(F.lit(0.0),
                       phi2 - (r - 1) * (c - 1) / (n - 1))
    rc = r - (r - 1) * (r - 1) / (n - 1)
    cc = c - (c - 1) * (c - 1) / (n - 1)
    v = F.sqrt(phi2c / F.least(rc - 1, cc - 1))
    return agg.select(v.alias("cramers_v_bc"))


def anova(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """analysisOfVariance(value, group): one-way ANOVA F-statistic
    (reference src/AggregateFunctions/AggregateFunctionAnalysisOfVariance.cpp).

    F = (SSB / (k-1)) / (SSW / (n-k)); both sums of squares derive from
    per-group (count, sum, sum of squares) — one groupBy shuffle over
    group cardinality, then a single-row reduction."""
    per = (df.filter(F.col(value_col).isNotNull())
           .groupBy(group_col)
           .agg(F.count(value_col).alias("__c"),
                F.sum(value_col).alias("__s"),
                F.sum(F.col(value_col) * F.col(value_col)).alias("__ss")))
    tot = per.agg(F.sum("__c").alias("__n"),
                  F.sum("__s").alias("__ts"),
                  F.sum("__ss").alias("__tss"),
                  F.count("*").alias("__k"),
                  F.sum(F.col("__s") * F.col("__s") / F.col("__c")).alias("__sb"))
    n, ts, tss, k, sb = (F.col(c) for c in ("__n", "__ts", "__tss", "__k", "__sb"))
    ssb = sb - ts * ts / n
    ssw = tss - sb
    f_stat = (ssb / (k - 1)) / (ssw / (n - k))
    return tot.select(f_stat.alias("f_statistic"))


def _pairwise_matrix(df: DataFrame, cols: Sequence[str], pair_fn,
                     alias: str) -> DataFrame:
    """Shared shape for corrMatrix / covarSampMatrix / covarPopMatrix
    (reference src/AggregateFunctions/AggregateFunctionVarianceMatrix.cpp):
    one aggregate pass computing the upper triangle, mirrored into a
    full array<array<double>> — single shuffle regardless of column
    count."""
    cols = list(cols)
    n = len(cols)
    aggs = [pair_fn(cols[i], cols[j]).alias(f"__m_{i}_{j}")
            for i in range(n) for j in range(i, n)]
    g = df.agg(*aggs)
    rows = [F.array(*[F.col(f"__m_{min(i, j)}_{max(i, j)}") for j in range(n)])
            for i in range(n)]
    return g.select(F.array(*rows).alias(alias))


def corr_matrix(df: DataFrame, cols: Sequence[str],
                alias: str = "corr_matrix") -> DataFrame:
    """corrMatrix(x1, ..., xn): pairwise Pearson correlation matrix."""
    return _pairwise_matrix(df, cols, F.corr, alias)


def covar_samp_matrix(df: DataFrame, cols: Sequence[str],
                      alias: str = "covar_matrix") -> DataFrame:
    """covarSampMatrix(x1, ..., xn): pairwise sample covariance matrix."""
    return _pairwise_matrix(df, cols, F.covar_samp, alias)


def covar_pop_matrix(df: DataFrame, cols: Sequence[str],
                     alias: str = "covar_matrix") -> DataFrame:
    """covarPopMatrix(x1, ..., xn): pairwise population covariance."""
    return _pairwise_matrix(df, cols, F.covar_pop, alias)


def categorical_information_value(df: DataFrame, cat_col: str, tag_col: str,
                                  alias: str = "civ") -> DataFrame:
    """categoricalInformationValue(cat, tag) (reference
    src/AggregateFunctions/AggregateFunctionCategoricalInformationValue.cpp):
    IV = sum over category values of (g/G - b/B) * ln((g/G)/(b/B)) where
    g/b are tag=1 / tag=0 counts.  Categories with a zero cell
    contribute 0 (the reference's log term degenerates there).

    One groupBy over category cardinality, totals via a window over the
    tiny category table, single-row result."""
    tag = F.col(tag_col).cast("double")
    g = (df.groupBy(cat_col)
         .agg(F.sum(tag).alias("__g"),
              F.sum(F.lit(1.0) - tag).alias("__b")))
    w = Window.partitionBy()
    gg = (g.withColumn("__tg", F.sum("__g").over(w))
          .withColumn("__tb", F.sum("__b").over(w)))
    gr = F.col("__g") / F.col("__tg")
    br = F.col("__b") / F.col("__tb")
    term = F.when((F.col("__g") > 0) & (F.col("__b") > 0),
                  (gr - br) * F.log(gr / br)).otherwise(F.lit(0.0))
    return gg.agg(F.sum(term).alias(alias))


def theils_u(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """theilsU(a, b): uncertainty coefficient U(a|b) = (H(a) - H(a|b)) / H(a)
    (reference cross-tab family, theilsU registration).

    All terms derive from the contingency cells: H(a) from row totals,
    H(a|b) = -sum over cells (o/n)*log(o/col_total).
    """
    cells = _cell_counts(df, a_col, b_col)
    o, ra, cb, n = (F.col(c) for c in ("__o", "__ra", "__cb", "__n"))
    h_cond = F.sum(-(o / n) * F.log(o / cb))
    # H(a): each row total counted once — divide by the #cells in the row
    row_cells = F.count("*").over(Window.partitionBy(a_col))
    agg = (cells.withColumn("__rc", row_cells)
           .agg(h_cond.alias("__hc"),
                F.sum(-(ra / n) * F.log(ra / n) / F.col("__rc")).alias("__ha")))
    return agg.select(
        ((F.col("__ha") - F.col("__hc")) / F.col("__ha")).alias("theils_u"))


def rank_corr(df: DataFrame, keys: Sequence[str], x_col: str,
              y_col: str) -> DataFrame:
    """rankCorr(x, y): Spearman rank correlation per key (reference
    src/AggregateFunctions/AggregateFunctionRankCorrelation.h).

    Tie-averaged ranks for both columns (rank + (tie_count-1)/2, as in
    Mann-Whitney), then Pearson corr of the ranks — two windows sharing
    the same keys-shuffle plus one groupBy.
    """
    keys = list(keys)

    def avg_rank(col: str) -> Column:
        w_all = Window.partitionBy(*keys).orderBy(col)
        w_tie = Window.partitionBy(*keys, col)
        return F.rank().over(w_all) + (F.count("*").over(w_tie) - 1) / 2.0

    ranked = (df.withColumn("__rx", avg_rank(x_col))
              .withColumn("__ry", avg_rank(y_col)))
    return (ranked.groupBy(*keys)
            .agg(F.corr("__rx", "__ry").alias("rank_corr")))


def roc_auc(df: DataFrame, keys: Sequence[str], score_col: str,
            label_col: str | Column) -> DataFrame:
    """arrayAUC(scores, labels) semantics per key on long-form rows
    (reference src/Functions/array/arrayAUC.cpp): area under the ROC
    curve.

    Rank-sum (Mann-Whitney) formulation with tie-averaged ranks:
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) — identical to
    the trapezoid-over-thresholds definition, and a single windowed
    shuffle instead of a per-key quadratic pass.
    """
    keys = list(keys)
    lbl = F.col(label_col) if isinstance(label_col, str) else label_col
    w_all = Window.partitionBy(*keys).orderBy(score_col)
    w_tie = Window.partitionBy(*keys, score_col)
    r = F.rank().over(w_all) + (F.count("*").over(w_tie) - 1) / 2.0
    ranked = df.withColumn("__r", r)
    out = (ranked.groupBy(*keys)
           .agg(F.sum(F.when(lbl, F.col("__r"))).alias("__rp"),
                F.count(F.when(lbl, F.lit(1))).alias("__np"),
                F.count(F.when(~lbl, F.lit(1))).alias("__nn")))
    auc = ((F.col("__rp") - F.col("__np") * (F.col("__np") + 1) / 2.0)
           / (F.col("__np") * F.col("__nn")))
    return out.withColumn("auc", auc).drop("__rp", "__np", "__nn")


def sessionize(df: DataFrame, keys: Sequence[str], ts_col: str,
               gap: str | int, session_col: str = "session_id") -> DataFrame:
    """Gap-based sessionization: a new session starts when the time
    since the previous event (per key) exceeds ``gap``.

    session_id = cumulative count of gap-breaks in time order — one
    window pass, the classic scalable formulation (equivalent to
    Spark's streaming session_window for the batch case).
    """
    if isinstance(gap, str):
        num, unit = gap.split()
        mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
                "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}[unit]
        gap_s = int(num) * mult
    else:
        gap_s = int(gap)
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    t = F.unix_timestamp(F.col(ts_col))
    is_break = F.when(
        t - F.unix_timestamp(F.lag(ts_col).over(w)) > gap_s, 1).otherwise(0)
    run = (Window.partitionBy(*keys).orderBy(ts_col)
           .rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn(session_col, F.sum(is_break).over(run).cast("long"))


def largest_triangle_three_buckets(df: DataFrame, keys: Sequence[str],
                                   x_col: str, y_col: str,
                                   n_buckets: int) -> DataFrame:
    """largestTriangleThreeBuckets(n)(x, y): downsample each key's
    series to ~n points, keeping visual shape (reference
    AggregateFunctionLargestTriangleThreeBuckets.cpp).

    Simplified LTTB (a standard variant): rank points into n equal-count
    buckets in x order and keep, per bucket, the point with the largest
    |y - bucket_mean_y| (the locally most extreme point — first/last
    rows always survive).  Window + groupBy only; one shuffle.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(x_col)
    n_rows = F.count("*").over(Window.partitionBy(*keys))
    rn = F.row_number().over(w)
    bucket = F.least(
        F.floor((rn - 1) * n_buckets / n_rows).cast("int"), F.lit(n_buckets - 1))
    b = df.withColumn("__bkt", bucket).withColumn("__rn", rn) \
          .withColumn("__n", n_rows)
    w_b = Window.partitionBy(*keys, "__bkt")
    dev = F.abs(F.col(y_col) - F.avg(y_col).over(w_b))
    # keep first/last point of the series unconditionally (LTTB contract)
    keep_rank = F.row_number().over(
        Window.partitionBy(*keys, "__bkt").orderBy(
            F.when((F.col("__rn") == 1) | (F.col("__rn") == F.col("__n")), 1)
            .otherwise(0).desc(),
            dev.desc(), F.col(x_col)))
    return (b.withColumn("__keep", keep_rank)
            .filter(F.col("__keep") == 1)
            .drop("__bkt", "__rn", "__n", "__keep"))


def gradient_linear_regression(df: DataFrame, feature_cols: Sequence[str],
                               label_col: str, learning_rate: float = 0.1,
                               iterations: int = 10,
                               l2: float = 0.0) -> DataFrame:
    """stochasticLinearRegression's deterministic refinement (reference
    src/AggregateFunctions/AggregateFunctionMLMethod.h — its minibatch
    SGD state is merge-order-dependent, so no reproducible distributed
    contract exists; full-batch gradient descent is the order-free limit
    of the same method and shares the hyperparameter surface).

    Features are standardized first (the reference recommends the same);
    each iteration is ONE aggregation computing the exact batch gradient
    g_j = mean(residual * x_j), applied driver-side to the tiny weight
    vector.  Scale shape: iterations × one map-side-combinable
    aggregation over the data; state on the driver is len(features)+1
    floats.  Returns a single row: weights w_1..w_n (standardized
    space), bias, and the de-standardized raw-space coefficients.
    """
    feats = list(feature_cols)
    n = len(feats)
    stats = df.agg(
        *[F.avg(c).alias(f"m{i}") for i, c in enumerate(feats)],
        *[F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(feats)],
        F.avg(label_col).alias("my")).first()
    means = [float(stats[f"m{i}"]) for i in range(n)]
    stds = [float(stats[f"s{i}"]) or 1.0 for i in range(n)]

    std_cols = [((F.col(c) - F.lit(means[i])) / F.lit(stds[i])).alias(f"x{i}")
                for i, c in enumerate(feats)]
    base = df.select(*std_cols, F.col(label_col).cast("double").alias("y"))

    w = [0.0] * n
    b = 0.0
    for _ in range(int(iterations)):
        pred = F.lit(b)
        for i in range(n):
            pred = pred + F.lit(w[i]) * F.col(f"x{i}")
        resid = pred - F.col("y")
        grads = base.agg(
            *[F.avg(resid * F.col(f"x{i}")).alias(f"g{i}") for i in range(n)],
            F.avg(resid).alias("gb")).first()
        for i in range(n):
            w[i] -= learning_rate * (float(grads[f"g{i}"]) + l2 * w[i])
        b -= learning_rate * float(grads["gb"])

    spark = df.sparkSession
    raw_w = [w[i] / stds[i] for i in range(n)]
    raw_b = b - sum(raw_w[i] * means[i] for i in range(n))
    row = tuple(w) + (b,) + tuple(raw_w) + (raw_b,)
    schema = (", ".join(f"w{i} double" for i in range(n)) + ", bias double, "
              + ", ".join(f"raw_w{i} double" for i in range(n))
              + ", raw_bias double")
    return spark.createDataFrame([row], schema)


def eval_ml_method(weights: Sequence[float], bias: float,
                   feature_cols: Sequence[str | Column],
                   kind: str = "linear") -> Column:
    """evalMLMethod(state, features...) (reference
    src/Functions/evalMLMethod.cpp + AggregateFunctionMLMethod.h
    predict): apply a trained linear/logistic state to feature columns.
    The state here is the (weights, bias) row produced by
    :func:`gradient_linear_regression` /
    :func:`gradient_logistic_regression` (raw-space coefficients);
    prediction is a pure Catalyst expression — no Python per row."""
    pred = F.lit(float(bias))
    for w, c in zip(weights, feature_cols):
        col = F.col(c) if isinstance(c, str) else c
        pred = pred + F.lit(float(w)) * col.cast("double")
    if kind == "logistic":
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-pred))
    if kind != "linear":
        raise ValueError(f"evalMLMethod: unknown kind {kind!r}")
    return pred


def gradient_logistic_regression(df: DataFrame, feature_cols: Sequence[str],
                                 label_col: str, learning_rate: float = 0.5,
                                 iterations: int = 10) -> DataFrame:
    """stochasticLogisticRegression's deterministic refinement
    (reference AggregateFunctionMLMethod.h LogisticRegression traits):
    full-batch gradient descent on the log-loss, sigma(z) computed with
    built-in exp — same order-free contract as
    gradient_linear_regression.  Label must be 0/1.
    """
    feats = list(feature_cols)
    n = len(feats)
    stats = df.agg(
        *[F.avg(c).alias(f"m{i}") for i, c in enumerate(feats)],
        *[F.stddev_pop(c).alias(f"s{i}") for i, c in enumerate(feats)]).first()
    means = [float(stats[f"m{i}"]) for i in range(n)]
    stds = [float(stats[f"s{i}"]) or 1.0 for i in range(n)]
    base = df.select(
        *[((F.col(c) - F.lit(means[i])) / F.lit(stds[i])).alias(f"x{i}")
          for i, c in enumerate(feats)],
        F.col(label_col).cast("double").alias("y"))

    w = [0.0] * n
    b = 0.0
    for _ in range(int(iterations)):
        z = F.lit(b)
        for i in range(n):
            z = z + F.lit(w[i]) * F.col(f"x{i}")
        sig = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        resid = sig - F.col("y")
        grads = base.agg(
            *[F.avg(resid * F.col(f"x{i}")).alias(f"g{i}") for i in range(n)],
            F.avg(resid).alias("gb")).first()
        for i in range(n):
            w[i] -= learning_rate * float(grads[f"g{i}"])
        b -= learning_rate * float(grads["gb"])

    row = tuple(w) + (b,)
    schema = ", ".join(f"w{i} double" for i in range(n)) + ", bias double"
    return df.sparkSession.createDataFrame([row], schema)
