"""Relational operators the reference supports but Spark lacks natively.

Each is expressed as a composition of DataFrame operations (SURVEY.md §2)
so Catalyst still sees a declarative plan: pushdown, AQE and codegen all
apply. Nothing here collects to the driver or loops per-row in Python.
"""

from clickhouse_core_spark.operators.joins import (
    asof_join,
    any_join,
    array_join,
    paste_join,
)
from clickhouse_core_spark.operators.aggregates import (
    limit_by,
    top_k,
    top_k_weighted,
    bitmap_cardinalities,
    with_totals,
    group_array,
    histogram,
    sparkbar,
    group_array_insert_at,
    group_array_sorted,
    group_array_sample,
    group_array_moving_sum,
    group_array_moving_avg,
    group_array_intersect,
    single_value_or_null,
    sum_count,
    any_heavy,
    min_map,
    max_map,
    group_array_last,
    quantile_exact,
    group_uniq_array,
    sum_kahan,
    any_respect_nulls,
    any_last_respect_nulls,
    sum_map_filtered,
    sum_mapped_arrays,
    min_mapped_arrays,
    max_mapped_arrays,
    group_concat,
)
from clickhouse_core_spark.operators.jsonpaths import distinct_json_paths
from clickhouse_core_spark.operators.timeseries import time_series_to_grid
from clickhouse_core_spark.operators.quantiles import (
    quantile_timing,
    quantile_bfloat16,
    bfloat16_expr,
    quantile_deterministic,
    quantile_interpolated_weighted,
)
from clickhouse_core_spark.operators.fill import with_fill
from clickhouse_core_spark.operators.recursive import recursive_cte, sample_by_hash
from clickhouse_core_spark.operators.sketches import (
    uniq_state, uniq_merge, uniq_theta_state, uniq_theta_estimate,
    quantile_state, quantile_merge, rollup_states, merge_states,
)
from clickhouse_core_spark.operators.dictionary import Dictionary, range_join
from clickhouse_core_spark.operators.combinators import (
    agg_if, agg_or_default, agg_distinct, agg_array, agg_for_each,
    agg_resample, count_or_null,
)
from clickhouse_core_spark.operators.stats import (
    simple_linear_regression,
    welch_t_test,
    mann_whitney_u,
    mean_z_test,
    kolmogorov_smirnov,
    cramers_v,
    contingency,
    cramers_v_bias_corrected,
    anova,
    categorical_information_value,
    corr_matrix,
    covar_samp_matrix,
    covar_pop_matrix,
    theils_u,
    rank_corr,
    roc_auc,
    sessionize,
    largest_triangle_three_buckets,
)
from clickhouse_core_spark.operators.sequence import (
    window_funnel,
    retention,
    sequence_match,
    sequence_match_events,
    sequence_count,
    sequence_next_node,
    max_intersections_position,
    delta_sum,
    delta_sum_timestamp,
    exponential_moving_average,
    bounding_ratio,
    uniq_up_to,
    entropy,
    max_intersections,
    interval_length_sum,
)
from clickhouse_core_spark.operators.final import (
    replacing_final,
    summing_final,
    collapsing_final,
    versioned_collapsing_final,
    coalescing_final,
    graphite_rollup,
)

__all__ = [
    "asof_join", "any_join", "array_join", "paste_join",
    "limit_by", "top_k", "with_totals", "group_array", "histogram",
    "sparkbar", "group_array_insert_at", "group_array_sorted",
    "group_array_moving_sum", "group_array_moving_avg",
    "group_array_sample",
    "group_array_intersect", "single_value_or_null", "sum_count", "any_heavy",
    "contingency", "cramers_v_bias_corrected", "anova",
    "categorical_information_value", "min_map", "max_map",
    "group_array_last", "corr_matrix", "covar_samp_matrix",
    "covar_pop_matrix", "quantile_exact",
    "group_uniq_array", "sum_kahan", "any_respect_nulls",
    "any_last_respect_nulls",
    "quantile_timing", "quantile_bfloat16", "bfloat16_expr",
    "quantile_deterministic", "quantile_interpolated_weighted",
    "with_fill", "recursive_cte", "sample_by_hash",
    "uniq_state", "uniq_merge", "uniq_theta_state", "uniq_theta_estimate",
    "quantile_state", "quantile_merge", "rollup_states", "merge_states",
    "Dictionary", "range_join",
    "agg_if", "agg_or_default", "agg_distinct", "agg_array",
    "agg_for_each", "agg_resample", "count_or_null",
    "simple_linear_regression", "welch_t_test", "mann_whitney_u",
    "sessionize", "largest_triangle_three_buckets",
    "window_funnel", "retention", "sequence_match", "delta_sum",
    "delta_sum_timestamp",
    "exponential_moving_average", "bounding_ratio", "uniq_up_to",
    "entropy", "max_intersections", "interval_length_sum",
    "sum_map_filtered", "sum_mapped_arrays", "min_mapped_arrays",
    "max_mapped_arrays", "group_concat", "distinct_json_paths",
    "time_series_to_grid", "sequence_match_events",
    "max_intersections_position",
    "replacing_final", "summing_final", "collapsing_final",
    "versioned_collapsing_final", "coalescing_final", "graphite_rollup",
]
