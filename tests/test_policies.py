"""Row policies + CHECK constraints (SURVEY §2.2; reference
src/Access/RowPolicy.h, src/Storages/ConstraintsDescription.h)."""

import pytest

from pyspark.sql import functions as F

from clickhouse_core_spark.sources import (
    RowPolicy, apply_row_policies, CheckConstraint, ConstraintViolation,
    with_check_constraints, validate_constraints,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, "eu", 10), (2, "us", 20), (3, "eu", 30), (4, "apac", 40)],
        "id int, region string, v int")


def test_permissive_policies_or_together(spark):
    pols = [RowPolicy("eu_only", "region = 'eu'", frozenset({"alice"})),
            RowPolicy("us_only", "region = 'us'", frozenset({"alice"}))]
    got = sorted(r.id for r in apply_row_policies(_df(spark), pols, "alice").collect())
    assert got == [1, 2, 3]


def test_restrictive_policy_ands(spark):
    pols = [RowPolicy("eu_or_us", "region IN ('eu', 'us')"),
            RowPolicy("small", "v < 25", restrictive=True)]
    got = sorted(r.id for r in apply_row_policies(_df(spark), pols, "bob").collect())
    assert got == [1, 2]


def test_no_applicable_policy_is_unrestricted(spark):
    pols = [RowPolicy("eu_only", "region = 'eu'", frozenset({"alice"}))]
    assert apply_row_policies(_df(spark), pols, "mallory").count() == 4


def test_check_constraint_passes(spark):
    out = with_check_constraints(_df(spark),
                                 [CheckConstraint("pos_v", "v > 0")])
    assert out.count() == 4


def test_check_constraint_fails_job(spark):
    out = with_check_constraints(_df(spark),
                                 [CheckConstraint("big_v", "v > 15")])
    with pytest.raises(Exception, match="big_v"):
        out.collect()


def test_validate_constraints_counts_violations(spark):
    with pytest.raises(ConstraintViolation, match="2 rows"):
        validate_constraints(_df(spark),
                             [CheckConstraint("big_v", "v > 25")])
    validate_constraints(_df(spark), [CheckConstraint("pos", "v > 0")])


def test_null_predicate_counts_as_violation(spark):
    df = _df(spark).withColumn("v", F.when(F.col("id") == 1, None)
                               .otherwise(F.col("v")))
    with pytest.raises(ConstraintViolation, match="1 rows"):
        validate_constraints(df, [CheckConstraint("nn", "v > 0")])
