"""Row policies and CHECK constraints (SURVEY §2.2).

Reference semantics: row policies are per-user filters injected into
every SELECT over a table (reference src/Access/RowPolicy.h:46 —
permissive policies OR together, restrictive policies AND together, and
the combined filter is `(p1 OR p2 OR ...) AND r1 AND r2 AND ...`,
src/Access/EnabledRowPolicies.h).  CHECK constraints reject INSERTed
rows that violate an expression (reference
src/Storages/ConstraintsDescription.h, checked in
src/Processors/Transforms/CheckConstraintsTransform.cpp).

Spark mapping: a policy is a plain Column predicate applied as a
`filter` at read time — Catalyst pushes it into the scan like any other
predicate, so policies cost nothing beyond the rows they exclude.
Constraints attach a distributed `assert_true` guard that fails the
write job on the first violating row — no extra pass over the data.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RowPolicy:
    """CREATE ROW POLICY name ON table FOR SELECT USING condition
    TO users (reference src/Parsers/Access/ParserCreateRowPolicyQuery.h)."""
    name: str
    condition: str                      # SQL predicate over table columns
    users: frozenset[str] = frozenset()  # empty = applies to all users
    restrictive: bool = False

    def applies_to(self, user: str) -> bool:
        return not self.users or user in self.users


def apply_row_policies(df: DataFrame, policies: Sequence[RowPolicy],
                       user: str) -> DataFrame:
    """Inject the combined policy filter for ``user``:
    (permissive1 OR permissive2 OR ...) AND restrictive1 AND ... .
    No applicable permissive policy means unrestricted (the reference
    default: policies narrow access only once one names the user)."""
    applicable = [p for p in policies if p.applies_to(user)]
    permissive = [F.expr(p.condition) for p in applicable if not p.restrictive]
    restrictive = [F.expr(p.condition) for p in applicable if p.restrictive]
    cond = None
    if permissive:
        acc = permissive[0]
        for c in permissive[1:]:
            acc = acc | c
        cond = acc
    for c in restrictive:
        cond = c if cond is None else cond & c
    return df if cond is None else df.filter(cond)


@dataclass(frozen=True)
class CheckConstraint:
    """CONSTRAINT name CHECK expression (reference
    src/Storages/ConstraintsDescription.h)."""
    name: str
    expression: str


class ConstraintViolation(Exception):
    pass


def with_check_constraints(df: DataFrame,
                           constraints: Sequence[CheckConstraint]) -> DataFrame:
    """Attach distributed constraint guards: any violating row fails the
    job that materializes the result (the INSERT path), mirroring
    CheckConstraintsTransform's fail-on-first-violation.  The guard is
    `filter(assert_true(...) IS NULL)`: assert_true yields NULL for every
    passing row (so nothing is dropped) and raises on a violation; the
    condition depends on row data, so Catalyst cannot fold it away (an
    OR-with-true form WOULD be erased by BooleanSimplification)."""
    out = df
    for c in constraints:
        guard = F.assert_true(
            F.coalesce(F.expr(c.expression), F.lit(False)),
            F.lit(f"CHECK constraint {c.name} violated: {c.expression}"))
        out = out.filter(guard.isNull())
    return out


def validate_constraints(df: DataFrame,
                         constraints: Sequence[CheckConstraint]) -> None:
    """Eager variant: one aggregate pass counting violations per
    constraint; raises ConstraintViolation naming the first broken one.
    Useful when the caller wants the error before any data is written."""
    if not constraints:
        return
    counts = df.agg(*[
        F.sum(F.when(~F.coalesce(F.expr(c.expression), F.lit(False)), 1)
              .otherwise(0)).alias(c.name)
        for c in constraints]).first()
    for c in constraints:
        n = counts[c.name]
        if n:
            raise ConstraintViolation(
                f"CHECK constraint {c.name} violated by {n} rows: "
                f"{c.expression}")
