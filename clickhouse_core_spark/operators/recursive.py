"""Recursive CTE + deterministic sampling.

Reference: recursive CTEs via
src/Processors/QueryPlan/ReadFromRecursiveCTEStep.h:10 (driver-side
iteration is the documented Spark mapping — SURVEY.md §2.7); SAMPLE via
hash-range part selection in
src/Storages/MergeTree/MergeTreeDataSelectExecutor.h:218-221.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    distinct_on: Sequence[str] | None = None,
    checkpoint_every: int = 4,
) -> DataFrame:
    """UNION-semantics recursive CTE: iterate ``step`` on the previous
    frontier, union new rows until fixpoint (or ``max_iterations``).

    The loop is driver-side *control flow only* — each iteration's work
    is a distributed DataFrame op; counts (the only driver-side data)
    are single longs.  ``localCheckpoint`` every few rounds truncates
    the growing lineage so the plan doesn't deepen unboundedly — the
    standard Spark iterative-algorithm pattern.

    ``distinct_on``: columns defining row identity for the fixpoint
    check (default: all columns).  New-frontier rows already seen are
    dropped, which is what guarantees termination on cyclic graphs
    (UNION DISTINCT semantics — the reference's recursive CTE default).
    """
    keys = list(distinct_on) if distinct_on else list(base.columns)
    acc = base.dropDuplicates(keys).localCheckpoint(eager=True)
    frontier = acc
    for i in range(max_iterations):
        nxt = step(frontier).dropDuplicates(keys)
        # anti-join against everything seen so far = "new rows only"
        new = nxt.join(acc.select(*keys), on=keys, how="left_anti")
        if (i + 1) % checkpoint_every == 0:
            new = new.localCheckpoint(eager=True)
        if new.isEmpty():
            break
        acc = acc.unionByName(new)
        if (i + 1) % checkpoint_every == 0:
            acc = acc.localCheckpoint(eager=True)
        frontier = new
    return acc


def sample_by_hash(df: DataFrame, fraction: float,
                   key_cols: Sequence[str],
                   granularity: int = 1_000_000,
                   method: str = "xxhash64") -> DataFrame:
    """SAMPLE f with a sampling key — deterministic hash-range filter
    (the reference's SAMPLE selects a range of the sampling-key hash
    space, MergeTreeDataSelectExecutor.h:218; same contract here:
    stable across runs and engines for the same key, composable —
    SAMPLE 0.5 of SAMPLE 0.5 = SAMPLE 0.25).

    ``method='xxhash64'`` (default) mixes best; ``method='knuth'`` is a
    multiplicative hash expressible in plain integer SQL arithmetic, so
    the selected subset is reproducible on any engine (the oracle path —
    the reference likewise only promises determinism per sampling key,
    not a specific hash).  A plain filter — pushes past shuffles.
    """
    if method == "knuth":
        mod = 1 << 31
        mixed = F.lit(0).cast("long")
        for c in key_cols:
            mixed = mixed * 1000003 + F.col(c).cast("long")
        h = F.pmod(F.pmod(mixed, F.lit(mod)) * 2654435761, F.lit(mod))
        return df.filter(h < int(fraction * mod))
    threshold = int(fraction * granularity)
    h = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(granularity))
    return df.filter(h < threshold)
