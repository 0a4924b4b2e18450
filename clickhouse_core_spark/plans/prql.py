"""PRQL dialect frontend.

Reference: src/Interpreters/executeQuery.cpp:997 (dialect = prql,
ParserPRQLQuery delegating to the public prqlc compiler) — the
semantics implemented here are the public PRQL language spec
(https://prql-lang.org), the same contract the reference compiles.

Supported transforms (the PRQL core pipeline set): ``from``,
``filter``, ``derive``, ``select`` (incl. ``select !{..}``
exclusion), ``aggregate``, ``group {keys} (pipeline)``, ``sort``
(with ``-col`` descending), ``take n`` / ``take a..b``, ``join``
(side:inner/left/right/full with ``==`` key equality). Expressions
translate textually to Spark SQL: ``==`` -> ``=``, ``&&``/``||`` ->
AND/OR, ``!`` -> NOT, aggregate functions ``average``/``stddev``/
``count this`` -> their SQL names.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from clickhouse_core_spark.plans.frontend import (
    _skip_string, _split_top_commas, _top_level_set)


def _fix_expr(e: str) -> str:
    """PRQL scalar expression -> Spark SQL text."""
    e = e.strip()
    e = re.sub(r"\baverage\s+", "avg__ ", e)
    # `count this` == COUNT(*)
    e = re.sub(r"\bcount\s+this\b", "count(*)", e)
    # prefix-call aggregates: `sum x` -> sum(x); `stddev x` -> stddev(x)
    for fn, sql in [("sum", "sum"), ("avg__", "avg"), ("min", "min"),
                    ("max", "max"), ("stddev", "stddev_samp"),
                    ("count", "count")]:
        e = re.sub(rf"\b{fn}\s+((?:[\w.]+|\((?:[^()]|\([^()]*\))*\)))",
                   lambda m, s=sql: f"{s}({m.group(1)})", e)
    e = e.replace("&&", " AND ").replace("||", " OR ")
    e = re.sub(r"!(?=[A-Za-z_(])", "NOT ", e)
    # f-strings: f"{a}-{b}" -> concat
    def _fstr(m):
        parts, body = [], m.group(1)
        for tok in re.split(r"(\{[^}]*\})", body):
            if not tok:
                continue
            if tok.startswith("{"):
                parts.append(f"CAST({tok[1:-1]} AS STRING)")
            else:
                parts.append("'" + tok.replace("'", "''") + "'")
        return "concat(" + ", ".join(parts) + ")"
    e = re.sub(r'f"([^"]*)"', _fstr, e)
    # == -> = outside strings
    out, i, n = [], 0, len(e)
    while i < n:
        c = e[i]
        if c in "'\"":
            j = _skip_string(e, i)
            out.append(e[i:j])
            i = j
            continue
        if c == "=" and i + 1 < n and e[i + 1] == "=":
            out.append("=")
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out).strip()


def _tuple_items(body: str) -> list[str]:
    """``{a, b = expr}`` or a single bare item -> item list."""
    body = body.strip()
    if body.startswith("{") and body.endswith("}"):
        body = body[1:-1]
    return _split_top_commas(body)


def _assign_split(item: str) -> tuple[str | None, str]:
    tops = _top_level_set(item)
    for i, c in enumerate(item):
        if (c == "=" and i in tops and (i + 1 >= len(item) or item[i + 1] != "=")
                and (i == 0 or item[i - 1] not in "=!<>")):
            name = item[:i].strip()
            if re.fullmatch(r"[A-Za-z_]\w*", name):
                return name, item[i + 1:].strip()
            break
    return None, item


def _split_pipeline(q: str) -> list[str]:
    """Split on top-level '|' and newlines that start a new transform."""
    q = re.sub(r"#[^\n]*", "", q)           # comments
    tops = _top_level_set(q)
    parts, start = [], 0
    kw = ("from", "filter", "derive", "select", "aggregate", "group",
          "sort", "take", "join", "let")
    for i, c in enumerate(q):
        if i not in tops:
            continue
        if c == "|":
            parts.append(q[start:i])
            start = i + 1
        elif c == "\n":
            rest = q[i + 1:].lstrip()
            word = rest.split(" ", 1)[0].split("\n", 1)[0].strip()
            if word in kw:
                parts.append(q[start:i])
                start = i + 1
    parts.append(q[start:])
    return [p.strip() for p in parts if p.strip()]


def _aggregate(df_or_grouped, body: str):
    cols = []
    for it in _tuple_items(body):
        name, expr = _assign_split(it)
        c = F.expr(_fix_expr(expr))
        cols.append(c.alias(name) if name else c)
    return df_or_grouped.agg(*cols)


def _resolve(spark: SparkSession, name: str,
             tables: dict[str, DataFrame] | None) -> DataFrame:
    if tables is not None and name in tables:
        return tables[name]
    return spark.table(name)


def prql(spark: SparkSession, query: str,
         tables: dict[str, DataFrame] | None = None) -> DataFrame:
    """Run a PRQL pipeline; tables resolve from ``tables`` or the
    session catalog (temp views registered by ``Catalog``)."""
    stages = _split_pipeline(query.strip())
    if not stages or not stages[0].startswith("from"):
        raise ValueError("PRQL pipeline must start with 'from <table>'")
    df = _resolve(spark, stages[0][4:].strip().strip("`"), tables)

    for st in stages[1:]:
        mo = re.match(r"^(\w+)\b(.*)$", st, re.S)
        op, body = mo.group(1), mo.group(2).strip()
        if op == "filter":
            df = df.filter(F.expr(_fix_expr(body)))
        elif op == "derive":
            for it in _tuple_items(body):
                name, expr = _assign_split(it)
                if name is None:
                    raise ValueError(f"derive needs name = expr: {it!r}")
                df = df.withColumn(name, F.expr(_fix_expr(expr)))
        elif op == "select":
            if body.startswith("!"):
                df = df.drop(*[c.strip() for c in _tuple_items(body[1:])])
            else:
                cols = []
                for it in _tuple_items(body):
                    name, expr = _assign_split(it)
                    c = F.expr(_fix_expr(expr))
                    cols.append(c.alias(name) if name else c)
                df = df.select(*cols)
        elif op == "aggregate":
            df = _aggregate(df, body)
        elif op == "group":
            m = re.match(r"^(\{[^}]*\}|[\w.]+)\s*\((.*)\)\s*$", body, re.S)
            if not m:
                raise ValueError(f"group expects 'group {{keys}} (pipe)': {body!r}")
            keys = [k.strip() for k in _tuple_items(m.group(1))]
            inner = _split_pipeline(m.group(2).strip())
            if len(inner) == 1 and inner[0].startswith("aggregate"):
                df = _aggregate(df.groupBy(*keys),
                                inner[0][len("aggregate"):].strip())
            elif len(inner) == 1 and inner[0].startswith("take"):
                # group {k} (take n) — first-n per group in input order
                # (PRQL's distinct idiom is `group {cols} (take 1)`)
                from pyspark.sql import Window
                n = int(inner[0][4:].strip())
                w = Window.partitionBy(*keys).orderBy(*[F.lit(1)
                                                        for _ in keys])
                df = (df.withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") <= n).drop("__rn"))
            elif len(inner) == 2 and inner[0].startswith("sort") \
                    and inner[1].startswith("take"):
                # group {k} (sort {-x} | take n) — per-group top-n
                from pyspark.sql import Window
                order = _sort_cols(inner[0][4:].strip())
                n = int(inner[1][4:].strip())
                w = Window.partitionBy(*keys).orderBy(*order)
                df = (df.withColumn("__rn", F.row_number().over(w))
                      .filter(F.col("__rn") <= n).drop("__rn"))
            else:
                raise NotImplementedError(
                    "group() supports (aggregate ...) or (sort ... | take n)")
        elif op == "sort":
            df = df.orderBy(*_sort_cols(body))
        elif op == "take":
            m = re.fullmatch(r"(\d+)\.\.(\d+)", body.strip())
            if m:
                lo, hi = int(m.group(1)), int(m.group(2))
                df = df.offset(lo - 1).limit(hi - lo + 1)
            else:
                df = df.limit(int(body))
        elif op == "join":
            m = re.match(r"^(?:side\s*:\s*(\w+)\s+)?([\w.]+)\s*\((.*)\)\s*$",
                         body, re.S)
            if not m:
                raise ValueError(f"join expects [side:kind] table (cond): {body!r}")
            side = {"left": "left", "right": "right", "full": "full",
                    None: "inner", "inner": "inner"}[m.group(1)]
            right = _resolve(spark, m.group(2), tables)
            cond = m.group(3).strip()
            mu = re.fullmatch(r"==\s*([\w]+)", cond)
            if mu:                        # (==col) equi-join shorthand
                df = df.join(right, on=mu.group(1), how=side)
            else:
                cond = re.sub(r"\bthis\.", "l.", cond)
                cond = re.sub(r"\bthat\.", "r.", cond)
                df = df.alias("l").join(right.alias("r"),
                                        F.expr(_fix_expr(cond)), how=side)
        elif op == "append":
            # set-op transforms (PRQL book "Append/Remove/Intersect")
            df = df.unionByName(
                _resolve(spark, body.strip().strip("`"), tables),
                allowMissingColumns=True)
        elif op == "remove":
            df = df.exceptAll(
                _resolve(spark, body.strip().strip("`"), tables))
        elif op == "intersect":
            df = df.intersectAll(
                _resolve(spark, body.strip().strip("`"), tables))
        else:
            raise NotImplementedError(f"PRQL transform '{op}' is not mapped")
    return df


def _sort_cols(body: str) -> list[Column]:
    cols = []
    for it in _tuple_items(body):
        it = it.strip()
        if it.startswith("-"):
            cols.append(F.expr(_fix_expr(it[1:])).desc())
        else:
            cols.append(F.expr(_fix_expr(it.lstrip("+"))).asc())
    return cols
