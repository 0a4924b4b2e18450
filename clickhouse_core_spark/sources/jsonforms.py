"""Structured-JSON document formats, dump/form readers, and text
renderers — the long tail of src/Formats/registerFormats.cpp beyond the
row-stream formats in rowformats.py.

Read formats (each a documented CH input format):
- JSON / JSONCompact      — {"meta":[...], "data":[{...}|[...]], ...}
- JSONColumns(+WithMetadata) — {"col": [v, ...], ...}
- JSONCompactColumns      — [[v, ...], [v, ...]] positional columns
- JSONObjectEachRow       — {"name1": {...}, "name2": {...}}
- JSONAsString / JSONAsObject — one top-level object per row, kept
  as a raw JSON string (the engine's Dynamic/Object carrier)
- MySQLDump               — INSERT statements parsed back to rows
  (reference src/Processors/Formats/Impl/MySQLDumpRowInputFormat.cpp)
- Form                    — application/x-www-form-urlencoded, one row
  (reference src/Processors/Formats/Impl/FormInputFormat.cpp)
- Null (discards / yields nothing), One (single UInt8 `dummy` = 0 row,
  reference src/Processors/Formats/Impl/OneFormat.cpp)

Render formats (CH OUTPUT-only displays — driver-side helpers over a
bounded collect, matching their interactive purpose):
- Markdown, Vertical, SQLInsert, XML

Execution shapes: the JSON document formats parse with Catalyst
`from_json`/`explode` over wholetext files (one document per file — the
format's own granularity); MySQLDump reuses the quote-aware Values
tokenizer inside Arrow-batched mapInPandas.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .rowformats import _parse_scalar, _schema, _split_values


def _wholetext(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.text(path, wholetext=True)


def read_json_document(spark: SparkSession, path: str, schema,
                       compact: bool = False,
                       strings: bool = False) -> DataFrame:
    """CH `JSON` / `JSONCompact` / `JSONStrings` / `JSONCompactStrings`
    input: one document per file with meta/data sections; `data` rows
    are objects (JSON) or positional arrays (JSONCompact); the Strings
    variants carry every value as a quoted string (parsed as strings,
    cast to the schema — the reference's type-from-schema rule)."""
    schema = _schema(schema)
    if compact:
        arr = T.ArrayType(T.ArrayType(T.StringType()))
        doc = T.StructType([T.StructField("data", arr)])
        parsed = _wholetext(spark, path).select(
            F.explode(F.from_json("value", doc)["data"]).alias("r"))
        cols = [F.col("r")[i].cast(f.dataType).alias(f.name)
                for i, f in enumerate(schema.fields)]
        return parsed.select(*cols)
    if strings:
        str_schema = T.StructType([
            T.StructField(f.name, T.StringType(), True)
            for f in schema.fields])
        doc = T.StructType([
            T.StructField("data", T.ArrayType(str_schema))])
        return (_wholetext(spark, path)
                .select(F.explode(F.from_json("value", doc)["data"])
                        .alias("r"))
                .select(*[F.col("r")[f.name].cast(f.dataType)
                          .alias(f.name) for f in schema.fields]))
    doc = T.StructType([T.StructField("data", T.ArrayType(schema))])
    return (_wholetext(spark, path)
            .select(F.explode(F.from_json("value", doc)["data"])
                    .alias("r"))
            .select("r.*"))


def read_raw_blob(spark: SparkSession, path: str,
                  column: str = "raw",
                  as_string: bool = False) -> DataFrame:
    """CH `RawBLOB` input (reference
    src/Processors/Formats/Impl/RawBLOBRowInputFormat.cpp): the whole
    file is ONE value of a single binary/String column — the format
    the reference uses to ingest opaque payloads."""
    df = (spark.read.format("binaryFile").load(path)
          .select(F.col("content").alias(column)))
    if as_string:
        df = df.select(F.col(column).cast("string").alias(column))
    return df


def read_json_columns(spark: SparkSession, path: str, schema,
                      compact: bool = False) -> DataFrame:
    """CH `JSONColumns(+WithMetadata)` / `JSONCompactColumns`: columnar
    documents zipped back to rows with arrays_zip + explode (pure
    Catalyst)."""
    schema = _schema(schema)
    names = [f.name for f in schema.fields]
    if compact:
        outer = T.ArrayType(T.ArrayType(T.StringType()))
        cols_arr = F.from_json("value", outer)
        zipped = F.arrays_zip(*[cols_arr[i].alias(n)
                                for i, n in enumerate(names)])
    else:
        # WithMetadata wraps the columns under "data"; plain JSONColumns
        # is the bare object — coalesce over both shapes
        bare = T.StructType([
            T.StructField(n, T.ArrayType(T.StringType())) for n in names])
        wrapped = T.StructType([T.StructField("data", bare)])
        obj = F.coalesce(F.from_json("value", wrapped)["data"],
                         F.from_json("value", bare))
        zipped = F.arrays_zip(*[obj[n].alias(n) for n in names])
    ex = _wholetext(spark, path).select(F.explode(zipped).alias("r"))
    return ex.select(*[F.col("r")[n].cast(f.dataType).alias(n)
                       for n, f in zip(names, schema.fields)])


def read_json_object_each_row(spark: SparkSession, path: str, schema,
                              name_col: str | None = None) -> DataFrame:
    """CH `JSONObjectEachRow`: a single object whose entries are rows
    keyed by name; optional ``name_col`` surfaces the key (the format's
    `format_json_object_each_row_column_for_object_name` setting)."""
    schema = _schema(schema)
    m = F.from_json("value", T.MapType(T.StringType(), schema))
    ex = _wholetext(spark, path).select(
        F.explode(m).alias("__k", "__v"))
    cols = ([F.col("__k").alias(name_col)] if name_col else []) + \
        [F.col("__v")[f.name].alias(f.name) for f in schema.fields]
    return ex.select(*cols)


def read_json_as_string(spark: SparkSession, path: str,
                        column: str = "json") -> DataFrame:
    """CH `JSONAsString` / `JSONAsObject`: every top-level object is one
    row holding the raw JSON text.  Files may be NDJSON or a single
    concatenated/array document; the splitter is executor-side."""
    blobs = spark.read.format("binaryFile").load(path).select("content")

    def split_objects(text: str) -> list[str]:
        out, depth, start, in_str, esc = [], 0, None, False, False
        for i, c in enumerate(text):
            if in_str:
                if esc:
                    esc = False
                elif c == "\\":
                    esc = True
                elif c == '"':
                    in_str = False
                continue
            if c == '"':
                in_str = True
            elif c == "{":
                if depth == 0:
                    start = i
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0 and start is not None:
                    out.append(text[start:i + 1])
                    start = None
        return out

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[str] = []
            for blob in pdf["content"]:
                rows.extend(split_objects(bytes(blob).decode(
                    "utf-8", "replace")))
            yield pd.DataFrame({column: rows})

    return blobs.mapInPandas(batches, schema=f"{column} string")


def read_mysql_dump(spark: SparkSession, path: str, schema,
                    table: str | None = None) -> DataFrame:
    """CH `MySQLDump` input: extract INSERT statements (optionally only
    for ``table``) and parse their VALUES tuples with the quote-aware
    Values tokenizer.  One task per dump file."""
    import re
    schema = _schema(schema)
    names = [f.name for f in schema.fields]
    blobs = spark.read.format("binaryFile").load(path).select("content")
    pat = re.compile(
        r"INSERT\s+INTO\s+`?(\w+)`?[^(;]*(?:\([^)]*\))?\s*VALUES\s*",
        re.IGNORECASE)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[dict] = []
            for blob in pdf["content"]:
                text = bytes(blob).decode("utf-8", "replace")
                for m in pat.finditer(text):
                    if table and m.group(1) != table:
                        continue
                    stmt_end = text.find(";", m.end())
                    tuples_src = text[m.end():
                                      stmt_end if stmt_end > 0 else None]
                    for toks in _split_values(tuples_src):
                        rows.append({
                            f.name: _parse_scalar(tok, f.dataType)
                            for f, tok in zip(schema.fields, toks)})
            yield pd.DataFrame(
                {n: [r.get(n) for r in rows] for n in names},
                columns=names)

    return blobs.mapInPandas(batches, schema=schema)


def read_form(spark: SparkSession, path: str, schema) -> DataFrame:
    """CH `Form` input: one application/x-www-form-urlencoded document
    per file -> one row (str_to_map + url_decode, pure Catalyst)."""
    schema = _schema(schema)
    m = F.str_to_map(F.trim(F.col("value")), F.lit("&"), F.lit("="))
    return (_wholetext(spark, path)
            .select(*[F.url_decode(F.regexp_replace(
                F.element_at(m, f.name), r"\+", "%20"))
                .cast(f.dataType).alias(f.name) for f in schema.fields]))


def read_one(spark: SparkSession) -> DataFrame:
    """CH `One` input format: exactly one row, column `dummy` UInt8 0."""
    return spark.range(1).select(F.lit(0).cast("smallint").alias("dummy"))


def read_null(spark: SparkSession, schema) -> DataFrame:
    """CH `Null` format: no rows (schema-typed empty frame)."""
    return spark.createDataFrame([], _schema(schema))


# ------------------------------------------------------------- renderers

def _collect_bounded(df: DataFrame, max_rows: int):
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"render formats are display helpers; got more than "
            f"{max_rows} rows — aggregate or limit first")
    return rows


def format_markdown(df: DataFrame, max_rows: int = 10000) -> str:
    """CH `Markdown` output format (pipe table)."""
    rows = _collect_bounded(df, max_rows)
    cols = df.columns
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "|".join("---" for _ in cols) + "|"]
    for r in rows:
        lines.append("| " + " | ".join(
            "" if v is None else str(v) for v in r) + " |")
    return "\n".join(lines) + "\n"


def format_vertical(df: DataFrame, max_rows: int = 10000) -> str:
    """CH `Vertical` output format (Row N: / name: value blocks)."""
    rows = _collect_bounded(df, max_rows)
    cols = df.columns
    width = max((len(c) for c in cols), default=0)
    out = []
    for i, r in enumerate(rows, 1):
        out.append(f"Row {i}:")
        out.append("─" * 6)
        for c in cols:
            v = r[c]
            out.append(f"{c.rjust(width)}: "
                       f"{'ᴺᵁᴸᴸ' if v is None else v}")
        out.append("")
    return "\n".join(out)


def format_sql_insert(df: DataFrame, table: str = "table",
                      max_rows: int = 10000,
                      batch: int = 100) -> str:
    """CH `SQLInsert` output format."""
    rows = _collect_bounded(df, max_rows)
    cols = ", ".join(f"`{c}`" for c in df.columns)

    def lit(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "1" if v else "0"
        if isinstance(v, (int, float)):
            return repr(v)
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    stmts = []
    for start in range(0, len(rows), batch):
        vals = ", ".join(
            "(" + ", ".join(lit(v) for v in r) + ")"
            for r in rows[start:start + batch])
        stmts.append(f"INSERT INTO {table} ({cols}) VALUES {vals};")
    return "\n".join(stmts) + ("\n" if stmts else "")


def format_xml(df: DataFrame, max_rows: int = 10000) -> str:
    """CH `XML` output format."""
    from xml.sax.saxutils import escape
    rows = _collect_bounded(df, max_rows)
    out = ["<?xml version='1.0' encoding='UTF-8' ?>", "<result>",
           "\t<meta>", "\t\t<columns>"]
    for c in df.columns:
        out.append(f"\t\t\t<name>{escape(c)}</name>")
    out += ["\t\t</columns>", "\t</meta>", "\t<data>"]
    for r in rows:
        out.append("\t\t<row>")
        for c in df.columns:
            v = r[c]
            out.append(
                f"\t\t\t<{c}>{escape('' if v is None else str(v))}</{c}>")
        out.append("\t\t</row>")
    out += ["\t</data>", f"\t<rows>{len(rows)}</rows>", "</result>", ""]
    return "\n".join(out)


def format_json_each_row_with_progress(df: DataFrame,
                                       max_rows: int = 10000,
                                       strings: bool = False,
                                       compact: bool = False) -> str:
    """CH `JSON[Compact][Strings]EachRowWithProgress` output (reference
    src/Processors/Formats/Impl/JSONEachRowWithProgressRowOutputFormat
    .cpp): each row wrapped as {"row": ...} with a terminal
    {"progress": {...}} event.  Progress here is the deterministic
    final snapshot (rows read) — the streaming server interleaves
    intermediate ones, which a bounded renderer has no source for."""
    import json as _json
    rows = _collect_bounded(df, max_rows)
    out = []
    for r in rows:
        if compact:
            vals = [r[c] for c in df.columns]
            payload = [str(v) if strings and v is not None else v
                       for v in vals]
        else:
            payload = {c: (str(r[c]) if strings and r[c] is not None
                           else r[c]) for c in df.columns}
        out.append(_json.dumps({"row": payload}, default=str))
    out.append(_json.dumps({"progress": {
        "read_rows": str(len(rows)), "read_bytes": "0",
        "total_rows_to_read": str(len(rows))}}))
    return "\n".join(out) + "\n"


def read_template(spark: SparkSession, path: str, schema,
                  row_format: str) -> DataFrame:
    """CH `Template` input (subset — reference
    src/Processors/Formats/Impl/TemplateRowInputFormat.cpp): each line
    matches ``row_format``, a string with ``${name}`` or
    ``${name:Escaping}`` placeholders between literal text.  The
    template compiles to one regex (placeholders -> capture groups,
    literals -> anchors) evaluated JVM-side; escaping rules collapse to
    raw capture + schema cast (CSV/JSON/Quoted un-escaping of embedded
    delimiters is not replicated — use the dedicated formats for
    those)."""
    import re as _re
    schema = _schema(schema)
    parts = _re.split(r"(\$\{\w+(?::\w+)?\})", row_format)
    regex, order = [], []
    for p in parts:
        m = _re.fullmatch(r"\$\{(\w+)(?::\w+)?\}", p)
        if m:
            order.append(m.group(1))
            regex.append("(.*?)" if regex else "(.*?)")
        elif p:
            regex.append(_re.escape(p))
    if regex and regex[-1] == "(.*?)":
        regex[-1] = "(.*)"
    rx = "^" + "".join(regex) + "$"
    lines = spark.read.text(path).filter(F.trim("value") != "")
    cols = []
    for f in schema.fields:
        gi = order.index(f.name) + 1 if f.name in order else None
        if gi is None:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.regexp_extract("value", rx, gi)
                        .cast(f.dataType).alias(f.name))
    return lines.select(*cols)


def format_template(df: DataFrame, row_format: str,
                    max_rows: int = 10000) -> str:
    """CH `Template` output (subset): render each row through the
    ``${name}`` template; driver-side display helper."""
    import re as _re
    rows = _collect_bounded(df, max_rows)
    out = []
    for r in rows:
        out.append(_re.sub(
            r"\$\{(\w+)(?::\w+)?\}",
            lambda m: "" if r[m.group(1)] is None else str(r[m.group(1)]),
            row_format))
    return "\n".join(out) + ("\n" if out else "")


def format_pretty(df: DataFrame, variant: str = "PrettyCompact",
                  max_rows: int = 10000) -> str:
    """CH Pretty display family (reference
    src/Processors/Formats/Impl/PrettyBlockOutputFormat.cpp — the CLI
    default): box-drawing grids with the reference's alignment rule
    (numbers right-aligned, strings left-aligned).  Variants: 'Pretty'
    (heavy header box), 'PrettyCompact' (single-line header-in-border),
    'PrettySpace' (borderless columns).  Bounded display renderer like
    Markdown/Vertical — never a data path."""
    if variant not in ("Pretty", "PrettyCompact", "PrettySpace"):
        raise NotImplementedError(f"Pretty variant {variant!r}")
    rows = _collect_bounded(df, max_rows)
    cols = df.columns
    numeric = {c: t in ("tinyint", "smallint", "int", "bigint", "float",
                        "double") or t.startswith("decimal")
               for c, t in df.dtypes}
    cells = [["" if r[c] is None else str(r[c]) for c in cols]
             for r in rows]
    widths = [max([len(c)] + [len(row[i]) for row in cells])
              for i, c in enumerate(cols)]

    def pad(text, i):
        w = widths[i]
        return text.rjust(w) if numeric[cols[i]] else text.ljust(w)

    out = []
    if variant == "PrettySpace":
        out.append("   ".join(c.ljust(widths[i]) if not numeric[cols[i]]
                              else c.rjust(widths[i])
                              for i, c in enumerate(cols)).rstrip())
        for row in cells:
            out.append("   ".join(pad(v, i)
                                  for i, v in enumerate(row)).rstrip())
        return "\n".join(out) + "\n"
    if variant == "Pretty":
        out.append("┏━" + "━┳━".join("━" * w for w in widths) + "━┓")
        out.append("┃ " + " ┃ ".join(
            c.ljust(widths[i]) for i, c in enumerate(cols)) + " ┃")
        out.append("┡━" + "━╇━".join("━" * w for w in widths) + "━┩")
    else:  # PrettyCompact: header embedded in the top border
        segs = []
        for i, c in enumerate(cols):
            segs.append("─" + c + "─" * (widths[i] - len(c) + 1))
        out.append("┌" + "┬".join(segs) + "┐")
    for row in cells:
        out.append("│ " + " │ ".join(pad(v, i)
                                     for i, v in enumerate(row)) + " │")
    out.append("└─" + "─┴─".join("─" * w for w in widths) + "─┘")
    return "\n".join(out) + "\n"
