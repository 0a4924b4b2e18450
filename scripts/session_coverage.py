"""STATEFUL coverage sweep over the reference's own stateless test
files (PUBLIC corpus at /root/reference/tests/queries/0_stateless) —
now with GOLDEN-OUTPUT verification against the adjacent
``*.reference`` files (the reference's primary test layer, SURVEY §5:
runner tests/clickhouse-test diffs each file's concatenated
TabSeparated output against its golden file).

Unlike parse_coverage.py (self-contained SELECTs only), this runner
executes each file as a SESSION: CREATE TABLE / INSERT / SELECT /
ALTER / OPTIMIZE / DROP run in order against a per-file ``tables``
dict.  Every result-bearing statement's rows are rendered CH-TSV-style
(clickhouse_core_spark.sources.tsvrender) and the file's concatenated
output is diffed against the golden file:

  file verdicts
    VERIFIED            — byte-identical to the golden output
    VERIFIED_UNORDERED  — same line multiset (un-ORDER-BY'd selects)
    MISMATCH            — ran fully but the answer differs
    RAN                 — ran, but not strictly verifiable (skipped
                          statements, FORMAT clauses, echo markers,
                          nondeterminism, huge results)
    ERROR               — at least one statement failed

  statement outcomes (as before)
    OK / EXPECTED / UNEXPECTED_OK / FRONTEND / ANALYSIS / EXEC / SKIP

Usage: python scripts/session_coverage.py [max_files] [pattern]
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parse_coverage import split_statements, signature  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF = "/root/reference/tests/queries/0_stateless"
MAX_VERIFY_ROWS = 10000

# statements that are session/server state we deliberately don't model
_SKIP_RE = re.compile(
    r"(?i)^\s*(set\s+role\b|system\s+(?!flush\s+logs)|use\s|grant|revoke|"
    r"kill\b|attach|detach|check\s+table|watch\b|"
    r"create\s+(database|user|role|row\s+policy|quota|"
    r"settings\s+profile|named\s+collection)|drop\s+("
    r"database|user|role|row\s+policy|quota|settings\s+profile|"
    r"named\s+collection)|backup\b|restore\b|exchange\s+dictionaries)")

# skipped statements that produce NO output in the reference client —
# skipping them does not break golden alignment
_SKIP_SILENT_RE = re.compile(
    r"(?i)^\s*(set\s|use\s|grant|revoke|attach|detach|system\s+"
    r"(reload|start|stop|flush|drop|enable|disable|sync)|"
    r"create\s|drop\s|backup\b|restore\b)")

_NONDET_RE = re.compile(
    r"(?i)\b(now|today|yesterday|rand|randCanonical|randomString|"
    r"randomPrintableASCII|generateUUIDv4|generateUUIDv7|uptime|"
    r"currentDatabase|currentUser|hostName|getMacro|version|serverUUID|"
    r"tcpPort|timezone|filesystemAvailable|getSetting)\s*\(")

_FORMAT_RE = re.compile(r"(?i)\bFORMAT\s+(\w+)\s*$")
_TSV_FORMATS = {"tabseparated", "tsv", "tabseparatedraw", "tsvraw"}




def split_statements_spans(text: str):
    """Like parse_coverage.split_statements, plus RAW SPANS: each item
    is (cleaned_stmt, span_start, span_end) where the span covers the
    file text from the previous statement's ';' through this one's
    ';' — extended to end-of-line when a trailing comment follows the
    ';' (the corpus's `-- { serverError }` convention, which the
    reference client also ECHOES on the same line)."""
    out = []
    cur = []
    i, n = 0, len(text)
    span_start = 0
    expect = False
    while i < n:
        c = text[i]
        if c == "-" and text[i:i + 2] == "--":
            j = text.find("\n", i)
            comment = text[i:n if j < 0 else j]
            if "serverError" in comment or "clientError" in comment \
                    or "error" in comment.lower().split("{")[-1][:20]:
                expect = True
            i = n if j < 0 else j
            continue
        if c == "/" and text[i:i + 2] == "/*":
            # multi-line block comment: a ';' inside must not split
            # (02869/parallel_replicas corpus files)
            j = text.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if c in "'`\"":
            j = i + 1
            while j < n:
                if text[j] == "\\":
                    j += 2
                    continue
                if text[j] == c:
                    j += 1
                    break
                j += 1
            cur.append(text[i:j])
            i = j
            continue
        if c == "\n":
            # INSERT ... FORMAT <fmt> with INLINE DATA and no ';':
            # the client ends the data block at a BLANK line
            # (01825_type_json_in_array corpus shape)
            cur_txt = "".join(cur)
            nl2 = text.find("\n", i + 1)
            line2 = text[i + 1:nl2 if nl2 >= 0 else n]
            if line2.strip() == "" and re.match(
                    r"(?is)^\s*INSERT\b[^;]*?\bFORMAT\s+\w+\s+\S",
                    cur_txt):
                stmt = cur_txt.strip()
                out.append((stmt + (" __EXPECT_ERROR__ "
                                    if expect else ""),
                            span_start, i))
                span_start = i
                cur = []
                expect = False
                i += 1
                continue
        if c == ";":
            end = i + 1
            # absorb a same-line trailing comment into the span
            eol = text.find("\n", end)
            rest = text[end:n if eol < 0 else eol]
            if re.match(r"\s*--", rest):
                if "serverError" in rest or "clientError" in rest:
                    expect = True
                end = n if eol < 0 else eol
            stmt = "".join(cur).strip()
            if stmt:
                if expect:
                    stmt += " __EXPECT_ERROR__ "
                out.append((stmt, span_start, end))
                span_start = end
            cur = []
            expect = False
            i = end
            continue
        cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append((tail + (" __EXPECT_ERROR__ " if expect else ""),
                    span_start, n))
    return out

def classify_and_run(spark, ch_sql, stmt: str, tables, settings=None):
    """Run one statement; returns (kind, rendered_output | None).

    ``rendered_output`` is the CH-TSV text the statement contributes to
    the file's golden comparison — None means 'cannot align this file'
    (unverifiable), '' means 'ran, no output'.
    """
    expect_error = "__EXPECT_ERROR__" in stmt
    stmt = stmt.replace("__EXPECT_ERROR__", " ").strip()
    if not stmt:
        return "SKIP", ""
    if re.search(r"(?i)\btest\.(hits|visits)\b", stmt):
        return "SKIP", None        # stateful dataset tables not shipped
    if re.search(r"\{\w+\s*:\s*[A-Za-z]", stmt):
        # parameterized query placeholders ({name:Type}) — the
        # reference runner substitutes client-side parameters this
        # harness does not have
        return "SKIP", None
    if re.search(r"(?i)\b(from|into|table\s+function)\s+url\s*\(",
                 stmt):
        # url() points the corpus at a LIVE localhost ClickHouse
        # server (reference registerTableFunctions.h:17) — there is
        # no server in this sandbox by design; expected-skip, same
        # contract as the parameterized placeholders above
        return "SKIP", None
    if _SKIP_RE.match(stmt):
        # silent session statements keep golden alignment; output-
        # bearing ones (CHECK TABLE, WATCH, KILL …) break it
        return "SKIP", ("" if _SKIP_SILENT_RE.match(stmt) else None)
    if re.match(r"(?i)\s*(select|with)\b", stmt) \
            and _NONDET_RE.search(stmt):
        return "SKIP", None
    if re.match(r"(?i)\s*EXPLAIN\b", stmt):
        # EXPLAIN renders Spark's plan text — never golden-comparable
        try:
            df = ch_sql(spark, stmt, tables=tables, settings=settings)
            if df is not None:
                df.limit(5).collect()
            return ("UNEXPECTED_OK" if expect_error else "OK"), None
        except Exception:
            if expect_error:
                return "EXPECTED", ""
            return "EXEC: explain", None
    fmt = _FORMAT_RE.search(stmt)
    fmt_name = fmt.group(1).lower() if fmt else None
    import threading
    spark.sparkContext.setJobGroup("harness_stmt", stmt[:80],
                                   interruptOnCancel=True)
    timer = threading.Timer(
        90.0, lambda: spark.sparkContext.cancelJobGroup("harness_stmt"))
    timer.daemon = True
    timer.start()
    try:
        df = ch_sql(spark, stmt, tables=tables, settings=settings)
        if df is None:
            return ("UNEXPECTED_OK" if expect_error else "OK"), ""
        if fmt_name == "null":
            df.limit(1).collect()
            return ("UNEXPECTED_OK" if expect_error else "OK"), ""
        rows = df.limit(MAX_VERIFY_ROWS + 1).collect()
        kind = "UNEXPECTED_OK" if expect_error else "OK"
        if kind == "UNEXPECTED_OK":
            # reference-rejected statement that ran: its output has no
            # golden counterpart — the file can't align byte-wise
            return kind, None
        if fmt_name in ("tabseparatedraw", "tsvraw"):
            # TSVRaw: NO escaping — embedded newlines stay raw
            # (SerializationString serializeTextRaw; golden 02997
            # SHOW CREATE ... FORMAT TSVRaw)
            from clickhouse_core_spark.sources import tsvrender as tr

            def _rawv(v):
                if v is None:
                    return "\\N"
                if isinstance(v, str):
                    return v
                return tr.render_value(v, bool_as_int=True)
            out = "\n".join("\t".join(_rawv(v) for v in row)
                            for row in rows)
            return kind, out + ("\n" if rows else "")
        if fmt_name is not None and fmt_name not in _TSV_FORMATS:
            # display renderers for the common output FORMATs —
            # tsvrender implements the reference's text serializations
            from clickhouse_core_spark.sources import tsvrender as tr
            try:
                if fmt_name in ("csv", "csvwithnames"):
                    return kind, tr.format_csv_rows(
                        rows, schema=df.schema,
                        with_names=fmt_name == "csvwithnames",
                        columns=df.columns)
                if fmt_name == "values":
                    return kind, tr.format_values_rows(
                        rows, schema=df.schema)
                if fmt_name == "jsoneachrow":
                    jset = set()
                    for tb in (tables or {}).values():
                        jset |= getattr(tb, "json_cols", set()) \
                            or set()
                    for d0 in ((tables or {}).get("__decl__")
                               or {}).values():
                        jset |= set((d0 or {}).get("json") or ())
                    q64 = str((settings or {}).get(
                        "output_format_json_quote_64bit_integers",
                        "1")).strip() not in ("0", "false")
                    return kind, tr.format_json_each_row(
                        rows, schema=df.schema, columns=df.columns,
                        json_cols=jset, quote64=q64)
                if fmt_name == "prometheus":
                    return kind, tr.format_prometheus(
                        rows, df.columns) + "\n"
                if fmt_name in ("tabseparatedwithnames",
                                "tsvwithnames"):
                    head = "\t".join(df.columns) + "\n"
                    body = tr.render_rows(rows, bool_as_int=True,
                                          schema=df.schema)
                    return kind, head + (body + "\n" if rows else "")
            except Exception:
                return kind, None
            return kind, None          # other displays — ran only
        if re.search(r"(?i)\bWITH\s+TOTALS\b", stmt):
            # the totals block renders as a separate blank-separated
            # block in the reference client: split the flattened
            # grouping-sets rows on the engine's __ch_totals__ marker
            # (RENDER_TOTALS_MARKER mode) and render main block +
            # blank line + totals block, totals key columns as CH
            # type defaults
            from clickhouse_core_spark.plans.frontend import (
                _top_level_set)
            tops = _top_level_set(stmt)
            top_limit = any(mm.start() in tops for mm in
                            re.finditer(r"(?i)\bLIMIT\b", stmt))
            if "__ch_totals__" not in df.columns or top_limit:
                return kind, None   # marker missing / LIMIT applies
                                    # to the main block only — punt
            from clickhouse_core_spark.sources.tsvrender import (
                render_row, ch_default_value)
            ti = df.columns.index("__ch_totals__")
            fields = [fld for i, fld in enumerate(df.schema.fields)
                      if i != ti]
            types = [fld.dataType.simpleString() for fld in fields]
            main, tot = [], []
            for r in rows:
                vals = list(r)
                flag = vals.pop(ti)
                (tot if flag else main).append(vals)
            tot = [[ch_default_value(types[i]) if v is None else v
                    for i, v in enumerate(vals)] for vals in tot]
            try:
                mbody = "\n".join(
                    render_row(v, bool_as_int=True, types=types)
                    for v in main)
                tbody = "\n".join(
                    render_row(v, bool_as_int=True, types=types)
                    for v in tot)
            except Exception:
                return kind, None
            return kind, ((mbody + "\n" if main else "")
                          + "\n" + tbody + "\n")
        if len(rows) > MAX_VERIFY_ROWS:
            return kind, None
        from clickhouse_core_spark.sources.tsvrender import render_rows
        jset0 = set()
        for tb in (tables or {}).values():
            jset0 |= getattr(tb, "json_cols", set()) or set()
        for d0 in ((tables or {}).get("__decl__") or {}).values():
            jset0 |= set((d0 or {}).get("json") or ())
        try:
            body = render_rows(rows, bool_as_int=True,
                               schema=df.schema, json_cols=jset0)
        except Exception:
            return kind, None
        return kind, (body + "\n" if rows else "")
    except Exception as e:
        if expect_error:
            return "EXPECTED", ""
        msg = str(e)
        if "cancelled" in msg.lower() or "interrupted" in msg.lower():
            return "EXEC: statement timeout (90s budget)", None
        ename = type(e).__name__
        if ename in ("ValueError", "NotImplementedError", "KeyError",
                     "IndexError", "ParseException") \
                and "AnalysisException" not in ename:
            head = " ".join(stmt.split()[:3])[:40]
            return "FRONTEND:" + f"{ename}: {signature(msg)} [{head}]", None
        if "AnalysisException" in ename or "UNRESOLVED" in msg \
                or "cannot resolve" in msg:
            return "ANALYSIS:" + f"{ename}: {signature(msg)}", None
        return "EXEC:" + f"{ename}: {signature(msg)}", None
    finally:
        timer.cancel()
        spark.sparkContext.setJobGroup("", "")


def first_diff(actual: str, expected: str):
    a, b = actual.split("\n"), expected.split("\n")
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return i + 1, x, y
    if len(a) != len(b):
        i = min(len(a), len(b))
        return (i + 1, a[i] if i < len(a) else "<eof>",
                b[i] if i < len(b) else "<eof>")
    return None


def main() -> int:
    max_files = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    pattern = sys.argv[2] if len(sys.argv) > 2 else ""
    files = sorted(glob.glob(os.path.join(REF, "*.sql")))
    if pattern:
        files = [f for f in files if re.search(pattern, os.path.basename(f))]
    import random
    random.seed(7)
    random.shuffle(files)
    files = files[:max_files]

    from clickhouse_core_spark import get_spark
    from clickhouse_core_spark.plans.frontend import (
        ch_sql, RENDER_TOTALS_MARKER)
    # display-harness mode: WITH TOTALS queries carry a marker column
    # so the renderer can emit the reference client's separate totals
    # block (never set on the oracle path)
    RENDER_TOTALS_MARKER[0] = True
    spark = get_spark("session_coverage", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "4"})
    # duplicate map-literal keys: Spark's default EXCEPTION policy
    # fails the construction; the reference keeps duplicate keys in
    # its Map type — LAST_WIN at least executes the statement
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.sparkContext.setLogLevel("ERROR")

    counts = Counter()
    verdicts = Counter()
    unexpected_ok: list = []
    sigs: dict[str, Counter] = {"FRONTEND": Counter(), "ANALYSIS": Counter(),
                                "EXEC": Counter()}
    mismatch_sigs: Counter = Counter()
    mismatch_examples: dict[str, tuple] = {}
    examples: dict[str, str] = {}
    file_verdicts: dict[str, dict] = {}
    n_files = 0
    for f in files:
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        if "{CLICKHOUSE_DATABASE" in text or "no-parallel" in text[:400]:
            continue
        n_files += 1
        try:
            from clickhouse_core_spark.plans.frontend import (
                SESSION_SETTINGS)
            SESSION_SETTINGS.clear()
        except Exception:
            pass
        conf_snapshot = {
            k: spark.conf.get(k, None)
            for k in ("spark.sql.session.timeZone",
                      "spark.sql.shuffle.partitions")}
        before = {t.name for t in spark.catalog.listTables()}
        tables: dict = {}
        settings: dict = {}
        had_error = False
        first_err = None
        verifiable = True
        echo_mode = bool(re.search(r"--\s*\{\s*echo", text))
        echo_active = False
        out_parts: list[str] = []
        for stmt, s0, s1 in split_statements_spans(text):
            raw = text[s0:s1]
            if echo_mode:
                m_on = re.search(r"--\s*\{\s*echo(On)?\s*\}", raw)
                m_off = re.search(r"--\s*\{\s*echoOff\s*\}", raw)
                if not echo_active and m_on is not None:
                    # the whole span echoes — including comment lines
                    # between the previous ';' and the marker (the
                    # client echoes each query's full raw text)
                    echo_active = True
                    out_parts.append(
                        raw.lstrip("\n\r \t").rstrip() + "\n")
                elif echo_active and m_off is not None:
                    echo_active = False
                elif echo_active:
                    out_parts.append(
                        raw.lstrip("\n\r \t").rstrip() + "\n")
            if len(stmt) > 4000:
                counts["SKIP"] += 1
                verifiable = False
                continue
            r, out = classify_and_run(spark, ch_sql, stmt, tables,
                                       settings)
            kind, _, sig = r.partition(":")
            counts[kind] += 1
            if kind == "UNEXPECTED_OK" and len(unexpected_ok) < 60:
                unexpected_ok.append(" ".join(stmt.split())[:140])
            if sig:
                sigs[kind][sig] += 1
                examples.setdefault(sig, stmt[:200])
                had_error = True
                if first_err is None:
                    first_err = f"{kind}:{sig.strip()[:120]} " \
                                f"| {' '.join(stmt.split())[:160]}"
            if out is None:
                verifiable = False
            else:
                out_parts.append(out)
        # restore live conf a SET statement may have changed
        for k, v in conf_snapshot.items():
            if v is not None:
                try:
                    spark.conf.set(k, v)
                except Exception:
                    pass
        # clean up the file's temp views
        for t in spark.catalog.listTables():
            if t.name not in before:
                try:
                    spark.catalog.dropTempView(t.name)
                except Exception:
                    pass
        base = os.path.basename(f)
        golden_path = f[:-4] + ".reference"
        if had_error:
            verdicts["ERROR"] += 1
            file_verdicts[base] = {"verdict": "ERROR",
                                   "err": first_err}
            continue
        if not verifiable or not os.path.exists(golden_path):
            verdicts["RAN"] += 1
            file_verdicts[base] = {"verdict": "RAN"}
            continue
        golden = open(golden_path, encoding="utf-8",
                      errors="replace").read()
        actual = "".join(out_parts)
        if actual.rstrip("\n") == golden.rstrip("\n"):
            verdicts["VERIFIED"] += 1
            file_verdicts[base] = {"verdict": "VERIFIED"}
        elif sorted(actual.rstrip("\n").split("\n")) \
                == sorted(golden.rstrip("\n").split("\n")):
            verdicts["VERIFIED_UNORDERED"] += 1
            file_verdicts[base] = {"verdict": "VERIFIED_UNORDERED"}
        else:
            verdicts["MISMATCH"] += 1
            d = first_diff(actual.rstrip("\n"), golden.rstrip("\n"))
            file_verdicts[base] = {"verdict": "MISMATCH"}
            if d:
                line_no, got, want = d
                key = f"want={want[:60]!r} got={got[:60]!r}"
                mismatch_sigs[key] += 1
                mismatch_examples.setdefault(key, (base, line_no))
                file_verdicts[base].update(
                    line=line_no, want=want[:200], got=got[:200])

    ran = sum(counts[k] for k in
              ("OK", "UNEXPECTED_OK", "FRONTEND", "ANALYSIS", "EXEC"))
    print(f"\n=== session mode: {n_files} files, {ran} graded statements "
          f"(+{counts['EXPECTED']} expected-error, "
          f"{counts['SKIP']} skipped) ===")
    for k in ("OK", "UNEXPECTED_OK", "FRONTEND", "ANALYSIS", "EXEC"):
        pct = 100.0 * counts[k] / ran if ran else 0
        print(f"{k:14} {counts[k]:6}  {pct:5.1f}%")
    nv = sum(verdicts.values())
    print(f"\n=== golden-output file verdicts ({nv} files) ===")
    for k in ("VERIFIED", "VERIFIED_UNORDERED", "MISMATCH", "RAN",
              "ERROR"):
        pct = 100.0 * verdicts[k] / nv if nv else 0
        print(f"{k:20} {verdicts[k]:6}  {pct:5.1f}%")
    ver = verdicts["VERIFIED"] + verdicts["VERIFIED_UNORDERED"]
    dec = ver + verdicts["MISMATCH"]
    if dec:
        print(f"verified-of-decided: {ver}/{dec} "
              f"({100.0 * ver / dec:.1f}%)")
    print("\n--- UNEXPECTED_OK statements (reference rejects, "
          "this engine accepts) ---")
    for u in unexpected_ok[:40]:
        print(f"   {u}")
    print("\n--- top MISMATCH signatures ---")
    for s, c in mismatch_sigs.most_common(25):
        fb, ln = mismatch_examples.get(s, ("?", 0))
        print(f"{c:5}  {s}   [{fb}:{ln}]")
    for kind in ("FRONTEND", "ANALYSIS", "EXEC"):
        print(f"\n--- top {kind} signatures ---")
        for s, c in sigs[kind].most_common(15):
            print(f"{c:5}  {s}")
            print(f"       e.g. {examples.get(s, '')[:150]}")
    import json
    with open("/tmp/sweep_file_verdicts.json", "w") as fh:
        json.dump(file_verdicts, fh, indent=1, sort_keys=True)
    print("\nper-file verdicts -> /tmp/sweep_file_verdicts.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
