"""STATEFUL coverage sweep over the reference's own stateless test
files (PUBLIC corpus at /root/reference/tests/queries/0_stateless).

Unlike parse_coverage.py (self-contained SELECTs only), this runner
executes each file as a SESSION: CREATE TABLE / INSERT / SELECT /
ALTER / OPTIMIZE / DROP run in order against a per-file ``tables``
dict, so the large majority of the corpus — which exercises queries
against freshly created MergeTree/Memory tables — becomes measurable.

Outcome classes per statement:

  OK        — executed (DDL/DML ran; SELECT collected)
  EXPECTED  — statement carries a `-- { serverError }` marker and DID
              fail (the reference expects the failure)
  UNEXPECTED_OK — marked-error statement that succeeded here
  FRONTEND  — our frontend raised
  ANALYSIS / EXEC — Spark analysis / runtime failure
  SKIP      — client-side / session-state statement we don't model
              (SET, SYSTEM …, CREATE DICTIONARY, …)

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

# statements that are session/server state we deliberately don't model
_SKIP_RE = re.compile(
    r"(?i)^\s*(set\s|system\s+(?!flush\s+logs)|use\s|grant|revoke|"
    r"kill\b|attach|detach|check\s+table|watch\b|"
    r"create\s+(dictionary|database|user|role|row\s+policy|quota|"
    r"settings\s+profile|named\s+collection)|drop\s+(dictionary|"
    r"database|user|role|row\s+policy|quota|settings\s+profile|"
    r"named\s+collection)|backup\b|restore\b|exchange\s+dictionaries)")

_NONDET_RE = re.compile(
    r"(?i)\b(now|today|yesterday|rand|randCanonical|randomString|"
    r"randomPrintableASCII|generateUUIDv4|generateUUIDv7|uptime|"
    r"currentDatabase|currentUser|hostName|getMacro|version|serverUUID|"
    r"tcpPort|timezone|filesystemAvailable|getSetting)\s*\(")


def classify_and_run(spark, ch_sql, stmt: str, tables) -> str:
    expect_error = "__EXPECT_ERROR__" in stmt
    stmt = stmt.replace("__EXPECT_ERROR__", " ").strip()
    if not stmt:
        return "SKIP"
    if _SKIP_RE.match(stmt):
        return "SKIP"
    # nondeterministic functions only disqualify result-bearing
    # statements; DDL/INSERT with e.g. DEFAULT today() still RUNS
    if re.match(r"(?i)\s*(select|with)\b", stmt) \
            and _NONDET_RE.search(stmt):
        return "SKIP"
    try:
        df = ch_sql(spark, stmt, tables=tables)
        if df is not None:
            df.limit(20).collect()
        return "UNEXPECTED_OK" if expect_error else "OK"
    except Exception as e:
        if expect_error:
            return "EXPECTED"
        msg = str(e)
        ename = type(e).__name__
        if ename in ("ValueError", "NotImplementedError", "KeyError",
                     "IndexError", "ParseException") \
                and "AnalysisException" not in ename:
            head = " ".join(stmt.split()[:3])[:40]
            return "FRONTEND:" + f"{ename}: {signature(msg)} [{head}]"
        if "AnalysisException" in ename or "UNRESOLVED" in msg \
                or "cannot resolve" in msg:
            return "ANALYSIS:" + f"{ename}: {signature(msg)}"
        return "EXEC:" + f"{ename}: {signature(msg)}"


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
    from clickhouse_core_spark.plans.frontend import ch_sql
    spark = get_spark("session_coverage", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "4"})
    spark.sparkContext.setLogLevel("ERROR")

    counts = Counter()
    sigs: dict[str, Counter] = {"FRONTEND": Counter(), "ANALYSIS": Counter(),
                                "EXEC": Counter()}
    examples: dict[str, str] = {}
    file_green = 0
    n_files = 0
    for f in files:
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        if "{CLICKHOUSE_DATABASE" in text or "no-parallel" in text[:400]:
            continue
        n_files += 1
        before = {t.name for t in spark.catalog.listTables()}
        tables: dict = {}
        file_ok = True
        for stmt in split_statements(text):
            if len(stmt) > 4000:
                counts["SKIP"] += 1
                continue
            r = classify_and_run(spark, ch_sql, stmt, tables)
            kind, _, sig = r.partition(":")
            counts[kind] += 1
            if sig:
                sigs[kind][sig] += 1
                examples.setdefault(sig, stmt[:200])
                file_ok = False
            if kind == "UNEXPECTED_OK":
                file_ok = False
        # clean up the file's temp views
        for t in spark.catalog.listTables():
            if t.name not in before:
                try:
                    spark.catalog.dropTempView(t.name)
                except Exception:
                    pass
        if file_ok:
            file_green += 1

    ran = sum(counts[k] for k in
              ("OK", "UNEXPECTED_OK", "FRONTEND", "ANALYSIS", "EXEC"))
    print(f"\n=== session mode: {n_files} files, {ran} graded statements "
          f"(+{counts['EXPECTED']} expected-error, "
          f"{counts['SKIP']} skipped) ===")
    for k in ("OK", "UNEXPECTED_OK", "FRONTEND", "ANALYSIS", "EXEC"):
        pct = 100.0 * counts[k] / ran if ran else 0
        print(f"{k:14} {counts[k]:6}  {pct:5.1f}%")
    print(f"files fully green: {file_green}/{n_files} "
          f"({100.0 * file_green / n_files if n_files else 0:.1f}%)")
    for kind in ("FRONTEND", "ANALYSIS", "EXEC"):
        print(f"\n--- top {kind} signatures ---")
        for s, c in sigs[kind].most_common(20):
            print(f"{c:5}  {s}")
            print(f"       e.g. {examples.get(s, '')[:150]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
