"""Frontend coverage sweep over the reference's own stateless test
queries (PUBLIC test corpus at /root/reference/tests/queries/0_stateless).

Extracts SELF-CONTAINED statements (SELECT/WITH with no table
dependency, or reading numbers()/system.numbers/system.one) and runs
them through the CH-SQL frontend, classifying outcomes:

  OK          — planned AND executed
  FRONTEND    — our frontend raised (parse/rewrite gap)
  ANALYSIS    — Spark analysis failed (unresolved function/semantic gap)
  EXEC        — runtime error
  SKIP        — statement not self-contained / uses session state

Usage: python scripts/parse_coverage.py [max_files] [pattern]
Writes a per-signature histogram so the top gaps become the worklist.
This measures the 'a reference user could run their queries' promise.
"""

from __future__ import annotations

import glob
import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference/tests/queries/0_stateless"

# statements we cannot meaningfully run standalone
_SKIP_RE = re.compile(
    r"(?i)\b(insert|create|drop|alter|attach|detach|rename|optimize|"
    r"truncate|grant|revoke|set\s|system\s|use\s|kill|exchange|"
    r"check\s+table|describe|desc\s|show|exists|watch|explain)\b")
_TABLEY_RE = re.compile(
    r"(?i)\bfrom\s+(?!numbers\b|system\.numbers\b|system\.one\b|"
    r"values\b|zeros\b|generate_series\b|\()")
_SETTINGS_RE = re.compile(r"(?i)\bsettings\s+[a-z0-9_]+\s*=")
_NONDET_RE = re.compile(
    r"(?i)\b(now|today|yesterday|rand|randCanonical|randomString|"
    r"generateUUIDv4|generateUUIDv7|uptime|currentDatabase|currentUser|"
    r"hostName|getMacro|version|serverUUID|tcpPort|timezone)\s*\(")


def split_statements(text: str) -> list[str]:
    """Split on top-level ';' (string-aware, comment-stripping).
    Comments carrying an error-expectation marker (the corpus's
    ``-- { serverError X }`` / clientError convention) leave a sentinel
    in the statement so eligibility can EXCLUDE it — the reference
    expects those statements to FAIL, so counting them against our
    success rate is wrong."""
    out, cur, i, n = [], [], 0, len(text)
    while i < n:
        c = text[i]
        if c == "-" and text[i:i + 2] == "--":
            j = text.find("\n", i)
            comment = text[i:n if j < 0 else j]
            if "serverError" in comment or "clientError" in comment \
                    or "error" in comment.lower().split("{")[-1][:20]:
                # the marker usually sits AFTER the ';' on the same
                # line — attach it to the statement it annotates
                if not "".join(cur).strip() and out:
                    out[-1] += " __EXPECT_ERROR__ "
                else:
                    cur.append(" __EXPECT_ERROR__ ")
            i = n if j < 0 else j
            continue
        if c == "/" and text[i:i + 2] == "/*":
            # block comment — possibly MULTI-LINE; a ';' inside it
            # must not split the statement (02869 family)
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
        if c == ";":
            out.append("".join(cur).strip())
            cur = []
            i += 1
            continue
        cur.append(c)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        out.append(tail)
    return [s for s in out if s]


def eligible(stmt: str) -> bool:
    low = stmt.lstrip().lower()
    if not (low.startswith("select") or low.startswith("with")):
        return False
    if "__EXPECT_ERROR__" in stmt:
        return False                 # the reference expects it to fail
    if re.search(r"(?i)\bdict(Get|Has|IsIn)", stmt):
        return False                 # needs a session dictionary (DDL)
    if _SKIP_RE.search(stmt) or _TABLEY_RE.search(stmt):
        return False
    if _SETTINGS_RE.search(stmt) or _NONDET_RE.search(stmt):
        return False
    if len(stmt) > 2000:
        return False
    return True


def signature(err: str) -> str:
    m = re.search(r"UNRESOLVED_ROUTINE\] Cannot resolve routine `([^`]+)`",
                  err)
    if m:
        return f"UNRESOLVED_ROUTINE `{m.group(1)}`"
    m = re.search(r'Cannot resolve "([A-Za-z_][A-Za-z_0-9]*)\(', err)
    fn = f" <{m.group(1)}>" if m else ""
    err = err.split("\n")[0]
    err = re.sub(r"'[^']*'", "'…'", err)
    err = re.sub(r"`[^`]*`", "`…`", err)
    err = re.sub(r"\"[^\"]*\"", '"…"', err)
    err = re.sub(r"\d+", "N", err)
    return (fn.strip() + " | " + err if fn else err)[:160]


def main() -> int:
    max_files = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    pattern = sys.argv[2] if len(sys.argv) > 2 else ""
    files = sorted(glob.glob(os.path.join(REF, "*.sql")))
    if pattern:
        files = [f for f in files if re.search(pattern, os.path.basename(f))]
    import random
    random.seed(6)
    random.shuffle(files)
    files = files[:max_files]

    from clickhouse_core_spark import get_spark
    from clickhouse_core_spark.plans.frontend import ch_sql
    spark = get_spark("parse_coverage", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "4"})
    spark.sparkContext.setLogLevel("ERROR")

    counts = Counter()
    sigs: dict[str, Counter] = {"FRONTEND": Counter(), "ANALYSIS": Counter(),
                                "EXEC": Counter()}
    examples: dict[str, str] = {}
    n_stmt = 0
    for f in files:
        try:
            text = open(f, encoding="utf-8", errors="replace").read()
        except OSError:
            continue
        for stmt in split_statements(text):
            if not eligible(stmt):
                continue
            n_stmt += 1
            try:
                df = ch_sql(spark, stmt)
            except Exception as e:
                counts["FRONTEND"] += 1
                s = f"{type(e).__name__}: {signature(str(e))}"
                sigs["FRONTEND"][s] += 1
                examples.setdefault(s, stmt[:200])
                if type(e).__name__ == "ParseException":
                    with open("/tmp/parse_fails.txt", "a") as fh:
                        fh.write(stmt.replace("\n", " ")[:500] + "\n")
                continue
            try:
                import time as _time
                _t0 = _time.time()
                df.limit(20).collect()
                if _time.time() - _t0 > 10:
                    print(f"SLOW {_time.time()-_t0:5.1f}s  "
                          f"{stmt[:160]!r}", flush=True)
                counts["OK"] += 1
            except Exception as e:
                msg = str(e)
                kind = ("ANALYSIS" if "AnalysisException" in type(e).__name__
                        or "UNRESOLVED" in msg or "cannot resolve" in msg
                        else "EXEC")
                counts[kind] += 1
                s = f"{type(e).__name__}: {signature(msg)}"
                sigs[kind][s] += 1
                examples.setdefault(s, stmt[:200])

    total = sum(counts.values())
    print(f"\n=== {n_stmt} eligible statements from {len(files)} files ===")
    for k in ("OK", "FRONTEND", "ANALYSIS", "EXEC"):
        pct = 100.0 * counts[k] / total if total else 0
        print(f"{k:9} {counts[k]:6}  {pct:5.1f}%")
    for kind in ("FRONTEND", "ANALYSIS", "EXEC"):
        print(f"\n--- top {kind} signatures ---")
        for s, c in sigs[kind].most_common(25):
            print(f"{c:5}  {s}")
            print(f"       e.g. {examples.get(s, '')[:150]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
