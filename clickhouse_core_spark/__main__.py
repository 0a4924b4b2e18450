"""clickhouse-local-style CLI (reference programs/local/LocalServer.h:
run queries against local files with no server).

    python -m clickhouse_core_spark --data /path/to/parquet_dir \
        -q "SELECT count() FROM orders"
    python -m clickhouse_core_spark -q "SELECT version()"   # no data dir
    echo "SELECT 1" | python -m clickhouse_core_spark

Queries run through the ClickHouse-SQL frontend (ch_sql); output
formats map to the sink format registry (--format, default
PrettyCompact-ish table via DataFrame.show, or any FORMAT_MAP name
written to --out).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="clickhouse_core_spark",
        description="Run ClickHouse-dialect SQL on Spark over local files")
    ap.add_argument("-q", "--query", action="append", default=[],
                    help="query to run (repeatable; also reads stdin)")
    ap.add_argument("--data", default=None,
                    help="directory of <table>.parquet files to register")
    ap.add_argument("--format", default=None,
                    help="output format name (FORMAT_MAP) written to --out")
    ap.add_argument("--out", default=None, help="output path for --format")
    ap.add_argument("--master", default=None,
                    help="Spark master (default local[N cpus])")
    ap.add_argument("-n", "--rows", type=int, default=100,
                    help="max rows to print (default 100)")
    args = ap.parse_args(argv)

    queries = list(args.query)
    if not queries and not sys.stdin.isatty():
        text = sys.stdin.read().strip()
        if text:
            queries = [q for q in text.split(";") if q.strip()]
    if not queries:
        ap.error("no query: pass -q or pipe SQL on stdin")

    from clickhouse_core_spark import Catalog, get_spark
    from clickhouse_core_spark.plans.frontend import ch_sql

    spark = get_spark("clickhouse-local", master=args.master)
    spark.sparkContext.setLogLevel("ERROR")
    if args.data:
        cat = Catalog(spark, args.data)
        cat.register_all()
        cat.register_system_tables()

    for q in queries:
        df = ch_sql(spark, q)
        if df is None:
            continue
        if args.format and args.out:
            from clickhouse_core_spark.sources.formats import write_format
            write_format(df, args.out, args.format)
            print(f"-- wrote {args.out} ({args.format})")
        else:
            df.show(n=args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
