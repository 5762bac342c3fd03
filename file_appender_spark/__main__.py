"""One-shot SQL / inventory-query runner:

    python -m file_appender_spark --sf-dir /root/testdata/sf0.01 \\
        "SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1"

    python -m file_appender_spark --sf-dir /root/testdata/sf0.01 \\
        --query q01_pricing_summary

Registers the driver tables as temp views (the A16 Explore-binding
analog) and executes either raw SQL or a named inventory query,
printing the result. ``--limit`` caps driver-side fetch (the CLI never
collects unbounded results by default); ``--explain`` prints the
formatted physical plan instead of rows.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="file_appender_spark")
    ap.add_argument("sql", nargs="?", help="SQL to run over the registered views")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--query", help="named inventory query (see --list)")
    ap.add_argument("--list", action="store_true", help="list inventory queries")
    ap.add_argument("--limit", type=int, default=100, help="max rows to print")
    ap.add_argument("--explain", action="store_true", help="print the plan, not rows")
    ap.add_argument(
        "--curate",
        metavar="OUT_DIR",
        help="run the full curation funnel (dedup -> near-dup -> quality "
        "-> PII -> split) over the sf-dir documents table and write "
        "train/val/test parquet shards to OUT_DIR",
    )
    args = ap.parse_args(argv)

    from file_appender_spark.queries import QUERIES

    if args.list:
        from file_appender_spark.queries.ledger import green_queries

        green = green_queries()
        for name, spec in QUERIES.items():
            doc = (spec.doc or "").strip().splitlines()
            mark = "✓" if name in green else "·"
            print(f"{mark} {name}: {doc[0] if doc else ''}")
        print(
            f"# {len(green)} driver-verified (✓), "
            f"{len(QUERIES) - len(green)} pending a driver window (·)"
        )
        return 0
    if not args.sql and not args.query and not args.curate:
        ap.error("provide SQL, --query NAME, --curate OUT_DIR, or --list")

    from file_appender_spark.session import get_spark
    from file_appender_spark.sources.catalog import register_views

    spark = get_spark(app_name="file_appender_spark_cli")
    if args.curate:
        import json

        from file_appender_spark.curate import curate
        from file_appender_spark.sources.catalog import load_table

        report = curate(spark, load_table(spark, args.sf_dir, "documents"), args.curate)
        print(json.dumps(report, sort_keys=True))
        return 0
    if args.query:
        if args.query not in QUERIES:
            print(f"unknown query {args.query!r}; try --list", file=sys.stderr)
            return 2
        # inventory queries register their own views (memoized)
        df = QUERIES[args.query].spark_fn(spark, args.sf_dir)
    else:
        register_views(spark, args.sf_dir)
        df = spark.sql(args.sql)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
