"""Command-line driver — the ExampleDriver parity surface (reference:
hadoop-mapreduce-examples ExampleDriver.java:39-73 dispatches example
programs by name; `hadoop jar hadoop-mapreduce-examples.jar wordcount
<in> <out>`).  Here every registered query is a program:

    python -m hadoop_3_3_6_spark list
    python -m hadoop_3_3_6_spark run wordcount --sf-dir /root/testdata/sf0.01
    python -m hadoop_3_3_6_spark run q1_pricing_summary --out /tmp/q1 --format parquet
    python -m hadoop_3_3_6_spark explain q3_shipping_priority

`run` without --out prints up to --show rows (collect-free preview);
with --out it writes the result via the chosen format — the
FileOutputFormat path.  `explain` prints the formatted physical plan
(pushdown/broadcast/codegen audit, the `.explain` workflow SCALE.md
documents).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hadoop_3_3_6_spark", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list every registered query/program")

    runp = sub.add_parser("run", help="run one query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default=None, help="fixture dir (default $SPARK_GRAFT_SF_DIR or sf0.1)")
    runp.add_argument("--out", default=None, help="write the result here instead of printing")
    runp.add_argument(
        "--format",
        default="parquet",
        choices=["parquet", "csv", "json", "orc", "text"],
        help="output format for --out",
    )
    runp.add_argument("--show", type=int, default=20, help="rows to print without --out")

    exp = sub.add_parser("explain", help="print a query's physical plan")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default=None)

    args = p.parse_args(argv)

    from hadoop_3_3_6_spark.plans.queries import ORACLES, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return 0

    if args.query not in QUERIES:
        close = [n for n in QUERIES if args.query in n]
        hint = f" (did you mean: {', '.join(sorted(close)[:5])}?)" if close else ""
        print(f"unknown query: {args.query}{hint}", file=sys.stderr)
        return 2

    from hadoop_3_3_6_spark.session import DEFAULT_SF_DIR, get_spark

    sf_dir = args.sf_dir or DEFAULT_SF_DIR
    spark = get_spark(f"cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.query](spark, sf_dir)

    if args.cmd == "explain":
        df.explain("formatted")
        return 0

    if args.out:
        getattr(df.write.mode("overwrite"), args.format)(args.out)
        print(f"wrote {args.out} ({args.format})")
    else:
        df.show(args.show, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
