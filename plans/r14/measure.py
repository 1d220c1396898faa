"""Fresh-session min-of-N noop-write timing for named queries — the
same methodology as bench.py (shared warmup, noop sink, min-of-reps),
for r14 A/B adjudication.

Usage: python plans/r14/measure.py [--reps N] <query> [<query> ...]
Prints one JSON line {query: {"sec": best, "cpu_sec": delta}}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    import bench
    from hadoop_3_3_6_spark.plans.queries import QUERIES

    spark = bench._fresh_session("r14-measure")
    out = {}
    for name in args:
        fn = QUERIES[name]
        best = best_cpu = None
        for _ in range(reps):
            c0 = bench._jvm_cpu_sec(spark)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            c1 = bench._jvm_cpu_sec(spark)
            if best is None or dt < best:
                best = dt
                best_cpu = None if c0 is None or c1 is None else c1 - c0
        out[name] = {
            "sec": round(best, 3),
            "cpu_sec": round(best_cpu, 2) if best_cpu is not None else None,
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
