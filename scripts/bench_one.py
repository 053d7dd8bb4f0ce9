"""Run a subset of bench entries in isolation (r17 optimization tooling).

Same methodology as bench.py (shared warmup, min-of-N noop-sink runs),
but only for the entries named on the command line, so a single query
can be measured uncontended without paying the full 109-entry sweep.

    python scripts/bench_one.py [-n RUNS] entry [entry ...]

Prints per-entry seconds to stderr and one JSON line to stdout (NOT the
bench contract line -- this tool never writes BENCH_LOCAL.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from rag_vertex_ai_vector_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--runs", type=int, default=2)
    ap.add_argument("--explain", action="store_true",
                    help="also print explain('formatted') for each entry")
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    table = dict(bench.BENCH_QUERIES)
    unknown = [e for e in args.entries if e not in table]
    if unknown:
        sys.exit(f"unknown entries: {unknown}; known: {sorted(table)}")

    spark = get_spark("bench_one")
    sf_dir = bench.SF_DIR
    # The EXACT warmup bench.py runs (shared function since r18, ADVICE
    # r17), so numbers are comparable by construction.
    bench.warmup(spark, sf_dir)

    out: dict[str, object] = {}
    for name in args.entries:
        fn = table[name]
        if args.explain:
            df = fn(spark, sf_dir)
            print(f"== explain {name} ==", file=sys.stderr)
            print(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                ),
                file=sys.stderr,
            )
        runs = []
        for _ in range(args.runs):
            spark.sparkContext.setJobDescription(f"bench_one: {name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        out[name] = round(min(runs), 3)
        print(
            f"# {name}: {out[name]}s (runs: "
            + ", ".join(f"{r:.3f}" for r in runs) + ")",
            file=sys.stderr,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
