"""Dump .explain('formatted') for named bench/declared queries to
plans/<round>/<name>_<tag>.txt (r17 optimization evidence).

    python scripts/dump_plans.py <tag> <name> [name ...]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from rag_vertex_ai_vector_search_spark.session import get_spark  # noqa: E402

ROUND = os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r17")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    table = dict(bench.BENCH_QUERIES)
    spark = get_spark("dump_plans")
    outdir = os.path.join(REPO, "plans", ROUND)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = table[name](spark, bench.SF_DIR)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
