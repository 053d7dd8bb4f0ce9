"""Measure RocksDBStateStoreProvider vs the default HDFS-backed state
store on the two state-store-I/O-bound streaming gates (VERDICT r14
#2): streaming_sessionize_stateful (applyInPandasWithState) and
streaming_dedup_exact_suppression (dropDuplicatesWithinWatermark).

Protocol (the repo's measure-twice rule): each (gate, provider) cell
runs N times on a fresh gate invocation (fresh checkpoints/queries per
call by construction); emitted row-sets must be BIT-EQUAL across
providers; report per-cell min + all samples as one JSON line.

Usage: python scripts/rocksdb_eval.py [runs_per_cell]
"""

import json
import sys
import time

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
HDFS = (
    "org.apache.spark.sql.execution.streaming.state."
    "HDFSBackedStateStoreProvider"
)
GATES = (
    "streaming_sessionize_stateful",
    "streaming_dedup_exact_suppression",
)
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from pyspark.sql import SparkSession

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as m

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = {**m.queries_archive(), **m.queries()}

    out = {}
    rows_by = {}
    for gate in GATES:
        out[gate] = {}
        for label, provider in (("hdfs", HDFS), ("rocksdb", ROCKSDB)):
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", provider
            )
            times = []
            for _ in range(runs):
                t0 = time.perf_counter()
                df = queries[gate](spark, SF_DIR)
                rows = sorted(tuple(r) for r in df.collect())
                times.append(round(time.perf_counter() - t0, 3))
                rows_by.setdefault(gate, {})[label] = rows
            out[gate][label] = {"min": min(times), "runs": times}
        equal = rows_by[gate]["hdfs"] == rows_by[gate]["rocksdb"]
        out[gate]["bit_equal"] = equal
        out[gate]["n_rows"] = len(rows_by[gate]["hdfs"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
