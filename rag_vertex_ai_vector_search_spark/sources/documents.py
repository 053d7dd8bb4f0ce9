"""Document-corpus source: directory scan -> (filename, content) rows.

Re-expresses the reference's ``load_md_files``
(vector_store/setup_vector_search.py:188-216): list a directory, keep
``*.md`` files (:195), read each wholly as UTF-8, error on a missing
directory or an empty result (:208-209).

Spark-first: ``text`` source with ``wholetext`` so one file = one row,
``pathGlobFilter`` so the suffix predicate is applied inside the file
listing (never reads non-matching files -- the pushed-down form of the
reference's suffix filter), and ``input_file_name()`` for the filename
column. At 100 TB this scan parallelizes by file across executors; no
driver-side listing loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class EmptyCorpusError(ValueError):
    """No documents matched -- reference raises ValueError
    (setup_vector_search.py:208-209)."""


def scan_document_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.md",
    check_non_empty: bool = True,
) -> DataFrame:
    """Scan a directory of text documents into (filename, content).

    ``filename`` is the base name (the reference stores
    ``os.path.basename``-style names, setup_vector_search.py:199-204).
    """
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select(
            F.element_at(F.split(F.input_file_name(), "/"), -1).alias("filename"),
            F.col("value").alias("content"),
        )
    )
    if check_non_empty and df.isEmpty():
        raise EmptyCorpusError(f"no documents matching {glob!r} under {path}")
    return df
