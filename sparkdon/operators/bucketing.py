"""Bucketed (pre-shuffled) table layout for co-located joins — the
"repartition/bucketing for co-located joins" leg of the 100 TB design
(SURVEY.md §4.3).

A fact table that is repeatedly joined on the same key (orders ⋈
lineitem on orderkey, a triple store's subject column, a document
corpus's doc_id) pays the join shuffle ONCE at write time:
``bucketBy(n, key)`` hash-partitions rows into a fixed number of
buckets per partition file, and Spark's scan reports the resulting
``HashPartitioning`` to the planner — a join of two tables bucketed on
the same key with the same bucket count needs NO Exchange on either
side (asserted in tests/test_bucketing.py).  ``sortBy`` additionally
pre-sorts within buckets, removing the Sort below a sort-merge join.

Bucketed tables must live in the session catalog (``saveAsTable``) —
plain ``parquet(path)`` writes lose the bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist ``df`` as a bucketed (and optionally bucket-sorted)
    catalog table.  Joins/aggregations keyed on ``bucket_cols`` against
    other tables bucketed the same way are then exchange-free."""
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed(spark, table: str) -> DataFrame:
    """Read a bucketed catalog table (scan exposes the bucket
    partitioning to the planner)."""
    return spark.table(table)
