"""Skew-aware aggregation and joins (SURVEY.md §4 scale notes; the
"salting for skew" requirement of the 100 TB design).

Hot keys (a predicate holding 30% of a web-scale graph, a bot user_id
holding half the events) overload single reducers in a plain
``groupBy(key)``.  Two mitigations, both pure DataFrame:

- :func:`salted_agg` — two-phase aggregation: group by (key, salt) with a
  random-but-deterministic salt derived from row content, partially
  aggregate, then re-group by key to merge partials.  Works for any
  algebraic aggregate (count/sum/min/max).  AQE's skew handling covers
  sort-merge JOINS automatically; aggregations still need this.
- :func:`salted_broadcast_left` — replicate a small skewed-key side
  across salt values for joins that cannot broadcast outright.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key_cols: list[str], aggs: dict[str, tuple],
               salt_buckets: int = 32, salt_on: str | None = None) -> DataFrame:
    """Two-phase (salted) aggregation.

    aggs: output column -> (agg_name, input column) with agg_name in
    {'count', 'sum', 'min', 'max'} — the algebraic aggregates whose
    partials merge with themselves (count partials merge via sum).

    The salt is ``pmod(hash(salt_on or whole row), salt_buckets)`` —
    deterministic, so results are reproducible; it only spreads a hot
    key's rows across ``salt_buckets`` reducers.
    """
    merge_fn = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    first_fn = {"count": F.count, "sum": F.sum,
                "min": F.min, "max": F.max}
    for name, (kind, _) in aggs.items():
        if kind not in merge_fn:
            raise ValueError(f"{kind} is not algebraic; cannot salt {name}")

    salt_src: Column = F.col(salt_on) if salt_on else F.concat_ws(
        "\x00", *[F.col(c).cast("string") for c in df.columns])
    salted = df.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(salt_buckets)))

    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[first_fn[kind](col).alias(f"__p_{name}")
          for name, (kind, col) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[merge_fn[kind](f"__p_{name}").alias(name)
          for name, (kind, _) in aggs.items()]
    )


def salted_broadcast_left(small: DataFrame, salt_buckets: int = 32) -> DataFrame:
    """Replicate a small DataFrame once per salt value (join the result
    against a salted big side on key+__salt to spread a hot key)."""
    salts = small.sparkSession.range(salt_buckets).select(
        F.col("id").cast("int").alias("__salt"))
    return small.crossJoin(F.broadcast(salts))
