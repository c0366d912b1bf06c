"""Planted-hot-key skew probe (round 10, VERDICT r9 item 3).

The round-9 rewrite of the chunk/substring keep rule replaced a
``row_number() OVER (PARTITION BY chunk ...)`` window with a chunk-keyed
aggregate joined back to the occurrences, arguing: a window partition
must be co-resident on ONE task (AQE cannot split window partitions),
while the join-back is an equi-join AQE's skew-join CAN split.  This
probe converts that argument into measurement.

Fixture: one "license header" chunk planted HOT_N times (the 100 TB
boilerplate pathology, scaled to probe size) over a uniform background
of BG_N unique chunks.  Both shapes compute the identical keep rule
(global first occurrence per chunk); we record

- wall time,
- per-task duration quantiles (p50 / max) of the heaviest stage, via the
  Spark UI REST API — the straggler signature is max >> p50,
- whether the executed (AQE-final) plan contains a skew-split join
  (``skew=true``).

AQE skew thresholds are lowered to model-scale values (the planted key
is ~200 MB of shuffle at 100 TB scale but only ~100s of MB here); the
window form gets the same configs — there is simply no skew rule that
applies to window exchanges.

Usage: python scripts/skew_probe.py [hot_n] [bg_n]
Prints one JSON line per shape.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HOT_CHUNK = ("permission is hereby granted free of charge to any person "
             "obtaining a copy of this software")


def planted(spark, hot_n: int, bg_n: int):
    from pyspark.sql import functions as F

    hot = spark.range(hot_n).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("ci"),
        F.lit(HOT_CHUNK).alias("chunk"))
    bg = spark.range(bg_n).select(
        (F.col("id") + hot_n).alias("doc_id"), F.lit(1).alias("ci"),
        F.concat(F.lit("unique background chunk number "),
                 F.col("id").cast("string"),
                 F.lit(" with enough words to match width")).alias("chunk"))
    return hot.unionByName(bg).repartition(32).localCheckpoint(eager=True)


def keep_window(ch):
    """The pre-r9 shape: global first-occurrence via a window."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("chunk").orderBy("doc_id", "ci")
    return (ch.withColumn("rn", F.row_number().over(w))
            .withColumn("is_first", (F.col("rn") == 1).cast("int"))
            .groupBy().agg(F.sum("is_first").alias("n_kept"),
                           F.count(F.lit(1)).alias("n")))


def keep_agg_join(ch):
    """The r9 shape: chunk-keyed aggregate + plain equi-join back."""
    from pyspark.sql import functions as F

    first = ch.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "ci")).alias("first_occ"))
    k = ch.join(first, "chunk").withColumn(
        "is_first",
        (F.col("first_occ") == F.struct("doc_id", "ci")).cast("int"))
    return k.groupBy().agg(F.sum("is_first").alias("n_kept"),
                           F.count(F.lit(1)).alias("n"))


def keep_hot_lane(ch):
    """The r10 production shape: `_join_back_skew_robust` — hot keys
    through a broadcast lane, cold keys through a skew-free shuffle."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.dedup import _join_back_skew_robust

    first = ch.groupBy("chunk").agg(
        F.min(F.struct("doc_id", "ci")).alias("first_occ"),
        F.count(F.lit(1)).alias("cnt"))
    k = _join_back_skew_robust(ch, first, "chunk").withColumn(
        "is_first",
        (F.col("first_occ") == F.struct("doc_id", "ci")).cast("int"))
    return k.groupBy().agg(F.sum("is_first").alias("n_kept"),
                           F.count(F.lit(1)).alias("n"))


def task_quantiles(ui: str, app: str):
    """(stage_name, p50_ms, max_ms) for the stage with the largest max
    task duration — the straggler, if any."""
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.loads(r.read())
    worst = (None, 0.0, 0.0)
    for s in stages:
        sid, att = s["stageId"], s["attemptId"]
        try:
            with urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{sid}/{att}/"
                    f"taskSummary?quantiles=0.5,1.0") as r:
                q = json.loads(r.read())
        except Exception:
            continue
        p50, mx = q["duration"][0], q["duration"][1]
        if mx > worst[2]:
            worst = (f"stage {sid}", p50, mx)
    return worst


def main() -> None:
    hot_n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    bg_n = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000

    from pyspark.sql import SparkSession

    for shape, fn in (("window", keep_window), ("agg_join", keep_agg_join),
                      ("hot_lane", keep_hot_lane)):
        spark = (
            SparkSession.builder.master("local[8]")
            .appName(f"skew-probe-{shape}")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4098")
            .config("spark.driver.memory", "16g")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            # model-scale thresholds: the planted key is ~the whole hot
            # partition; at 100 TB the defaults (256 MB) trigger on their
            # own — here the partition is ~10s of MB, so scale the bar
            .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
            .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
            .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
            .config("spark.sql.autoBroadcastJoinThreshold", "-1")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        ch = planted(spark, hot_n, bg_n)
        out = fn(ch)
        t0 = time.time()
        row = out.collect()[0]
        dt = time.time() - t0
        plan = out._jdf.queryExecution().executedPlan().toString()
        stage, p50, mx = task_quantiles(spark.sparkContext.uiWebUrl,
                                        spark.sparkContext.applicationId)
        print(json.dumps({
            "shape": shape, "hot_n": hot_n, "bg_n": bg_n,
            "n_kept": row["n_kept"], "n": row["n"],
            "wall_s": round(dt, 2),
            "straggler_stage": stage,
            "task_p50_ms": p50, "task_max_ms": mx,
            "max_over_p50": round(mx / max(p50, 1.0), 1),
            "skew_split_in_plan": "skew=true" in plan,
            "broadcast_in_plan": "BroadcastHashJoin" in plan,
        }))
        spark.stop()


if __name__ == "__main__":
    main()
