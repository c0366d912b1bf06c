"""Optimization-round probe: for each named query, dump the formatted
plan to plans/r17/<name>_<tag>.txt, run warm-up + timed noop-sink runs
(bench.py's exact action), and report wall seconds plus Spark job/stage
counts so time can be attributed to plan shape (many tiny sequential
stages) vs data volume.

Usage: python scripts/opt_probe.py <tag> [name ...]
  tag   suffix for the plan files ("before" / "after" / scratch tags)
  name  query names; default = the heavy tier from the r15/r16 bench

Prints one JSON line per query:
  {"name": ..., "sec": min_wall, "runs": [...], "jobs": n, "stages": n}
Plan files go to plans/r17/ only for tag "before"/"after"; scratch tags
dump to /tmp/plans_r17/.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "x_pagerank", "x_dedup_embed", "x_sim_ivfpq", "x_semantic_dedup",
    "x_dedup_substring", "x_trim_spans", "x_dedup_clusters",
    "x_dedup_embed_strict", "x_pq_trained", "x_embed_gram", "x_sim_ivf",
    "x_sim_pq", "x_fasttext_score", "sparql_service", "x_dedup_minhash",
    "x_cross_dedup", "x_soft_dedup", "x_lm_bigram", "x_cms_heavy_hitters",
    "x_cooccur_pmi", "x_sim_lsh_refined",
]

N_RUNS = 3


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "probe"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    plans_dir = (os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r17")
        if tag in ("before", "after") else "/tmp/plans_r17")
    os.makedirs(plans_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("opt-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # codegen warm-up
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    for name in names:
        if name not in qs:
            print(json.dumps({"name": name, "error": "unknown"}))
            continue
        from sparkdon.pipeline import _COMPONENTS_MEMO

        def build():
            _COMPONENTS_MEMO.clear()
            # drop any persisted frame from a previous run of the same
            # query (x_pagerank's partitioned edge cache) — mirror of
            # bench.py's pre_run honesty reset
            spark.catalog.clearCache()
            return qs[name](spark, sf_dir)

        # plan dump (fresh build so memo state doesn't change the plan)
        df = build()
        plan_txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan_txt)

        runs = []
        jobs_n = stages_n = 0
        for i in range(N_RUNS):
            # bench.py times build+materialize together (the lambda calls
            # qs[n] inside the timed fn), so eager build work (collects,
            # checkpoints, k-means training) is part of the measurement.
            sc.setJobGroup(f"probe-{name}-{i}", name)
            t0 = time.time()
            df = build()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            jids = tracker.getJobIdsForGroup(f"probe-{name}-{i}")
            jobs_n = len(jids)
            stages_n = 0
            for j in jids:
                ji = tracker.getJobInfo(j)
                if ji:
                    stages_n += len(ji.stageIds)
            sc.setJobGroup("", "")
        print(json.dumps({
            "name": name, "sec": min(runs), "runs": runs,
            "jobs": jobs_n, "stages": stages_n,
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
