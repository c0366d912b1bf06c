"""Measure bytes shuffled by a query plain vs ``use_ids`` (the id-encoded
join-variable mode) via the Spark UI REST API — evidence for the
shuffle-byte claim in PERF.md that wall-clock timings at local scale
cannot show (the id win is bandwidth, which local[32] has in excess).

Shuffle WRITE bytes are deterministic properties of the plan + data
(unlike wall time), so this measurement is contention-proof.

Usage: python scripts/shuffle_bytes.py [sf_dir] [query ...]
Set SHUFFLE_RAW=1 to disable shuffle compression (raw-byte comparison —
the PERF.md table reports both: raw shows the mechanism, LZ4 shows the
wire reality on this synthetic corpus).
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_metrics(ui_url: str, app_id: str) -> tuple[int, int]:
    """(shuffle_write_bytes, input_bytes) summed over all completed stages."""
    with urllib.request.urlopen(f"{ui_url}/api/v1/applications/{app_id}/stages") as r:
        stages = json.loads(r.read())
    write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    inp = sum(s.get("inputBytes", 0) for s in stages)
    return write, inp


QUERIES = {
    # join-only vars id-encoded (use_ids v2): the original measurement
    "sparql_join_agg": (
        "SELECT ?nation (COUNT(*) AS ?cnt) { "
        " ?c a c:customer . ?c p:c_nationkey ?n . ?n p:n_name ?nation } "
        "GROUP BY ?nation",
        {"nation": "str", "cnt": "long"},
    ),
    # PROJECTED vars late-materialized (use_ids v3): ?cust and ?rname
    # cross the whole 5-join chain as longs and decode at the end — the
    # case v2 could not touch because the values are observable
    "sparql_late_ids": (
        "SELECT ?cust ?rname { ?c p:c_name ?cust . ?c p:c_nationkey ?n . "
        " ?n p:n_regionkey ?r . ?r p:r_name ?rname . ?c p:c_acctbal ?bal . "
        " FILTER(?bal > 9000) }",
        {"cust": "str", "rname": "str"},
    ),
}


def _session(mode: str):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName(f"shuffle-bytes-{mode}")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4099")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.shuffle.compress",
                "false" if os.environ.get("SHUFFLE_RAW") else "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def measure_closure(sf_dir: str, gate: str = "sparql_path_plus") -> None:
    """A/B the recursive-closure tier: ``paths.CLOSURE_IDS`` off (term
    structs shuffle every BFS level) vs on (16-byte long pairs shuffle,
    one decode join at the edge).  Round-10 evidence row for PERF.md."""
    from sparkdon import paths
    from sparkdon import rdf_queries

    results = {}
    default_min = paths.CLOSURE_IDS_MIN_STEP
    for mode, flag in (("structs", False), ("ids", True)):
        paths.CLOSURE_IDS = flag
        # force the representation regardless of the cost-based size
        # gate — the A/B measures the mechanism, not the planner choice
        paths.CLOSURE_IDS_MIN_STEP = 0 if flag else default_min
        spark = _session(f"closure-{mode}")
        n = rdf_queries.QUERIES[gate](spark, sf_dir).count()
        write, inp = stage_metrics(spark.sparkContext.uiWebUrl,
                                   spark.sparkContext.applicationId)
        results[mode] = {"rows": n, "shuffle_write_bytes": write,
                         "input_bytes": inp}
        spark.stop()
    paths.CLOSURE_IDS = True
    paths.CLOSURE_IDS_MIN_STEP = default_min
    ratio = (results["structs"]["shuffle_write_bytes"]
             / max(1, results["ids"]["shuffle_write_bytes"]))
    print(json.dumps({"sf_dir": sf_dir, "query": gate + " [closure A/B]",
                      "structs": results["structs"], "ids": results["ids"],
                      "shuffle_write_ratio": round(ratio, 2)}))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(QUERIES)
    if names and names[0] == "closure":
        for gate in names[1:] or ["sparql_path_plus"]:
            measure_closure(sf_dir, gate)
        return

    from sparkdon.rdf_queries import run

    for name in names:
        sparql, schema = QUERIES[name]
        results = {}
        for mode, use_ids in (("plain", False), ("use_ids", True)):
            spark = (
                SparkSession.builder.master("local[8]")
                .appName(f"shuffle-bytes-{mode}")
                .config("spark.sql.shuffle.partitions", "8")
                .config("spark.sql.session.timeZone", "UTC")
                .config("spark.ui.enabled", "true")
                .config("spark.ui.port", "4099")
                # isolate the measurement: no broadcast short-circuit (a
                # broadcast join would hide the shuffle we want to compare),
                # no AQE re-plan moving bytes between stages
                .config("spark.sql.autoBroadcastJoinThreshold", "-1")
                .config("spark.sql.adaptive.enabled", "false")
                .config("spark.shuffle.compress",
                        "false" if os.environ.get("SHUFFLE_RAW") else "true")
                .getOrCreate()
            )
            spark.sparkContext.setLogLevel("ERROR")
            n = run(spark, sf_dir, sparql, schema, use_ids=use_ids).count()
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            write, inp = stage_metrics(ui, app)
            results[mode] = {"rows": n, "shuffle_write_bytes": write,
                             "input_bytes": inp}
            spark.stop()

        ratio = (results["plain"]["shuffle_write_bytes"]
                 / max(1, results["use_ids"]["shuffle_write_bytes"]))
        print(json.dumps({"sf_dir": sf_dir, "query": name,
                          "plain": results["plain"],
                          "use_ids": results["use_ids"],
                          "shuffle_write_ratio": round(ratio, 2)}))


if __name__ == "__main__":
    main()
