"""Multi-seed sweep of the random differential battery (round 14).

The pytest battery (tests/test_fuzz_pipeline_oracles.py) pins one seed
so CI is stable — which means each round certifies ONE random corpus.
This sweep regenerates the documents corpus for N fresh seeds and runs
the same driver-style compare (Spark gate ≡ DuckDB oracle) for the
documents gates, the r16-registered x_trim_spans/x_soft_dedup (listed
explicitly — they predate their registration here), and the staged
gates on every one of them.  Any failure prints the seed so the shape
can be frozen into the pytest battery as a regression.

Usage: python scripts/seed_sweep.py [n_seeds] [base_seed] [tier]
  tier: "docs" (default — documents gates + x_trim_spans/x_soft_dedup
        (battery-registered at the r16 swap) + staged),
        "tpch" (the full relational + SPARQL engine battery on a fresh
        random TPC-H instance per seed, the r13 shape that caught two
        oracle bugs),
        "tpch-nulls" (same, with NULL c_acctbal on ~15% of customers —
        the null → no-triple → unbound chain vs SQL NULL), or
        "tables" (embeddings + events gates plus the unregistered
        x_decontam_embed candidate on fresh random tables — zero
        vectors, duplicate timestamps, malformed props JSON).
Prints one JSON line: {"n_seeds": N, "base": B, "failures": [...]}.
"""

from __future__ import annotations

import importlib.util
import json
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    "fuzz_battery",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tests", "test_fuzz_pipeline_oracles.py"))
_fuzz = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_fuzz)


def _random_events(rng):
    """Same shape as the pytest battery's rand_tables_dir events (that
    generator lives inside a fixture, so the sweep carries its own
    copy): duplicate timestamps, constant-value runs, malformed /
    fractional / overflowing props JSON."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    evs = []
    for i in range(400):
        user = rng.randrange(25)
        if rng.random() < 0.2 and evs:
            ts = evs[-1][1]
        else:
            ts = t0 + datetime.timedelta(seconds=rng.randrange(86400 * 3))
        val = rng.choice([0.0, 1.0, 1.0, -5.5, rng.uniform(-100, 100)])
        props = rng.choice(
            [f'{{"k": {rng.randrange(100)}}}', "{}", "not json", "",
             '{"k": 1.5}', '{"k": "7"}',
             '{"k": 99999999999999999999}'])
        evs.append((i, ts, user,
                    rng.choice(["click", "view", "purchase", "error",
                                "signup"]),
                    val, props))
    return evs


_EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")


def _random_embeddings(rng, dim: int = 64):
    """Same edge shapes as the pytest battery's embeddings: a zero
    vector, exact duplicates, near-zero magnitudes."""
    vecs = []
    for i in range(120):
        kind = rng.random()
        if kind < 0.04:
            v = [0.0] * dim
        elif kind < 0.12 and vecs:
            v = list(vecs[rng.randrange(len(vecs))][1])
        elif kind < 0.2:
            v = [rng.uniform(-1e-4, 1e-4) for _ in range(dim)]
        else:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        vecs.append((i, v, rng.randrange(4)))
    return vecs


_EMBED_SCHEMA = "vec_id long, embedding array<float>, label int"


def main() -> None:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    base = int(sys.argv[2]) if len(sys.argv) > 2 else 777_000
    tier = sys.argv[3] if len(sys.argv) > 3 else "docs"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("seed-sweep")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sparkdon.pipeline.clusters import _SOFT_DEDUP_ORACLE, x_soft_dedup
    from sparkdon.pipeline.dedup import _TRIM_ORACLE, x_trim_spans
    from sparkdon.pipeline.packing import (_CHUNK_STRIDE_ORACLE,
                                           x_chunk_stride)
    from sparkdon.pipeline.sampling import (_DSIR_ORACLE,
                                            _KEEP_TOP_APPROX_ORACLE,
                                            x_dsir_weights,
                                            x_keep_top_approx)
    from sparkdon.pipeline.staged_gates import STAGED, STAGED_ORACLE

    from sparkdon.pipeline.text import _HLL_UNION_ORACLE, x_hll_union

    pairs = (_fuzz._pipeline_pairs(_fuzz.GATES)
             + [("x_trim_spans", x_trim_spans, _TRIM_ORACLE),
                ("x_soft_dedup", x_soft_dedup, _SOFT_DEDUP_ORACLE),
                ("x_chunk_stride", x_chunk_stride, _CHUNK_STRIDE_ORACLE),
                ("x_dsir_weights", x_dsir_weights, _DSIR_ORACLE),
                ("x_keep_top_approx", x_keep_top_approx,
                 _KEEP_TOP_APPROX_ORACLE),
                ("x_hll_union", x_hll_union, _HLL_UNION_ORACLE)]
             + [(k, STAGED[k], STAGED_ORACLE[k]) for k in sorted(STAGED)])

    if tier in ("tpch", "tpch-nulls"):
        pairs = _fuzz._engine_pairs()
    elif tier == "tables":
        from sparkdon.pipeline.ann import _DECONTAM_ORACLE, x_decontam_embed

        pairs = (_fuzz._pipeline_pairs(_fuzz.EMBED_GATES
                                       + _fuzz.EVENT_GATES)
                 + [("x_decontam_embed", x_decontam_embed,
                     _DECONTAM_ORACLE)])

    all_failures = []
    for i in range(n_seeds):
        seed = base + i
        d = tempfile.mkdtemp(prefix=f"seedsweep_{seed}_")
        try:
            rng = random.Random(seed)
            (spark.createDataFrame(_fuzz._random_docs(rng),
                                   _fuzz._DOCS_SCHEMA)
             .repartition(3)
             .write.mode("overwrite")
             .parquet(os.path.join(d, "documents.parquet")))
            views = ["documents"]
            if tier == "tables":
                (spark.createDataFrame(_random_embeddings(rng),
                                       _EMBED_SCHEMA)
                 .repartition(3)
                 .write.mode("overwrite")
                 .parquet(os.path.join(d, "embeddings.parquet")))
                (spark.createDataFrame(_random_events(rng), _EVENTS_SCHEMA)
                 .repartition(3)
                 .write.mode("overwrite")
                 .parquet(os.path.join(d, "events.parquet")))
                views = ["embeddings", "events"]
            elif tier in ("tpch", "tpch-nulls"):
                tables = _fuzz._random_tpch(rng)
                if tier == "tpch-nulls":
                    cust, schema = tables["customer"]
                    cust = [(k, n, nk,
                             (None if rng.random() < 0.15 else bal), seg)
                            for k, n, nk, bal, seg in cust]
                    tables["customer"] = (cust, schema)
                for name, (rows, schema) in tables.items():
                    (spark.createDataFrame(rows, schema).repartition(2)
                     .write.mode("overwrite")
                     .parquet(os.path.join(d, f"{name}.parquet")))
                (spark.createDataFrame(_random_events(rng), _EVENTS_SCHEMA)
                 .repartition(3)
                 .write.mode("overwrite")
                 .parquet(os.path.join(d, "events.parquet")))
                views = list(_fuzz.TPCH_TABLES)
            fails = _fuzz._compare(spark, d, views, pairs)
            for f in fails:
                all_failures.append({"seed": seed, "fail": [str(x) for x in f]})
            print(f"seed {seed}: {len(pairs) - len(fails)} ok, "
                  f"{len(fails)} fail", file=sys.stderr)
        finally:
            shutil.rmtree(d, ignore_errors=True)

    print(json.dumps({"n_seeds": n_seeds, "base": base,
                      "n_pairs": len(pairs), "failures": all_failures}))
    spark.stop()


if __name__ == "__main__":
    main()
