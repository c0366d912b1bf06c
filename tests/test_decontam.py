"""Semantic decontamination (r15, pipeline/ann.py `decontam_semantic` /
`x_decontam_embed`): embedding-space test-set leakage flagging — the
paraphrase-robust counterpart of the n-gram `x_contamination` gate.

UNREGISTERED (zero-slack 150/50/3 cadence): an r17+ swap candidate.
Per the standing gate-admission rule this file carries the driver-style
oracle compare at BOTH gate scales plus planted semantics and the plan
contract; the random-corpus battery entry lives in
tests/test_fuzz_pipeline_oracles.py."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.ann import (_DECONTAM_ORACLE, DECONTAM_SIM_SCALED,
                                   decontam_semantic, x_decontam_embed)

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_decontam_matches_oracle(spark, sf_dir):
    df = x_decontam_embed(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW embeddings AS SELECT * FROM "
                f"'{sf_dir}/embeddings.parquet'")
    cur = con.execute(_DECONTAM_ORACLE)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) > 0
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_decontam_flags_are_nontrivial_at_gate_scale(spark):
    """DECONTAM_BENCH_MOD is chosen so planted near-dups cross the
    bench/corpus split: the flag column must be exercised (some true,
    not all true) at the driver's sf0.01 gate scale."""
    df = x_decontam_embed(spark, "/root/testdata/sf0.01")
    n_contam = df.filter("contaminated").count()
    assert 0 < n_contam < df.count()


def test_decontam_planted_semantics(spark):
    """Constructed frames: an exact copy of a benchmark vector is
    contaminated, an orthogonal vector is not, a zero vector yields
    NULL max-sim and contaminated=false, and an empty benchmark leaves
    every corpus row uncontaminated (left join, never empty-out)."""
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "bench_id long, bv array<double>")
    corpus = spark.createDataFrame(
        [(1, [2.0, 0.0, 0.0]),     # parallel: cos = 1.0
         (2, [0.0, 1.0, 0.0]),     # orthogonal: cos = 0
         (3, [0.0, 0.0, 0.0])],    # zero vector: NULL cosine
        "vec_id long, v array<double>")
    got = {r["vec_id"]: r for r in decontam_semantic(corpus, bench).collect()}
    assert got[1]["contaminated"] and got[1]["max_sim_scaled"] == 1_000_000
    assert not got[2]["contaminated"] and got[2]["max_sim_scaled"] == 0
    assert not got[3]["contaminated"] and got[3]["max_sim_scaled"] is None

    empty_bench = bench.limit(0)
    out = decontam_semantic(corpus, empty_bench).collect()
    assert len(out) == 3 and not any(r["contaminated"] for r in out)
    assert all(r["max_sim_scaled"] is None for r in out)


def test_decontam_threshold_boundary(spark):
    """A vector exactly AT the scaled bar is contaminated (>=); one
    grid step below is not — the integer-scaled compare has no float
    ambiguity."""
    import math

    # cos(theta) = DECONTAM_SIM_SCALED/1e6 exactly at the bar
    c = DECONTAM_SIM_SCALED / 1e6
    s = math.sqrt(1 - c * c)
    bench = spark.createDataFrame(
        [(0, [1.0, 0.0])], "bench_id long, bv array<double>")
    corpus = spark.createDataFrame(
        [(1, [c, s])], "vec_id long, v array<double>")
    row = decontam_semantic(corpus, bench).collect()[0]
    # unit vectors: floor(1e6*cos) is within one grid step of the bar
    assert abs(row["max_sim_scaled"] - DECONTAM_SIM_SCALED) <= 1
    assert row["contaminated"] == (
        row["max_sim_scaled"] >= DECONTAM_SIM_SCALED)


def test_decontam_plan_contract(spark):
    """The 100 TB contract from the docstring, read off the plan: the
    benchmark side broadcasts (no corpus-sized shuffle for the join)
    and the vec_id max carries a map-side partial aggregate; the only
    HASH exchange is the vec_id max's.  The r17 spread of the
    under-split fixture corpus scan adds at most one round-robin
    exchange (spread_narrow_scan — a no-op at corpus scale)."""
    df = x_decontam_embed(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    rr = plan.count("Exchange RoundRobinPartitioning")
    assert rr <= 1
    assert plan.count("Exchange") - plan.count("BroadcastExchange") - rr == 1
    assert "partial_max" in plan


def test_contaminated_stream_matches_batch_twin(spark, tmp_path):
    """The streaming semi-join twin flags EXACTLY the vec_ids the batch
    decontam_semantic flags — run the sf0.01 embeddings through a real
    file stream (2 files, availableNow) against the same mod-29 bench."""
    from sparkdon.pipeline.ann import DECONTAM_BENCH_MOD
    from sparkdon.streaming.neardup import contaminated_stream
    from sparkdon.streaming.windows import run_to_memory

    def vecs(df):
        return df.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("v"))

    base = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    bench = (vecs(base)
             .filter(F.col("vec_id") % DECONTAM_BENCH_MOD == 0)
             .select(F.col("vec_id").alias("bench_id"),
                     F.col("v").alias("bv"))
             .localCheckpoint(eager=True))
    corpus = base.filter(F.col("vec_id") % DECONTAM_BENCH_MOD != 0)

    land = tmp_path / "vecs"
    corpus.repartition(2).write.parquet(str(land))
    stream = (spark.readStream.schema(corpus.schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(land)))
    flagged = contaminated_stream(vecs(stream), bench)
    run_to_memory(flagged, "decontam_stream_test", output_mode="append")
    got = {r.vec_id for r in
           spark.sql("SELECT * FROM decontam_stream_test").collect()}

    expect = {r.vec_id for r in
              decontam_semantic(vecs(corpus), bench)
              .filter("contaminated").collect()}
    assert got == expect and expect  # non-trivial at sf0.01 (2 flags)
