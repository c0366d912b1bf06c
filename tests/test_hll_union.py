"""HLL sketch union (r15, pipeline/text.py `x_hll_union`): register-MAX
mergeability across sources, gated against both the direct whole-corpus
sketch (must be EXACTLY equal) and the exact distinct count.

UNREGISTERED (zero-slack 150/50/3 cadence): an r18+ swap candidate.
Driver-style oracle compare at both gate scales plus the merge-algebra
properties; the random-corpus battery entry lives in
tests/test_fuzz_pipeline_oracles.py."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.text import (_HLL_UNION_ORACLE, hll_estimate,
                                    hll_from_registers, hll_registers,
                                    x_hll_union)

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_hll_union_matches_oracle(spark, sf_dir):
    df = x_hll_union(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    cur = con.execute(_HLL_UNION_ORACLE)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) == 1
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_hll_union_merge_equals_direct_at_harmonic_range(spark):
    """The merge-consistency identity on a cardinality (5k) that lands
    in the raw harmonic branch, split across 7 skewed 'sources': max
    over per-source registers == registers of the union, so the merged
    estimate equals the direct estimate EXACTLY (same doubles, same
    branch), and both sit within the ~3σ HLL-256 error of the truth."""
    n = 5000
    df = (spark.range(n)
          .select((F.col("id") % 7).cast("string").alias("source"),
                  F.concat(F.lit("item"), F.col("id")).alias("item")))
    per_src = hll_registers(df, "source")
    merged = hll_from_registers(
        per_src.groupBy("j").agg(F.max("mj").alias("mj"))
        .select(F.lit(0).alias("g"), "j", "mj"), "g").collect()[0]["e"]
    direct = hll_estimate(
        df.select(F.lit(0).alias("g"), "item"), "g").collect()[0]["e"]
    assert merged == direct  # bit-exact, not approximately
    assert abs(merged - n) / n < 3 * 1.04 / (256 ** 0.5)


def test_hll_union_overlapping_sources_no_double_count(spark):
    """Sketch union is a SET union: an item present in every source
    contributes once — 3 sources sharing one 400-item universe
    estimate ~400, not ~1200."""
    df = (spark.range(1200)
          .select((F.col("id") % 3).cast("string").alias("source"),
                  F.concat(F.lit("i"), (F.col("id") % 400)).alias("item")))
    per_src = hll_registers(df, "source")
    merged = hll_from_registers(
        per_src.groupBy("j").agg(F.max("mj").alias("mj"))
        .select(F.lit(0).alias("g"), "j", "mj"), "g").collect()[0]["e"]
    assert abs(merged - 400) / 400 < 3 * 1.04 / (256 ** 0.5)
