"""Driver-style verification of the gates RETIRED from the battery at
the cycle-boundary swaps (sparkdon/relational.py RETIRED tier, r15;
sparkdon/pipeline/_registry.py RETIRED tier, r16+):
``u2_except`` / ``u3_intersect`` / ``f1_str_cast`` gave up their
battery slots to the staged learned-tier trio at r15,
``x_dedup_substring_hashed`` / ``x_embed_norm`` gave up theirs to
``x_trim_spans`` / ``x_soft_dedup`` at r16, and ``x_lm_score`` /
``x_sim_topk`` gave up theirs to ``x_chunk_stride`` /
``x_decontam_embed`` at r17 — but their pytest coverage stays: the
same row-count / column / order-insensitive canonical-value compare
the driver runs, so a regression in any retired gate's semantics
still fails loudly every session."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

from sparkdon.pipeline._registry import RETIRED as P_RETIRED
from sparkdon.pipeline._registry import RETIRED_ORACLE as P_RETIRED_ORACLE
from sparkdon.relational import RETIRED as R_RETIRED
from sparkdon.relational import RETIRED_ORACLE as R_RETIRED_ORACLE

# pipeline gates register at family-module import time; importing the
# package facade runs every family module exactly as the driver does
import sparkdon.pipeline  # noqa: F401

RETIRED = {**R_RETIRED, **P_RETIRED}
RETIRED_ORACLE = {**R_RETIRED_ORACLE, **P_RETIRED_ORACLE}

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows
TABLES = _check.TABLES


def _oracle_rows(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def test_retired_tier_is_exactly_the_r15_through_r17_swaps():
    assert sorted(RETIRED) == [
        "f1_str_cast", "u2_except", "u3_intersect",
        "x_dedup_substring_hashed", "x_embed_norm",
        "x_lm_score", "x_sim_topk"]
    assert sorted(RETIRED_ORACLE) == sorted(RETIRED)
    # and none of them still occupies a battery slot
    from sparkdon.pipeline import QUERIES as PQ
    from sparkdon.relational import QUERIES as RQ
    assert not set(RETIRED) & (set(RQ) | set(PQ))
    # the slots they vacated are occupied by the registered candidates
    assert {"x_trim_spans", "x_soft_dedup",
            "x_decontam_embed", "x_chunk_stride"} <= set(PQ)


@pytest.mark.parametrize("key", sorted(RETIRED))
def test_retired_gate_still_matches_oracle(spark, key):
    df = RETIRED[key](spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    o_cols, o_rows = _oracle_rows(RETIRED_ORACLE[key])
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) > 0
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)
