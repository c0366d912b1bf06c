"""Driver-style verification of the gates RETIRED from the battery at
the r15 cycle-boundary swap (sparkdon/relational.py RETIRED tier):
``u2_except`` / ``u3_intersect`` / ``f1_str_cast`` gave up their
battery slots to the staged learned-tier trio, but their pytest
coverage stays — the same row-count / column / order-insensitive
canonical-value compare the driver runs, so a regression in subtract /
intersect / string-cast semantics still fails loudly every session."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

from sparkdon.relational import RETIRED, RETIRED_ORACLE

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


def test_retired_tier_is_exactly_the_r15_swap():
    assert sorted(RETIRED) == ["f1_str_cast", "u2_except", "u3_intersect"]
    assert sorted(RETIRED_ORACLE) == sorted(RETIRED)
    # and none of them still occupies a battery slot
    from sparkdon.relational import QUERIES
    assert not set(RETIRED) & set(QUERIES)


@pytest.mark.parametrize("key", sorted(RETIRED))
def test_retired_gate_still_matches_oracle(spark, key):
    df = RETIRED[key](spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    o_cols, o_rows = _oracle_rows(RETIRED_ORACLE[key])
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) > 0
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)
