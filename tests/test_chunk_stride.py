"""Stride-overlap window chunking (r15, pipeline/packing.py
`chunk_windows` / `x_chunk_stride`): the long-context training-window
prep pass — overlapping seq_len windows advancing by stride, exact
token offsets.

UNREGISTERED (zero-slack 150/50/3 cadence): the second r17+ swap
candidate alongside x_decontam_embed.  Driver-style oracle compare at
both gate scales, coverage/overlap invariants, and the plan contract;
the random-corpus battery entry lives in
tests/test_fuzz_pipeline_oracles.py."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.packing import (_CHUNK_STRIDE_ORACLE, CHUNK_SEQ_LEN,
                                       CHUNK_STRIDE, chunk_windows,
                                       x_chunk_stride)

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
def test_chunk_stride_matches_oracle(spark, sf_dir):
    df = x_chunk_stride(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    cur = con.execute(_CHUNK_STRIDE_ORACLE)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) > 0
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_chunk_stride_coverage_and_overlap(spark):
    """Every token of every document lands in ≥1 window; consecutive
    windows of a long doc overlap by exactly seq_len - stride; window
    reassembly at stride offsets reproduces the document text."""
    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens, 5 windows
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted((r["chunk_id"], r["start_tok"], r["n_tok"], r["chunk"])
                  for r in chunk_windows(docs).collect())
    assert [r[0] for r in rows] == [0, 1, 2, 3, 4]  # floor(99/24)+1
    # exact expected geometry: starts advance by stride, the tail
    # windows shorten as the document runs out
    assert [(r[1], r[2]) for r in rows] == [
        (0, 32), (24, 32), (48, 32), (72, 28), (96, 4)]
    # coverage: stitching the first `stride` tokens of every window
    # (all of the last) reproduces the document byte-for-byte
    stitched = []
    for idx, (_, _, _, chunk) in enumerate(rows):
        toks = chunk.split(" ")
        stitched.extend(toks if idx == len(rows) - 1
                        else toks[:CHUNK_STRIDE])
    assert " ".join(stitched) == text
    # overlap: window i's tail == window i+1's head, seq_len - stride wide
    full = [r[3].split(" ") for r in rows if r[2] == CHUNK_SEQ_LEN]
    for a, b in zip(full, full[1:]):
        assert a[CHUNK_STRIDE:] == b[:CHUNK_SEQ_LEN - CHUNK_STRIDE]


def test_chunk_stride_short_null_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "just three tokens"), (2, None), (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in chunk_windows(docs).collect()}
    # short doc: exactly one whole-doc window
    assert rows[1]["chunk_id"] == 0 and rows[1]["n_tok"] == 3
    assert rows[1]["chunk"] == "just three tokens"
    # null text: no windows (documented; the oracle's WHERE matches)
    assert 2 not in rows
    # empty text: split('') is [''] — one 1-token window of the empty
    # token, byte-identical to the oracle's string_split behavior
    assert rows[3]["n_tok"] == 1 and rows[3]["chunk"] == ""


def test_chunk_stride_plan_contract(spark):
    """Zero shuffles: tokenize-once projection + one explode, no
    Exchange anywhere (the scan's partitioning is the output's).
    An r17 spread_narrow_scan in the gate wrapper was measured-REVERTED
    (numbers in the gate docstring), so the gate itself stays
    exchange-free."""
    df = x_chunk_stride(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate explode" in plan
