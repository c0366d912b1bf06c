"""trim_duplicated_spans — the ExactSubstr span-trim endgame (r14,
VERDICT r13 #5): x_dedup_substring measures duplicated-span coverage,
this applies the trim.  Byte-for-byte reassembly is asserted against
the DuckDB oracle (driver-style compare) on the sf0.001 fixture here
and on the random corpus in test_fuzz_pipeline_oracles.py; the 10×
probe row lives in PERF.md."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkdon.pipeline.dedup import (  # noqa: E402
    _TRIM_ORACLE,
    SUBSTR_L,
    trim_duplicated_spans,
    x_trim_spans,
)

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


PASSAGE = "one two three four five six seven eight"  # exactly SUBSTR_L


def test_second_occurrence_is_trimmed_first_survives(spark):
    a = f"alpha {PASSAGE} omega"
    b = f"start {PASSAGE} finish"
    out = {r.doc_id: r for r in trim_duplicated_spans(
        _docs(spark, [(1, a), (2, b)])).collect()}
    # doc 1 holds the corpus-first occurrence: verbatim, nothing removed
    assert out[1].text == a and out[1].n_removed == 0
    # doc 2 loses exactly the duplicated 8-token passage
    assert out[2].text == "start finish"
    assert out[2].n_removed == SUBSTR_L


def test_intra_document_repeat_keeps_first_copy(spark):
    text = f"{PASSAGE} middle {PASSAGE}"
    out = trim_duplicated_spans(_docs(spark, [(7, text)])).collect()[0]
    assert out.text == f"{PASSAGE} middle"
    assert out.n_removed == SUBSTR_L


def test_short_empty_and_null_pass_through(spark):
    rows = [(1, "too short to window"), (2, ""), (3, None)]
    out = {r.doc_id: r for r in
           trim_duplicated_spans(_docs(spark, rows)).collect()}
    assert out[1].text == "too short to window"
    assert out[2].text == ""
    assert out[3].text is None
    assert all(out[i].n_removed == 0 for i in (1, 2, 3))
    # a trim never invents or drops documents
    assert len(out) == 3


def test_unique_long_doc_is_byte_identical(spark):
    text = " ".join(f"tok{i}" for i in range(40))
    out = trim_duplicated_spans(_docs(spark, [(5, text)])).collect()[0]
    assert out.text == text and out.n_removed == 0


def test_whole_doc_duplicate_trims_to_empty(spark):
    out = {r.doc_id: r for r in trim_duplicated_spans(
        _docs(spark, [(1, PASSAGE), (2, PASSAGE)])).collect()}
    assert out[1].text == PASSAGE and out[1].n_removed == 0
    assert out[2].text == "" and out[2].n_removed == SUBSTR_L


def test_hashed_marking_matches_text_keyed(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select("doc_id", "text")
    t = {r.doc_id: (r.text, r.n_removed)
         for r in trim_duplicated_spans(docs).collect()}
    h = {r.doc_id: (r.text, r.n_removed)
         for r in trim_duplicated_spans(docs, hashed=True).collect()}
    assert t == h


def test_driver_style_compare_vs_duckdb_oracle(spark):
    """The same row-count / columns / order-insensitive value compare
    the driver gate runs — byte-for-byte on the reassembled text."""
    sf_dir = "/root/testdata/sf0.001"
    df = x_trim_spans(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    cur = con.execute(_TRIM_ORACLE)
    o_cols = [c[0] for c in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_conservation_properties_on_random_docs(spark):
    """Structural invariants on a seeded random corpus: (1) kept text
    is a sub-SEQUENCE of the original tokens (the trim only deletes,
    never reorders or rewrites), (2) token conservation: kept + removed
    == original count, (3) every removed token was part of some
    duplicated window."""
    import random

    rng = random.Random(99)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(80):
        if rng.random() < 0.3 and rows:
            # replant a passage from an earlier doc to force cross-doc dups
            prev = rows[rng.randrange(len(rows))][1].split(" ")
            start = rng.randrange(max(1, len(prev) - SUBSTR_L))
            passage = prev[start:start + SUBSTR_L + rng.randrange(5)]
            body = rng.choices(vocab, k=rng.randrange(3, 20))
            toks = body[:5] + passage + body[5:]
        else:
            toks = rng.choices(vocab, k=rng.randrange(0, 40))
        rows.append((i, " ".join(toks)))
    frame = _docs(spark, rows)
    out = {r.doc_id: r for r in trim_duplicated_spans(frame).collect()}
    assert set(out) == {i for i, _ in rows}
    # the 8-byte marking twin must agree on this random corpus too
    # (fixture-only equality could in principle overfit)
    hashed = {r.doc_id: (r.text, r.n_removed)
              for r in trim_duplicated_spans(frame, hashed=True).collect()}
    assert hashed == {i: (r.text, r.n_removed) for i, r in out.items()}
    for i, text in rows:
        orig = text.split(" ")
        kept = out[i].text.split(" ") if out[i].text else []
        if out[i].text == "":
            kept = [""] if text == "" else []
        # subsequence check
        it = iter(orig)
        assert all(tok in it for tok in kept), (i, orig, kept)
        n_orig = len(orig)
        n_kept = len(out[i].text.split(" ")) if out[i].text else (
            1 if text == "" else 0)
        assert n_kept + out[i].n_removed == n_orig, (i, text, out[i])


def test_no_global_order_window_in_plan(spark):
    """Every window in the trim plan must be doc-partitioned — a
    global-order window would collapse the corpus onto one task (the
    canonical scale killer this family's docstrings promise away)."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j+i}" for j in range(20))) for i in range(30)],
        "doc_id long, text string")
    import re

    plan = (trim_duplicated_spans(docs)
            ._jdf.queryExecution().executedPlan().toString())
    # windowspecdefinition(partCol..., sortCol ASC ..., frame): a
    # GLOBAL window's first argument is the sort item itself (no
    # partition columns), so requiring doc_id first catches it
    # regardless of how the surrounding Window line is formatted
    specs = re.findall(r"windowspecdefinition\(([^,)]+)", plan)
    assert specs, "no window specs in plan — formatting changed?"
    for s in specs:
        assert "doc_id" in s, s
