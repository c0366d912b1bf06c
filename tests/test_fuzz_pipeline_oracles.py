"""Seeded random differential battery for the PIPELINE gates: the
driver verifies each oracle on the FIXED fixture, so an oracle could in
principle agree there by accident (fixture-overfit token shapes, no
edge words).  This battery regenerates a random ``documents`` table —
skewed lengths, empty docs, single-char words, dense duplicate
vocabulary, digit/punctuation tokens — and asserts Spark gate ≡ DuckDB
oracle on THAT, for every deterministic text/dedup/sampling gate that
reads only ``documents``.

Same compare as scripts/check_correctness.py (row count, columns,
order-insensitive canonical values); fixed seed so CI is stable."""

from __future__ import annotations

import importlib.util
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows

SEED = 20260816
N_DOCS = 220

#: gates whose inputs are documents-only AND whose oracle is exact (no
#: fixture-specific constants baked into semantics beyond thresholds)
GATES = [
    "x_dedup_exact",
    "x_dedup_jaccard",
    "x_dedup_simhash",
    "x_fingerprint",
    "x_chunk_dedup",
    "x_lang_id",
    "x_text_stats",
    "x_text_quality",
    "x_vocab_topk",
    "x_token_bpe",
    "x_bpe_pairs",
    "x_pack_sequences",
    "x_length_buckets",
    "x_char_entropy",
    "x_mix_sample",
    "x_sample_stratified",
]


def _random_docs(rng):
    vocab = (["the", "of", "data", "spark", "a", "is", "x1", "9", "42",
              "word", "row", "batch", "scan", "e", "er", "ererer"]
             + [f"w{i}" for i in range(40)])
    rows = []
    for i in range(N_DOCS):
        kind = rng.random()
        if kind < 0.05:
            text = ""                      # empty doc
        elif kind < 0.10:
            text = rng.choice(vocab)       # single token
        elif kind < 0.20:
            # dense duplicate text — dedup gates must collide
            text = " ".join(["dup"] * rng.randint(5, 30))
        else:
            n = rng.randint(2, 120)
            text = " ".join(rng.choices(vocab, k=n))
        rows.append((i, text,
                     rng.choice(["en", "de", "fr", "xx"]),
                     rng.choice(["web", "wiki", "book"]),
                     len(text)))
    return rows


@pytest.fixture(scope="module")
def rand_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("randsf")
    rows = _random_docs(random.Random(SEED))
    (spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
     .repartition(3)
     .write.mode("overwrite").parquet(str(d / "documents.parquet")))
    return str(d)


def test_pipeline_gates_match_oracles_on_random_corpus(spark, rand_dir):
    from sparkdon import pipeline

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part glob
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{rand_dir}/documents.parquet/*.parquet'")
    failures = []
    for key in GATES:
        assert key in pipeline.QUERIES and key in pipeline.ORACLE
        df = pipeline.QUERIES[key](spark, rand_dir)
        s_cols = df.columns
        s_rows = [tuple(r) for r in df.collect()]
        cur = con.execute(pipeline.ORACLE[key])
        o_cols = [c[0] for c in cur.description]
        o_rows = cur.fetchall()
        if sorted(s_cols) != sorted(o_cols):
            failures.append((key, "columns", s_cols, o_cols))
        elif canon_rows(s_cols, s_rows) != canon_rows(o_cols, o_rows):
            sc = canon_rows(s_cols, s_rows)
            oc = canon_rows(o_cols, o_rows)
            diff = [(a, b) for a, b in zip(sc, oc) if a != b][:2]
            failures.append((key, "values", len(sc), len(oc), diff))
    assert not failures, failures
