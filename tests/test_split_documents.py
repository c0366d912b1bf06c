"""split_long_documents — pre-packing/embedding chunking (RefinedWeb
split-giant-pages shape): verbatim passthrough under the budget,
token-exact windows above it, optional overlap."""

import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.text import split_long_documents


def test_short_docs_pass_verbatim(spark):
    docs = spark.createDataFrame(
        [(1, "two  spaces   preserved"), (2, ""), (3, None)],
        "doc_id long, text string")
    out = {r.doc_id: (r.chunk_id, r.text)
           for r in split_long_documents(docs, 10).collect()}
    assert out == {1: (0, "two  spaces   preserved"),
                   2: (0, ""), 3: (0, None)}


def test_splitting_reconstructs_tokens(spark):
    words = [f"w{i}" for i in range(23)]
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    rows = sorted(split_long_documents(docs, 10).collect(),
                  key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in rows] == [0, 1, 2]
    assert [len(r.text.split()) for r in rows] == [10, 10, 3]
    # concatenated chunk tokens ARE the original token sequence
    assert [t for r in rows for t in r.text.split()] == words


def test_overlap_windows(spark):
    words = [f"w{i}" for i in range(12)]
    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    rows = sorted(split_long_documents(docs, 8, overlap=4).collect(),
                  key=lambda r: r.chunk_id)
    # stride 4: starts 0 and 4 — the second window already reaches the
    # end, so no further (unseen-token-free) window is emitted and the
    # last chunk stays full-size
    assert [r.text.split() for r in rows] == [words[0:8], words[4:12]]
    # a longer doc gets the third start
    docs17 = spark.createDataFrame(
        [(1, " ".join(f"v{i}" for i in range(17)))],
        "doc_id long, text string")
    rows17 = sorted(split_long_documents(docs17, 8, overlap=4).collect(),
                    key=lambda r: r.chunk_id)
    v = [f"v{i}" for i in range(17)]
    assert [r.text.split() for r in rows17] == [
        v[0:8], v[4:12], v[8:16], v[12:17]]


def test_exact_boundary_is_single_chunk(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)))],
        "doc_id long, text string")
    rows = split_long_documents(docs, 10).collect()
    assert len(rows) == 1 and rows[0].chunk_id == 0


def test_other_columns_carried_and_validation(spark):
    docs = spark.createDataFrame(
        [(1, "en", " ".join(["t"] * 15))],
        "doc_id long, lang string, text string")
    rows = split_long_documents(docs, 10).collect()
    assert len(rows) == 2 and all(r.lang == "en" for r in rows)
    with pytest.raises(ValueError, match="max_tokens"):
        split_long_documents(docs, 0)
    with pytest.raises(ValueError, match="overlap"):
        split_long_documents(docs, 10, overlap=10)
    has = docs.withColumn("chunk_id", F.lit(1))
    with pytest.raises(ValueError, match="chunk_id"):
        split_long_documents(has, 10)


def test_plan_python_free_no_shuffle(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (split_long_documents(docs, 2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_reserved_internal_columns_fail_loudly(spark):
    docs = spark.createDataFrame([(1, "a b", ["x"])],
                                 "doc_id long, text string, _toks array<string>")
    with pytest.raises(ValueError, match="_toks"):
        split_long_documents(docs, 10)
