"""blocklist_filter — the C4 bad-words document gate (token and phrase
modes, codegen and join lanes)."""

import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.text import (BLOCKLIST_LITERAL_MAX,
                                    blocklist_filter)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "a perfectly clean document"),
         (2, "contains BADWORD here"),           # case-insensitive hit
         (3, "badwordy is not badword as a token"),  # hit via exact token
         (4, "hyphen-badword stays in token mode"),
         (5, ""), (6, None),
         (7, "multi word phrase target sits here")],
        "doc_id long, text string")


def test_token_mode_exact_tokens_case_insensitive(spark):
    kept = {r.doc_id for r in
            blocklist_filter(_docs(spark), ["badword"]).collect()}
    # 2 (case) and 3 (exact token present) drop; 4's token is
    # "hyphen-badword", not "badword" — kept in token mode
    assert kept == {1, 4, 5, 6, 7}


def test_phrase_mode_boundaries_and_phrases(spark):
    kept = {r.doc_id for r in
            blocklist_filter(_docs(spark),
                             ["badword", "word phrase target"],
                             mode="phrase").collect()}
    # 4 now drops (word-boundary substring); "badwordy" still safe
    # (boundary); 7 drops on the multi-word phrase
    assert kept == {1, 5, 6}


def test_lanes_identical_and_join_lane(spark):
    docs = _docs(spark)
    terms = ["badword"] + [f"zz{i}" for i in range(BLOCKLIST_LITERAL_MAX)]
    a = {r.doc_id for r in blocklist_filter(docs, ["badword"]).collect()}
    b = {r.doc_id for r in blocklist_filter(docs, terms).collect()}
    assert a == b  # padding terms never match; lanes agree


def test_literal_lane_is_zero_shuffle_codegen(spark):
    df = blocklist_filter(_docs(spark), ["badword", "it's", "a\\b"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_empty_list_and_validation(spark):
    docs = _docs(spark)
    assert blocklist_filter(docs, []).count() == docs.count()
    with pytest.raises(ValueError, match="empty term"):
        blocklist_filter(docs, ["ok", ""])
    with pytest.raises(ValueError, match="mode"):
        blocklist_filter(docs, ["x"], mode="regex")


def test_composes_with_c4(spark):
    """The deployed position: after line cleaning, before packing."""
    from sparkdon.pipeline.text import c4_clean_lines

    docs = spark.createDataFrame(
        [(1, "The archive describes the people with care and patience "
             "over many years of print and this sentence also ends."),
         (2, "The casino jackpot pages scream badword offers at length "
             "with terminal punctuation to sneak past the line rules.")],
        "doc_id long, text string")
    out = blocklist_filter(c4_clean_lines(docs), ["badword"])
    assert [r.doc_id for r in out.collect()] == [1]


def test_phrase_mode_punctuation_edged_terms(spark):
    """\\b boundaries can never match a term ending in a non-word char
    (the shape the public bad-words list carries); the lookaround
    boundaries do (review find r13)."""
    docs = spark.createDataFrame(
        [(1, "what an a$$ move"), (2, "classy text"), (3, "pass it")],
        "doc_id long, text string")
    kept = {r.doc_id for r in
            blocklist_filter(docs, ["a$$"], mode="phrase").collect()}
    assert kept == {2, 3}                      # no 'pass'/'classy' hit


def test_token_mode_rejects_multiword_terms(spark):
    """A whitespace-bearing term can never match a whitespace token —
    silent per-entry no-ops hide real misses (review find r13)."""
    docs = _docs(spark)
    with pytest.raises(ValueError, match="phrase"):
        blocklist_filter(docs, ["word phrase"])


def test_token_mode_requires_doc_id_in_both_lanes(spark):
    """The contract must not change when the list crosses the literal
    lane's size cap (review find r13)."""
    no_id = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError, match="doc_id"):
        blocklist_filter(no_id, ["x"])
