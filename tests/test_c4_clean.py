"""C4-style line/document cleaning (pipeline/text.py, round 11) —
ground fixtures against the public recipe's rules, asserted line by
line and fully JVM-side (no Python UDF in the plan)."""

from sparkdon.pipeline.text import c4_clean_lines, c4_document_filter


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_rules(spark):
    text = "\n".join([
        "This is a good sentence that stays.",          # kept
        "A short line.",                                  # < 5 words
        "No terminal punctuation on this line",           # no terminal
        "Please enable javascript to continue reading.",  # boilerplate cue
        "We use a Cookies Policy on this site.",          # boilerplate cue
        "This site uses cookies to work well.",           # C4 cookie cue
        "Lorem ipsum dolor sit amet, consectetur.",       # lorem ipsum
        'He said "stop right over there."',               # quote terminal ok
        "Is this kept as well too?",                      # question mark ok
    ])
    out = c4_clean_lines(_docs(spark, [(1, text)])).collect()[0]
    kept = out.text.split("\n")
    assert kept == [
        "This is a good sentence that stays.",
        'He said "stop right over there."',
        "Is this kept as well too?",
    ]
    assert out.n_lines_kept == 3
    assert out.n_lines_dropped == 6


def test_document_rules(spark):
    good = ("One real sentence here. Another follows it. "
            "And a third closes it.")
    code = "if (x) { return 1; } one. two. three."
    megaword = "ok. " * 3 + "a" * 2000 + "."
    short = "Only one sentence."
    df = _docs(spark, [(1, good), (2, code), (3, megaword), (4, short)])
    kept = sorted(r.doc_id for r in c4_document_filter(df).collect())
    assert kept == [1]


def test_plan_is_python_free(spark):
    df = c4_clean_lines(_docs(spark, [(1, "A fine line stays here.")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_composes_with_line_then_doc(spark):
    # a page that only survives BECAUSE line cleaning removed its junk
    text = "\n".join([
        "Buy now {click here}",                       # dropped line ('{')
        "First real sentence stays right here.",
        "Second real sentence also stays here.",
        "Third real sentence closes the article.",
    ])
    df = _docs(spark, [(1, text)])
    assert c4_document_filter(df).count() == 0        # raw: '{' kills it
    cleaned = c4_clean_lines(df)
    assert c4_document_filter(cleaned).count() == 1   # cleaned: passes
