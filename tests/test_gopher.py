"""Gopher quality + repetition rule battery (pipeline/text.py, round
11): each named rule is exercised by a planted fixture that fails it
and by a clean page that passes everything."""

from sparkdon.pipeline.text import (gopher_quality_signals,
                                    gopher_repetition_signals)

import random as _random

_rng = _random.Random(3)
_FILLER = ["history", "city", "records", "archives", "library", "bridge",
           "river", "market", "castle", "square", "garden", "museum"]
# ~96 words; every other token carries a unique index so NO word
# n-gram (n>=2) ever repeats, while the plain stop words keep the
# quality rules green
CLEAN = " ".join(
    f"the {_rng.choice(_FILLER)}{i}a of {_rng.choice(_FILLER)}{i}b "
    f"and {_rng.choice(_FILLER)}{i}c that {_rng.choice(_FILLER)}{i}d "
    f"have {_rng.choice(_FILLER)}{i}e with {_rng.choice(_FILLER)}{i}f."
    for i in range(8))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sig(spark, text):
    return gopher_quality_signals(_docs(spark, [(1, text)])).collect()[0]


def test_quality_rules_each_fire(spark):
    ok = _sig(spark, CLEAN)
    assert ok.keep and ok.ok_words and ok.ok_stops
    assert not _sig(spark, "too short of the and that").ok_words
    # mean word length out of [3, 10]
    assert not _sig(spark, ("a b " * 60)).ok_word_len
    # symbol ratio: a '#' per word
    hashy = " ".join(f"#w{i}" for i in range(60)) + " the of and that"
    assert not _sig(spark, hashy).ok_symbols
    # bullet lines > 90%
    bullets = "\n".join(f"- item {i} of the list" for i in range(20))
    assert not _sig(spark, bullets).ok_bullets
    # ellipsis-ending lines > 30%
    ell = "\n".join(
        [f"line {i} of the story..." for i in range(10)]
        + ["the closing line stays here of and that have with"])
    assert not _sig(spark, ell).ok_ellipsis
    # alphabetic-word fraction < 80%
    nums = " ".join(str(i) for i in range(60)) + " the of and that with"
    assert not _sig(spark, nums).ok_alpha
    # fewer than 2 stop words
    nostop = " ".join(f"word{i}" for i in range(60))
    assert not _sig(spark, nostop).ok_stops


def test_repetition_rules(spark):
    rep_line = "\n".join(["this exact line repeats again"] * 10
                         + ["a unique closing line here"])
    dup5 = ("one two three four five six " * 10
            + "tail words differ here now")
    clean_rows = [(1, CLEAN), (2, rep_line), (3, dup5)]
    out = {r.doc_id: r for r in
           gopher_repetition_signals(_docs(spark, clean_rows)).collect()}
    assert out[1].keep
    assert out[2].dup_line_frac > 0.30 and not out[2].keep
    assert not out[2].ok_dup_line_frac
    assert out[3].dup_5gram_char_frac > 0.15 and not out[3].keep
    # the clean doc's top-2-gram fraction is small
    assert out[1].top_2gram_char_frac <= 0.20


def test_quality_plan_is_python_free(spark):
    df = gopher_quality_signals(_docs(spark, [(1, CLEAN)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan          # narrow: per-row expressions only


def test_repetition_plan_is_python_and_exchange_free(spark):
    """The r12 rewrite's contract, plan-asserted: with the input
    already spread, the whole 13-metric battery is narrow projections —
    no Python eval, and the ONLY Exchange is the caller's own
    repartition (the guard adds nothing when partitions >= cores)."""
    p = spark.sparkContext.defaultParallelism
    df = _docs(spark, [(i, CLEAN) for i in range(64)]).repartition(p)
    out = gopher_repetition_signals(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") == 1, plan   # only the input spread


def test_repetition_fold_matches_bruteforce_reference(spark):
    """r12: the sort-and-fold rewrite vs a Counter-based brute-force
    reference of the published accounting, on 40 random docs drawn from
    a tiny vocabulary (dense gram collisions, newlines, blank-line
    paragraphs, repeated lines, short/empty edge docs).  One Spark
    action for the whole battery — the fuzz pattern from
    test_fuzz_crawl (hypothesis around an action would shrink
    forever)."""
    import re
    from collections import Counter

    import pytest as _pytest

    rng = _random.Random(12)
    vocab = ["aa", "bb", "ccc", "dd", "e"]
    docs = []
    for i in range(40):
        parts = []
        for _ in range(rng.randint(0, 6)):
            line = " ".join(rng.choice(vocab)
                            for _ in range(rng.randint(0, 12)))
            parts.append(line)
            parts.append(rng.choice(["\n", "\n", "\n\n", "\n\n\n"]))
        if rng.random() < 0.3 and parts:
            parts.append(parts[0])  # force a duplicate line
        docs.append((i, "".join(parts)))
    docs += [(100, ""), (101, " \n\n "), (102, "one"), (103, "x y x y")]

    def ref_row(text):
        tc = max(len(text), 1)
        out = {}
        for name, pat in (("line", r"\r?\n"), ("para", r"(?:\r?\n){2,}")):
            units = [u for u in re.split(pat, text) if u.strip()]
            c = Counter(units)
            n = sum(c.values())
            out[f"dup_{name}_frac"] = (
                sum(v - 1 for v in c.values() if v > 1) / n if n else 0.0)
            out[f"dup_{name}_char_frac"] = sum(
                (v - 1) * len(u) for u, v in c.items() if v > 1) / tc
        toks = [t for t in re.split(r"\s+", text.strip()) if t]
        for n in range(2, 11):
            grams = [" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1)]
            c = Counter(grams)
            top = max(((v, len(g)) for g, v in c.items()), default=(0, 0))
            if n <= 4:
                out[f"top_{n}gram_char_frac"] = top[0] * top[1] / tc
            else:
                out[f"dup_{n}gram_char_frac"] = min(
                    sum((v - 1) * len(g) for g, v in c.items() if v > 1)
                    / tc, 1.0)
        return out

    got = {r.doc_id: r for r in gopher_repetition_signals(
        _docs(spark, docs)).collect()}
    assert sorted(got) == sorted(d for d, _ in docs)
    for doc_id, text in docs:
        want = ref_row(text)
        for col, val in want.items():
            assert got[doc_id][col] == _pytest.approx(val, abs=1e-9), \
                (doc_id, col, text)


def test_empty_docs_survive_both_batteries(spark):
    # r11 review: ANSI DIVIDE_BY_ZERO on empty docs in quality; silent
    # doc loss in repetition — both batteries must return one row per
    # input doc, with sane defaults
    df = _docs(spark, [(1, CLEAN), (2, ""), (3, "   \n\n  ")])
    q = {r.doc_id: r for r in gopher_quality_signals(df).collect()}
    assert sorted(q) == [1, 2, 3]
    assert not q[2].keep and q[2].n_words == 0
    r = {r.doc_id: r for r in gopher_repetition_signals(df).collect()}
    assert sorted(r) == [1, 2, 3]
    assert r[2].keep and r[2].dup_line_frac == 0.0   # nothing repeated
    assert r[3].dup_5gram_char_frac == 0.0
