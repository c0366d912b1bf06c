"""UniMax mixing (Chung et al. 2023): epoch-capped waterfill budgets +
the frame-level counts-not-copies application."""

import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.sampling import unimax_budgets, unimax_sample


def test_waterfill_hand_case():
    # budget 100 over masses {a: 10, b: 30, c: 200}, cap 2 epochs:
    # a caps at 20 (its 2x10 cap is under the 33.3 equal share); the
    # remaining 80 splits evenly — b and c are both under their caps
    out = unimax_budgets({"a": 10, "b": 30, "c": 200}, 100, max_epochs=2)
    assert out == {"a": 20, "b": 40, "c": 40}


def test_waterfill_uniform_when_uncapped():
    out = unimax_budgets({"a": 1000, "b": 2000, "c": 500}, 90)
    assert out == {"a": 30, "b": 30, "c": 30}


def test_waterfill_budget_exceeds_caps():
    # caps absorb only 1x each: surplus stays unspent (the paper's
    # no-over-repetition rule), detectable by summing
    out = unimax_budgets({"a": 10, "b": 20}, 1000, max_epochs=1)
    assert out == {"a": 10, "b": 20}
    assert sum(out.values()) == 30


def test_waterfill_properties():
    import random

    rng = random.Random(3)
    for _ in range(200):
        n = rng.randint(1, 8)
        masses = {f"s{i}": rng.randint(1, 10_000) for i in range(n)}
        budget = rng.randint(0, 40_000)
        cap = rng.choice([0.5, 1.0, 3.0])
        out = unimax_budgets(masses, budget, max_epochs=cap)
        assert set(out) == set(masses)
        total_caps = cap * sum(masses.values())
        assert sum(out.values()) == pytest.approx(
            min(budget, total_caps), rel=1e-9)
        shares = []
        for s, b in out.items():
            assert b <= cap * masses[s] + 1e-9          # cap respected
            if b < cap * masses[s] - 1e-9:
                shares.append(b)
        # every uncapped source gets the SAME share
        assert all(abs(x - shares[0]) < 1e-6 for x in shares)


def test_waterfill_validation():
    with pytest.raises(ValueError, match="total_budget"):
        unimax_budgets({"a": 1}, -1)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_budgets({"a": 1}, 10, max_epochs=0)
    with pytest.raises(ValueError, match="non-positive"):
        unimax_budgets({"a": 0}, 10)


def test_unimax_sample_counts_not_copies(spark):
    # big source: 60 docs x 5 tokens = 300; small: 10 docs x 5 = 50.
    # budget 200, cap 3: small caps at 150?? no - cap 3*50 = 150 > share
    # 100, so both get 100: big runs 1/3 epoch, small runs 2 epochs.
    rows = [(i, "t " * 4 + "t", "big") for i in range(60)]
    rows += [(100 + i, "t " * 4 + "t", "small") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = unimax_sample(docs, total_budget=200, source_col="lang",
                        max_epochs=3.0)
    got = out.collect()
    assert len(got) == 70                       # never materializes copies
    by = {}
    for r in got:
        by.setdefault(r.lang, []).append(r)
    # big: 0 full epochs, partial at 100/300 -> 3333 bp
    assert all(r.n_epochs == 0 for r in by["big"])
    kept_big = sum(r.in_partial for r in by["big"])
    assert 0 < kept_big < 60                    # a real fraction
    # small: 100/50 = 2.0 epochs exactly -> 2 full, no partial
    assert all(r.n_epochs == 2 for r in by["small"])
    assert all(not r.in_partial for r in by["small"])
    # deterministic: same frame twice, identical selection
    again = {r.doc_id: (r.n_epochs, r.in_partial)
             for r in unimax_sample(docs, 200, max_epochs=3.0).collect()}
    assert again == {r.doc_id: (r.n_epochs, r.in_partial) for r in got}


def test_unimax_sample_reserved_columns(spark):
    docs = spark.createDataFrame(
        [(1, "a", "x", 3)], "doc_id long, text string, lang string, n_epochs long")
    with pytest.raises(ValueError, match="reserved"):
        unimax_sample(docs, 10)


def test_unimax_sample_n_tok_col(spark):
    docs = spark.createDataFrame(
        [(1, "ignored", "x", 100), (2, "ignored", "y", 300)],
        "doc_id long, text string, lang string, n long")
    out = {r.lang: r for r in
           unimax_sample(docs, 200, n_tok_col="n").collect()}
    # uniform split 100/100: x runs exactly 1 epoch, y a 1/3 partial
    assert out["x"].n_epochs == 1 and not out["x"].in_partial
    assert out["y"].n_epochs == 0


def test_null_source_fails_loudly(spark):
    """A NULL source would receive a budget its rows can never claim
    (the equi-join drops them) — refuse instead (review find r13)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs = spark.createDataFrame(
        [(1, "a b", "x"), (2, "c d", None)],
        "doc_id long, text string, lang string")
    with pytest.raises(SparkRuntimeException, match="null lang"):
        unimax_sample(docs, 10)


def test_null_text_fails_loudly(spark):
    """Null-text docs have no token mass yet would ride every epoch of
    their source — and an all-null source makes SUM(n_tok) NULL, which
    used to crash the driver waterfill with a bare TypeError (advice
    r14).  Both now refuse with the contract message."""
    docs = spark.createDataFrame(
        [(1, "a b", "x"), (2, None, "x")],
        "doc_id long, text string, lang string")
    with pytest.raises(Exception, match="null text"):
        unimax_sample(docs, 10)
    all_null = spark.createDataFrame(
        [(1, None, "x")], "doc_id long, text string, lang string")
    with pytest.raises(Exception, match="null text"):
        unimax_sample(all_null, 10)


def test_null_n_tok_col_fails_loudly(spark):
    docs = spark.createDataFrame(
        [(1, "t", "x", 100), (2, "t", "x", None)],
        "doc_id long, text string, lang string, n long")
    with pytest.raises(Exception, match="null n"):
        unimax_sample(docs, 10, n_tok_col="n")


def test_exact_epoch_snaps_through_float_noise(spark):
    """A source due EXACTLY 1 epoch must get n_epochs=1 / no partial,
    even when mass arrives through float summation noise (0.1 + 0.2):
    the old truncation landed it at 0 full epochs + a 9999-bp partial,
    biasing realized budgets low (advice r14)."""
    docs = spark.createDataFrame(
        [(1, "t", "x", 0.1), (2, "t", "x", 0.2)],
        "doc_id long, text string, lang string, n double")
    out = unimax_sample(docs, 0.3, n_tok_col="n").collect()
    assert all(r.n_epochs == 1 and not r.in_partial for r in out)
