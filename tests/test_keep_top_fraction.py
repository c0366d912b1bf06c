"""keep_top_fraction — exact corpus-wide quality selection (FineWeb-Edu
shape) on the shared no-global-window rank machinery."""

import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.sampling import keep_top_fraction, value_rank_table


def _scored(spark, scores):
    return spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate(scores)],
        "doc_id long, score double")


def test_exact_top_fraction(spark):
    docs = _scored(spark, range(100))          # scores 0..99, unique
    kept = {r.doc_id for r in
            keep_top_fraction(docs, "score", 0.2).collect()}
    assert kept == set(range(80, 100))         # exactly the top 20
    low = {r.doc_id for r in
           keep_top_fraction(docs, "score", 0.1, ascending=True).collect()}
    assert low == set(range(10))               # lowest decile


def test_boundary_ties_are_inclusive(spark):
    # 10 docs at score 5, 10 below: top 5% budget (1 doc) lands ON the
    # tie block -> all ten tied docs kept (documented semantics)
    docs = _scored(spark, [5] * 10 + [1] * 10)
    kept = keep_top_fraction(docs, "score", 0.05).collect()
    assert len(kept) == 10
    assert all(r.score == 5.0 for r in kept)


def test_edge_fractions_and_validation(spark):
    docs = _scored(spark, range(10))
    assert keep_top_fraction(docs, "score", 1.0).count() == 10
    assert keep_top_fraction(docs, "score", 0.0).count() == 0
    with pytest.raises(ValueError, match="frac"):
        keep_top_fraction(docs, "score", 1.5)


def test_null_score_fails_loudly(spark):
    # match the MESSAGE, not the exception type: under AQE stage
    # materialization raise_error may surface re-wrapped (the repo's
    # recorded pyspark-4 lesson), and which wrapper appears is
    # plan-path-dependent across test orderings
    docs = spark.createDataFrame([(1, 0.5), (2, None)],
                                 "doc_id long, score double")
    with pytest.raises(Exception, match="null/NaN/inf score"):
        keep_top_fraction(docs, "score", 0.5).collect()


def test_nan_and_inf_scores_fail_loudly(spark):
    # NaN/±inf poison the real-span bucket width (NaN hi → NaN bucket
    # for EVERY row) — without the guard this surfaced as an opaque
    # ANSI cast error instead of the contract message (advice r14)
    for bad in (float("nan"), float("inf"), float("-inf")):
        docs = spark.createDataFrame([(1, 0.5), (2, bad)],
                                     "doc_id long, score double")
        with pytest.raises(Exception, match="null/NaN/inf score"):
            keep_top_fraction(docs, "score", 0.5).collect()


def test_integer_scores_still_work(spark):
    # the finite guard casts to double for isnan; an integer score
    # column must pass through unharmed
    docs = spark.createDataFrame(
        [(i, i % 7) for i in range(50)], "doc_id long, score int")
    # budget = floor(0.3*50) = 15; 7 docs score 6, 7 score 5, and
    # value 4 has 14 strictly-better docs < 15 so the tie-inclusive
    # threshold lands at 4
    kept = keep_top_fraction(docs, "score", 0.3).collect()
    assert all(r.score >= 4 for r in kept)
    assert len(kept) == sum(1 for i in range(50) if i % 7 >= 4)


def test_rank_table_matches_naive(spark):
    import random

    rng = random.Random(4)
    vals = [rng.randrange(20) for _ in range(300)]
    d = spark.createDataFrame([(v,) for v in vals], "v int")
    got = {r.v: (r.c, r.rank_less, r._n) for r in
           value_rank_table(d, "v").collect()}
    for v, (c, rl, n) in got.items():
        assert c == vals.count(v)
        assert rl == sum(1 for x in vals if x < v)
        assert n == len(vals)


def test_no_global_order_window(spark):
    """The selection must never collapse the corpus to one ordered
    task: every window in the plan is bucket-partitioned."""
    docs = _scored(spark, range(50))
    plan = (keep_top_fraction(docs, "score", 0.3)
            ._jdf.queryExecution().executedPlan().toString())
    for i, line in enumerate(plan.splitlines()):
        if "Window " in line and "partitionBy" not in line:
            # spark prints Window [..], [b ASC..] — partition spec is
            # the second bracket; a single-partition global window
            # prints an EMPTY partition spec
            assert "], [" in line, (i, line)


def test_fractional_domain_selection_and_bucket_spread(spark):
    """Scores in [0, 1] (the classifier's range): selection stays exact
    AND the rank windows actually spread across buckets — the integer
    +1 bucket form would land the whole domain in bucket 0 (the r12
    fractional-curriculum-key collapse, re-found here in review)."""
    import random

    rng = random.Random(8)
    scores = sorted(round(rng.random(), 6) for _ in range(200))
    docs = _scored(spark, scores)                  # doc_id == sort rank
    kept = {r.doc_id for r in
            keep_top_fraction(docs, "score", 0.25).collect()}
    assert kept == set(range(150, 200))            # unique scores: exact
    # the real-span table is rank-exact on the fractional domain
    rt = value_rank_table(docs.select("score"), "score",
                          unit_span=False)
    got = {r.rank_less for r in rt.collect()}
    assert got == set(range(0, 200))               # exact dense ranks


def test_budget_is_exact_for_awkward_fractions(spark):
    """floor(frac·n) in doubles loses a document on ordinary fractions
    (0.58·100 = 57.999…994 → 57); the parts-per-billion DECIMAL budget
    keeps exactly 58 (review find r13)."""
    docs = _scored(spark, range(100))
    for frac, want in ((0.58, 58), (0.29, 29), (0.07, 7)):
        assert keep_top_fraction(docs, "score", frac).count() == want


# ---------------------------------------------------------------------------
# approx twin (round 14 — the 100 TB path for raw un-gridded scores)
# ---------------------------------------------------------------------------

def test_approx_matches_exact_on_gridded_scores(spark):
    from sparkdon.pipeline.sampling import keep_top_fraction_approx

    # gridded scores (the exact path's documented contract domain) with
    # the budget landing strictly INSIDE a tie block (frac=0.25 → 50 of
    # 200 lands mid-block of the 20-wide 0.7 tier): both paths must
    # land on the same boundary value and keep the same doc set.  A
    # budget landing exactly ON a block edge may resolve to the
    # adjacent block in the sketch (documented divergence).
    docs = spark.createDataFrame(
        [(i, (i % 10) / 10.0) for i in range(200)],
        "doc_id long, score double")
    exact = {r.doc_id for r in
             keep_top_fraction(docs, "score", 0.25).collect()}
    approx = {r.doc_id for r in
              keep_top_fraction_approx(docs, "score", 0.25).collect()}
    assert approx == exact
    assert len(exact) == 60  # tie-inclusive: 0.25·200=50 → 0.7 block


def test_approx_fraction_on_all_distinct_scores(spark):
    from sparkdon.pipeline.sampling import keep_top_fraction_approx

    # all-distinct raw floats — the domain where the exact rank table
    # is corpus-sized and the sketch is the production path; kept mass
    # must sit within the sketch's rank error of frac·n
    n = 5000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.sin(F.col("id").cast("double")) * 1e6).alias("score"))
    assert docs.select("score").distinct().count() == n
    kept = keep_top_fraction_approx(docs, "score", 0.25).count()
    assert abs(kept - 0.25 * n) <= n / 1000 + 1
    low = keep_top_fraction_approx(docs, "score", 0.25,
                                   ascending=True)
    hi_min = docs.agg(F.expr("percentile(score, 0.74)")).first()[0]
    assert low.agg(F.max("score")).first()[0] < hi_min


def test_approx_edge_fracs(spark):
    from sparkdon.pipeline.sampling import keep_top_fraction_approx

    docs = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "doc_id long, score double")
    assert keep_top_fraction_approx(docs, "score", 0.0).count() == 0
    assert keep_top_fraction_approx(docs, "score", 1.0).count() == 20


def test_approx_nonfinite_fails_loudly(spark):
    from sparkdon.pipeline.sampling import keep_top_fraction_approx

    for bad in (None, float("nan"), float("inf")):
        docs = spark.createDataFrame([(1, 0.5), (2, bad)],
                                     "doc_id long, score double")
        with pytest.raises(Exception, match="null/NaN/inf score"):
            keep_top_fraction_approx(docs, "score", 0.5).collect()


def test_x_keep_top_approx_matches_oracle(spark):
    """r16 (VERDICT r15 #5 gap): the GK-sketch top-fraction gate,
    driver-style compare on the fixture — the sketch is EXACT while
    n <= accuracy (buffer holds every sample), and its discrete-rank
    convention matches DuckDB quantile_disc (0/88 empirical mismatches
    incl. heavy-tie grids), so the compare is bit-for-bit.  Staged r19+
    battery-swap candidate."""
    import importlib.util
    import os

    import duckdb

    from sparkdon.pipeline.sampling import (_KEEP_TOP_APPROX_ORACLE,
                                            x_keep_top_approx)

    spec = importlib.util.spec_from_file_location(
        "check_correctness",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "check_correctness.py"))
    check = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(check)
    sf_dir = "/root/testdata/sf0.001"
    df = x_keep_top_approx(spark, sf_dir)
    s_cols, s_rows = df.columns, [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    cur = con.execute(_KEEP_TOP_APPROX_ORACLE)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) > 0
    assert check.canon_rows(s_cols, s_rows) == check.canon_rows(o_cols, o_rows)
    # the kept fraction is ~20% of the corpus (within boundary ties)
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert 0.15 * n <= len(s_rows) <= 0.3 * n
