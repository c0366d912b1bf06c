"""Sampling & distribution shaping: stratified/exact-k sampling,
percentiles (exact + t-digest), per-stratum top-k, winsorization,
mixture/temperature sampling.

Split out of the former monolithic ``sparkdon/pipeline.py`` (round 9);
every gate registers into the shared :mod:`sparkdon.pipeline` registry,
so ``pipeline.QUERIES`` / ``pipeline.ORACLE`` and every public name are
unchanged for callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._registry import pin_shared, register, table


@register(
    "x_event_percentiles",
    "SELECT event_type, COUNT(*) AS cnt, "
    "CAST(FLOOR(1e4 * quantile_cont(value, 0.5)) AS BIGINT) AS p50_scaled, "
    "CAST(FLOOR(1e4 * quantile_cont(value, 0.95)) AS BIGINT) AS p95_scaled, "
    "CAST(FLOOR(1e4 * quantile_cont(value, 0.99)) AS BIGINT) AS p99_scaled "
    "FROM events GROUP BY event_type",
)
def x_event_percentiles(spark, sf_dir):
    """Exact latency-style percentiles per event type (p50/p95/p99 with
    linear interpolation — Spark ``percentile`` and DuckDB
    ``quantile_cont`` implement the same estimator, so the oracle matches
    on scaled floors).

    At 100 TB exact percentiles are the wrong tool — this gate is the
    *correctness baseline* for the sketch path: swap in
    ``percentile_approx`` (t-digest) per group at scale, validated
    against this exact twin on samples."""
    e = table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5, 0.95, 0.99))")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), pct.alias("p"))
        .select(
            "event_type", "cnt",
            F.floor(1e4 * F.col("p")[0]).alias("p50_scaled"),
            F.floor(1e4 * F.col("p")[1]).alias("p95_scaled"),
            F.floor(1e4 * F.col("p")[2]).alias("p99_scaled"),
        )
    )


@register(
    "x_sample_stratified",
    "SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc "
    "FROM documents "
    "WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    " AS BIGINT) % 100 < 10 "
    "GROUP BY lang",
)
def x_sample_stratified(spark, sf_dir):
    """Deterministic ~10% Bernoulli sample, reported per language
    stratum: the selection key is md5(doc_id) — content-stable, so the
    SAME rows are sampled on every engine, every run, every cluster size
    (unlike ``df.sample``'s partition-dependent RNG).  This is how a
    training pipeline carves held-out/eval slices reproducibly.

    Narrow map + one partial-agg shuffle; the md5 gate pushes no rows
    through Python."""
    d = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("long") % 100
    return (
        d.filter(bucket < 10)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"),
             F.min("doc_id").alias("first_doc"))
    )


@register(
    "x_sample_weighted",
    "SELECT doc_id, lang, w, priority FROM ("
    " SELECT doc_id, lang, CAST(length(text) AS BIGINT) + 1 AS w, "
    "  CAST(FLOOR(1000000.0 * CAST(concat('0x', "
    "   substr(md5('w:' || doc_id), 1, 8)) AS BIGINT) "
    "   / (CAST(length(text) AS BIGINT) + 1)) AS BIGINT) AS priority "
    " FROM documents) "
    "ORDER BY priority, doc_id LIMIT 100",
)
def x_sample_weighted(spark, sf_dir):
    """Weighted sampling without replacement via Duffield–Lund–Thorup
    PRIORITY SAMPLING (round 9): each document draws a deterministic
    uniform u from md5 and gets priority u/w (w = char length + 1, the
    'sample long documents more' weight a token-budget-aware corpus
    carve wants); the k smallest priorities are the sample.  Published
    scheme with unbiased subset-sum estimators — not an ad-hoc ranking.

    Engine-portability: the priority is floor(1e6·h32/w) computed in
    BIGINT/double — h32 < 2^32, so 1e6·h32 < 2^52 stays exactly
    representable and the single correctly-rounded division + floor is
    bit-identical on both engines; ties break on doc_id.

    100 TB shape: a narrow map then ORDER BY + LIMIT, which Spark
    executes as TakeOrderedAndProject — per-partition top-k, merge of
    k-row heaps on the driver side of the exchange; nothing global ever
    sorts.  Plan-asserted in tests/test_pipeline.py."""
    d = table(spark, sf_dir, "documents")
    w = (F.length("text").cast("long") + 1).alias("w")
    h = F.conv(F.substring(F.md5(F.concat(F.lit("w:"),
                                          F.col("doc_id").cast("string"))),
                           1, 8), 16, 10).cast("long")
    pri = F.floor(F.lit(1000000.0) * h / (F.length("text").cast("long") + 1)
                  ).cast("long").alias("priority")
    return (d.select("doc_id", "lang", w, pri)
            .orderBy("priority", "doc_id").limit(100))


@register(
    "x_sample_exact_k",
    "SELECT doc_id, lang FROM ("
    " SELECT doc_id, lang, row_number() OVER (PARTITION BY lang "
    "  ORDER BY md5('k:' || doc_id), doc_id) AS rn FROM documents) "
    "WHERE rn <= 20",
)
def x_sample_exact_k(spark, sf_dir):
    """Exact-k per-stratum sampling — 'exactly 20 documents per
    language', the eval-slice carve a rate-based Bernoulli gate cannot
    promise (its stratum counts are binomial).  Selection order is the
    md5 of the salted doc_id — a deterministic uniform permutation, so
    the chosen k are content-stable across engines, runs, and cluster
    sizes, and growing the corpus only displaces rows at the hash
    boundary.

    100 TB shape: one window per stratum key (bounded groups — lang
    cardinality, not corpus); Catalyst's window-group-limit rewrite
    (``InferWindowGroupLimit``, the rank-limit pushdown — plan-asserted
    in tests/test_pipeline.py) turns the ``rn <= 20`` filter into a
    partial top-k per partition before the shuffle; nothing global.  For heavily
    skewed strata the rank-over-hash is still a single shuffle of
    (lang, hash, id) triples — the document bodies never move."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("k:"), F.col("doc_id").cast("string"))),
        F.asc("doc_id"))
    return (d.select("doc_id", "lang")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20).drop("rn"))


def event_percentiles_approx(spark, sf_dir, accuracy: int = 10000) -> DataFrame:
    """The 100 TB percentile path: ``percentile_approx`` (t-digest
    sketch) per event type — mergeable, bounded-memory, one partial-agg
    shuffle.  Not oracle-gated (the sketch is engine-specific and its
    merge order is plan-dependent); instead pytest asserts it against
    the exact twin ``x_event_percentiles`` within sketch tolerance."""
    e = table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
                              F.lit(accuracy))
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), pct.alias("p"))
        .select(
            "event_type", "cnt",
            F.col("p")[0].alias("p50"), F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
    )


@register(
    "x_topk_per_lang",
    "SELECT lang, doc_id, n_chars FROM ("
    " SELECT lang, doc_id, n_chars, row_number() OVER "
    "  (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
    " FROM documents) WHERE rn <= 3",
)
def x_topk_per_lang(spark, sf_dir):
    """Top-k per group (3 longest documents per language): the
    rank-within-partition pattern — one shuffle on the group key, sort
    within partitions, early-out at rn <= 3.  Deterministic tie-break on
    doc_id."""
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        table(spark, sf_dir, "documents")
        .select("lang", "doc_id", "n_chars",
                F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# passage-level dedup, semantic dedup, product quantization, stream joins
# ---------------------------------------------------------------------------


@register(
    "x_winsorize",
    "WITH q AS (SELECT event_type, "
    " FLOOR(100 * quantile_cont(value, 0.05)) / 100 AS lo, "
    " FLOOR(100 * quantile_cont(value, 0.95)) / 100 AS hi "
    " FROM events GROUP BY event_type) "
    "SELECT e.event_type, COUNT(*) AS cnt, "
    "CAST(SUM(CAST(LEAST(GREATEST(e.value, q.lo), q.hi) AS DECIMAL(18,2))) "
    " AS DOUBLE) AS sum_clipped, "
    "CAST(SUM(CASE WHEN e.value < q.lo THEN 1 ELSE 0 END) AS BIGINT) "
    " AS n_low, "
    "CAST(SUM(CASE WHEN e.value > q.hi THEN 1 ELSE 0 END) AS BIGINT) "
    " AS n_high "
    "FROM events e JOIN q USING (event_type) GROUP BY e.event_type",
)
def x_winsorize(spark, sf_dir):
    """Winsorization — the outlier-clipping stage of metric cleaning:
    per event type, clip values to the [p05, p95] band and report the
    clipped sum plus how many rows hit each side.  Thresholds are
    quantized to 2 decimals (floor) so both engines compare against
    BIT-IDENTICAL bounds — interpolated percentiles at non-binary
    fractions can differ in the last ulp between engines, and a clip
    compare must not hinge on that; the clipped sum goes through
    DECIMAL so the cross-row sum is order-independent (the money
    trick).

    100 TB shape: one percentile partial agg per (low-cardinality)
    type, broadcast back for a narrow clip map, one partial-agg
    report — the corpus shuffles zero times (both aggs are map-side
    partial on the same key)."""
    e = table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        (F.floor(100 * F.expr("percentile(value, 0.05D)")) / 100).alias("lo"),
        (F.floor(100 * F.expr("percentile(value, 0.95D)")) / 100).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(clipped.cast("decimal(18,2)")).cast("double")
            .alias("sum_clipped"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long").alias("n_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long").alias("n_high"),
        )
    )


@register(
    "x_mix_sample",
    "WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) "
    " AS n_tok FROM documents), "
    "lt AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens FROM d "
    " GROUP BY lang), "
    "r AS (SELECT lang, lang_tokens, CAST(FLOOR(10000.0 * "
    " (SELECT MIN(lang_tokens) FROM lt) / lang_tokens) AS BIGINT) AS rate_bp "
    " FROM lt), "
    "s AS (SELECT d.lang, d.n_tok FROM d JOIN r USING (lang) "
    " WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) "
    "  AS BIGINT) % 10000 < r.rate_bp), "
    "agg AS (SELECT lang, COUNT(*) AS n_sampled, "
    " CAST(SUM(n_tok) AS BIGINT) AS tok_sampled FROM s GROUP BY lang) "
    "SELECT r.lang, r.lang_tokens, r.rate_bp, "
    "COALESCE(agg.n_sampled, 0) AS n_sampled, "
    "COALESCE(agg.tok_sampled, 0) AS tok_sampled "
    "FROM r LEFT JOIN agg USING (lang)",
)
def x_mix_sample(spark, sf_dir):
    """Data mixing to a target per-language token budget — the sampling
    stage that turns a raw corpus into a training mixture: compute each
    language's token mass, set every language's keep-rate so it
    downsamples to the SMALLEST language's budget (a balanced mixture;
    any target vector works the same way), then apply the rate with the
    content-stable md5 gate — the same rows are kept on every engine,
    run, and cluster size.  Rates are integer basis points
    (floor(1e4·budget/mass)), so the gate compare is portable.  Output
    per language: token mass, applied rate, and the sampled doc/token
    counts — the oracle re-derives the whole budget computation.

    100 TB shape: the mixture table is one tiny per-language aggregate
    (partial-agg shuffle), BROADCAST back onto the corpus for a narrow
    filter — the corpus itself never shuffles to be sampled; the final
    per-language report is a second partial agg."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    lt = d.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    r = lt.withColumn(
        "rate_bp",
        F.floor(10000.0 * F.min("lang_tokens").over(Window.partitionBy())
                / F.col("lang_tokens")))
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("long") % 10000
    s = (d.join(F.broadcast(r.select("lang", "rate_bp")), "lang")
         .filter(bucket < F.col("rate_bp")))
    agg = s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_tok").alias("tok_sampled"))
    return (
        r.join(agg, "lang", "left")
        .select(
            "lang", "lang_tokens", "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("tok_sampled", F.lit(0)).cast("long")
            .alias("tok_sampled"),
        )
    )


@register(
    "x_mix_temperature",
    "WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) "
    " AS n_tok FROM documents), "
    "lt AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens FROM d "
    " GROUP BY lang), "
    "r AS (SELECT lang, lang_tokens, CAST(FLOOR(10000.0 * "
    " sqrt(CAST((SELECT MIN(lang_tokens) FROM lt) AS DOUBLE) "
    "      / lang_tokens)) AS BIGINT) AS rate_bp "
    " FROM lt), "
    "s AS (SELECT d.lang, d.n_tok FROM d JOIN r USING (lang) "
    " WHERE CAST(concat('0x', substr(md5('t:' || d.doc_id), 1, 8)) "
    "  AS BIGINT) % 10000 < r.rate_bp), "
    "agg AS (SELECT lang, COUNT(*) AS n_sampled, "
    " CAST(SUM(n_tok) AS BIGINT) AS tok_sampled FROM s GROUP BY lang) "
    "SELECT r.lang, r.lang_tokens, r.rate_bp, "
    "COALESCE(agg.n_sampled, 0) AS n_sampled, "
    "COALESCE(agg.tok_sampled, 0) AS tok_sampled "
    "FROM r LEFT JOIN agg USING (lang)",
)
def x_mix_temperature(spark, sf_dir):
    """Temperature-based data mixing, α = 0.5 — the multilingual-
    pretraining sampling rule (q_i ∝ mass_i^α): keep-rate per language
    is √(mass_min/mass_i), which IS the α = 0.5 mixture normalized so
    the smallest language is fully kept — low-resource languages are
    upweighted relative to proportional sampling but high-resource
    ones are not flattened to uniform (``x_mix_sample`` is the α → 0
    balanced-budget limit of the same machinery).

    Portability is exact, not approximate: mass ratios are exact in
    doubles at these magnitudes and IEEE-754 requires CORRECTLY-ROUNDED
    sqrt, so both engines floor identical basis-point rates — the
    reason this gate uses α = 0.5 specifically rather than a pow()
    whose last ulp is library-dependent.  The keep gate is the
    content-stable md5 draw (salted 't:' so it decorrelates from the
    other sampling gates).

    100 TB shape: identical to ``x_mix_sample`` — one tiny per-language
    aggregate broadcast back for a narrow filter; the corpus never
    shuffles."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    lt = d.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    r = lt.withColumn(
        "rate_bp",
        F.floor(10000.0 * F.sqrt(
            F.min("lang_tokens").over(Window.partitionBy())
            / F.col("lang_tokens"))).cast("long"))
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("t:"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 10000
    s = (d.join(F.broadcast(r.select("lang", "rate_bp")), "lang")
         .filter(bucket < F.col("rate_bp")))
    agg = s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_tok").alias("tok_sampled"))
    return (
        r.join(agg, "lang", "left")
        .select(
            "lang", "lang_tokens", "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("tok_sampled", F.lit(0)).cast("long")
            .alias("tok_sampled"),
        )
    )


@register(
    "x_rank_normalize",
    "WITH n AS (SELECT COUNT(*) AS n_total FROM documents), "
    "r AS (SELECT doc_id, n_chars, "
    " CAST(RANK() OVER (ORDER BY n_chars) - 1 AS BIGINT) AS rank_less "
    " FROM documents) "
    "SELECT r.doc_id, r.n_chars, r.rank_less, "
    "CAST((r.rank_less * 10) // n.n_total AS BIGINT) AS decile "
    "FROM r, n",
)
def x_rank_normalize(spark, sf_dir):
    """Exact global rank-normalization — every document gets its rank in
    the corpus-wide ``n_chars`` order (``rank_less`` = how many documents
    are strictly shorter = ``RANK() OVER (ORDER BY n_chars) - 1``) plus
    the decile bucket ``rank_less*10 div N``.  This is the
    quality-score → percentile step of curriculum/filtering pipelines
    (keep the top-X% by score), kept integer-exact so the oracle compares
    without float tolerance.

    The naive form is a single global window — ``RANK() OVER (ORDER BY
    ...)`` collapses 100 TB onto ONE task and is the canonical scale
    killer.  This plan never does that: (1) groupBy(value) shrinks the
    corpus to its value domain with a map-side partial agg; (2) the
    cumulative count over the grouped relation runs as the same two-pass
    arithmetic-bucket prefix sum as ``x_pack_sequences`` (per-bucket
    totals → #bucket-row running offsets → within-bucket window), so no
    stage sees more than a bucket's worth of ordered rows; (3) the
    rank table joins back on the value key — many-to-one, AQE-broadcast
    when the domain is small; for a heavy-tailed domain the hot/cold
    lane of ``dedup._join_back_skew_robust`` is the drop-in production
    variant.  Ranks are exact at every scale; nothing is sampled."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    cum = value_rank_table(d, "n_chars").drop("c")
    return (
        d.join(cum, "n_chars")
        .select("doc_id", "n_chars", "rank_less",
                F.expr("(rank_less * 10) div _n").alias("decile"))
    )


def value_rank_table(d: DataFrame, col: str,
                     unit_span: bool = True) -> DataFrame:
    """(value, c, rank_less, _n) per DISTINCT value of ``col`` —
    ``rank_less`` = how many rows carry a strictly smaller value, via
    the arithmetic-bucket two-pass prefix sum (no global-order window;
    the shape documented on :func:`x_rank_normalize`, refactored out in
    r13 so the quality-selection ops share one definition).

    ``unit_span=True`` keeps the integer form (span + 1 — the gated
    ``x_rank_normalize`` plan, exact for integer domains).  Pass
    ``unit_span=False`` for FRACTIONAL value domains: a [0, 1] score
    range under the +1 form lands every value in bucket 0 and the
    within-bucket window degenerates to one task over the whole value
    domain — the same collapse ``pack_and_shard`` fixed for fractional
    curriculum keys in r12; the real-span form buckets over the actual
    (hi − lo) with the top value capped into the last bucket."""
    spark = d.sparkSession
    p = spark.sparkContext.defaultParallelism
    g = d.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
    mm = g.agg(F.min(col).alias("_lo"), F.max(col).alias("_hi"),
               F.sum("c").alias("_n"))
    if unit_span:
        width = F.col("_hi") - F.col("_lo") + 1
    else:
        span = F.col("_hi") - F.col("_lo")
        width = F.when(span > 0, span).otherwise(F.lit(1.0))
    bucket = F.least(
        F.lit(p - 1),
        F.floor((F.col(col) - F.col("_lo")) * p / width)
    ).cast("int")
    gg = g.crossJoin(F.broadcast(mm)).withColumn("b", bucket)
    per = gg.groupBy("b").agg(F.sum("c").alias("bs"))
    wo = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(
        "b", F.coalesce(F.sum("bs").over(wo), F.lit(0)).alias("boff"))
    wl = Window.partitionBy("b").orderBy(col).rowsBetween(
        Window.unboundedPreceding, -1)
    return (
        gg.withColumn("local", F.coalesce(F.sum("c").over(wl), F.lit(0)))
        .join(F.broadcast(offs), "b")
        .select(col, "c",
                (F.col("local") + F.col("boff")).alias("rank_less"), "_n")
    )


def keep_top_fraction(docs: DataFrame, score_col: str, frac: float,
                      ascending: bool = False) -> DataFrame:
    """Keep the documents whose ``score_col`` falls in the corpus-wide
    top ``frac`` — the FineWeb-Edu-style quality selection (score the
    corpus, keep the best slice).  Threshold-INCLUSIVE at the boundary
    value: every document tied with the cutoff score is kept, so the
    result can exceed ``frac·n`` by the boundary tie mass (the honest
    deterministic semantics; a tie-broken exact-k variant is
    ``x_sample_exact_k``'s md5 machinery, at the cost of a second
    keyed pass).  ``ascending=True`` keeps the LOWEST slice (e.g.
    perplexity filtering).

    Scale shape: the exact threshold comes from
    :func:`value_rank_table` (value-domain-sized, never a global-order
    window) reduced to ONE row, broadcast back as a scalar filter —
    the corpus itself is touched by one narrow pass.  A null score
    fails loudly: silently dropping unscored docs would make the kept
    fraction lie.

    100 TB contract for RAW float scores: "value-domain-sized" is only
    smaller than the corpus when scores are GRIDDED (the staged
    fasttext gate floors probabilities to a 1e-4 grid; perplexities,
    classifier logits etc. should be quantized the same way —
    ``floor(1e4·p)/1e4`` changes no keep decision beyond the grid's
    own resolution and collapses the rank table to ≤10⁴ rows).  On
    un-quantized scores distinct values ≈ corpus rows and the rank
    table quietly grows corpus-sized — it stays bucket-partitioned
    (degrades to an extra corpus-sized two-pass shuffle, never a
    single-task window), but the right production tool for raw floats
    is :func:`keep_top_fraction_approx`, whose threshold state is a
    constant-size t-digest regardless of the value domain."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac!r}")
    d = docs.withColumn(score_col,
                        _finite_score_guard(score_col,
                                            "keep_top_fraction"))
    # real-span bucketing: quality scores are fractional ([0, 1]) and
    # the integer form would collapse the rank windows to one bucket
    rt = value_rank_table(d.select(score_col), score_col,
                          unit_span=False)
    if ascending:
        better = F.col("rank_less")                  # strictly smaller
    else:
        better = F.col("_n") - F.col("rank_less") - F.col("c")
    # budget = floor(frac·n) computed in EXACT integer arithmetic:
    # frac as parts-per-billion (driver-side exact int) times n in
    # DECIMAL — the naive double product silently loses a document on
    # ordinary fractions (0.58 * 100 = 57.999…994 → floor 57, review
    # find r13).  floor semantics also means frac·n < 1 keeps nothing —
    # the honest reading of "top 10% of 5 documents".
    frac_ppb = int(round(float(frac) * 1_000_000_000))
    budget = F.expr(
        f"CAST((CAST({frac_ppb} AS DECIMAL(38, 0)) * _n) DIV "
        "1000000000 AS BIGINT)")
    kept_vals = rt.withColumn("_keep", better < budget) \
        .filter(F.col("_keep"))
    thr = kept_vals.agg(
        (F.min(score_col) if not ascending else F.max(score_col))
        .alias("thr"))
    cond = (F.col(score_col) >= F.col("thr") if not ascending
            else F.col(score_col) <= F.col("thr"))
    # frac == 0 (or an empty frame) leaves thr NULL: the comparison is
    # NULL for every row and the filter keeps nothing — correct.
    return d.join(F.broadcast(thr)).filter(cond).drop("thr")


def _finite_score_guard(score_col: str, op: str):
    """Score column with null/NaN/±inf replaced by a loud
    ``raise_error`` naming the contract — shared by the exact and
    approx top-fraction paths (and shaped like ``pack_and_shard``'s
    curriculum guard).  Non-finite scores otherwise poison the
    bucket/percentile arithmetic into an opaque ANSI error or a
    silent mis-ranking."""
    sc = F.col(score_col)
    scd = sc.cast("double")
    finite = (sc.isNotNull() & ~F.isnan(scd)
              & (scd > float("-inf")) & (scd < float("inf")))
    return F.when(finite, sc).otherwise(F.raise_error(F.lit(
        f"{op}: null/NaN/inf {score_col} — score every document with "
        "a finite score first (empty docs score the classifier bias, "
        "not null)")))


def keep_top_fraction_approx(docs: DataFrame, score_col: str,
                             frac: float, ascending: bool = False,
                             accuracy: int = 10_000) -> DataFrame:
    """Approximate-threshold twin of :func:`keep_top_fraction` for RAW
    (un-gridded) float scores — the 100 TB path when distinct score
    values ≈ corpus rows and the exact rank table would itself be
    corpus-sized.

    The cutoff is ``percentile_approx(score, 1-frac)`` (Spark's
    Greenwald-Khanna/t-digest family sketch): ONE aggregate whose
    per-partition state is a constant-size sketch — map-side partials
    merge associatively, the reduce fan-in is #partitions sketches,
    nothing is value-domain- or corpus-sized — then the same broadcast
    scalar filter as the exact path.  Same threshold-inclusive
    semantics; the kept mass is ``frac·n`` within the sketch's rank
    error (≤ 1/``accuracy`` of n, so the default wanders by at most
    0.01 % of the corpus).  On gridded scores it lands on the exact
    path's boundary value when ``frac·n`` falls strictly INSIDE a tie
    block; when the budget lands exactly ON a block edge the quantile
    may resolve to the adjacent block (rank error straddles the edge) —
    one more reason the exact path stays the default for gridded
    scores.  Null/NaN/inf scores fail loudly with the shared contract
    message."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac!r}")
    d = docs.withColumn(
        score_col,
        _finite_score_guard(score_col, "keep_top_fraction_approx"))
    if frac == 0.0:
        # percentile q=1 would return the max and keep its tie mass;
        # the exact path's floor(0·n)=0 budget keeps nothing — match it
        return d.filter(F.lit(False))
    q = (1.0 - frac) if not ascending else frac
    thr = d.agg(F.percentile_approx(
        F.col(score_col).cast("double"), F.lit(q),
        F.lit(int(accuracy))).alias("thr"))
    sc = F.col(score_col).cast("double")
    cond = (sc >= F.col("thr")) if not ascending else (sc <= F.col("thr"))
    return d.join(F.broadcast(thr)).filter(cond).drop("thr")


#: DuckDB oracle for :func:`x_keep_top_approx` — the GK-sketch
#: top-fraction path made driver-verifiable.  Exactness argument (the
#: x_bpe_encode style): Spark's ``percentile_approx`` stores EVERY
#: sample while n ≤ accuracy (the Greenwald-Khanna buffer only
#: compresses beyond it), so at the verification scales (≤5000 docs vs
#: accuracy 10,000) it returns the exact discrete quantile — and its
#: rank convention matches DuckDB ``quantile_disc`` bit-for-bit
#: (verified empirically: 0/88 mismatches across n ∈ {1..500},
#: q ∈ {0..1}, random values AND heavy-tie grids).  Above the
#: accuracy the threshold is approximate BY DESIGN (that is the 100 TB
#: contract); the driver gate never runs there.  The score is a raw
#: float with ~corpus-many distinct values — ln(n_chars+2) + doc_id%97
#: — exactly the regime whose exact rank table would be corpus-sized,
#: i.e. the approx path's reason to exist.
_KEEP_TOP_APPROX_ORACLE = (
    "WITH s AS (SELECT doc_id, ln(n_chars + 2) + (doc_id % 97) AS sc "
    " FROM documents), "
    "thr AS (SELECT quantile_disc(sc, 0.8) AS t FROM s) "
    "SELECT s.doc_id, CAST(FLOOR(1e6 * s.sc) AS BIGINT) AS score_scaled "
    "FROM s, thr WHERE s.sc >= thr.t"
)


def x_keep_top_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20% quality selection through
    :func:`keep_top_fraction_approx` — the sketch-threshold plan shape
    (ONE constant-state percentile_approx aggregate → broadcast scalar
    filter) as a driver-verifiable gate, closing the VERDICT r15 #5
    gap ("no gated entry exercises the GK-sketch path").  Staged as an
    r19+ battery-swap candidate (zero-slack 150/50/3 cadence): until
    registration, tests/test_keep_top_fraction.py runs the
    driver-style compare against ``_KEEP_TOP_APPROX_ORACLE`` and the
    random-corpus battery + seed_sweep docs tier lock it."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.log(F.col("n_chars") + 2) + (F.col("doc_id") % 97)).alias("sc"))
    kept = keep_top_fraction_approx(docs, "sc", 0.2)
    return kept.select(
        "doc_id", F.floor(1e6 * F.col("sc")).cast("long").alias("score_scaled"))


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (round 11)
# ---------------------------------------------------------------------------

def dsir_features(docs: DataFrame, buckets: int = 8192,
                  ngram: int = 2, text_col: str = "text",
                  portable_hash: bool = False) -> DataFrame:
    """Hashed n-gram features per doc: (doc_id, bucket, cnt).

    The public DSIR recipe's featurizer (Xie et al., "Data Selection
    for Language Models via Importance Resampling"): word n-grams
    hashed into a fixed bucket space — corpus-size-independent state,
    all JVM (split + transform + explode + xxhash64).  Unigrams AND
    ``ngram``-grams both contribute, like the reference
    implementation.  Tokens come from the shared
    :func:`sparkdon.pipeline.text.nonempty_tokens` (leading/trailing
    whitespace must not manufacture phantom grams that shift a doc's
    weight).

    ``portable_hash=True`` swaps xxhash64 for the md5-prefix bucket
    hash (first 15 hex chars as a bigint, mod ``buckets``) that DuckDB
    replays verbatim — the same engine-portability trick as the
    simhash gate's md5 token hashes.  Bucketing quality is equivalent
    (both are uniform over the bucket space); xxhash64 stays the
    production default because it skips the hex round-trip."""
    from ._registry import spread_narrow_scan
    from .text import nonempty_tokens, word_ngrams

    # measured 3.1 → 2.4 s on the one-partition 5k fixture
    docs = spread_narrow_scan(docs)
    # tokenize in a projection of its own — see gopher_repetition's
    # note: slicing an inline split expression re-tokenizes per
    # position (quadratic per row)
    toked = docs.select(
        "doc_id", nonempty_tokens(F.col(text_col)).alias("_toks"))
    grams = F.flatten(F.array(*[
        word_ngrams(F.col("_toks"), n) for n in range(1, ngram + 1)]))
    return (
        toked.select("doc_id", F.explode(grams).alias("gram"))
        .filter(F.col("gram") != "")
        .select("doc_id",
                F.pmod(
                    F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
                    .cast("bigint") if portable_hash
                    else F.xxhash64("gram"),
                    F.lit(buckets)).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _bucket_dist(feats: DataFrame, buckets: int):
    """(bucket, logp) distribution with add-1 smoothing, plus the
    smoothing-floor log-prob for absent buckets.  The bucket histogram
    is ``localCheckpoint``-ed (it is ≤ buckets rows) so the total and
    the distribution are read off the materialized histogram instead of
    re-running the corpus-wide feature plan per consumer."""
    counts = feats.groupBy("bucket").agg(F.sum("cnt").alias("c")) \
        .transform(pin_shared)
    total = float(counts.agg(F.sum("c")).collect()[0][0] or 0) + buckets
    dist = counts.select(
        "bucket", F.log((F.col("c") + 1) / F.lit(total)).alias("logp"))
    import math

    return dist, math.log(1.0 / total)


def dsir_weights(source: DataFrame, target: DataFrame,
                 buckets: int = 8192, ngram: int = 2) -> DataFrame:
    """Per-source-doc importance log-weight toward the TARGET text
    distribution: ``log w(doc) = Σ_b cnt_b · (log p_target[b] −
    log q_source[b])`` over hashed n-gram buckets, add-1 smoothed.

    100 TB shape: both distributions reduce to buckets-sized
    checkpointed histograms (one partial agg each — the source corpus
    tokenizes twice in total: once for its histogram, once for the
    per-doc scoring join); the per-doc score is one broadcast join of
    doc features against the log-ratio frame plus a doc-keyed sum —
    no vocabulary state, no corpus-sized collect.  Returns
    (doc_id, log_weight); downstream resampling plugs into the
    existing weighted-sampling machinery."""
    sf = dsir_features(source, buckets, ngram)
    tf = dsir_features(target, buckets, ngram)
    src_d, src_floor = _bucket_dist(sf, buckets)
    tgt_d, tgt_floor = _bucket_dist(tf, buckets)
    ratio = (
        src_d.select("bucket", F.col("logp").alias("logq"))
        .join(tgt_d, "bucket", "full")
        .select(
            "bucket",
            (F.coalesce(F.col("logp"), F.lit(tgt_floor))
             - F.coalesce(F.col("logq"), F.lit(src_floor)))
            .alias("logratio"))
    )
    return (
        sf.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("logratio")).alias("log_weight"))
    )


#: Gate bucket count for :func:`x_dsir_weights` — small enough that the
#: two histograms are trivially broadcast, large enough that the
#: fixture's vocabulary doesn't saturate every bucket.
DSIR_GATE_BUCKETS = 4096

#: DuckDB oracle for :func:`x_dsir_weights` — the full DSIR pipeline
#: end-to-end (featurize → two histograms → smoothed log-ratio →
#: per-doc weight) replayed exactly: the md5-prefix bucket hash is
#: engine-portable (verified bit-equal), each bucket's log-ratio is
#: floored to 1e-6 units FIRST so every per-document sum is exact
#: integer arithmetic — order-independent across engines and
#: partitionings (the x_lm_score trick), with ln() the only float op,
#: evaluated once per BUCKET (≤2·buckets calls), never per doc.
#: ln((COALESCE(c,0)+1)/t) covers present and absent buckets in one
#: formula — identical arithmetic to the Spark side's coalesce of the
#: present-bucket logp with the driver-computed log(1/total) floor,
#: because the absent case is (0+1)/t = 1/t.
_DSIR_ORACLE = (
    "WITH ft AS (SELECT doc_id, source, "
    r"  list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')"
    "  AS t FROM documents), "
    "uni AS (SELECT doc_id, source, unnest(t) AS gram FROM ft), "
    "big AS (SELECT doc_id, source, array_to_string(t[i : i+1], ' ') AS gram "
    "  FROM ft, LATERAL unnest(generate_series(1, len(t) - 1)) AS u(i) "
    "  WHERE len(t) >= 2), "
    "grams AS (SELECT doc_id, source, gram FROM uni WHERE gram <> '' "
    "  UNION ALL SELECT doc_id, source, gram FROM big), "
    "feat AS (SELECT doc_id, source, "
    f"  CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % {DSIR_GATE_BUCKETS} "
    "  AS bucket FROM grams), "
    "sfeat AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt "
    "  FROM feat GROUP BY doc_id, bucket), "
    "shist AS (SELECT bucket, CAST(SUM(cnt) AS BIGINT) AS c "
    "  FROM sfeat GROUP BY bucket), "
    "thist AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c "
    "  FROM feat WHERE doc_id % 5 = 0 GROUP BY bucket), "
    f"stot AS (SELECT CAST(COALESCE(SUM(c), 0) + {DSIR_GATE_BUCKETS} AS DOUBLE) "
    "  AS t FROM shist), "
    f"ttot AS (SELECT CAST(COALESCE(SUM(c), 0) + {DSIR_GATE_BUCKETS} AS DOUBLE) "
    "  AS t FROM thist), "
    "ratio AS (SELECT COALESCE(s.bucket, tt.bucket) AS bucket, "
    "  CAST(FLOOR(1e6 * (ln((COALESCE(tt.c, 0) + 1.0) / ttot.t) "
    "                  - ln((COALESCE(s.c, 0) + 1.0) / stot.t))) AS BIGINT) "
    "  AS lr_scaled "
    "  FROM shist s FULL JOIN thist tt ON s.bucket = tt.bucket, stot, ttot) "
    "SELECT f.doc_id, CAST(SUM(f.cnt * r.lr_scaled) AS BIGINT) "
    " AS log_weight_scaled "
    "FROM sfeat f JOIN ratio r ON f.bucket = r.bucket GROUP BY f.doc_id"
)


def dsir_logweights_scaled(source: DataFrame, target: DataFrame,
                           buckets: int = DSIR_GATE_BUCKETS,
                           ngram: int = 2) -> DataFrame:
    """Engine-portable integer twin of :func:`dsir_weights`: identical
    pipeline (hashed-n-gram featurize → two ≤buckets-sized smoothed
    histograms → broadcast log-ratio join → per-doc sum), but each
    bucket's log-ratio is floored to 1e-6 units BEFORE the per-doc
    sum, so the document weight is an exact integer — reproducible
    across engines, partitionings, and reduction orders (raw double
    sums are order-sensitive at the ulp; the x_lm_score discipline).
    The ranking this induces differs from the raw-double path only
    within a bucket's 1e-6 quantization, far below the sketch noise of
    hashed features themselves.  Returns (doc_id, log_weight_scaled).

    100 TB shape is dsir_weights' own: two partial aggs whose fan-in
    is ≤buckets rows each, one broadcast join, one doc-keyed integer
    partial agg — no vocabulary state, no corpus-sized collect."""
    sf = dsir_features(source, buckets, ngram, portable_hash=True)
    tf = dsir_features(target, buckets, ngram, portable_hash=True)
    src_d, src_floor = _bucket_dist(sf, buckets)
    tgt_d, tgt_floor = _bucket_dist(tf, buckets)
    ratio = (
        src_d.select("bucket", F.col("logp").alias("logq"))
        .join(tgt_d, "bucket", "full")
        .select(
            "bucket",
            F.floor(F.lit(1e6) * (
                F.coalesce(F.col("logp"), F.lit(tgt_floor))
                - F.coalesce(F.col("logq"), F.lit(src_floor))))
            .cast("long").alias("lr_scaled"))
    )
    return (
        sf.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("lr_scaled")).cast("long")
             .alias("log_weight_scaled"))
    )


def x_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting end-to-end over the documents table:
    source = the whole corpus, target = the deterministic
    ``doc_id % 5 = 0`` slice (a fixed 20% "quality sample" that is
    non-empty on EVERY corpus — the driver fixture's source labels
    are src0..src19 while random test corpora use web/wiki/book, so a
    label-keyed target would leave one side's histogram empty and the
    gate would never exercise the target path; in production the
    target is the curated corpus, see
    :func:`test_scaled_weights_upweight_target_like_docs` for the
    wiki-slice semantics).  Built as an r18 battery-swap candidate
    (VERDICT r15 #5): NOT in ``pipeline.QUERIES`` yet — the 150/50/3
    cadence has zero slack, so registration waits for the r18 swap.
    Until then the driver-style compare against ``_DSIR_ORACLE`` runs
    in tests/test_dsir.py and the seed_sweep docs tier."""
    docs = table(spark, sf_dir, "documents")
    return dsir_logweights_scaled(
        docs, docs.filter(F.col("doc_id") % 5 == 0))


def dsir_resample(source: DataFrame, target: DataFrame, k: int,
                  buckets: int = 8192, ngram: int = 2,
                  temperature: float = 1.0) -> DataFrame:
    """Top-k importance resample: Gumbel-top-k over the DSIR
    log-weights with DETERMINISTIC hash noise (md5-derived uniform per
    doc_id — content-stable, engine-portable), equivalent to sampling
    k docs without replacement with probability ∝ w^(1/T).

    The selection is a TakeOrdered-style global top-k on
    ``log_weight/T + gumbel`` — no single-partition window."""
    w = dsir_weights(source, target, buckets, ngram)
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13),
                16, 10).cast("double") / F.lit(float(16 ** 13)))
    # clamp away from 0/1 so the double log is finite
    u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    gumbel = -F.log(-F.log(u))
    return (
        w.select("doc_id", "log_weight",
                 (F.col("log_weight") / temperature + gumbel).alias("_key"))
        .orderBy(F.desc("_key"), F.asc("doc_id"))
        .limit(k)
        .drop("_key")
    )


def unimax_budgets(source_tokens: dict, total_budget: float,
                   max_epochs: float = 1.0) -> dict:
    """UniMax budget allocation (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"): split ``total_budget`` tokens across sources as
    UNIFORMLY as possible subject to a per-source repetition cap —
    no source may contribute more than ``max_epochs`` passes over its
    own ``source_tokens[s]`` mass.

    Exact waterfilling on the (#sources)-sized dict: walk sources in
    ascending mass order; a source whose cap falls below the current
    equal share takes its cap and leaves the room to the rest; the
    first source whose cap covers the share ends the walk — every
    remaining (larger) source gets the same share, which makes the
    allocation the unique uniform-up-to-caps solution.  Pure driver
    math — the input is one row per SOURCE (languages/domains, never
    documents), the same bounded aggregate every mixing rule here
    collects.

    Returns ``{source: budget_tokens}`` with
    ``sum == min(total_budget, max_epochs * sum(masses))`` — when the
    caps cannot absorb the budget the surplus is left unspent (the
    paper's behavior: repeat no source past the cap), which the caller
    can detect by summing."""
    if total_budget < 0:
        raise ValueError(f"total_budget must be >= 0, "
                         f"got {total_budget!r}")
    if not max_epochs > 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs!r}")
    for s, m in source_tokens.items():
        if not m > 0:
            raise ValueError(f"unimax_budgets: source {s!r} has "
                             f"non-positive mass {m!r}")
    alloc: dict = {}
    order = sorted(source_tokens, key=lambda s: (source_tokens[s], str(s)))
    budget = float(total_budget)
    for i, s in enumerate(order):
        share = budget / (len(order) - i)
        cap = max_epochs * source_tokens[s]
        if cap <= share:
            alloc[s] = cap
            budget -= cap
        else:
            # sorted ascending: every remaining cap also exceeds the
            # share, so the rest is an equal split
            for t in order[i:]:
                alloc[t] = share
            budget = 0.0
            break
    return alloc


def unimax_sample(docs: DataFrame, total_budget: float,
                  source_col: str = "lang",
                  text_col: str = "text",
                  n_tok_col: str | None = None,
                  max_epochs: float = 1.0) -> DataFrame:
    """Apply :func:`unimax_budgets` to a corpus: appends

    - ``n_epochs`` (long) — full passes every document of the source
      makes into the mixture, and
    - ``in_partial`` (boolean) — whether the document is in the
      content-stable sample implementing the FRACTIONAL remainder of
      its source's budget (salted ``u:`` md5 gate, decorrelated from
      the other sampling gates);

    a loader streams each doc ``n_epochs + in_partial`` times.
    Repeats are NEVER materialized — at 100 TB an exploded
    max_epochs× corpus would multiply every downstream byte; counts
    are the mixture.

    Shape: one bounded per-source aggregate (fan-in = #sources)
    collected to the driver for the exact waterfill, then a broadcast
    join back and a narrow gate — the corpus itself never shuffles,
    the same contract as ``x_mix_temperature``."""
    from pyspark.sql.types import LongType, StructField, StructType

    for c in ("n_epochs", "in_partial", "partial_bp"):
        if c in docs.columns:
            raise ValueError(f"unimax_sample: column {c!r} is reserved")
    if n_tok_col:
        n_tok = F.col(n_tok_col).cast("double")
        null_msg = (f"unimax_sample: null {n_tok_col} — every document "
                    "needs a token count before mixing")
    else:
        from .text import nonempty_tokens

        n_tok = F.size(nonempty_tokens(F.col(text_col))).cast("double")
        null_msg = (f"unimax_sample: null {text_col} — null-text "
                    "documents have no token mass yet would receive "
                    "their source's full epochs; drop or empty them "
                    "before mixing")
    # a NULL token count contributes 0 to the source's mass yet the
    # doc still rides every epoch, inflating realized tokens — and a
    # source that is ALL null yields SUM(n_tok)=NULL, crashing the
    # driver waterfill with a bare TypeError (review find r13/advice
    # r14).  Refuse loudly, naming the contract.
    n_tok = F.when(n_tok.isNotNull(), n_tok).otherwise(
        F.raise_error(F.lit(null_msg)))
    # a NULL source would receive a budget its rows can never claim —
    # the inner equi-join drops them, silently under-spending the
    # mixture (review find r13).  Refuse, like every other silent-loss
    # path in this tier: bucket lang-id failures into a real label
    # ('unk') before mixing.
    sc_ = F.col(source_col)
    guarded_src = F.when(sc_.isNotNull(), sc_).otherwise(
        F.raise_error(F.lit(
            f"unimax_sample: null {source_col} — assign unlabeled "
            "documents a real source value (e.g. 'unk') before mixing")))
    docs = docs.withColumn(source_col, guarded_src)
    masses = {r[0]: float(r[1]) for r in
              docs.groupBy(source_col).agg(F.sum(n_tok)).collect()}
    alloc = unimax_budgets(masses, total_budget, max_epochs)
    spark = docs.sparkSession
    rows = []
    for s in sorted(masses, key=str):
        epochs = alloc[s] / masses[s]
        # snap near-integer epochs (float-division noise) so a source
        # due exactly N epochs never lands at N-1 full + 9999-bp
        # partial, and ROUND the basis-point remainder instead of
        # truncating — int(10000*frac) bias runs up to 1e-4 of a
        # source's mass (advice r14)
        if abs(epochs - round(epochs)) < 1e-9:
            epochs = float(round(epochs))
        full = int(epochs)
        bp = int(round(10000 * (epochs - full)))
        if bp == 10000:  # remainder rounded up to a whole epoch
            full, bp = full + 1, 0
        rows.append((s, full, bp))
    plan = spark.createDataFrame(rows, StructType([
        docs.schema[source_col],
        StructField("n_epochs", LongType()),
        StructField("partial_bp", LongType())]))
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("u:"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 10000
    return (docs.join(F.broadcast(plan), source_col)
            .withColumn("in_partial", bucket < F.col("partial_bp"))
            .drop("partial_bp"))
