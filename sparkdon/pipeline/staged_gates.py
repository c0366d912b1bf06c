"""Staged driver gates for the learned tier — built in r13, registered
into the live battery at the r15 cycle boundary (PERF.md "Round 13:
battery-swap design note", executed r15 first commit).

The 150-entry battery / 50-entry window / 3-round verification cadence
has zero slack, so these three entries waited out r13/r14 here with the
SAME contract as registered entries — a (spark, sf_dir) callable plus a
DuckDB oracle — while ``tests/test_staged_gates.py`` ran the full
driver-style comparison (row count, columns, order-insensitive
canonical values) every session.  At r15 the three redundant relational
gates (``u2_except``, ``u3_intersect``, ``f1_str_cast``) retired with
their own due cohort (they live on as :mod:`sparkdon.relational`'s
RETIRED tier, still pytest-oracled) and the ``register`` loop at the
bottom of this module put these three into ``pipeline.QUERIES`` /
``ORACLE``; the r15 ``_FRONT`` window carries them (never-green → due
immediately; 47 surviving r12-cohort entries + these 3 = 50), and
``scripts/derive_window.py --check`` enforces the arithmetic.

STANDING GATE-ADMISSION RULE (r14, VERDICT r13 #6): every oracle that
enters (or is staged for) the battery MUST first pass
``tests/test_fuzz_pipeline_oracles.py`` on the regenerated random
corpora — the fixture-only compare has repeatedly certified oracles
that crash or silently drop rows on shapes the fixture lacks (the r13
battery found eight such defects).  The three gates here carry that
evidence (``test_staged_gates_match_on_random_corpus``); any future
swap candidate (e.g. ``x_trim_spans``, r14) must arrive with its own
battery entry before registration is even scheduled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ._registry import register, table

# no __all__: the package facade's duplicate-definition guard treats a
# repeated module-level assignment as a shadowing hazard, and this
# module's surface is exactly the STAGED/STAGED_ORACLE dicts below


# ---------------------------------------------------------------------------
# x_bpe_encode — full trained-merge-list encoding, driver-verified
# ---------------------------------------------------------------------------

#: fixed tokenizer artifact for the gate: the first 30 merges
#: ``bpe_train_merges`` learns on the sf0.01 documents fixture, PINNED
#: (a gate must not train in-gate — the artifact is the input, exactly
#: as deployment ships a frozen merges.txt).  The list exercises
#: multi-level merge chains ((a,s)→(as,h)→(h,ash); (at,c)→(atc,h)→
#: (b,atch)) and same-target competition, so ordering bugs cannot hide.
STAGED_BPE_MERGES: list = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"),
]


def x_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode ``documents`` with the pinned merge list and return each
    document's token sequence as one space-joined string — BPE tokens
    never contain whitespace (``save_bpe_merges`` enforces it), so the
    join is lossless and hash-comparable."""
    from .text import bpe_encode

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    return (bpe_encode(docs, STAGED_BPE_MERGES)
            .select("doc_id",
                    F.concat_ws(" ", "bpe_tokens").alias("bpe_text")))


def _bpe_word_expr(merges: list, var: str = "w") -> str:
    """The per-word DuckDB merge-apply expression (shared by the oracle
    and its fuzz lock, so the verified construction IS the deployed
    one).

    The symbol sequence rides as a ``chr(31)``-delimited string (sep at
    every boundary INCLUDING both ends); one merge (a, b) is
    ``replace(s, sep·a·sep·b·sep, sep·ab·sep)`` applied TWICE.  For
    a ≠ b, twice is exact, not heuristic: replace() consumes its
    match's trailing separator, so an occurrence immediately after a
    replaced one is skipped in pass 1 — but two skipped occurrences can
    never be adjacent (the second would still have its leading
    separator and would have been replaced), so pass 2 catches every
    leftover; and merging can create no NEW (a, b) adjacency (ab ≠ a
    and ab ≠ b by length), so pass 2 cannot over-merge.  For a == b the
    argument FAILS — occurrences overlap in symbol space, and a run of
    five gives [aa, a, aa] vs the encoder's greedy [aa, aa, a] (review
    find, r13) — so same-symbol merges are REJECTED loudly here: a
    future repin of STAGED_BPE_MERGES that learns e.g. ('e', 'e') must
    fail at build time, never as a silent driver mismatch."""
    for a, b in merges:
        if a == b:
            raise ValueError(
                f"_bpe_word_expr: same-symbol merge ({a!r}, {b!r}) — "
                "the replace-twice oracle is only exact for a != b; "
                "pin a merge list without same-symbol merges")
    sep = "chr(31)"

    def q(s: str) -> str:
        return s.replace("'", "''")

    expr = f"{sep} || regexp_replace({var}, '(.)', '\\1' || chr(31), 'g')"
    for a, b in merges:
        pat = f"{sep} || '{q(a)}' || {sep} || '{q(b)}' || {sep}"
        rep = f"{sep} || '{q(a + b)}' || {sep}"
        expr = f"replace(replace({expr}, {pat}, {rep}), {pat}, {rep})"
    return (f"array_to_string(list_filter("
            f"string_split({expr}, chr(31)), x -> x <> ''), ' ')")


def _bpe_oracle() -> str:
    """DuckDB replication of the greedy left-to-right merge apply —
    see :func:`_bpe_word_expr` for the construction and its exactness
    argument."""
    # coalesce: DuckDB's array_to_string([]) is NULL where Spark's
    # concat_ws gives '' — an empty document must encode to the empty
    # string on both sides (r13 random-corpus fuzz find)
    return (
        "SELECT doc_id, coalesce(array_to_string(list_transform("
        " list_filter(string_split(text, ' '), w -> w <> ''),"
        f" w -> {_bpe_word_expr(STAGED_BPE_MERGES)}), ' '), '') AS bpe_text"
        " FROM documents"
    )


# ---------------------------------------------------------------------------
# x_fasttext_score — hashed-n-gram linear scoring, driver-verified
# ---------------------------------------------------------------------------

_SCORE_BUCKETS = 8192

#: fixed scoring model: 32 nonzero weight buckets (a deployed model is
#: dense, but a CASE ladder over thousands of buckets would make the
#: oracle unreadable; 32 hit buckets exercise the full featurize →
#: lookup → mean → sigmoid path).  Weights are multiples of 2^-6, so
#: the per-document weight SUM is exact in binary floating point and
#: therefore identical under any accumulation order — the sum is the
#: only order-sensitive float op, which removes Spark-vs-DuckDB fold
#: order from the comparison entirely (the remaining ops — one divide,
#: one exp, one floor — are IEEE-deterministic or asserted far from
#:  the 1e-4 grid by the boundary-margin test).
_SCORE_WEIGHTS: dict = {
    (i * 251 + 7) % _SCORE_BUCKETS: ((-1) ** i) * (i + 1) / 64.0
    for i in range(32)
}
_SCORE_BIAS = 0.125


def _staged_score_model() -> dict:
    w = [0.0] * _SCORE_BUCKETS
    for b, v in _SCORE_WEIGHTS.items():
        w[b] = v
    return {"w": w, "bias": _SCORE_BIAS, "buckets": _SCORE_BUCKETS,
            "ngram": 2, "text_col": "text", "char_ngrams": None,
            "hash": "md5"}


def x_fasttext_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score ``documents`` with the pinned model through the public
    :func:`sparkdon.pipeline.classifier.fasttext_score` path
    (md5-bucketed features so DuckDB can replicate the hash), emitting
    ``floor(10000·p)`` — the 1e-4 integer-scaling trick
    ``x_dedup_jaccard`` uses to keep float noise out of the driver's
    value hash."""
    from ._registry import spread_narrow_scan
    from .classifier import fasttext_score

    # r16: scoring is a narrow zero-shuffle projection, so it inherits
    # the scan's partitioning — a one-file fixture ran the whole
    # md5-per-gram scoring pass on ONE core (guide §2.5; no-op once
    # scan partitions >= cores)
    docs = spread_narrow_scan(
        table(spark, sf_dir, "documents")).select("doc_id", "text")
    return (fasttext_score(docs, _staged_score_model(), out_col="_p")
            .select("doc_id",
                    F.floor(F.lit(10000.0) * F.col("_p")).cast("long")
                    .alias("score_scaled")))


def _score_oracle() -> str:
    bucket = (f"CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) "
              f"% {_SCORE_BUCKETS}")
    ladder = " ".join(
        f"WHEN {b} THEN {v!r}"
        for b, v in sorted(_SCORE_WEIGHTS.items()))
    wexpr = f"CASE {bucket} {ladder} ELSE 0.0 END"
    return (
        "WITH t AS (SELECT doc_id,"
        " list_filter(string_split(text, ' '), x -> x <> '') AS toks"
        " FROM documents), "
        "f AS (SELECT doc_id, toks || list_transform("
        " range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])"
        " AS grams FROM t), "
        "s AS (SELECT doc_id,"
        f" coalesce(list_sum(list_transform(grams, g -> {wexpr})), 0.0)"
        "  AS total, greatest(len(grams), 1) AS n FROM f) "
        f"SELECT doc_id, CAST(FLOOR(10000.0 * (1.0 / (1.0 + "
        f"exp(-({_SCORE_BIAS!r} + total / n))))) AS BIGINT)"
        " AS score_scaled FROM s"
    )


# ---------------------------------------------------------------------------
# x_pack_shard — curriculum-ordered packing assignment, driver-verified
# ---------------------------------------------------------------------------

def x_pack_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`sparkdon.pipeline.packing.pack_assignment`'s CURRICULUM
    path — the one ordering rule ``x_pack_sequences``/``x_corpus_pack``
    (id order) do not cover: documents pack in (score, doc_id) order
    through the same two-pass distributed prefix sum, with the score a
    deterministic derived column (``(doc_id·37) % 101`` — dense ties,
    so the doc_id tie-break is genuinely load-bearing)."""
    from .packing import PACK_SEQ_LEN, pack_assignment

    docs = table(spark, sf_dir, "documents").select("doc_id", "text") \
        .withColumn("score", ((F.col("doc_id") * 37) % 101)
                    .cast("double"))
    return pack_assignment(docs, seq_len=PACK_SEQ_LEN,
                           order_col="score").select(
        "doc_id", "n_tok", "start_tok", "seq_id", "seq_offset")


def _pack_oracle() -> str:
    from .packing import PACK_SEQ_LEN

    return (
        "WITH d AS (SELECT doc_id,"
        " CAST((doc_id * 37) % 101 AS DOUBLE) AS score,"
        " CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))"
        "  AS BIGINT) AS n_tok FROM documents), "
        "c AS (SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER ("
        " ORDER BY score, doc_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS BIGINT) AS start_tok FROM d) "
        "SELECT doc_id, n_tok, start_tok, "
        f"CAST(FLOOR(start_tok / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id, "
        f"CAST(start_tok % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset "
        "FROM c"
    )


STAGED = {
    "x_bpe_encode": x_bpe_encode,
    "x_fasttext_score": x_fasttext_score,
    "x_pack_shard": x_pack_shard,
}

STAGED_ORACLE = {
    "x_bpe_encode": _bpe_oracle(),
    "x_fasttext_score": _score_oracle(),
    "x_pack_shard": _pack_oracle(),
}

# r15 battery swap (PERF.md r13 design note, executed): the three gates
# above enter the driver battery in place of the retired
# u2_except/u3_intersect/f1_str_cast trio (now sparkdon.relational's
# RETIRED tier, still pytest-oracled).  STAGED/STAGED_ORACLE remain the
# canonical views this module's tests and scripts/seed_sweep.py iterate.
for _k in STAGED:
    register(_k, STAGED_ORACLE[_k])(STAGED[_k])
del _k
