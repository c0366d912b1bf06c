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


#: Entries hoisted into the driver's verification window.  Round 9, in
#: priority order (freshness invariant: no battery entry's newest
#: driver-green row may be older than two rounds, so r09 must cover
#: everything whose newest green is r06 -- after r08 those 38 entries
#: are exactly two rounds stale):
#: 1. Gates whose Spark-side code changed this round
#:    (x_dedup_priority: the src_rank substring-length advice fix).
#: 2. The 38 entries whose newest driver-green row is r06 (the r07/r08
#:    windows cut them; VERDICT r8 item 2 lists them explicitly).
#: The ~90 remaining entries are all r07/r08-green and stay within the
#: two-round freshness budget (r07 u r08 u r09 covers the battery).
_FRONT = [
    # 0. round-9 NEW gates (never driver-verified)
    "x_dedup_intra", "x_ngram_novelty", "x_sample_weighted",
    "sparql_strfuncs", "x_dedup_substring", "x_contamination_stream",
    "x_pivot_source_lang", "x_events_rollup", "x_event_lag",
    # 1. changed code paths this round
    "x_dedup_priority",
    # 2. r06-green refresh (two rounds stale after r08)
    "a2_group_expr", "a4_global_agg", "a5_group_multi_pattern",
    "a7_distinct", "a9_multi_agg",
    "f1_str_cast", "f3_strstarts", "f4_substr",
    "o1_order_asc", "o2_topk_desc", "o3_order_computed", "o4_limit_topk",
    "p1_scan_filter", "p3_constant_pushdown", "p4_projection_expr",
    "p5_filter_compare", "p6_bool_connectives", "p7_filter_in",
    "p8_bind", "p9_values_join",
    "q_decollect_seq",
    "sparql_ask", "sparql_construct_count", "sparql_group_concat",
    "sparql_offset",
    "u1_union", "u2_except", "u3_intersect",
    "x_asof_join", "x_dedup_clusters", "x_dedup_stream",
    "x_event_percentiles", "x_sample_stratified", "x_text_repetition",
    "x_topk_per_lang", "x_vocab_topk", "x_window_sliding",
    "x_window_stream",
    # 3. fill to 50 with r07-green entries (newest green r07 -> due for
    #    refresh in r10 anyway; pulling 11 forward spreads the load and
    #    pins the window deterministically) -- preferring gates whose
    #    code moved in this round's pipeline-package split
    "x_dedup_minhash",
    # x_chunk_dedup stays in-window: its Spark plan changed this round
    # (window -> aggregate+join keep rule) and must re-verify
    "x_chunk_dedup",
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
