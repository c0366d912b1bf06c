"""SPARQL engine end-to-end correctness entries.

Each query here runs REAL SPARQL text through the full pipeline
(parse → compile → Catalyst → execute) over rdf-ized driver tables
(:mod:`sparkdon.rdfize`), then flattens the term-struct bindings to plain
columns so the driver can hash-compare against a DuckDB oracle running
plain SQL on the ORIGINAL relational tables.  A green row here certifies
the whole engine stack, not just a DataFrame translation.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdon.rdfize import rdfize
from sparkdon.session import LocalEndpoint

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: Dict[str, str] = {}

PREFIXES = {
    "p": "urn:p:",
    "c": "urn:c:",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


#: lazy DataFrame plans are safely reusable across queries in one session;
#: caching avoids rebuilding the 14-branch rdfize union per gate entry
_GRAPH_CACHE: dict[tuple, DataFrame] = {}


def _graph(spark: SparkSession, sf_dir: str, tables, located_in: bool = False) -> DataFrame:
    # applicationId, not id(spark): id() of a stopped session can be
    # reused by a new object, which would hand back plans bound to a
    # dead SparkContext
    key = (spark.sparkContext.applicationId, sf_dir, tuple(tables), located_in)
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = rdfize(spark, sf_dir, tables, located_in=located_in)
    return _GRAPH_CACHE[key]


def endpoint(spark: SparkSession, sf_dir: str,
             tables=("region", "nation", "customer", "supplier"),
             use_ids: bool = False) -> LocalEndpoint:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return LocalEndpoint(spark, _graph(spark, sf_dir, tables), prefixes=PREFIXES,
                         use_ids=use_ids)


def run(spark: SparkSession, sf_dir: str, sparql: str, schema: dict[str, str],
        tables=("region", "nation", "customer", "supplier"),
        use_ids: bool = False) -> DataFrame:
    """Execute SPARQL, flatten term structs to typed columns.

    schema: output column -> 'str' | 'long' | 'double' (cast from the
    term's lexical form — lossless for values that came from the parquet
    in the first place)."""
    e = endpoint(spark, sf_dir, tables, use_ids=use_ids)
    raw = e.select_raw(sparql)
    cols = []
    for name, typ in schema.items():
        c = raw["v_" + name]["lex"]
        if typ != "str":
            c = c.try_cast(typ)
        cols.append(c.alias(name))
    return raw.select(*cols)


@register(
    "sparql_census",
    # property census over the rdf-ized graph == per-column NON-NULL
    # counts (rdfize emits no triple for a NULL value, so count(col)
    # — not count(*) — is the form that stays correct on data with
    # nulls; the r13 null-injection differential caught this)
    "SELECT p, cnt FROM ("
    " SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,"
    "  (SELECT count(*) FROM region)+(SELECT count(*) FROM nation)"
    "  +(SELECT count(*) FROM customer)+(SELECT count(*) FROM supplier) AS cnt"
    " UNION ALL SELECT 'urn:p:r_name', (SELECT count(r_name) FROM region)"
    " UNION ALL SELECT 'urn:p:n_name', (SELECT count(n_name) FROM nation)"
    " UNION ALL SELECT 'urn:p:n_regionkey', (SELECT count(n_regionkey) FROM nation)"
    " UNION ALL SELECT 'urn:p:c_name', (SELECT count(c_name) FROM customer)"
    " UNION ALL SELECT 'urn:p:c_nationkey', (SELECT count(c_nationkey) FROM customer)"
    " UNION ALL SELECT 'urn:p:c_acctbal', (SELECT count(c_acctbal) FROM customer)"
    " UNION ALL SELECT 'urn:p:c_mktsegment', (SELECT count(c_mktsegment) FROM customer)"
    " UNION ALL SELECT 'urn:p:s_name', (SELECT count(s_name) FROM supplier)"
    " UNION ALL SELECT 'urn:p:s_nationkey', (SELECT count(s_nationkey) FROM supplier)"
    " UNION ALL SELECT 'urn:p:s_acctbal', (SELECT count(s_acctbal) FROM supplier)"
    ")",
)
def sparql_census(spark, sf_dir):
    """The reference's signature query (DBpedia_Schema_Queries#cell10)
    through the engine: scan → groupBy(p) → count → order."""
    return run(
        spark, sf_dir,
        "SELECT ?p (COUNT(*) AS ?cnt) { ?s ?p ?o } GROUP BY ?p ORDER BY DESC(?cnt)",
        {"p": "str", "cnt": "long"},
    )


@register(
    "sparql_census_ids",
    "SELECT p, cnt FROM ("
    " SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,"
    "  (SELECT count(*) FROM region)+(SELECT count(*) FROM nation)"
    "  +(SELECT count(*) FROM customer)+(SELECT count(*) FROM supplier) AS cnt"
    " UNION ALL SELECT 'urn:p:r_name', (SELECT count(r_name) FROM region)"
    " UNION ALL SELECT 'urn:p:n_name', (SELECT count(n_name) FROM nation)"
    " UNION ALL SELECT 'urn:p:n_regionkey', (SELECT count(n_regionkey) FROM nation)"
    " UNION ALL SELECT 'urn:p:c_name', (SELECT count(c_name) FROM customer)"
    " UNION ALL SELECT 'urn:p:c_nationkey', (SELECT count(c_nationkey) FROM customer)"
    " UNION ALL SELECT 'urn:p:c_acctbal', (SELECT count(c_acctbal) FROM customer)"
    " UNION ALL SELECT 'urn:p:c_mktsegment', (SELECT count(c_mktsegment) FROM customer)"
    " UNION ALL SELECT 'urn:p:s_name', (SELECT count(s_name) FROM supplier)"
    " UNION ALL SELECT 'urn:p:s_nationkey', (SELECT count(s_nationkey) FROM supplier)"
    " UNION ALL SELECT 'urn:p:s_acctbal', (SELECT count(s_acctbal) FROM supplier)"
    ")",
)
def sparql_census_ids(spark, sf_dir):
    """The signature census with ``use_ids``: ?s/?o are id-only (COUNT(*)
    never observes them) and the group key ?p is LATE — the aggregation
    exchange carries 8-byte predicate ids and `_aggregate` decodes the
    handful of distinct predicates on the per-group frame.  This is the
    workload the reference's corpus is dominated by (property censuses),
    id-encoded end to end."""
    return run(
        spark, sf_dir,
        "SELECT ?p (COUNT(*) AS ?cnt) { ?s ?p ?o } GROUP BY ?p ORDER BY DESC(?cnt)",
        {"p": "str", "cnt": "long"},
        use_ids=True,
    )


@register(
    "sparql_filter_gt",
    "SELECT 'urn:g:customer:' || c_custkey AS cust, c_acctbal AS bal "
    "FROM customer WHERE c_acctbal > 5000",
)
def sparql_filter_gt(spark, sf_dir):
    """P5/F-tier: numeric FILTER over typed literals."""
    return run(
        spark, sf_dir,
        "SELECT ?cust ?bal { ?cust p:c_acctbal ?bal . FILTER(?bal > 5000) }",
        {"cust": "str", "bal": "double"},
    )


@register(
    "sparql_join_agg",
    "SELECT n.n_name AS nation, count(*) AS cnt FROM customer c "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name",
)
def sparql_join_agg(spark, sf_dir):
    """J1+A1: BGP join chain + grouped count through the engine."""
    return run(
        spark, sf_dir,
        "SELECT ?nation (COUNT(*) AS ?cnt) { "
        " ?c a c:customer . ?c p:c_nationkey ?n . ?n p:n_name ?nation } "
        "GROUP BY ?nation",
        {"nation": "str", "cnt": "long"},
    )


@register(
    "sparql_join_agg_ids",
    "SELECT n.n_name AS nation, count(*) AS cnt FROM customer c "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey GROUP BY n.n_name",
)
def sparql_join_agg_ids(spark, sf_dir):
    """The same J1+A1 chain with ``use_ids`` on: the join-only variables
    ?c and ?n travel as 64-bit term ids instead of term structs
    (compile.py use_ids / SURVEY.md §4.3 dictionary v2) — oracle-checked
    so the shuffle-shrinking mode is correctness-gated, not just
    pytest-asserted."""
    return run(
        spark, sf_dir,
        "SELECT ?nation (COUNT(*) AS ?cnt) { "
        " ?c a c:customer . ?c p:c_nationkey ?n . ?n p:n_name ?nation } "
        "GROUP BY ?nation",
        {"nation": "str", "cnt": "long"},
        use_ids=True,
    )


@register(
    "sparql_optional",
    "SELECT n.n_name AS nation, count(s.s_suppkey) AS suppliers FROM nation n "
    "LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name",
)
def sparql_optional(spark, sf_dir):
    """P10/J2: OPTIONAL keeps unmatched nations with COUNT(?s)=0."""
    return run(
        spark, sf_dir,
        "SELECT ?nation (COUNT(?s) AS ?suppliers) { "
        " ?n a c:nation . ?n p:n_name ?nation . "
        " OPTIONAL { ?s p:s_nationkey ?n } } GROUP BY ?nation",
        {"nation": "str", "suppliers": "long"},
    )


@register(
    "sparql_optional_ids",
    "SELECT n.n_name AS nation, count(s.s_suppkey) AS suppliers FROM nation n "
    "LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name",
)
def sparql_optional_ids(spark, sf_dir):
    """sparql_optional with ``use_ids``: COUNT(?s) over a bare variable
    only needs presence/equality, so ?s and ?n stay id-encoded end to end
    (r4 extension of the id analysis) — the OPTIONAL's left-outer join
    and the count both run on 8-byte ids."""
    return run(
        spark, sf_dir,
        "SELECT ?nation (COUNT(?s) AS ?suppliers) { "
        " ?n a c:nation . ?n p:n_name ?nation . "
        " OPTIONAL { ?s p:s_nationkey ?n } } GROUP BY ?nation",
        {"nation": "str", "suppliers": "long"},
        use_ids=True,
    )


@register(
    "sparql_late_ids",
    "SELECT c.c_name AS cust, r.r_name AS rname FROM customer c "
    "JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "WHERE c.c_acctbal > 9000",
)
def sparql_late_ids(spark, sf_dir):
    """Late materialization (use_ids v3): ?cust and ?rname are *projected*
    values, yet they cross the whole customer→nation→region join chain as
    8-byte ids and are decoded by one left join per var at the end
    (compile.py ``late`` / ``_decode_late``).  ?c and ?n/?r stay id-only.
    Oracle-checked so the deferred-decode path is correctness-gated."""
    return run(
        spark, sf_dir,
        "SELECT ?cust ?rname { ?c p:c_name ?cust . ?c p:c_nationkey ?n . "
        " ?n p:n_regionkey ?r . ?r p:r_name ?rname . ?c p:c_acctbal ?bal . "
        " FILTER(?bal > 9000) }",
        {"cust": "str", "rname": "str"},
        tables=("region", "nation", "customer", "supplier"),
        use_ids=True,
    )


@register(
    "sparql_not_exists",
    "SELECT n_name AS nation FROM nation n WHERE NOT EXISTS "
    "(SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey "
    " AND s.s_acctbal > 5000)",
)
def sparql_not_exists(spark, sf_dir):
    """J3: FILTER NOT EXISTS with an inner FILTER (the shape of
    DBpedia_Schema_Queries#cell46)."""
    return run(
        spark, sf_dir,
        "SELECT ?nation { ?n a c:nation . ?n p:n_name ?nation . "
        "FILTER NOT EXISTS { ?s p:s_nationkey ?n . ?s p:s_acctbal ?b . "
        "FILTER(?b > 5000) } }",
        {"nation": "str"},
    )


@register(
    "sparql_minus",
    "SELECT 'urn:g:nation:' || n_nationkey AS n FROM nation "
    "EXCEPT SELECT 'urn:g:nation:' || s_nationkey FROM supplier "
    "WHERE s_acctbal > 5000",
)
def sparql_minus(spark, sf_dir):
    """J4: MINUS on the shared-variable set (inner pattern filtered so the
    difference is non-empty at every sf)."""
    return run(
        spark, sf_dir,
        "SELECT ?n { ?n a c:nation MINUS { ?s p:s_nationkey ?n . "
        "?s p:s_acctbal ?b . FILTER(?b > 5000) } }",
        {"n": "str"},
    )


@register(
    "sparql_union",
    "SELECT c_name AS name FROM customer UNION ALL SELECT s_name FROM supplier",
)
def sparql_union(spark, sf_dir):
    """U1: UNION with bag semantics."""
    return run(
        spark, sf_dir,
        "SELECT ?name { { ?x p:c_name ?name } UNION { ?x p:s_name ?name } }",
        {"name": "str"},
    )


@register(
    "sparql_values",
    "SELECT n.n_name AS nation, r.r_name AS region FROM nation n "
    "JOIN region r ON n.n_regionkey = r.r_regionkey "
    "WHERE r.r_name IN ('ASIA', 'AFRICA')",
)
def sparql_values(spark, sf_dir):
    """P9: VALUES inline table (broadcast) constraining a join."""
    return run(
        spark, sf_dir,
        'SELECT ?nation ?region { VALUES (?region) { ("ASIA") ("AFRICA") } '
        " ?n p:n_regionkey ?r . ?r p:r_name ?region . ?n p:n_name ?nation }",
        {"nation": "str", "region": "str"},
    )


@register(
    "sparql_path_seq",
    "SELECT 'urn:g:customer:' || c.c_custkey AS cust, r.r_name AS region "
    "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
    "JOIN region r ON n.n_regionkey = r.r_regionkey",
)
def sparql_path_seq(spark, sf_dir):
    """G1: sequence property path customer→nation→region."""
    return run(
        spark, sf_dir,
        "SELECT ?cust ?region { ?cust p:c_nationkey/p:n_regionkey/p:r_name ?region }",
        {"cust": "str", "region": "str"},
    )


@register(
    "sparql_path_inverse",
    "SELECT 'urn:g:supplier:' || s_suppkey AS supp FROM supplier s "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey WHERE n.n_name = 'NATION_7'",
)
def sparql_path_inverse(spark, sf_dir):
    """G2: inverse-direction hop from a constant literal anchor."""
    return run(
        spark, sf_dir,
        # literal anchor in subject position — the trick a DataFrame engine
        # gets for free (Inference_Over_RDF_Containers#cell56,64)
        'SELECT ?supp { "NATION_7" ^p:n_name/^p:s_nationkey ?supp . '
        " ?supp a c:supplier }",
        {"supp": "str"},
    )


@register(
    "sparql_path_nps",
    # negating every predicate except n_regionkey leaves exactly the
    # nation→region FK edges
    "SELECT 'urn:g:nation:' || n_nationkey AS s, "
    "'urn:g:region:' || n_regionkey AS o FROM nation",
)
def sparql_path_nps(spark, sf_dir):
    """G-tier: negated property set !(iri|...|a) — one predicate NOT-IN
    filter over the triple scan (spec §18.4; paths.py 'nps')."""
    return run(
        spark, sf_dir,
        "SELECT ?s ?o { ?s !(a|p:r_name|p:n_name|p:c_name|p:c_nationkey"
        "|p:c_acctbal|p:c_mktsegment|p:s_name|p:s_nationkey|p:s_acctbal) ?o }",
        {"s": "str", "o": "str"},
    )


@register(
    "sparql_subquery_having",
    "SELECT n.n_name AS nation, cnt FROM "
    "(SELECT c_nationkey, count(*) AS cnt FROM customer GROUP BY c_nationkey "
    " HAVING count(*) > 5) x JOIN nation n ON x.c_nationkey = n.n_nationkey",
)
def sparql_subquery_having(spark, sf_dir):
    """A6: aggregate subquery + outer FILTER (HAVING emulation,
    DBpedia_Schema_Queries#cell62)."""
    return run(
        spark, sf_dir,
        "SELECT ?nation ?cnt { "
        " { SELECT ?n (COUNT(*) AS ?cnt) { ?c p:c_nationkey ?n } GROUP BY ?n } "
        " FILTER(?cnt > 5) ?n p:n_name ?nation }",
        {"nation": "str", "cnt": "long"},
    )


@register(
    "sparql_orderby_limit",
    "SELECT c_name AS name, c_acctbal AS bal FROM customer "
    "ORDER BY c_acctbal DESC, c_name LIMIT 10",
)
def sparql_orderby_limit(spark, sf_dir):
    """O2/O4: ORDER BY DESC + tie-break + LIMIT (top-k plan)."""
    return run(
        spark, sf_dir,
        "SELECT ?name ?bal { ?c p:c_name ?name . ?c p:c_acctbal ?bal } "
        "ORDER BY DESC(?bal) ?name LIMIT 10",
        {"name": "str", "bal": "double"},
    )


@register(
    "sparql_bind_strstarts",
    "SELECT c_name AS name, c_acctbal * 2 AS double_bal FROM customer "
    "WHERE c_name LIKE 'Customer#0000001%'",
)
def sparql_bind_strstarts(spark, sf_dir):
    """P8+F3: BIND arithmetic + STRSTARTS filter."""
    return run(
        spark, sf_dir,
        'SELECT ?name ?double_bal { ?c p:c_name ?name . '
        ' FILTER(STRSTARTS(?name, "Customer#0000001")) ?c p:c_acctbal ?bal . '
        " BIND(?bal * 2 AS ?double_bal) }",
        {"name": "str", "double_bal": "double"},
    )


@register(
    "sparql_strfuncs",
    "SELECT upper(c_name) AS u, "
    "CASE WHEN strpos(c_name, '#') > 0 "
    " THEN substr(c_name, 1, strpos(c_name, '#') - 1) ELSE '' END AS b, "
    "CASE WHEN strpos(c_name, '#') > 0 "
    " THEN substr(c_name, strpos(c_name, '#') + 1) ELSE '' END AS a, "
    "regexp_replace(c_name, 'Customer', 'Cst', 'g') AS r, "
    "CAST(length(c_name) AS BIGINT) AS l FROM customer",
)
def sparql_strfuncs(spark, sf_dir):
    """F-family string builtins end-to-end with a DuckDB oracle (round
    9 — previously pytest-only): UCASE, STRBEFORE / STRAFTER (empty
    string when the needle is absent, per spec), regex REPLACE, STRLEN.
    All compile to single-pass Column expressions (compile.py:1216-1250)
    — no UDF, no shuffle."""
    return run(
        spark, sf_dir,
        'SELECT ?u ?b ?a ?r ?l { ?c p:c_name ?name . '
        ' BIND(UCASE(?name) AS ?u) . BIND(STRBEFORE(?name, "#") AS ?b) . '
        ' BIND(STRAFTER(?name, "#") AS ?a) . '
        ' BIND(REPLACE(?name, "Customer", "Cst") AS ?r) . '
        " BIND(STRLEN(?name) AS ?l) }",
        {"u": "str", "b": "str", "a": "str", "r": "str", "l": "long"},
    )


@register(
    "sparql_count_distinct",
    "SELECT count(DISTINCT c_mktsegment) AS segments FROM customer",
)
def sparql_count_distinct(spark, sf_dir):
    """A3: COUNT(DISTINCT ?x) global aggregate."""
    return run(
        spark, sf_dir,
        "SELECT (COUNT(DISTINCT ?seg) AS ?segments) { ?c p:c_mktsegment ?seg }",
        {"segments": "long"},
    )


@register(
    "sparql_path_plus",
    # locatedIn+ = customer→nation ∪ nation→region ∪ customer→region
    "SELECT 'urn:g:customer:' || c_custkey AS x, 'urn:g:nation:' || c_nationkey AS y "
    "FROM customer "
    "UNION SELECT 'urn:g:nation:' || n_nationkey, 'urn:g:region:' || n_regionkey FROM nation "
    "UNION SELECT 'urn:g:customer:' || c_custkey, 'urn:g:region:' || n_regionkey "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey",
)
def sparql_path_plus(spark, sf_dir):
    """G4: one-or-more transitive path — the full semi-naive fixpoint over
    the locatedIn hierarchy (customer→nation→region), verified against the
    SQL closure."""
    e = LocalEndpoint(
        spark,
        _graph(spark, sf_dir, ("region", "nation", "customer", "supplier"),
               located_in=True),
        prefixes=PREFIXES)
    raw = e.select_raw("SELECT ?x ?y { ?x p:locatedIn+ ?y }")
    return raw.select(raw["v_x"]["lex"].alias("x"), raw["v_y"]["lex"].alias("y"))


@register(
    "sparql_path_plus_ids",
    "SELECT 'urn:g:customer:' || c_custkey AS x, 'urn:g:nation:' || c_nationkey AS y "
    "FROM customer "
    "UNION SELECT 'urn:g:nation:' || n_nationkey, 'urn:g:region:' || n_regionkey FROM nation "
    "UNION SELECT 'urn:g:customer:' || c_custkey, 'urn:g:region:' || n_regionkey "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey",
)
def sparql_path_plus_ids(spark, sf_dir):
    """G4 with the full id stack on (round 10): the compiler runs in
    ``use_ids`` mode AND the closure tier iterates its semi-naive
    fixpoint on 64-bit term ids — every BFS level shuffles 16-byte
    (start, end) long pairs instead of term structs, decoded once at
    the edge.  The id representation is size-gated in production
    (paths.CLOSURE_IDS_MIN_STEP, a cost-based choice); the gate forces
    it so the id path stays oracle-green at driver scale — the closure
    runs eagerly inside ``select_raw``, so the override window is
    exactly this call."""
    from sparkdon import paths

    e = LocalEndpoint(
        spark,
        _graph(spark, sf_dir, ("region", "nation", "customer", "supplier"),
               located_in=True),
        prefixes=PREFIXES, use_ids=True)
    old = paths.CLOSURE_IDS_MIN_STEP
    paths.CLOSURE_IDS_MIN_STEP = 0
    try:
        raw = e.select_raw("SELECT ?x ?y { ?x p:locatedIn+ ?y }")
    finally:
        paths.CLOSURE_IDS_MIN_STEP = old
    return raw.select(raw["v_x"]["lex"].alias("x"), raw["v_y"]["lex"].alias("y"))


@register(
    "sparql_path_star_values_ids",
    "SELECT 'urn:g:customer:' || c_custkey AS s, "
    " 'urn:g:customer:' || c_custkey AS x FROM customer WHERE c_custkey IN (7, 8) "
    "UNION SELECT 'urn:g:customer:' || c_custkey, 'urn:g:nation:' || c_nationkey "
    "FROM customer WHERE c_custkey IN (7, 8) "
    "UNION SELECT 'urn:g:customer:' || c_custkey, 'urn:g:region:' || n_regionkey "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey IN (7, 8) "
    "UNION SELECT 'urn:g:nation:3', 'urn:g:nation:3' "
    "UNION SELECT 'urn:g:nation:3', 'urn:g:region:' || n_regionkey "
    "FROM nation WHERE n_nationkey = 3",
)
def sparql_path_star_values_ids(spark, sf_dir):
    """G3 multi-anchor with the full id stack on (round 10): the
    VALUES-driven anchored BFS (per-anchor provenance) runs its frontier
    loop on (anchor_id, node_id) long pairs — the id-encoded analogue of
    ``sparql_path_star_values``, oracle-checked (id path forced past the
    cost-based size gate, as in ``sparql_path_plus_ids``)."""
    from sparkdon import paths

    e = LocalEndpoint(
        spark,
        _graph(spark, sf_dir, ("region", "nation", "customer", "supplier"),
               located_in=True),
        prefixes=PREFIXES, use_ids=True)
    old = paths.CLOSURE_IDS_MIN_STEP
    paths.CLOSURE_IDS_MIN_STEP = 0
    try:
        raw = e.select_raw(
            "SELECT ?s ?x { VALUES ?s { <urn:g:customer:7> <urn:g:customer:8> "
            "<urn:g:nation:3> } ?s p:locatedIn* ?x }")
    finally:
        paths.CLOSURE_IDS_MIN_STEP = old
    return raw.select(raw["v_s"]["lex"].alias("s"), raw["v_x"]["lex"].alias("x"))


@register(
    "sparql_path_star_anchored",
    "SELECT 'urn:g:customer:7' AS x "
    "UNION SELECT 'urn:g:nation:' || c_nationkey FROM customer WHERE c_custkey = 7 "
    "UNION SELECT 'urn:g:region:' || n_regionkey FROM customer "
    "JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey = 7",
)
def sparql_path_star_anchored(spark, sf_dir):
    """G3: zero-or-more path from a constant anchor — the BFS fast path
    (reachable cone only), zero-length includes the anchor itself."""
    e = LocalEndpoint(
        spark,
        _graph(spark, sf_dir, ("region", "nation", "customer", "supplier"),
               located_in=True),
        prefixes=PREFIXES)
    raw = e.select_raw("SELECT ?x { <urn:g:customer:7> p:locatedIn* ?x }")
    return raw.select(raw["v_x"]["lex"].alias("x"))


@register(
    "sparql_path_star_values",
    # per-anchor expansion of locatedIn* from VALUES {customer:7,
    # customer:8, nation:3}: each anchor itself (zero-length) plus its
    # reachable cone
    "SELECT 'urn:g:customer:' || c_custkey AS s, "
    " 'urn:g:customer:' || c_custkey AS x FROM customer WHERE c_custkey IN (7, 8) "
    "UNION SELECT 'urn:g:customer:' || c_custkey, 'urn:g:nation:' || c_nationkey "
    "FROM customer WHERE c_custkey IN (7, 8) "
    "UNION SELECT 'urn:g:customer:' || c_custkey, 'urn:g:region:' || n_regionkey "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_custkey IN (7, 8) "
    "UNION SELECT 'urn:g:nation:3', 'urn:g:nation:3' "
    "UNION SELECT 'urn:g:nation:3', 'urn:g:region:' || n_regionkey "
    "FROM nation WHERE n_nationkey = 3",
)
def sparql_path_star_values(spark, sf_dir):
    """G3 multi-anchor: ``VALUES ?s {a b c} ?s locatedIn* ?x`` — the
    VALUES terms become the BFS anchor set (paths.anchored_closure
    carries per-anchor provenance), so the engine explores three
    reachable cones in one frontier loop instead of the full transitive
    closure the unanchored plan would pay."""
    e = LocalEndpoint(
        spark,
        _graph(spark, sf_dir, ("region", "nation", "customer", "supplier"),
               located_in=True),
        prefixes=PREFIXES)
    raw = e.select_raw(
        "SELECT ?s ?x { VALUES ?s { <urn:g:customer:7> <urn:g:customer:8> "
        "<urn:g:nation:3> } ?s p:locatedIn* ?x }")
    return raw.select(raw["v_s"]["lex"].alias("s"), raw["v_x"]["lex"].alias("x"))


@register(
    "sparql_path_star_sip",
    # locatedIn* from the customers a plain pattern binds (c_acctbal >
    # 9900): each such customer itself (zero-length) plus its cone
    "SELECT 'urn:g:customer:' || c_custkey AS s, "
    " 'urn:g:customer:' || c_custkey AS x FROM customer WHERE c_acctbal > 9900 "
    "UNION SELECT 'urn:g:customer:' || c_custkey, 'urn:g:nation:' || c_nationkey "
    "FROM customer WHERE c_acctbal > 9900 "
    "UNION SELECT 'urn:g:customer:' || c_custkey, 'urn:g:region:' || n_regionkey "
    "FROM customer JOIN nation ON c_nationkey = n_nationkey WHERE c_acctbal > 9900",
)
def sparql_path_star_sip(spark, sf_dir):
    """G3 sideways information passing: no constant or VALUES anchor —
    the anchor set is the ?s bindings the PLAIN pattern produces at
    runtime (compile.py `_reorder_for_sip` + the prior-bindings harvest
    in compile_path_pattern).  The closure BFSes only the bound
    customers' cones instead of the full locatedIn* closure; the anchors
    flow as a DataFrame, never through the driver."""
    e = LocalEndpoint(
        spark,
        _graph(spark, sf_dir, ("region", "nation", "customer", "supplier"),
               located_in=True),
        prefixes=PREFIXES)
    raw = e.select_raw(
        "SELECT ?s ?x { ?s p:c_acctbal ?bal . FILTER(?bal > 9900) . "
        "?s p:locatedIn* ?x }")
    return raw.select(raw["v_s"]["lex"].alias("s"), raw["v_x"]["lex"].alias("x"))


@register(
    "s1_ntriples_roundtrip",
    "SELECT 'urn:p:n_name' AS p, count(*) AS cnt FROM nation "
    "UNION ALL SELECT 'urn:p:n_regionkey', count(*) FROM nation "
    "UNION ALL SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', count(*) FROM nation",
)
def s1_ntriples_roundtrip(spark, sf_dir):
    """S1+S4: rdfize nation → distributed N-Triples write → splittable
    read-back → census.  Gates the whole serialize/parse loop against the
    relational row counts."""
    import tempfile

    from sparkdon.io import read_ntriples, write_ntriples
    from sparkdon.rdfize import rdfize as _rdfize

    nt_dir = tempfile.mkdtemp(prefix="sparkdon_nt_") + "/nation_nt"
    write_ntriples(_rdfize(spark, sf_dir, tables=("nation",)), nt_dir)
    triples = read_ntriples(spark, nt_dir)
    return triples.groupBy("p").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "sparql_census_orders",
    "SELECT p, cnt FROM ("
    " SELECT 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p, count(*) AS cnt FROM orders"
    " UNION ALL SELECT 'urn:p:o_custkey', count(*) FROM orders"
    " UNION ALL SELECT 'urn:p:o_orderstatus', count(*) FROM orders"
    " UNION ALL SELECT 'urn:p:o_totalprice', count(*) FROM orders"
    " UNION ALL SELECT 'urn:p:o_orderpriority', count(*) FROM orders"
    " UNION ALL SELECT 'urn:p:o_orderdate', count(o_orderdate) FROM orders"
    ")",
)
def sparql_census_orders(spark, sf_dir):
    """The census at fact-table scale: ~5×|orders| triples (750k at sf0.1)
    through the full engine — the bench's engine-throughput probe."""
    return run(
        spark, sf_dir,
        "SELECT ?p (COUNT(*) AS ?cnt) { ?s ?p ?o } GROUP BY ?p",
        {"p": "str", "cnt": "long"},
        tables=("orders",),
    )


@register(
    "sparql_year_agg",
    "SELECT CAST(year(o_orderdate) AS BIGINT) AS y, count(*) AS cnt "
    "FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1",
)
def sparql_year_agg(spark, sf_dir):
    """F-tier datetime accessors end-to-end: YEAR() over xsd:dateTime
    literals (o_orderdate rdf-ized with a typed lexical form), grouped —
    the engine parses the lexical form, DuckDB the native timestamp."""
    return run(
        spark, sf_dir,
        "SELECT ?y (COUNT(*) AS ?cnt) { ?o p:o_orderdate ?d . "
        "BIND(YEAR(?d) AS ?y) } GROUP BY ?y",
        {"y": "long", "cnt": "long"},
        tables=("orders",),
    )


@register(
    "q_peel_bnode_closure",
    # golden relation, hand-derived from the fixture's known shape: peel
    # copies exactly the 5 facts reachable from :thing (never :other's),
    # and WL canonicalization must rank the "a" bnode (2 out-edges +
    # :part in-edge from an IRI) apart from the nested "b" bnode —
    # cb0/cb1 per the structural-hash order verified stable across
    # permuted re-serializations in tests/test_engine2.py
    "SELECT * FROM (VALUES "
    "('bnode', 'cb0', 'http://example.com/name', 'lit', 'a'), "
    "('bnode', 'cb0', 'http://example.com/sub', 'bnode', 'cb1'), "
    "('bnode', 'cb1', 'http://example.com/name', 'lit', 'b'), "
    "('iri', 'http://example.com/thing', 'http://example.com/label', 'lit', 'top'), "
    "('iri', 'http://example.com/thing', 'http://example.com/part', 'bnode', 'cb0')"
    ") t(s_kind, s, p, o_kind, o)",
)
def q_peel_bnode_closure(spark, sf_dir):
    """S5/G5: peel copies the bnode-closure of a node on an inline
    fixture (reference ``peel``/``_peel``, gastrodon/__init__.py:688-743).

    Parser-generated blank-node labels defeat a naive value compare (the
    same structure parses to different labels every time), so the gate
    projects the peeled subgraph through
    :func:`sparkdon.session.canonicalize_bnodes` — a WL-style iterative
    structural relabeling — making the full (s, p, o) content
    hash-comparable against the golden relation, INCLUDING which triples
    hang off which bnode.  Structure/isomorphism invariants are
    additionally asserted in tests/test_engine.py::test_peel_through_bnodes."""
    from sparkdon.session import canonicalize_bnodes, inline

    e = inline(
        """@prefix : <http://example.com/> .
        :thing :part [ :name "a" ; :sub [ :name "b" ] ] ; :label "top" .
        :other :part [ :name "c" ] .""",
        spark,
    )
    return canonicalize_bnodes(e.peel(":thing").graph).select(
        "s_kind", "s", "p", "o_kind", "o")


@register(
    "q_decollect_seq",
    "SELECT * FROM (VALUES (0, 'one'), (1, 'two'), (2, 'three'), (3, 'four'), "
    "(4, 'five'), (5, 'six'), (6, 'seven'), (7, 'eight'), (8, 'nine'), "
    "(9, 'ten'), (10, 'eleven')) t(pos, item)",
)
def q_decollect_seq(spark, sf_dir):
    """Q10/O5: Seq decollection in numeric index order — the _10/_2
    lexical trap (RDFContainers#cell46-52).  The fixture is inline and
    fixed, so the oracle is the expected relation itself: the gate fails
    exactly when the engine mis-orders (e.g. lexically: ten before two)
    or drops a member."""
    from sparkdon.session import inline

    words = "one two three four five six seven eight nine ten eleven".split()
    ttl = "@prefix : <http://example.com/> .\n@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n:seq a rdf:Seq"
    for i, w in enumerate(words):
        ttl += f' ; rdf:_{i + 1} "{w}"'
    e = inline(ttl + " .", spark)
    items = e.decollect(":seq")
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(items)], "pos int, item string")


@register(
    "q_rule_fixpoint",
    # independent recomputation of the fixpoint: recursive-CTE transitive
    # closure over the same seed edges
    "WITH RECURSIVE edges(x, z) AS (SELECT * FROM (VALUES "
    " ('http://example.com/a', 'http://example.com/b'), "
    " ('http://example.com/b', 'http://example.com/c'), "
    " ('http://example.com/c', 'http://example.com/d'), "
    " ('http://example.com/d', 'http://example.com/e')) t(x, z)), "
    "closure(x, z) AS (SELECT x, z FROM edges UNION "
    " SELECT e.x, c.z FROM edges e JOIN closure c ON e.z = c.x) "
    "SELECT x, z FROM closure",
)
def q_rule_fixpoint(spark, sf_dir):
    """G7: INSERT-WHERE rule run to fixpoint — transitive closure of a
    5-level subclass chain materializes all ancestor edges.  Oracle: the
    same closure computed independently by DuckDB's WITH RECURSIVE over
    the seed edges."""
    from sparkdon.session import inline

    e = inline(
        """@prefix : <http://example.com/> .
        @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        :a rdfs:subClassOf :b . :b rdfs:subClassOf :c .
        :c rdfs:subClassOf :d . :d rdfs:subClassOf :e .""",
        spark,
    )
    e.update_to_fixpoint(
        "INSERT { ?x rdfs:subClassOf ?z } "
        "WHERE { ?x rdfs:subClassOf ?y . ?y rdfs:subClassOf ?z }"
    )
    raw = e.select_raw("SELECT ?x ?z { ?x rdfs:subClassOf ?z }")
    return raw.select(raw["v_x"]["lex"].alias("x"), raw["v_z"]["lex"].alias("z"))


@register(
    "sparql_construct_count",
    "SELECT count(*) AS cnt FROM customer WHERE c_acctbal > 8000",
)
def sparql_construct_count(spark, sf_dir):
    """Q3: CONSTRUCT → graph; count the constructed triples."""
    e = endpoint(spark, sf_dir)
    g = e.construct(
        "CONSTRUCT { ?c a c:RichCustomer } WHERE { ?c p:c_acctbal ?bal . FILTER(?bal > 8000) }"
    )
    return g.graph.agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "sparql_group_concat",
    "SELECT 'urn:g:region:' || n_regionkey AS rk, "
    "string_agg(n_name, ',' ORDER BY n_name) AS nations "
    "FROM nation GROUP BY n_regionkey",
)
def sparql_group_concat(spark, sf_dir):
    """A-tier: GROUP_CONCAT with an explicit SEPARATOR; elements are
    sorted (engine sorts collected strings for determinism, oracle uses
    ORDER BY inside string_agg)."""
    return run(
        spark, sf_dir,
        'SELECT ?rk (GROUP_CONCAT(?nname; SEPARATOR=",") AS ?nations) '
        "{ ?n p:n_regionkey ?rk . ?n p:n_name ?nname } GROUP BY ?rk",
        {"rk": "str", "nations": "str"},
    )


@register(
    "sparql_ask",
    "SELECT CAST(EXISTS(SELECT 1 FROM customer WHERE c_acctbal > 9000) AS BIGINT) "
    "AS result",
)
def sparql_ask(spark, sf_dir):
    """ASK through the engine (compile_ask); the boolean is projected as
    0/1 so both engines hash identically."""
    e = endpoint(spark, sf_dir)
    b = e.ask("ASK { ?c p:c_acctbal ?bal . FILTER(?bal > 9000) }")
    return spark.createDataFrame([(1 if b else 0,)], "result bigint")


@register(
    "sparql_offset",
    "SELECT 'urn:g:customer:' || c_custkey AS cust, c_acctbal AS bal "
    "FROM customer ORDER BY bal DESC, cust LIMIT 20 OFFSET 10",
)
def sparql_offset(spark, sf_dir):
    """O-tier: ORDER BY (desc + tie-break) with LIMIT and OFFSET through
    the engine's slice modifiers."""
    return run(
        spark, sf_dir,
        "SELECT ?cust ?bal { ?cust p:c_acctbal ?bal } "
        "ORDER BY DESC(?bal) ?cust LIMIT 20 OFFSET 10",
        {"cust": "str", "bal": "double"},
    )


@register(
    "sparql_describe",
    "SELECT s, p, o FROM ("
    " SELECT 'urn:g:region:0' AS s,"
    "  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' AS p,"
    "  'urn:c:region' AS o"
    " UNION ALL SELECT 'urn:g:region:0', 'urn:p:r_name', r_name"
    "  FROM region WHERE r_regionkey = 0"
    " UNION ALL SELECT 'urn:g:nation:' || n_nationkey,"
    "  'http://www.w3.org/1999/02/22-rdf-syntax-ns#type', 'urn:c:nation'"
    "  FROM nation"
    " UNION ALL SELECT 'urn:g:nation:' || n_nationkey, 'urn:p:n_name',"
    "  n_name FROM nation"
    " UNION ALL SELECT 'urn:g:nation:' || n_nationkey, 'urn:p:n_regionkey',"
    "  'urn:g:region:' || n_regionkey FROM nation"
    ")",
)
def sparql_describe(spark, sf_dir):
    """DESCRIBE through the engine (session.describe): one constant IRI
    plus every ?n the WHERE clause binds, materialized as the Concise
    Bounded Description of the node *set* (one distributed BFS, not
    per-node loops).  The rdf-ized graph has no bnodes, so the CBD is
    exactly the subject triples — SQL-expressible oracle."""
    e = endpoint(spark, sf_dir, tables=("region", "nation"))
    d = e.describe("DESCRIBE <urn:g:region:0> ?n WHERE { ?n a c:nation }")
    return d.graph.select("s", "p", "o")


@register(
    "sparql_service",
    "SELECT n.n_name AS nation, count(*) AS cnt FROM supplier s "
    "JOIN nation n ON s.s_nationkey = n.n_nationkey GROUP BY n.n_name",
)
def sparql_service(spark, sf_dir):
    """SPARQL 1.1 federation end-to-end: the supplier triples live behind
    a real HTTP endpoint (sparkdon.protocol server over a second
    LocalEndpoint on the same Spark session); the local plan binds ?n
    from the nation graph and the SERVICE clause ships a FedX-style
    VALUES-bound join to the remote side.  Both the client compilation
    and the server evaluation are the engine under test."""
    from sparkdon.protocol import SparqlProtocolServer

    remote = endpoint(spark, sf_dir, tables=("supplier",))
    with SparqlProtocolServer(remote) as srv:
        # compile (and the driver-side SERVICE fetch) happens inside the
        # with-block; the returned plan holds the fetched bindings as a
        # local relation, so the server need not outlive this call.
        return run(
            spark, sf_dir,
            "SELECT ?nation (COUNT(*) AS ?cnt) { ?n p:n_name ?nation . "
            f" SERVICE <{srv.url}> {{ ?s p:s_nationkey ?n }} }} "
            "GROUP BY ?nation",
            {"nation": "str", "cnt": "long"},
            tables=("nation",),
        )
