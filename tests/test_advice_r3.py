"""Regression tests for the round-2 ADVICE findings (ADVICE.md r2):

1. ORDER BY over non-projected / in-scope variables (SPARQL orders before
   projection, spec §18.5).
2. MINUS keeps left solutions whose shared vars are all unbound (domains
   disjoint ⇒ not removed).
3. select_raw harvests ?_x substitutions from the direct caller's frame.
4. zero-or-one path modifier ``p?`` tokenizes and evaluates.
5. AVG(DISTINCT ?x) deduplicates before averaging.
"""

from __future__ import annotations

import pytest

from sparkdon.session import inline, one
from tests.conftest import BOROS_TTL, SCHEMA_TTL

POPS_TTL = """
@prefix : <http://example.com/> .
:a :pop 3 . :b :pop 1 . :c :pop 2 .
:x :v 2 . :y :v 2 . :z :v 4 .
"""


@pytest.fixture(scope="module")
def pops(spark):
    return inline(POPS_TTL, spark)


def test_order_by_non_projected_var(pops):
    # ADVICE #1: ?n is not projected but must still drive the sort
    df = pops.select("SELECT ?s { ?s :pop ?n } ORDER BY DESC(?n)")
    assert list(df["s"]) == [":a", ":c", ":b"]
    df = pops.select("SELECT ?s { ?s :pop ?n } ORDER BY ?n")
    assert list(df["s"]) == [":b", ":c", ":a"]


def test_order_by_select_alias(pops):
    # aliases introduced in the projection are in scope for ORDER BY
    df = pops.select(
        "SELECT (xsd:integer(?n) AS ?m) { ?s :pop ?n } ORDER BY DESC(?m)"
    )
    assert list(df["m"]) == [3, 2, 1]


def test_order_by_non_projected_with_distinct(pops):
    df = pops.select("SELECT DISTINCT ?s { ?s :pop ?n } ORDER BY DESC(?n)")
    assert list(df["s"]) == [":a", ":c", ":b"]


def test_minus_keeps_unbound_shared_var_rows(spark):
    # ADVICE #2: left rows whose only shared var (?l) is unbound have a
    # domain disjoint from every right solution — MINUS must keep them.
    e = inline(BOROS_TTL, spark)
    df = e.select(
        "SELECT ?b { :New_York_City :boro ?b "
        "OPTIONAL { ?b rdfs:label ?l . FILTER(LANG(?l)='en') } "
        "MINUS { ?x rdfs:label ?l . FILTER(LANG(?l)='en') } }"
    )
    assert set(df["b"]) == {":Queens", ":The_Bronx", ":Staten_Island"}


def test_select_raw_substitution_from_caller_frame(spark):
    # ADVICE #3: direct select_raw call must harvest THIS frame's locals
    e = inline(BOROS_TTL, spark)
    city = ":New_York_City"  # noqa: F841 — harvested via sys._getframe
    raw = e.select_raw("SELECT ?b { ?_city :boro ?b }")
    assert raw.count() == 5


def test_path_zero_or_one(spark):
    # ADVICE #4: 'p?' must lex ('?' as an operator token) and evaluate
    e = inline(SCHEMA_TTL, spark)
    df = e.select("SELECT ?x { :Dog rdfs:subClassOf? ?x }")
    assert set(df["x"]) == {":Dog", ":Mammal"}


def test_avg_distinct(pops):
    # ADVICE #5: AVG(DISTINCT 2,2,4) = 3, plain AVG = 8/3
    df = pops.select("SELECT (AVG(DISTINCT ?n) AS ?a) { ?s :v ?n }")
    assert one(df) == 3
    df = pops.select("SELECT (AVG(?n) AS ?a) { ?s :v ?n }")
    assert abs(one(df) - 8 / 3) < 1e-9


def test_group_concat_separator_and_distinct(pops):
    df = pops.select(
        'SELECT (GROUP_CONCAT(STR(?n); SEPARATOR="|") AS ?all) { ?s :v ?n }'
    )
    assert one(df) == "2|2|4"  # sorted elements, custom separator
    df = pops.select(
        'SELECT (GROUP_CONCAT(DISTINCT STR(?n); SEPARATOR=", ") AS ?all) { ?s :v ?n }'
    )
    assert one(df) == "2, 4"
    df = pops.select("SELECT (GROUP_CONCAT(STR(?n)) AS ?all) { ?s :v ?n }")
    assert one(df) == "2 2 4"  # default separator is a single space


COLL_TTL = """
@prefix : <http://example.com/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
:s :list (1 2 3) .
:t :list () .
"""


def test_turtle_collection_desugars(spark):
    # (1 2 3) -> 3 rdf:first + 3 rdf:rest triples + the :s :list link;
    # () -> rdf:nil directly
    e = inline(COLL_TTL, spark)
    assert e.count() == 8
    df = e.select(
        "SELECT ?x { :s :list ?head . ?head rdf:rest* ?n . ?n rdf:first ?x } ORDER BY ?x"
    )
    assert list(df["x"]) == [1, 2, 3]
    df = e.select("SELECT ?o { :t :list ?o }")
    assert list(df["o"]) == ["rdf:nil"]


def test_sparql_collection_pattern(spark):
    # collection syntax inside a BGP matches the desugared chain
    e = inline(COLL_TTL, spark)
    df = e.select("SELECT ?s { ?s ?p (1 2 3) }")
    assert list(df["s"]) == [":s"]


def test_construct_bnodes_fresh_across_calls(spark):
    # two separate construct() calls must not share bnode labels: a union
    # of the two graphs keeps 2+2 distinct bnodes (each call constructs
    # one fresh node per solution)
    e = inline(BOROS_TTL, spark)
    q = "CONSTRUCT { ?b :via [] } WHERE { ?b a :Borough }"
    g1, g2 = e.construct(q), e.construct(q)
    both = g1.graph.unionByName(g2.graph)
    n_bnodes = both.filter("o_kind = 'bnode'").select("o").distinct().count()
    assert n_bnodes == 4  # 2 boroughs x 2 calls, no cross-call collisions


NESTED_OPT_TTL = """
@prefix : <http://example.com/> .
:x :left 5 . :x :opt :o1 . :o1 :val 3 .
:y :left 7 . :y :opt :o2 .
"""


def test_optional_filter_on_possibly_inner_bound_var(spark):
    """Spec §18.2.2.2: the optional group's filter joins over the MERGED
    solution.  ?n is left-bound and only possibly bound inside (nested
    OPTIONAL): for :x the inner ?n=3 is incompatible (x keeps NULL ?o);
    for :y the inner ?n is unbound, merge takes left's 7, filter passes."""
    e = inline(NESTED_OPT_TTL, spark)
    df = e.select(
        "SELECT ?s ?o { ?s :left ?n . "
        "OPTIONAL { ?s :opt ?o OPTIONAL { ?o :val ?n } FILTER(?n > 4) } }"
    )
    got = dict(zip(df["s"], df["o"]))
    assert got == {":x": None, ":y": ":o2"}
