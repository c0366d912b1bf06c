"""use_ids mode (compile.py / SURVEY.md §4.3 term-dictionary v2):
join-only variables travel as 64-bit content-hash ids instead of term
structs.  Every test runs the same SPARQL with the mode off and on and
asserts identical results; one test asserts the physical plan actually
joins on longs."""

from __future__ import annotations

import pytest

from sparkdon.algebra import parse_query
from sparkdon.compile import Compiler
from sparkdon.session import inline

IDS_TTL = """
@prefix : <http://example.com/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
:New_York_City :boro :Manhattan , :Brooklyn , :Queens .
:Manhattan rdfs:label "Manhattan"@en ; a :Borough ; :pop 1694251 .
:Brooklyn rdfs:label "Brooklyn"@en ; a :Borough ; :pop 2736074 .
:Queens rdfs:label "Queens"@en ; :pop 2405464 .
:Albany rdfs:label "Albany"@en ; :pop 99224 .
:loop :next :loop .
"""


@pytest.fixture(scope="module")
def ends(spark):
    off = inline(IDS_TTL, spark)
    on = inline(IDS_TTL, spark)
    on.use_ids = True
    return off, on


def both(ends, sparql):
    off, on = ends
    a = sorted(map(repr, off.select_raw(sparql).collect()))
    b = sorted(map(repr, on.select_raw(sparql).collect()))
    assert a == b, f"use_ids changed results for {sparql!r}"
    return a


EQUIV_QUERIES = [
    # join chain, ?b join-only
    "SELECT ?lab { :New_York_City :boro ?b . ?b rdfs:label ?lab }",
    # OPTIONAL with id-only left var
    "SELECT ?lab { :New_York_City :boro ?b OPTIONAL { ?b rdfs:label ?lab } }",
    # UNION where the id-only ?nyc is missing from one branch (null-long cast)
    "SELECT ?lab { { ?nyc :boro ?b } UNION { ?b a :Borough } . ?b rdfs:label ?lab }",
    # MINUS on an id-only shared var
    "SELECT ?lab { ?b rdfs:label ?lab . MINUS { ?b a :Borough } }",
    # FILTER NOT EXISTS sharing an id-only var
    "SELECT ?lab { ?b rdfs:label ?lab . FILTER NOT EXISTS { ?b a :Borough } }",
    # predicate variable as id
    'SELECT ?lab { ?s ?p :Manhattan . ?s :boro ?b . ?b rdfs:label ?lab }',
    # repeated var in one pattern (self-loop), id-only
    "SELECT (COUNT(*) AS ?n) { ?x :next ?x }",
    # aggregation over a graph where the grouped var stays a struct but
    # the join var is an id
    "SELECT ?lab (SUM(?pop) AS ?p) { :New_York_City :boro ?b . "
    " ?b rdfs:label ?lab . ?b :pop ?pop } GROUP BY ?lab",
    # property path endpoint shared with plain patterns: ?b must stay a
    # struct (paths build struct frames) even though it is join-only
    "SELECT ?lab { :New_York_City :boro+ ?b . ?b rdfs:label ?lab }",
]


@pytest.mark.parametrize("q", EQUIV_QUERIES)
def test_equivalent(ends, q):
    rows = both(ends, q)
    assert rows  # every battery query is non-empty on the fixture


def test_ask(ends):
    off, on = ends
    q = "ASK { :New_York_City :boro ?b . ?b a :Borough }"
    assert off.ask(q) is on.ask(q) is True
    q2 = "ASK { :Albany :boro ?b }"
    assert off.ask(q2) is on.ask(q2) is False


def test_select_star_disables_ids(ends, spark):
    _, on = ends
    comp = on._compiler()
    comp.compile_select(parse_query(
        "SELECT * WHERE { ?s ?p ?o }", prefixes=on.prefixes))
    assert comp.id_only == frozenset()


def test_analysis_and_plan(ends):
    _, on = ends
    comp = on._compiler()
    pq = parse_query(
        "SELECT ?lab { :New_York_City :boro ?b . ?b rdfs:label ?lab }",
        prefixes=on.prefixes)
    b = comp.compile_select(pq)
    # ?b is join-only → id; ?lab is projected → struct
    assert comp.id_only == frozenset({"b"})
    assert b.df.schema["v_lab"].dataType.typeName() == "struct"
    # re-compile just the WHERE group: the join var column is a bare long
    inner = comp.compile_group(pq.where)
    assert inner.df.schema["v_b"].dataType.typeName() == "long"


def test_projected_var_stays_struct(ends):
    _, on = ends
    comp = on._compiler()
    comp.compile_select(parse_query(
        "SELECT ?b { :New_York_City :boro ?b }", prefixes=on.prefixes))
    assert comp.id_only == frozenset()


LATE_QUERIES = [
    # projected var crosses the join as an id, decoded at the end
    "SELECT ?b ?lab { :New_York_City :boro ?b . ?b rdfs:label ?lab }",
    # late under OPTIONAL: null id must decode to an unbound struct
    "SELECT ?b ?lab { :New_York_City :boro ?b OPTIONAL { ?b rdfs:label ?lab } }",
    # late + ORDER BY the late var (sort runs post-decode on the struct)
    "SELECT ?b { :New_York_City :boro ?b . ?b :pop ?pop . "
    "FILTER(?pop > 100) } ORDER BY ?b",
    # late + GROUP BY the late var (decode precedes aggregation)
    "SELECT ?b (COUNT(*) AS ?n) { :New_York_City :boro ?b . ?b ?p ?o } GROUP BY ?b",
    # late + DISTINCT (dedup over decoded structs)
    "SELECT DISTINCT ?b { :New_York_City :boro ?b . ?b ?p ?o }",
    # late var missing from one UNION branch (null-long cast, then decode)
    "SELECT ?b ?lab { { :New_York_City :boro ?b } UNION { :Albany rdfs:label ?lab } }",
    # late var bound by multiple patterns (decode relation is a union)
    "SELECT ?x { { :New_York_City :boro ?x } UNION { ?x a :Borough } . ?x :pop ?p }",
]


@pytest.mark.parametrize("q", LATE_QUERIES)
def test_late_equivalent(ends, q):
    rows = both(ends, q)
    assert rows


def test_late_analysis_and_decode(ends):
    """use_ids v3: a projected var whose value is needed only at the top
    level is classified ``late``, travels the WHERE as a bare long, and
    comes out of compile_select as a struct again."""
    _, on = ends
    comp = on._compiler()
    pq = parse_query(
        "SELECT ?b ?lab { :New_York_City :boro ?b . ?b rdfs:label ?lab }",
        prefixes=on.prefixes)
    b = comp.compile_select(pq)
    assert comp.late == frozenset({"b", "lab"})
    assert comp.id_only == frozenset()
    # final output is decoded back to term structs
    assert b.df.schema["v_b"].dataType.typeName() == "struct"
    assert b.df.schema["v_lab"].dataType.typeName() == "struct"
    # inside the WHERE both vars are 8-byte ids
    inner = comp.compile_group(pq.where)
    assert inner.df.schema["v_b"].dataType.typeName() == "long"
    assert inner.df.schema["v_lab"].dataType.typeName() == "long"


def test_late_disabled_for_single_pattern(ends):
    """One pattern = no join to shrink: the decode join would be pure
    overhead, so late mode stays off and the var is a plain struct."""
    _, on = ends
    comp = on._compiler()
    comp.compile_select(parse_query(
        "SELECT ?b { :New_York_City :boro ?b }", prefixes=on.prefixes))
    assert comp.late == frozenset()
    assert comp.id_only == frozenset()


def test_late_filter_var_excluded(ends):
    """A value use inside the WHERE (FILTER) disqualifies the var from
    late encoding — it must be a struct mid-plan."""
    _, on = ends
    comp = on._compiler()
    comp.compile_select(parse_query(
        "SELECT ?b ?pop { :New_York_City :boro ?b . ?b :pop ?pop . "
        "FILTER(?pop > 100) }", prefixes=on.prefixes))
    assert "pop" not in comp.late
    assert "b" in comp.late


def test_count_over_bare_var_stays_id_encoded(ends, spark):
    """r4: COUNT(?v)/COUNT(DISTINCT ?v) need only presence/equality, so a
    var whose only value use is a bare-var COUNT keeps its 8-byte id
    encoding — and results match the struct-mode twin."""
    off, on = ends
    q = ("SELECT ?b (COUNT(DISTINCT ?lab) AS ?n) "
         "{ :New_York_City :boro ?b . ?b rdfs:label ?lab } GROUP BY ?b")
    comp = on._compiler()
    comp.compile_select(parse_query(q, prefixes=on.prefixes))
    assert "lab" in comp.id_only  # counted-only var rides as an id
    got_on = sorted(map(tuple, on.select(q).reset_index().values.tolist()))
    got_off = sorted(map(tuple, off.select(q).reset_index().values.tolist()))
    assert got_on == got_off
