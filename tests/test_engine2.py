"""Scalar-function and solution-modifier battery — the long tail of the
SPARQL builtin surface (SURVEY.md §2.7 'beyond parity' rows included)."""

from __future__ import annotations

import pytest

from sparkdon.session import inline, one

TTL = """
@prefix : <http://example.com/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
:a :name "Alice" ; :age 30 ; :score 7.5 ; :tag "x"@en .
:b :name "Bob" ; :age 25 .
:c :name "carol" ; :age 41 ; :when "2020-05-04T10:00:00"^^xsd:dateTime .
"""


@pytest.fixture(scope="module")
def ep(spark):
    return inline(TTL, spark)


def q(ep, sparql):
    return ep.select(sparql)


def test_concat_ucase_strlen(ep):
    df = q(ep, 'SELECT ?v { :a :name ?n . BIND(CONCAT(UCASE(?n), "!") AS ?v) }')
    assert one(df) == "ALICE!"
    df = q(ep, "SELECT ?v { :a :name ?n . BIND(STRLEN(?n) AS ?v) }")
    assert one(df) == 5


def test_replace_contains_strends(ep):
    df = q(ep, 'SELECT ?v { :a :name ?n . BIND(REPLACE(?n, "li", "LI") AS ?v) }')
    assert one(df) == "ALIce"
    df = q(ep, 'SELECT ?n { ?s :name ?n . FILTER(CONTAINS(?n, "aro")) }')
    assert one(df) == "carol"
    df = q(ep, 'SELECT ?n { ?s :name ?n . FILTER(STRENDS(?n, "ob")) }')
    assert one(df) == "Bob"


def test_strbefore_strafter(ep):
    df = q(ep, 'SELECT ?v { :a :name ?n . BIND(STRBEFORE(?n, "ice") AS ?v) }')
    assert one(df) == "Al"
    df = q(ep, 'SELECT ?v { :a :name ?n . BIND(STRAFTER(?n, "Al") AS ?v) }')
    assert one(df) == "ice"


def test_if_coalesce_bound(ep):
    df = q(
        ep,
        "SELECT ?n ?v { ?s :name ?n . OPTIONAL { ?s :score ?sc } "
        'BIND(IF(BOUND(?sc), "has", "none") AS ?v) }',
    )
    got = dict(zip(df["n"], df["v"]))
    assert got == {"Alice": "has", "Bob": "none", "carol": "none"}
    df = q(
        ep,
        "SELECT ?n ?v { ?s :name ?n . OPTIONAL { ?s :score ?sc } "
        "BIND(COALESCE(?sc, 0) AS ?v) }",
    )
    got = dict(zip(df["n"], df["v"]))
    assert got["Alice"] == 7.5 and got["Bob"] == 0


def test_type_predicates(ep):
    df = q(ep, "SELECT ?o { :a ?p ?o . FILTER(ISLITERAL(?o)) }")
    assert len(df) == 4
    df = q(ep, "SELECT ?s { ?s :name ?n . FILTER(ISIRI(?s)) }")
    assert len(df) == 3
    df = q(ep, "SELECT ?v { :a :age ?a . BIND(ISNUMERIC(?a) AS ?v) }")
    assert bool(one(df)) is True


def test_datatype_and_lang(ep):
    df = q(ep, "SELECT ?v { :a :age ?a . BIND(DATATYPE(?a) AS ?v) }")
    # result is QName-shortened ('xsd:integer'); round-trip to the full IRI
    assert one(df).to_uri().endswith("#integer")
    df = q(ep, 'SELECT ?t { :a :tag ?t . FILTER(LANGMATCHES(LANG(?t), "EN")) }')
    assert one(df) == "x"


def test_sameterm_and_iri_constructor(ep):
    df = q(ep, "SELECT ?o { :a :name ?o . FILTER(SAMETERM(?o, \"Alice\")) }")
    assert len(df) == 1
    df = q(ep, 'SELECT ?v { BIND(IRI(CONCAT("http://example.com/", "zzz")) AS ?v) }')
    assert one(df).to_uri() == "http://example.com/zzz"


def test_arithmetic_and_numeric_fns(ep):
    df = q(ep, "SELECT ?v { :a :age ?a . :b :age ?b . BIND(?a - ?b AS ?v) }")
    assert one(df) == 5
    df = q(ep, "SELECT ?v { :a :score ?s . BIND(FLOOR(?s) AS ?v) }")
    assert one(df) == 7
    df = q(ep, "SELECT ?v { :a :score ?s . BIND(CEIL(?s) AS ?v) }")
    assert one(df) == 8
    df = q(ep, "SELECT ?v { :a :score ?s . BIND(ABS(0 - ?s) AS ?v) }")
    assert one(df) == 7.5


def test_year_month_day(ep):
    df = q(ep, "SELECT ?y ?m ?d { :c :when ?w . BIND(YEAR(STR(?w)) AS ?y) "
               "BIND(MONTH(STR(?w)) AS ?m) BIND(DAY(STR(?w)) AS ?d) }")
    assert (one(df["y"].to_frame()), one(df["m"].to_frame()), one(df["d"].to_frame())) == (2020, 5, 4)


def test_md5_sha(ep):
    import hashlib

    df = q(ep, "SELECT ?v { :a :name ?n . BIND(MD5(?n) AS ?v) }")
    assert one(df) == hashlib.md5(b"Alice").hexdigest()


def test_sum_avg_min_max(ep):
    df = q(ep, "SELECT (SUM(?a) AS ?s) (AVG(?a) AS ?av) (MIN(?a) AS ?mn) (MAX(?a) AS ?mx) "
               "{ ?x :age ?a }")
    assert list(df.iloc[0]) == [96, 32, 25, 41]


def test_group_concat_and_sample(ep):
    df = q(ep, "SELECT (GROUP_CONCAT(?n) AS ?all) { { SELECT ?n { ?s :name ?n } ORDER BY ?n } }")
    assert set(one(df).split()) == {"Alice", "Bob", "carol"}


def test_having(ep):
    df = q(ep, "SELECT ?s (COUNT(*) AS ?cnt) { ?s ?p ?o } GROUP BY ?s HAVING (COUNT(*) > 3)")
    assert list(df.index) == [":a"]


def test_offset(ep):
    df = q(ep, "SELECT ?n { ?s :name ?n } ORDER BY ?n LIMIT 10 OFFSET 1")
    assert list(df["n"]) == ["Bob", "carol"]


def test_not_in(ep):
    df = q(ep, 'SELECT ?n { ?s :name ?n . FILTER(?n NOT IN ("Alice", "Bob")) }')
    assert one(df) == "carol"


def test_strdt_strlang(ep):
    df = q(ep, 'SELECT ?v { BIND(STRLANG("chat", "fr") AS ?v) ?s :name ?n . '
               "FILTER(LANG(?v) = \"fr\") } LIMIT 1")
    assert one(df) == "chat"
    df = q(ep, 'SELECT ?v { BIND(DATATYPE(STRDT("5", "http://www.w3.org/2001/XMLSchema#integer")) AS ?v) } LIMIT 1')
    assert one(df).to_uri().endswith("#integer")


def test_construct_bnode_labels_consistent(spark):
    # a template bnode must yield ONE fresh node per solution, shared by
    # every template triple that mentions it (standard CONSTRUCT semantics)
    e = inline("@prefix : <http://ex.com/> . :a :v 1 . :b :v 2 .", spark)
    g = e.construct("CONSTRUCT { ?s :stat _:n . _:n :value ?o } WHERE { ?s :v ?o }")
    rows = [tuple(r) for r in g.graph.collect()]
    subj = {r[4] for r in rows if r[2].endswith("stat")}
    obj = {r[1] for r in rows if r[2].endswith("value")}
    assert subj == obj and len(subj) == 2
    # distinct template bnodes stay distinct within a solution
    g2 = e.construct("CONSTRUCT { ?s :x _:n . ?s :y _:m } WHERE { ?s :v ?o }")
    per_s = {}
    for r in g2.graph.collect():
        per_s.setdefault(r[1], set()).add(r[4])
    assert all(len(v) == 2 for v in per_s.values())


def test_path_star_values_multi_anchor(spark):
    """VALUES-driven anchor sets: overlapping cones and cycles must keep
    per-anchor provenance (each anchor pairs with ITS reachable nodes,
    not the union)."""
    g = inline(
        "@prefix : <http://ex.com/> . "
        ":a :n :b . :b :n :c . :c :n :a . "  # 3-cycle
        ":d :n :b . "                         # joins the cycle mid-way
        ":e :n :e . ",                        # self-loop island
        spark)
    df = g.select("SELECT ?s ?x { VALUES ?s { :a :d :e } ?s :n* ?x }")

    def norm(t):
        return str(t).split(":")[-1].split("/")[-1]

    pairs = {(norm(s), norm(x)) for s, x in zip(df["s"], df["x"])}
    assert pairs == {
        ("a", "a"), ("a", "b"), ("a", "c"),
        ("d", "d"), ("d", "b"), ("d", "c"), ("d", "a"),
        ("e", "e"),
    }
    # matches running each anchor alone
    singles = set()
    for a in (":a", ":d", ":e"):
        one_df = g.select(f"SELECT ?x {{ {a} :n* ?x }}")
        singles |= {(a[1:], norm(x)) for x in one_df["x"]}
    assert pairs == singles


def test_path_plus_values_anchor_no_zero(spark):
    """p+ from a VALUES anchor set: no zero-length pairs unless reached
    by a real cycle."""
    g = inline(
        "@prefix : <http://ex.com/> . :a :n :b . :b :n :c . :e :n :e .",
        spark)
    df = g.select("SELECT ?s ?x { VALUES ?s { :a :e } ?s :n+ ?x }")

    def norm(t):
        return str(t).split(":")[-1].split("/")[-1]

    pairs = {(norm(s), norm(x)) for s, x in zip(df["s"], df["x"])}
    assert pairs == {("a", "b"), ("a", "c"), ("e", "e")}


def test_datetime_accessors_hours_minutes_seconds(ep):
    df = q(ep, "SELECT ?h ?m ?sec { :c :when ?w . "
               "BIND(HOURS(?w) AS ?h) BIND(MINUTES(?w) AS ?m) "
               "BIND(SECONDS(?w) AS ?sec) }")
    assert (df["h"][0], df["m"][0], df["sec"][0]) == (10, 0, 0)


def test_tz_of_lexical_form(ep):
    df = q(ep, 'SELECT ?t { :c :when ?w . BIND(TZ(?w) AS ?t) }')
    assert df["t"][0] == ""  # no timezone designator in the fixture
    df = q(ep, 'SELECT ?t { BIND(TZ("2020-05-04T10:00:00Z") AS ?t) }')
    assert df["t"][0] == "Z"
    df = q(ep, 'SELECT ?t { BIND(TZ("2020-05-04T10:00:00+05:30") AS ?t) }')
    assert df["t"][0] == "+05:30"


def test_now_uuid_struuid_rand(ep):
    import re

    df = q(ep, "SELECT ?n ?u ?su ?r { :a :name ?x . BIND(NOW() AS ?n) "
               "BIND(UUID() AS ?u) BIND(STRUUID() AS ?su) BIND(RAND() AS ?r) }")
    # the xsd:dateTime literal decodes to a Python datetime
    import datetime

    assert isinstance(df["n"][0], datetime.datetime)
    assert df["n"][0].year >= 2026
    u = df["u"][0]
    assert str(u.to_uri() if hasattr(u, "to_uri") else u).startswith("urn:uuid:")
    assert re.fullmatch(r"[0-9a-f-]{36}", df["su"][0])
    assert 0.0 <= df["r"][0] < 1.0


def test_encode_for_uri_and_sha512(ep):
    df = q(ep, 'SELECT ?e { BIND(ENCODE_FOR_URI("a b~c*d/e") AS ?e) }')
    assert df["e"][0] == "a%20b~c%2Ad%2Fe"
    df = q(ep, 'SELECT ?h { BIND(SHA512("abc") AS ?h) }')
    import hashlib
    assert df["h"][0] == hashlib.sha512(b"abc").hexdigest()


def test_bnode_fresh_per_row(ep):
    from sparkdon.terms import BNode

    df = q(ep, "SELECT ?b { ?s :name ?n . BIND(BNODE() AS ?b) }")
    vals = list(df["b"])
    assert all(isinstance(v, BNode) for v in vals)
    assert len(set(map(str, vals))) == len(vals)  # fresh per solution


def test_timezone_duration(ep):
    df = q(ep, 'SELECT ?t { BIND(TIMEZONE("2020-05-04T10:00:00Z") AS ?t) }')
    assert str(df["t"][0]) == "PT0S"
    df = q(ep, 'SELECT ?t { BIND(TIMEZONE("2020-05-04T10:00:00+05:30") AS ?t) }')
    assert str(df["t"][0]) == "PT5H30M"
    df = q(ep, 'SELECT ?t { BIND(TIMEZONE("2020-05-04T10:00:00-08:00") AS ?t) }')
    assert str(df["t"][0]) == "-PT8H"
    # no designator -> type error -> unbound
    df = q(ep, 'SELECT ?t { :c :when ?w . BIND(TIMEZONE(?w) AS ?t) }')
    assert df["t"][0] is None


# -- bnode canonicalization (backs the q_peel_bnode_closure oracle) ------


def test_canonicalize_bnodes_stable_across_parses(spark):
    """The same structure serialized two different ways (different parser
    label assignment, different statement order) canonicalizes to the
    identical triple set — the property that makes peel's output
    value-comparable."""
    from sparkdon.session import canonicalize_bnodes, inline

    a = inline(
        """@prefix : <http://example.com/> .
        :thing :part [ :name "a" ; :sub [ :name "b" ] ] ; :label "top" .""",
        spark,
    )
    b = inline(
        """@prefix : <http://example.com/> .
        _:y :name "b" .
        :thing :label "top" .
        _:x :sub _:y . _:x :name "a" .
        :thing :part _:x .""",
        spark,
    )
    ra = sorted(map(tuple, canonicalize_bnodes(a.graph).collect()))
    rb = sorted(map(tuple, canonicalize_bnodes(b.graph).collect()))
    assert ra == rb
    labels = {r[1] for r in ra if r[0] == "bnode"}
    assert labels == {"cb0", "cb1"}


def test_canonicalize_bnodes_no_bnodes_passthrough(spark):
    from sparkdon.session import canonicalize_bnodes, inline

    e = inline(
        '@prefix : <http://example.com/> . :a :name "x" . :b :name "y" .',
        spark,
    )
    assert sorted(map(tuple, canonicalize_bnodes(e.graph).collect())) == \
        sorted(map(tuple, e.graph.collect()))


def test_canonicalize_bnodes_automorphic_share_label(spark):
    """Two structurally indistinguishable bnodes share a canonical label
    (that IS the canonical form) and cardinality is preserved — no
    dedup."""
    from sparkdon.session import canonicalize_bnodes, inline

    e = inline(
        """@prefix : <http://example.com/> .
        :r :part [ :name "same" ] , [ :name "same" ] .""",
        spark,
    )
    rows = canonicalize_bnodes(e.graph).collect()
    assert len(rows) == len(e.graph.collect()) == 4
    bn = [r for r in rows if r["s_kind"] == "bnode"]
    assert {r["s"] for r in bn} == {"cb0"}
    # both :part links survive as two identical canonical rows
    parts = [r for r in rows if r["p"].endswith("part")]
    assert len(parts) == 2


def test_canonicalize_bnodes_distinguishes_depth_chain(spark):
    """A 4-deep bnode chain gets 4 distinct labels (WL refinement must
    iterate past round 1 to split middle nodes)."""
    from pyspark.sql import functions as F

    from sparkdon.session import canonicalize_bnodes, inline

    e = inline(
        """@prefix : <http://example.com/> .
        :top :next [ :next [ :next [ :next [ :name "leaf" ] ] ] ] .""",
        spark,
    )
    g = canonicalize_bnodes(e.graph)
    labels = {r["s"] for r in g.filter(F.col("s_kind") == "bnode").collect()}
    assert len(labels) == 4


def test_endpoint_canonical_method(spark):
    from sparkdon.session import inline

    a = inline('@prefix : <http://example.com/> . :r :p [ :q "v" ] .', spark)
    b = inline(
        '@prefix : <http://example.com/> . _:z :q "v" . :r :p _:z .', spark)
    ca = sorted(map(tuple, a.canonical().graph.collect()))
    cb = sorted(map(tuple, b.canonical().graph.collect()))
    assert ca == cb
    # prefixes survive
    assert a.canonical().prefixes == a.prefixes


def test_explain_exposes_physical_plan(ep):
    """ep.explain() returns the Spark physical plan for a SPARQL query
    without executing it — pushdown and join strategy visible."""
    plan = ep.explain(
        "SELECT ?s { ?s :age ?a . FILTER(?a > 30) }")
    assert "Physical Plan" in plan
    simple = ep.explain("SELECT ?s ?n { ?s :name ?n }", mode="simple")
    assert "Scan" in simple or "LocalTableScan" in simple


# --- Inference_Over_RDF_Containers, end-to-end (r15, VERDICT r14 #7) ----

#: the notebook's actual race card (#cell5): 6 / 7 / 6 entrants
TIOGA_TTL = """
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
@prefix : <http://example.com/> .
:tioga_downs_2017_08_14 a rdf:Seq ;
    rdf:_1 :race_1 ; rdf:_2 :race_2 ; rdf:_3 :race_3 .
:race_1 a rdf:Seq ;
    rdf:_1 "PRINCE ADIRAN" ; rdf:_2 "KDMAKEWAY" ;
    rdf:_3 "ANDERSON VALLEY" ; rdf:_4 "SETTINEMONFIRE" ;
    rdf:_5 "TRILLIONAIR" ; rdf:_6 "OZZY BLUE CHIP" .
:race_2 a rdf:Seq ;
    rdf:_1 "MACHMEMACKIE" ; rdf:_2 "FREE LOVE" ;
    rdf:_3 "FRANKIES DRAGON" ; rdf:_4 "IM AN ART MAJOR" ;
    rdf:_5 "GOLD STAR SPIKE" ; rdf:_6 "F TWENTY TWO" ;
    rdf:_7 "TAILGUNNER HANOVER" .
:race_3 a rdf:Seq ;
    rdf:_1 "LYONS JOHNNY" ; rdf:_2 "BETTORSLUCKYSTREAK" ;
    rdf:_3 "DASH OF DANGER" ; rdf:_4 "NEPTUNE" ;
    rdf:_5 "WINYARD HANOVER" ; rdf:_6 "DEE'S ROCKETMAN" .
"""


@pytest.fixture(scope="module")
def races(spark):
    """The notebook's two inference rules applied verbatim: #cell17
    types every rdf:_N predicate as rdfs:ContainerMembershipProperty,
    #cell26 derives rdfs:member from it."""
    e = inline(TIOGA_TTL, spark)
    e.update("""
        INSERT {
            ?p a rdfs:ContainerMembershipProperty .
        } WHERE {
            ?s ?p ?o .
            FILTER(REGEX(STR(?p),"^http://www[.]w3[.]org/1999/02/22-rdf-syntax-ns#_[1-9]([0-9])*$"))
        }
    """)
    e.update("""
        INSERT {
            ?container rdfs:member ?member .
        } WHERE {
            ?container ?containerMembershipProperty ?member .
            ?containerMembershipProperty a rdfs:ContainerMembershipProperty .
        }
    """)
    return e


def test_inference_cell71_grouped_entrant_counts(races):
    """Inference_Over_RDF_Containers #cell71: per-race entrant counts
    through the inferred ContainerMembershipProperty typing."""
    df = races.select("""
        select ?race (count(*) as ?count) {
           ?race
                ^rdfs:member :tioga_downs_2017_08_14 ;
                ?rdfN ?horse .
           ?rdfN a rdfs:ContainerMembershipProperty .
        } GROUP BY ?race
    """)
    got = dict(zip(df.index, df["count"]))
    # each race Seq also carries `a rdf:Seq`, but only rdf:_N predicates
    # are typed ContainerMembershipProperty, so counts are exact
    assert got == {":race_1": 6, ":race_2": 7, ":race_3": 6}


def test_inference_cell73_subquery_filter_count_6(races):
    """Inference_Over_RDF_Containers #cell73 verbatim: agg subquery +
    outer FILTER(?count=6) — the HAVING-like shape.  Races 1 and 3
    have exactly six entrants; race 2 has seven."""
    df = races.select("""
        select ?race {
            {
                select ?race (count(*) as ?count) {
                   ?race
                        ^rdfs:member :tioga_downs_2017_08_14 ;
                        ?rdfN ?horse .
                   ?rdfN a rdfs:ContainerMembershipProperty .
                } GROUP BY ?race
            }
            FILTER(?count=6)
        }
    """)
    assert sorted(df["race"]) == [":race_1", ":race_3"]
