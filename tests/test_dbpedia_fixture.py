"""End-to-end parity on the reference's real-data fixture: the 30,318-triple
DBpedia schema dump (notebooks/local/data/dbpedia_2015-10.nt.gz, loaded at
DBpedia_Schema_Queries.ipynb#cell4).  Golden numbers come from the
notebook's saved outputs (FIXTURES.md §A1): triple count at #cell6, the
property census at #cell10, and the single dcterms:source triple used by
the one() examples."""

from __future__ import annotations

import os

import pytest

from sparkdon.session import LocalEndpoint, from_ntriples, one

FIXTURE = "/root/reference/notebooks/local/data/dbpedia_2015-10.nt.gz"

PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "dcterms": "http://purl.org/dc/terms/",
    "prov": "http://www.w3.org/ns/prov#",
}

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE), reason="reference fixture not present")


@pytest.fixture(scope="module")
def dbpedia(spark) -> LocalEndpoint:
    return from_ntriples(FIXTURE, spark, prefixes=PREFIXES)


def test_triple_count(dbpedia):
    # len(g) output at DBpedia_Schema_Queries.ipynb#cell6
    assert dbpedia.count() == 30318


def test_property_census_golden(dbpedia):
    # the signature query + its saved output at #cell10 (FIXTURES.md §A1)
    df = dbpedia.select(
        "SELECT ?p (COUNT(*) AS ?cnt) { ?s ?p ?o } GROUP BY ?p ORDER BY DESC(?cnt)"
    )
    got = dict(zip(df.index, df["cnt"]))
    assert got["rdfs:label"] == 11645
    assert got["rdf:type"] == 6681
    assert got["prov:wasDerivedFrom"] == 3434
    assert got["rdfs:range"] == 2558
    assert got["rdfs:domain"] == 2407
    assert got["rdfs:comment"] == 1208
    assert got["rdfs:subPropertyOf"] == 971
    assert got["rdfs:subClassOf"] == 748
    assert got["owl:equivalentClass"] == 407
    # ordering is by descending count
    assert list(df["cnt"]) == sorted(df["cnt"], reverse=True)
    assert df.index[0] == "rdfs:label"


def test_one_dcterms_source(dbpedia):
    # exactly one dcterms:source triple (used by the reference's one() demos)
    df = dbpedia.select("SELECT ?s ?o { ?s dcterms:source ?o }")
    assert len(df) == 1
    assert one(df[["s"]]) is not None


def test_lang_census(dbpedia):
    # #cell40 shape: GROUP BY LANG(?label); English must dominate
    df = dbpedia.select(
        "SELECT (LANG(?l) AS ?lang) (COUNT(*) AS ?cnt) { ?s rdfs:label ?l } "
        "GROUP BY (LANG(?l)) ORDER BY DESC(?cnt)"
    )
    got = dict(zip(df["lang"], df["cnt"]))
    assert got["en"] > 2000
    assert sum(got.values()) == 11645


def test_subclass_star_on_real_schema(dbpedia):
    # #cell77-82 shape: rdfs:subClassOf* from a leaf reaches owl:Thing
    leaf = "http://dbpedia.org/ontology/Actor"
    df = dbpedia.select(
        "SELECT ?x { ?_leaf rdfs:subClassOf* ?x }", bindings={"leaf": f"<{leaf}>"})
    ancestors = {str(v.to_uri()) if hasattr(v, "to_uri") else str(v) for v in df["x"]}
    assert leaf in ancestors
    assert len(ancestors) >= 3  # Actor -> Artist -> Person -> ... chain


def test_not_exists_no_english_label(dbpedia):
    # #cell46: classes lacking an en label
    df = dbpedia.select(
        "SELECT (COUNT(*) AS ?n) { ?s a owl:Class . "
        "FILTER NOT EXISTS { ?s rdfs:label ?l . FILTER(LANG(?l) = 'en') } }"
    )
    total = dbpedia.select("SELECT (COUNT(*) AS ?n) { ?s a owl:Class }")
    assert 0 <= one(df) < one(total)

def test_subclass_star_values_anchors_on_real_schema(dbpedia):
    """Multi-anchor closure on the real ontology: VALUES {Actor, City}
    subClassOf* — per-anchor cones must match the single-anchor runs."""
    actor = "http://dbpedia.org/ontology/Actor"
    city = "http://dbpedia.org/ontology/City"

    def uris(series):
        return {str(v.to_uri()) if hasattr(v, "to_uri") else str(v)
                for v in series}

    multi = dbpedia.select(
        f"SELECT ?s ?x {{ VALUES ?s {{ <{actor}> <{city}> }} "
        "?s rdfs:subClassOf* ?x }")
    per_anchor = {}
    for s, x in zip(multi["s"], multi["x"]):
        key = str(s.to_uri()) if hasattr(s, "to_uri") else str(s)
        per_anchor.setdefault(key, set()).add(
            str(x.to_uri()) if hasattr(x, "to_uri") else str(x))
    assert set(per_anchor) == {actor, city}
    for anchor in (actor, city):
        single = dbpedia.select(
            "SELECT ?x { ?_a rdfs:subClassOf* ?x }",
            bindings={"a": f"<{anchor}>"})
        assert per_anchor[anchor] == uris(single["x"])
        assert anchor in per_anchor[anchor]  # zero-length pair
