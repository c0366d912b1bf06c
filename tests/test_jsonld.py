"""JSON-LD reader (W3C JSON-LD 1.0 expansion subset) — ground fixtures
cross-check against the Turtle parser on the equivalent graph (two
independent parsers, one triple set), same strategy as test_rdfxml."""

from __future__ import annotations

import json

import pytest

from sparkdon.io import parse_turtle
from sparkdon.jsonld import parse_jsonld, read_jsonld

EX = "http://ex.com/"
FOAF = "http://xmlns.com/foaf/0.1/"


def ground(rows):
    out = []
    for s_kind, s, p, o_kind, o, dt, lang in rows:
        out.append((s_kind, s if s_kind != "bnode" else "*", p,
                    o_kind, o if o_kind != "bnode" else "*", dt, lang))
    return sorted(out)


def test_basic_node_vs_turtle():
    doc = {
        "@context": {
            "name": FOAF + "name",
            "knows": {"@id": FOAF + "knows", "@type": "@id"},
            "age": {"@id": EX + "age",
                    "@type": "http://www.w3.org/2001/XMLSchema#integer"},
            "foaf": FOAF,
            "@base": EX,
        },
        "@id": "alice",
        "@type": "foaf:Person",
        "name": "Alice",
        "age": "19",
        "knows": ["bob", {"@id": "carol",
                          "name": {"@value": "Carol", "@language": "en"}}],
    }
    ttl = f"""@prefix foaf: <{FOAF}> . @prefix ex: <{EX}> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:alice a foaf:Person ; foaf:name "Alice" ;
             ex:age "19"^^xsd:integer ;
             foaf:knows ex:bob, ex:carol .
    ex:carol foaf:name "Carol"@en ."""
    assert ground(parse_jsonld(json.dumps(doc))) == ground(parse_turtle(ttl))


def test_scalars_language_and_vocab():
    doc = {
        "@context": {"@vocab": EX, "@language": "de"},
        "@id": EX + "x",
        "flag": True,
        "n": 7,
        "score": 2.5,
        "label": "hallo",
    }
    ttl = f"""@prefix ex: <{EX}> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:x ex:flag true ; ex:n 7 ; ex:score "2.5E0"^^xsd:double ;
         ex:label "hallo"@de ."""
    assert ground(parse_jsonld(json.dumps(doc))) == ground(parse_turtle(ttl))


def test_list_container_and_explicit_list():
    doc = {
        "@context": {"items": {"@id": EX + "items",
                               "@container": "@list"},
                     "also": EX + "also"},
        "@id": EX + "s",
        "items": ["a", "b"],
        "also": {"@list": []},
    }
    ttl = f"""@prefix ex: <{EX}> .
    ex:s ex:items ("a" "b") ; ex:also () ."""
    assert ground(parse_jsonld(json.dumps(doc))) == ground(parse_turtle(ttl))


def test_graph_bnodes_and_explicit_bnode_ids():
    doc = {
        "@context": {"p": {"@id": EX + "p", "@type": "@id"},
                     "q": EX + "q"},
        "@graph": [
            {"@id": "_:n1", "p": {"@id": EX + "o"}},
            {"q": "anon"},  # no @id: fresh bnode
        ],
    }
    ttl = f"""@prefix ex: <{EX}> .
    _:n1 ex:p ex:o . _:m ex:q "anon" ."""
    assert ground(parse_jsonld(json.dumps(doc))) == ground(parse_turtle(ttl))
    # the SAME _: label maps to the same bnode
    doc2 = {"@graph": [
        {"@id": "_:a", "@type": EX + "T"},
        {"@id": "_:a", EX + "p": "x"},
    ]}
    rows = parse_jsonld(json.dumps(doc2))
    subjects = {r[1] for r in rows}
    assert len(subjects) == 1


def test_honest_boundaries():
    with pytest.raises(NotImplementedError, match="remote @context"):
        parse_jsonld('{"@context": "https://schema.org", "@id": "x"}')
    # @reverse values must denote nodes (value objects are invalid)
    with pytest.raises(ValueError, match="@reverse value"):
        parse_jsonld(json.dumps(
            {"@id": EX + "x", "@reverse": {EX + "p": {"@value": 3}}}))


def test_reverse_keyword_and_terms():
    def iri_row(s, p, o):
        return ("iri", s, p, "iri", o, None, None)

    # node-level @reverse: (y, p, x) — cross-checked against Turtle
    doc = {"@id": EX + "x", "@reverse": {EX + "p": {"@id": EX + "y"}}}
    ttl = f"@prefix ex: <{EX}> . ex:y ex:p ex:x ."
    assert ground(parse_jsonld(json.dumps(doc))) == ground(parse_turtle(ttl))
    # context reverse term: children → (child, parent, subj); string
    # values in reverse position are IRIs
    doc = {"@context": {"children": {"@reverse": EX + "parent"}},
           "@id": EX + "mom",
           "children": [{"@id": EX + "kid1"}, EX + "kid2"]}
    rows = parse_jsonld(json.dumps(doc))
    assert iri_row(EX + "kid1", EX + "parent", EX + "mom") in rows
    assert iri_row(EX + "kid2", EX + "parent", EX + "mom") in rows
    # nested node under @reverse emits its own forward triples too
    doc = {"@id": EX + "x",
           "@reverse": {EX + "p": {"@id": EX + "y",
                                   EX + "name": "why"}}}
    rows = parse_jsonld(json.dumps(doc))
    assert iri_row(EX + "y", EX + "p", EX + "x") in rows
    assert ("iri", EX + "y", EX + "name", "lit", "why", None, None) in rows
    # a reverse TERM used inside @reverse flips back to a forward edge
    doc = {"@context": {"rchild": {"@reverse": EX + "parent"}},
           "@id": EX + "x", "@reverse": {"rchild": {"@id": EX + "y"}}}
    rows = parse_jsonld(json.dumps(doc))
    assert iri_row(EX + "x", EX + "parent", EX + "y") in rows


def test_read_jsonld_scan_and_sparql(spark, tmp_path):
    from sparkdon.session import LocalEndpoint

    doc = {"@context": {"name": FOAF + "name"},
           "@graph": [{"@id": EX + f"p{i}", "name": f"Person {i}"}
                      for i in range(4)]}
    (tmp_path / "a.jsonld").write_text(json.dumps(doc))
    (tmp_path / "b.jsonld").write_text(json.dumps(
        {"@context": {"q": EX + "q"}, "q": "from-b"}))  # bnode subject
    df = read_jsonld(spark, str(tmp_path))
    assert df.count() == 5

    ep = LocalEndpoint(spark, df, prefixes={"foaf": FOAF})
    got = ep.select("SELECT ?n WHERE { ?s foaf:name ?n } ORDER BY ?n")
    assert list(got["n"]) == [f"Person {i}" for i in range(4)]


def test_to_jsonld_roundtrip():
    from sparkdon.jsonld import to_jsonld

    ttl = f"""@prefix ex: <{EX}> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:a a ex:T ; ex:p ex:b ; ex:q "lit"@fr ; ex:r "5"^^xsd:integer ;
         ex:s "plain" ; ex:t _:z .
    _:z ex:q "inner" ."""
    rows = parse_turtle(ttl)
    again = parse_jsonld(to_jsonld(rows))
    assert ground(again) == ground(rows)


def test_review_fixes_bnode_identity_set_aliases():
    # distinct anonymous nodes stay distinct across nested contexts
    doc = {"@id": EX + "s",
           EX + "p": {"@context": {}, EX + "q": "v1"},
           EX + "r": {EX + "q": "v2"}}
    rows = parse_jsonld(json.dumps(doc))
    anon = {r[1] for r in rows if r[0] == "bnode"}
    assert len(anon) == 2

    # inline @set is transparent, not a swallowed nested node
    rows = parse_jsonld(json.dumps(
        {"@id": EX + "s", EX + "p": {"@set": ["a", "b"]}}))
    assert {(r[4]) for r in rows} == {"a", "b"}

    # keyword aliases: "id"/"type" mappings behave as @id/@type
    doc = {"@context": {"id": "@id", "type": "@type",
                        "@vocab": EX},
           "id": EX + "thing", "type": EX + "T", "p": "x"}
    rows = sorted(parse_jsonld(json.dumps(doc)))
    assert ("iri", EX + "thing",
            "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            "iri", EX + "T", None, None) in rows
    assert ("iri", EX + "thing", EX + "p", "lit", "x", None, None) in rows
    assert len(rows) == 2


def test_review_fixes_relative_pred_cycles_nonfinite():
    # unmapped key with no @vocab: dropped, not a relative-IRI predicate
    rows = parse_jsonld(json.dumps({"@id": EX + "s", "name": "x"}))
    assert rows == []

    # prefix definitions expand recursively
    doc = {"@context": {"ex": EX, "v": "ex:vocab/"},
           "@id": EX + "s", "v:name": "n"}
    rows = parse_jsonld(json.dumps(doc))
    assert rows[0][2] == EX + "vocab/name"

    # mutually-referencing terms terminate instead of recursing forever
    doc = {"@context": {"a": {"@id": "b"}, "b": {"@id": "a"},
                        "@vocab": EX},
           "@id": EX + "s", "a": "x"}
    rows = parse_jsonld(json.dumps(doc))
    assert len(rows) == 1  # falls back to @vocab expansion

    # nonstandard Infinity/NaN JSON literals -> xsd:double lexicals
    rows = sorted(parse_jsonld(
        '{"@id": "http://e/s", "http://e/p": Infinity, '
        '"http://e/q": NaN}'))
    assert {r[4] for r in rows} == {"INF", "NaN"}


def test_reverse_alias_and_bad_value():
    # context alias of the @reverse keyword behaves like the keyword
    doc = {"@context": {"rev": "@reverse"},
           "@id": EX + "x", "rev": {EX + "p": {"@id": EX + "y"}}}
    rows = parse_jsonld(json.dumps(doc))
    assert ("iri", EX + "y", EX + "p", "iri", EX + "x", None, None) in rows
    # malformed @reverse value raises ValueError, not AttributeError
    with pytest.raises(ValueError, match="@reverse"):
        parse_jsonld(json.dumps({"@id": EX + "x", "@reverse": "nope"}))

