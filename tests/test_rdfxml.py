"""RDF/XML reader (W3C RDF 1.1 XML Syntax) — fixtures cover the spec's
abbreviation machinery; ground fixtures cross-check against the Turtle
parser on the equivalent graph (two independent parsers, one triple set).
"""

from __future__ import annotations

import pytest

from sparkdon.io import parse_turtle
from sparkdon.rdfxml import parse_rdfxml

EX = "http://ex.com/"


def ground(rows):
    """Triple rows with bnode labels wiped (label-insensitive compare)."""
    out = []
    for s_kind, s, p, o_kind, o, dt, lang in rows:
        out.append((s_kind, s if s_kind != "bnode" else "*", p,
                    o_kind, o if o_kind != "bnode" else "*", dt, lang))
    return sorted(out)


def test_typed_node_about_and_literal_props():
    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}">
      <ex:Person rdf:about="{EX}alice">
        <ex:name>Alice</ex:name>
        <ex:age rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">19</ex:age>
        <ex:knows rdf:resource="{EX}bob"/>
      </ex:Person>
    </rdf:RDF>"""
    ttl = f"""@prefix ex: <{EX}> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    ex:alice a ex:Person ; ex:name "Alice" ; ex:age "19"^^xsd:integer ;
             ex:knows ex:bob ."""
    assert ground(parse_rdfxml(xml)) == ground(parse_turtle(ttl))


def test_xml_lang_inheritance_and_override():
    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}" xml:lang="en">
      <rdf:Description rdf:about="{EX}a">
        <ex:label>hello</ex:label>
        <ex:label xml:lang="fr">bonjour</ex:label>
        <ex:count rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">3</ex:count>
      </rdf:Description>
    </rdf:RDF>"""
    rows = sorted(parse_rdfxml(xml))
    langs = {(r[4], r[6]) for r in rows if r[3] == "lit" and r[5] is None}
    assert langs == {("hello", "en"), ("bonjour", "fr")}


def test_nested_node_and_nodeid():
    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}">
      <rdf:Description rdf:about="{EX}a">
        <ex:knows>
          <ex:Person rdf:nodeID="b1">
            <ex:name>Bob</ex:name>
          </ex:Person>
        </ex:knows>
        <ex:likes rdf:nodeID="b1"/>
      </rdf:Description>
    </rdf:RDF>"""
    rows = parse_rdfxml(xml)
    # the same bnode label joins both references
    bn = {r[4] for r in rows if r[3] == "bnode"}
    assert bn == {"b1"}
    ttl = f"""@prefix ex: <{EX}> .
    ex:a ex:knows _:b1 ; ex:likes _:b1 .
    _:b1 a ex:Person ; ex:name "Bob" ."""
    assert ground(rows) == ground(parse_turtle(ttl))


def test_parsetype_resource():
    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}">
      <rdf:Description rdf:about="{EX}a">
        <ex:address rdf:parseType="Resource">
          <ex:city>Springfield</ex:city>
          <ex:zip>12345</ex:zip>
        </ex:address>
      </rdf:Description>
    </rdf:RDF>"""
    ttl = f"""@prefix ex: <{EX}> .
    ex:a ex:address [ ex:city "Springfield" ; ex:zip "12345" ] ."""
    assert ground(parse_rdfxml(xml)) == ground(parse_turtle(ttl))


def test_parsetype_collection():
    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}">
      <rdf:Description rdf:about="{EX}a">
        <ex:items rdf:parseType="Collection">
          <rdf:Description rdf:about="{EX}x"/>
          <rdf:Description rdf:about="{EX}y"/>
        </ex:items>
      </rdf:Description>
    </rdf:RDF>"""
    ttl = f"""@prefix ex: <{EX}> .
    ex:a ex:items ( ex:x ex:y ) ."""
    assert ground(parse_rdfxml(xml)) == ground(parse_turtle(ttl))
    # empty collection → rdf:nil directly
    xml_empty = xml.replace(
        f'<rdf:Description rdf:about="{EX}x"/>', "").replace(
        f'<rdf:Description rdf:about="{EX}y"/>', "")
    ttl_empty = f"@prefix ex: <{EX}> . ex:a ex:items ( ) ."
    assert ground(parse_rdfxml(xml_empty)) == ground(parse_turtle(ttl_empty))


def test_parsetype_literal_xmlliteral():
    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}">
      <rdf:Description rdf:about="{EX}a">
        <ex:html rdf:parseType="Literal">bold <b>text</b></ex:html>
      </rdf:Description>
    </rdf:RDF>"""
    rows = parse_rdfxml(xml)
    assert len(rows) == 1
    r = rows[0]
    assert r[5] == "http://www.w3.org/1999/02/22-rdf-syntax-ns#XMLLiteral"
    assert "bold" in r[4] and "<b>text</b>" in r[4]


def test_rdf_li_and_container():
    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}">
      <rdf:Seq rdf:about="{EX}seq">
        <rdf:li>one</rdf:li>
        <rdf:li>two</rdf:li>
        <rdf:li>three</rdf:li>
      </rdf:Seq>
    </rdf:RDF>"""
    rows = parse_rdfxml(xml)
    preds = sorted(r[2] for r in rows if r[2].endswith(("_1", "_2", "_3")))
    assert [p[-2:] for p in preds] == ["_1", "_2", "_3"]
    by_pred = {r[2][-2:]: r[4] for r in rows if "_" in r[2][-3:]}
    assert by_pred == {"_1": "one", "_2": "two", "_3": "three"}


def test_rdf_id_xmlbase_and_property_attributes():
    xml = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="http://ex.com/" xml:base="http://base.org/doc">
      <rdf:Description rdf:ID="frag" ex:name="Frag" ex:kind="thing"/>
    </rdf:RDF>"""
    rows = sorted(parse_rdfxml(xml))
    assert all(r[1] == "http://base.org/doc#frag" for r in rows)
    assert {(r[2], r[4]) for r in rows} == {
        ("http://ex.com/name", "Frag"), ("http://ex.com/kind", "thing")}


def test_reification_via_property_id():
    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}" xml:base="{EX}doc">
      <rdf:Description rdf:about="{EX}a">
        <ex:says rdf:ID="st1">hi</ex:says>
      </rdf:Description>
    </rdf:RDF>"""
    rows = parse_rdfxml(xml)
    assert len(rows) == 5  # the triple + 4 reification triples
    st = {r[2].rsplit("#", 1)[1]: r for r in rows
          if r[1] == f"{EX}doc#st1"}
    assert set(st) == {"type", "subject", "predicate", "object"}
    assert st["subject"][4] == f"{EX}a"
    assert st["object"][4] == "hi"


def test_single_node_document_and_forbidden_node():
    xml = f"""<ex:Person xmlns:ex="{EX}"
      xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
      rdf:about="{EX}solo"/>"""
    rows = parse_rdfxml(xml)
    assert rows[0][2].endswith("#type")
    with pytest.raises(Exception, match="not a valid node element"):
        parse_rdfxml(
            '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
            "<rdf:li/></rdf:RDF>")


def test_distributed_read_rdfxml(spark, tmp_path):
    # two files with colliding bnode labels must stay distinct
    doc = """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="http://ex.com/">
      <rdf:Description rdf:about="http://ex.com/{n}">
        <ex:knows rdf:nodeID="shared"/>
      </rdf:Description>
    </rdf:RDF>"""
    (tmp_path / "a.rdf").write_text(doc.format(n="a"))
    (tmp_path / "b.rdf").write_text(doc.format(n="b"))
    from sparkdon.rdfxml import read_rdfxml

    df = read_rdfxml(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 2
    labels = {r["o"] for r in rows}
    assert len(labels) == 2  # per-file bnode namespace

    from sparkdon.session import from_rdfxml

    e = from_rdfxml(str(tmp_path), spark, prefixes={"ex": "http://ex.com/"})
    pdf = e.select("SELECT ?s WHERE { ?s ex:knows ?o }")
    assert sorted(str(v) for v in pdf["s"]) == ["ex:a", "ex:b"]


def test_inline_rdfxml_endpoint(spark):
    from sparkdon.session import inline_rdfxml

    xml = f"""<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#"
                 xmlns:ex="{EX}">
      <ex:Person rdf:about="{EX}alice"><ex:age
        rdf:datatype="http://www.w3.org/2001/XMLSchema#integer">19</ex:age></ex:Person>
    </rdf:RDF>"""
    e = inline_rdfxml(xml, spark, prefixes={"ex": EX})
    pdf = e.select("SELECT ?a WHERE { ?s ex:age ?a }")
    assert list(pdf["a"]) == [19]


# -- writer (round 10) --------------------------------------------------

def test_serialize_roundtrip_all_term_shapes():
    from sparkdon.rdfxml import serialize_rdfxml

    rows = [
        ("iri", "http://ex.com/a", "http://ex.com/p", "lit",
         'quotes " and <tags> & amps', None, None),
        ("iri", "http://ex.com/a", "http://ex.com/p", "lit",
         "bonjour", None, "fr"),
        ("iri", "http://ex.com/a", "http://ex.com/n", "lit",
         "7", "http://www.w3.org/2001/XMLSchema#integer", None),
        ("iri", "http://ex.com/a", "http://other.org/q", "iri",
         "http://ex.com/b", None, None),
        ("bnode", "b0", "http://ex.com/p", "bnode", "b1", None, None),
        ("iri", "http://ex.com/u", "http://ex.com/p", "lit",
         "multi\nline\ttext", None, None),
    ]
    doc = serialize_rdfxml(rows, {"ex": "http://ex.com/"})
    assert 'xmlns:ex="http://ex.com/"' in doc  # seeded prefix used
    assert sorted(parse_rdfxml(doc)) == sorted(rows)


def test_serialize_unserializable_predicate_raises():
    from sparkdon.errors import SparkdonError
    from sparkdon.rdfxml import serialize_rdfxml

    rows = [("iri", "http://ex.com/a", "http://ex.com/p/", "iri",
             "http://ex.com/b", None, None)]  # empty local part
    with pytest.raises(SparkdonError, match="NCName"):
        serialize_rdfxml(rows)


def test_serialize_control_char_literal_raises():
    from sparkdon.errors import SparkdonError
    from sparkdon.rdfxml import serialize_rdfxml

    rows = [("iri", "http://ex.com/a", "http://ex.com/p", "lit",
             "bad\x01char", None, None)]
    with pytest.raises(SparkdonError, match="control"):
        serialize_rdfxml(rows)


def test_rdfxml_string_and_write_roundtrip(spark, tmp_path):
    from sparkdon.rdfxml import rdfxml_string, read_rdfxml, write_rdfxml
    from sparkdon.session import inline

    ep = inline("""
@prefix : <http://ex.com/> .
:a :p :b ; :q "lit with spaces" ; :n 41 .
:b :p :c .
""", spark)
    doc = rdfxml_string(ep.graph, {"": "http://ex.com/"})
    assert sorted(parse_rdfxml(doc)) == sorted(
        map(tuple, ep.graph.collect()))
    path = str(tmp_path / "out_rdfxml")
    write_rdfxml(ep.graph.repartition(3), path)
    back = read_rdfxml(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ep.graph.collect()))


def test_serialize_cr_literal_roundtrips():
    from sparkdon.rdfxml import serialize_rdfxml

    rows = [("iri", "http://ex.com/a", "http://ex.com/p", "lit",
             "line\rreturn\r\nmix", None, None)]
    assert sorted(parse_rdfxml(serialize_rdfxml(rows))) == sorted(rows)


def test_serialize_non_ncname_bnode_labels():
    from sparkdon.rdfxml import serialize_rdfxml

    rows = [("bnode", "3fa2c1d9.b0", "http://ex.com/p", "bnode",
             "3fa2c1d9.b1", None, None),
            ("bnode", "b7", "http://ex.com/p", "lit", "x", None, None)]
    back = parse_rdfxml(serialize_rdfxml(rows))
    assert len(back) == 2
    # valid labels survive; invalid ones mint fresh NCNames consistently
    assert ("bnode", "b7", "http://ex.com/p", "lit", "x", None, None) in back
    pair = [r for r in back if r[3] == "bnode"][0]
    assert pair[1] != pair[4]


def test_write_rdfxml_with_empty_partitions(spark, tmp_path):
    from sparkdon.rdfxml import read_rdfxml, write_rdfxml
    from sparkdon.session import inline

    ep = inline("""
@prefix : <http://ex.com/> .
:a :p :b . :b :p :c .
""", spark)
    path = str(tmp_path / "sparse")
    write_rdfxml(ep.graph.repartition(16), path)  # most partitions empty
    back = read_rdfxml(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, ep.graph.collect()))
