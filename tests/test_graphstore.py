"""SPARQL 1.1 Graph Store HTTP Protocol (round 10): GET/HEAD/PUT/POST/
DELETE against ?default / ?graph=<iri>, backed by the named quad store;
mutations visible to SPARQL GRAPH queries on the same endpoint."""

from __future__ import annotations

import urllib.error
import urllib.parse
import urllib.request

import pytest

from sparkdon.graphstore import GraphStoreServer
from sparkdon.session import inline

BASE_TTL = """
@prefix : <http://example.com/> .
:a :p :b .
"""

G1 = "http://example.com/g1"
TTL1 = "@prefix : <http://example.com/> .\n:x :q 1 .\n"
TTL2 = "@prefix : <http://example.com/> .\n:y :q 2 .\n"


@pytest.fixture()
def srv(spark):
    s = GraphStoreServer(inline(BASE_TTL, spark)).start()
    yield s
    s.stop()


def req(url, method="GET", body=None, ctype="text/turtle", accept=None):
    headers = {}
    if body is not None:
        headers["Content-Type"] = ctype
    if accept:
        headers["Accept"] = accept
    r = urllib.request.Request(
        url, data=body.encode() if body is not None else None,
        headers=headers, method=method)
    return urllib.request.urlopen(r)


def gurl(srv, iri=None):
    if iri is None:
        return srv.url + "?default"
    return srv.url + "?" + urllib.parse.urlencode({"graph": iri})


def test_put_creates_then_replaces_named_graph(srv):
    resp = req(gurl(srv, G1), "PUT", TTL1)
    assert resp.status == 201
    body = req(gurl(srv, G1)).read().decode()
    assert "http://example.com/x" in body
    resp = req(gurl(srv, G1), "PUT", TTL2)
    assert resp.status == 204
    body = req(gurl(srv, G1)).read().decode()
    assert "http://example.com/y" in body
    assert "http://example.com/x" not in body


def test_post_merges_into_named_graph(srv):
    req(gurl(srv, G1), "PUT", TTL1)
    resp = req(gurl(srv, G1), "POST", TTL2)
    assert resp.status == 204
    body = req(gurl(srv, G1)).read().decode()
    assert "http://example.com/x" in body and "http://example.com/y" in body


def test_delete_named_graph_then_404(srv):
    req(gurl(srv, G1), "PUT", TTL1)
    assert req(gurl(srv, G1), "DELETE").status == 204
    with pytest.raises(urllib.error.HTTPError) as exc:
        req(gurl(srv, G1))
    assert exc.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as exc:
        req(gurl(srv, G1), "DELETE")
    assert exc.value.code == 404


def test_default_graph_get_put_delete(srv):
    body = req(gurl(srv)).read().decode()
    assert "http://example.com/a" in body
    assert req(gurl(srv), "PUT", TTL1).status == 204
    body = req(gurl(srv)).read().decode()
    assert "http://example.com/x" in body
    assert "http://example.com/a" not in body
    # the default graph always exists: DELETE empties, GET stays 200
    assert req(gurl(srv), "DELETE").status == 204
    assert req(gurl(srv)).read().decode().strip() == ""


def test_post_default_merges(srv):
    req(gurl(srv), "POST", TTL1)
    body = req(gurl(srv)).read().decode()
    assert "http://example.com/a" in body and "http://example.com/x" in body


def test_gsp_graph_visible_to_sparql(srv):
    req(gurl(srv, G1), "PUT", TTL1)
    pdf = srv.endpoint.select(
        "SELECT ?s WHERE { GRAPH <http://example.com/g1> { ?s ?p ?o } }")
    assert list(pdf["s"]) == [":x"]


def test_indirect_identification_required(srv):
    with pytest.raises(urllib.error.HTTPError) as exc:
        req(srv.url)  # neither ?default nor ?graph=
    assert exc.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        req(srv.url + "?default&graph=" + G1)
    assert exc.value.code == 400


def test_unsupported_payload_415_and_parse_400(srv):
    with pytest.raises(urllib.error.HTTPError) as exc:
        req(gurl(srv, G1), "PUT", "<x>", ctype="application/rdf+json")
    assert exc.value.code == 415
    with pytest.raises(urllib.error.HTTPError) as exc:
        req(gurl(srv, G1), "PUT", "this is not turtle @@")
    assert exc.value.code == 400


def test_head_and_accept_negotiation(srv):
    resp = req(gurl(srv), "HEAD")
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "application/n-triples"
    assert resp.read() == b""
    with pytest.raises(urllib.error.HTTPError) as exc:
        req(gurl(srv), accept="application/json")
    assert exc.value.code == 406
    assert req(gurl(srv), accept="text/*").status == 200


def test_remote_graphstore_client_loop(spark, srv):
    from sparkdon.graphstore import RemoteGraphStore
    from sparkdon.session import inline

    client = RemoteGraphStore(srv.url, spark)
    assert not client.exists(G1)
    src = inline(TTL1, spark).graph
    assert client.put(src, G1) == 201
    assert client.exists(G1)
    back = client.get(G1)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect()))
    assert client.post(inline(TTL2, spark).graph, G1) == 204
    assert back.count() + 1 == client.get(G1).count()
    # default graph round-trip + delete
    base = client.get()
    assert base.count() == 1
    client.delete(G1)
    assert not client.exists(G1)


def test_put_rdfxml_payload(srv):
    from sparkdon.rdfxml import serialize_rdfxml

    xml = serialize_rdfxml(
        [("iri", "http://example.com/z", "http://example.com/q", "lit",
          "3", "http://www.w3.org/2001/XMLSchema#integer", None)])
    assert req(gurl(srv, G1), "PUT", xml,
               ctype="application/rdf+xml").status == 201
    body = req(gurl(srv, G1)).read().decode()
    assert "http://example.com/z" in body


def test_get_turtle_accept_and_put_relative_iris(srv):
    # review fixes: text/turtle GET (N-Triples is valid Turtle) and
    # payload-relative IRIs resolving against the target graph IRI
    resp = req(gurl(srv), accept="text/turtle")
    assert resp.status == 200
    assert resp.headers["Content-Type"] == "text/turtle"
    body = ("@prefix : <http://example.com/> .\n"
            "<item> :q 5 .\n")
    req(gurl(srv, G1), "PUT", body)
    got = req(gurl(srv, G1)).read().decode()
    # RFC 3986 against base http://example.com/g1: sibling resolution
    assert "<http://example.com/item>" in got


def test_get_rdfxml_and_real_turtle(srv):
    resp = req(gurl(srv), accept="application/rdf+xml")
    assert resp.headers["Content-Type"] == "application/rdf+xml"
    from sparkdon.rdfxml import parse_rdfxml

    assert len(parse_rdfxml(resp.read())) == 1
    resp = req(gurl(srv), accept="text/turtle")
    body = resp.read().decode()
    assert "@prefix" in body  # real prefixed Turtle now, not bare NT
