"""Regression tests for the round-4 ADVICE findings.

1. compile.py bound-join injection: only mandatory triple-pattern vars
   are injectable — FILTER-only vars, BIND targets, OPTIONAL-only vars
   must never be shipped as VALUES (semantics / well-formedness).
2. protocol.py `_query_form`: prologue PREFIX/BASE/comments are stripped
   before form detection, so labels/IRIs embedding a form keyword cannot
   misroute the query.
3. protocol.py: update is only accepted via POST (405 on GET).
4. compile.py SERVICE SILENT: a malformed results document degrades to
   the unit solution instead of raising.
5. algebra.py: a bare subselect directly behind the group brace
   (``SERVICE <ep> { SELECT ... }``) parses and evaluates.
"""

from __future__ import annotations

import urllib.error
import urllib.parse
import urllib.request

import pytest

from sparkdon.protocol import SparqlProtocolServer, _query_form
from sparkdon.session import inline

EX = "PREFIX : <http://example.com/>\n"

LOCAL_TTL = """
@prefix : <http://example.com/> .
:NYC :boro :Manhattan , :Brooklyn , :Queens .
:Manhattan :grade "A" .
"""

REMOTE_TTL = """
@prefix : <http://example.com/> .
:Manhattan :pop 1694251 .
:Brooklyn :pop 2736074 .
:Queens :pop 2405464 .
:Manhattan :grade "A" .
"""


@pytest.fixture(scope="module")
def local(spark):
    return inline(LOCAL_TTL, spark)


@pytest.fixture(scope="module")
def served(spark):
    srv = SparqlProtocolServer(inline(REMOTE_TTL, spark)).start()
    yield srv
    srv.stop()


# -- 1: injectable-variable restriction ---------------------------------

def test_filter_only_var_not_injected(local, served):
    served.queries.clear()
    local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b . :Manhattan :grade ?g ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop . FILTER(?g = \"A\") }} }}")
    (remote_q,) = served.queries
    # ?b is a triple-pattern var: still injected; ?g appears only in the
    # FILTER: pre-binding it would flip the spec's error-eliminates-row
    # semantics, so it must not travel
    assert "VALUES (?b)" in remote_q
    assert "?g" not in remote_q.split("FILTER")[0].replace("?grade", "")


def test_bind_target_var_not_injected(local, served):
    served.queries.clear()
    local.select(
        EX + "SELECT ?b ?pop2 WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?p . BIND(?p + ?p AS ?pop2) }} }}")
    (remote_q,) = served.queries
    assert "VALUES (?b)" in remote_q
    # injecting the BIND target would put ?pop2 in scope before the BIND,
    # making the remote query ill-formed
    assert "VALUES (?b ?pop2)" not in remote_q and "VALUES (?pop2" not in remote_q


def test_optional_only_var_not_injected(local, served):
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?pop ?g WHERE { :NYC :boro ?b . :Manhattan :grade ?g ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop OPTIONAL {{ ?b :grade ?g }} }} }}"
        " ORDER BY ?b")
    (remote_q,) = served.queries
    # ?g occurs only inside the OPTIONAL: VALUES ?g {..} OPTIONAL {..?g..}
    # keeps left rows the uninjected evaluation never produces
    assert "VALUES (?b)" in remote_q
    assert "?g" not in remote_q[: remote_q.index("OPTIONAL")]
    # Brooklyn/Queens have no remote grade -> OPTIONAL leaves ?g unbound
    # remotely, the local join then binds it to "A"; Manhattan matches
    assert list(pdf["b"]) == [":Brooklyn", ":Manhattan", ":Queens"]


# -- 2: form detection vs prologue --------------------------------------

def test_query_form_ignores_prologue_keywords():
    assert _query_form(
        "PREFIX d: <urn:ns/delete#> SELECT * WHERE { ?s ?p ?o }") == "SELECT"
    assert _query_form(
        "PREFIX select: <urn:x/> BASE <urn:drop/> ASK { ?s ?p ?o }") == "ASK"
    assert _query_form(
        "# DELETE is discussed here\nSELECT * WHERE { ?s ?p ?o }") == "SELECT"
    assert _query_form("INSERT DATA { <urn:a> <urn:b> <urn:c> }") == "INSERT"


def test_prefixed_select_routes_ok(served):
    q = "PREFIX d: <urn:ns/delete#> " + EX + "SELECT ?p WHERE { :Manhattan :pop ?p }"
    url = served.url + "?" + urllib.parse.urlencode({"query": q})
    import json

    with urllib.request.urlopen(url) as resp:
        doc = json.load(resp)
    assert doc["results"]["bindings"][0]["p"]["value"] == "1694251"


# -- 3: update only via POST --------------------------------------------

def test_update_via_get_is_rejected(spark):
    ep = inline(REMOTE_TTL, spark)
    before = ep.select_raw("SELECT * WHERE { ?s ?p ?o }").count()
    with SparqlProtocolServer(ep) as srv:
        upd = EX + "INSERT DATA { :Yonkers :pop 211569 }"
        url = srv.url + "?" + urllib.parse.urlencode({"update": upd})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(url)
        assert ei.value.code == 405
        assert ep.select_raw("SELECT * WHERE { ?s ?p ?o }").count() == before
        # POST is still the accepted route
        req = urllib.request.Request(
            srv.url, data=urllib.parse.urlencode({"update": upd}).encode())
        assert urllib.request.urlopen(req).status == 204
        assert ep.select_raw("SELECT * WHERE { ?s ?p ?o }").count() == before + 1


# -- 4: SILENT covers malformed result documents ------------------------

def test_service_silent_malformed_document(local, monkeypatch):
    import sparkdon.remote as remote

    monkeypatch.setattr(remote, "fetch_bindings",
                        lambda *a, **k: ["not", "a", "results", "doc"])
    q = (EX + "SELECT ?b WHERE { :NYC :boro ?b ."
         "  SERVICE SILENT <http://x.invalid/sparql> { ?b :pop ?pop } }")
    pdf = local.select(q)
    # failed service execution -> unit solution -> local rows survive
    assert len(pdf) == 3

    from sparkdon.errors import QueryExecutionError

    # pin the exact error surface: a malformed document on a non-SILENT
    # SERVICE must raise the engine's QueryExecutionError naming the
    # endpoint — not whatever decode exception happened to escape
    with pytest.raises(QueryExecutionError, match="malformed results"):
        local.select(q.replace("SERVICE SILENT", "SERVICE"))


# -- 5: bare subselect as a group body ----------------------------------

def test_bare_subselect_in_service(local, served):
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ SELECT ?b ?pop WHERE {{ ?b :pop ?pop }} }} }}"
        " ORDER BY ?b")
    assert list(pdf["pop"]) == [2736074, 1694251, 2405464]
    (remote_q,) = served.queries
    # a bare-subselect body exposes no injectable vars -> no VALUES, and
    # the shipped query must still be well-formed
    assert "VALUES" not in remote_q


def test_bare_subselect_plain_group(local):
    pdf = local.select(
        EX + "SELECT ?n WHERE { { SELECT (COUNT(?b) AS ?n) WHERE "
        "{ :NYC :boro ?b } } }")
    assert list(pdf["n"]) == [3]
