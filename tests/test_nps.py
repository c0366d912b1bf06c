"""Negated property sets `!p` / `!(p1|^p2|...)` — spec §18.4, parsed in
algebra.py parse_path_elt, evaluated in paths.py eval_pairs('nps')."""

from __future__ import annotations

import pytest

from sparkdon.session import inline

NPS_TTL = """
@prefix : <http://example.com/> .
@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
:NYC :boro :Manhattan ; :mayor :Adams .
:Manhattan rdfs:label "Manhattan" ; a :Borough .
"""


@pytest.fixture(scope="module")
def e(spark):
    return inline(NPS_TTL, spark)


def lex(e, q, var):
    return sorted(r[0][1] for r in e.select_raw(q).select("v_" + var).collect())


def test_forward_single(e):
    assert lex(e, "SELECT ?o { :NYC !:boro ?o }", "o") == [
        "http://example.com/Adams"]


def test_forward_set_with_a(e):
    assert lex(e, "SELECT ?o { :Manhattan !(a|rdfs:label) ?o }", "o") == []


def test_mixed_forward_and_inverse(e):
    # fwd set {mayor, a, label} leaves :boro; inv set {boro} reverses the
    # other three edges
    got = lex(e, "SELECT ?s { ?s !(^:boro|:mayor|a|rdfs:label) ?o }", "s")
    assert got == sorted([
        "http://example.com/NYC", "http://example.com/Adams",
        "http://example.com/Borough", "Manhattan"])


def test_pure_inverse(e):
    assert lex(e, "SELECT ?x { :Manhattan !(^a) ?x }", "x") == [
        "http://example.com/NYC"]


def test_empty_set_matches_all_forward(e):
    assert len(lex(e, "SELECT ?s { ?s !() ?o }", "s")) == 4


def test_inside_sequence_path(e):
    assert lex(e, "SELECT ?o { :NYC !:mayor/rdfs:label ?o }", "o") == ["Manhattan"]


def test_outer_inverse_of_nps(e):
    # ^!(:mayor) flips the nps pairs: ?x such that (?x reached from
    # :Manhattan by an inverted non-mayor edge)
    assert lex(e, "SELECT ?x { :Manhattan ^!:mayor ?x }", "x") == [
        "http://example.com/NYC"]
