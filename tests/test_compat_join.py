"""Joins over possibly-unbound shared variables — the SPARQL
compatible-mappings semantics (the slow path of compile.Compiler.join)."""

from __future__ import annotations

from sparkdon.session import inline

TTL = """
@prefix : <http://ex.com/> .
:a :name "x" . :a :nick "xx" .
:b :name "y" .
:c :alias "xx" . :d :alias "yy" .
"""


def test_optional_then_join_on_uncertain_var(spark):
    e = inline(TTL, spark)
    df = e.select(
        "SELECT ?s ?n ?t { ?s :name ?o . OPTIONAL { ?s :nick ?n } ?t :alias ?n }"
    )
    rows = {(r["s"], r["n"], r["t"]) for r in df.to_dict("records")}
    # :a has nick "xx" -> only :c is compatible; :b's ?n is UNBOUND ->
    # compatible with every alias, and the join fills ?n from the right
    assert rows == {
        (":a", "xx", ":c"),
        (":b", "xx", ":c"),
        (":b", "yy", ":d"),
    }


def test_optional_filter_referencing_left_var(spark):
    # the full P10 trap: the FILTER references a LEFT variable, so it must
    # join-condition the OPTIONAL (not pre-filter the right side, not
    # post-filter the result — which would drop the unmatched rows)
    e = inline(
        """@prefix : <http://ex.com/> .
        :a :min 5 . :b :min 20 .
        :a :item :x1 . :a :item :x2 .
        :x1 :price 3 . :x2 :price 10 .
        :b :item :y1 . :y1 :price 15 .""",
        spark,
    )
    df = e.select(
        "SELECT ?s ?i { ?s :min ?m . "
        "OPTIONAL { ?s :item ?i . ?i :price ?p . FILTER(?p > ?m) } }"
    )
    rows = sorted((r["s"], r["i"]) for r in df.to_dict("records"))
    assert rows == [(":a", ":x2"), (":b", None)]


def test_union_missing_var_then_join(spark):
    e = inline(TTL, spark)
    df = e.select(
        "SELECT ?s ?n { { ?s :name ?o } UNION { ?s :nick ?n } ?t :alias ?n }"
    )
    rows = {(r["s"], r["n"]) for r in df.to_dict("records")}
    # name-branch rows leave ?n unbound -> compatible with xx and yy;
    # nick-branch binds ?n = "xx" -> only :c compatible
    assert (":a", "xx") in rows and (":b", "yy") in rows
    assert (":a", "yy") in rows  # unbound branch merged with :d's alias
