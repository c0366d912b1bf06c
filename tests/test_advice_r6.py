"""Regression tests for the round-5 ADVICE findings.

1. compile.py `_injectable_vars`: BIND targets are banned *recursively* —
   a var that is a mandatory triple var but also a BIND target inside a
   nested OPTIONAL/MINUS/group/subselect is not injected.
2. compile.py SERVICE SILENT catch scope: only document-shape errors
   degrade to the unit solution; a driver-side defect while materializing
   the bindings frame surfaces even under SILENT.
3. bench.py partial totals are covered in tests/test_bench_output.py.
"""

from __future__ import annotations

import pytest

from sparkdon.algebra import parse_query
from sparkdon.compile import Compiler, _injectable_vars
from sparkdon.errors import QueryExecutionError
from sparkdon.session import inline

EX = "PREFIX : <http://example.com/>\n"

LOCAL_TTL = """
@prefix : <http://example.com/> .
:NYC :boro :Manhattan , :Brooklyn , :Queens .
"""


def group_of(body: str):
    q = parse_query(EX + "SELECT * WHERE { " + body + " }")
    return q.where


# -- 1: recursive BIND-target ban ---------------------------------------

def test_bind_target_banned_at_top_level():
    g = group_of("?s :p ?v . BIND(1 AS ?v)")
    assert "v" not in _injectable_vars(g)
    assert "s" in _injectable_vars(g)


def test_bind_target_banned_inside_optional():
    # ?v is a mandatory triple var AND a BIND target inside OPTIONAL:
    # the interaction between injection and the inner BIND is unanalyzed,
    # so ?v must not be injected (round-5 ADVICE)
    g = group_of("?s :p ?v . OPTIONAL { ?s :q ?w . BIND(1 AS ?v) }")
    assert "v" not in _injectable_vars(g)
    assert "s" in _injectable_vars(g)
    # OPTIONAL-only triple vars still never injectable
    assert "w" not in _injectable_vars(g)


def test_bind_target_banned_inside_minus():
    g = group_of("?s :p ?v . MINUS { ?s :q ?x . BIND(2 AS ?v) }")
    assert "v" not in _injectable_vars(g)


def test_bind_target_banned_inside_nested_optional():
    g = group_of(
        "?s :p ?v . OPTIONAL { ?s :q ?w . OPTIONAL { BIND(3 AS ?v) } }")
    assert "v" not in _injectable_vars(g)


def test_bind_target_banned_inside_union_branch():
    g = group_of("?s :p ?v . { ?s :q ?x } UNION { BIND(4 AS ?v) }")
    assert "v" not in _injectable_vars(g)


def test_bind_target_banned_inside_subselect():
    g = group_of(
        "?s :p ?v . { SELECT ?z WHERE { ?z :q ?q1 . BIND(5 AS ?v) } }")
    assert "v" not in _injectable_vars(g)


def test_plain_mandatory_vars_still_injectable():
    g = group_of("?s :p ?v . OPTIONAL { ?s :q ?w . BIND(1 AS ?u) }")
    assert _injectable_vars(g) >= {"s", "v"}
    assert "u" not in _injectable_vars(g)


# -- 2: SILENT must not swallow driver-side defects ---------------------

@pytest.fixture(scope="module")
def local(spark):
    return inline(LOCAL_TTL, spark)


SVC_Q = (EX + "SELECT ?b WHERE { :NYC :boro ?b ."
         "  SERVICE SILENT <http://x.invalid/sparql> { ?b :pop ?pop } }")


def test_silent_does_not_mask_local_defect(local, monkeypatch):
    import sparkdon.remote as remote

    monkeypatch.setattr(
        remote, "fetch_bindings",
        lambda *a, **k: {"head": {"vars": ["pop"]},
                         "results": {"bindings": []}})

    def boom(self, doc):
        raise RuntimeError("driver-side materialization bug")

    monkeypatch.setattr(Compiler, "_service_bindings", boom)
    with pytest.raises(RuntimeError, match="materialization bug"):
        local.select(SVC_Q)


def test_silent_still_covers_fetch_failure(local, monkeypatch):
    import sparkdon.remote as remote

    def network_down(*a, **k):
        raise OSError("connection refused")

    monkeypatch.setattr(remote, "fetch_bindings", network_down)
    pdf = local.select(SVC_Q)
    # failed service execution -> unit solution -> local rows survive
    assert len(pdf) == 3


# -- round-6 self-review: UNION partial-binding cardinality -------------

def test_union_partial_branch_var_not_injectable():
    """A var bound in only SOME union branches must not be injected:
    solutions from the non-binding branch carry it unbound and would
    join-multiply against every VALUES row (bag-cardinality bug)."""
    g = group_of("{ ?s :p ?v } UNION { ?s :q ?w }")
    inj = _injectable_vars(g)
    assert "v" not in inj and "w" not in inj
    assert "s" in inj  # bound in every branch


def test_union_all_branch_var_still_injectable():
    g = group_of("{ ?s :p ?v } UNION { ?s :q ?v }")
    assert {"s", "v"} <= _injectable_vars(g)


def test_union_cardinality_not_inflated_by_injection(local, spark):
    """End-to-end: a SERVICE whose union binds ?pop in one branch only
    must return each remote solution once, not once per VALUES row."""
    from sparkdon.protocol import SparqlProtocolServer

    remote = inline(
        "@prefix : <http://example.com/> .\n"
        ":Manhattan :pop 1694251 .\n"
        ":Manhattan :grade \"A\" .\n", spark)
    with SparqlProtocolServer(remote) as srv:
        pdf = local.select(
            EX + "SELECT ?b ?pop ?g WHERE { :NYC :boro ?b ."
            f" SERVICE <{srv.url}> {{ {{ ?b :pop ?pop }} UNION "
            "{ ?b :grade ?g } } }")
    # Manhattan matches both branches once each; Brooklyn/Queens match
    # nothing remotely -> exactly 2 rows, never N-fold duplicates
    assert len(pdf) == 2
