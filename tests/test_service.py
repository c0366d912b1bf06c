"""SERVICE federation (SPARQL 1.1 §18), the SPARQL protocol server, and
DESCRIBE.

The federation tests run against a REAL evaluating endpoint: a second
LocalEndpoint published over HTTP by sparkdon.protocol — so both sides of
every SERVICE round-trip (client compilation and server evaluation) are
the engine under test."""

from __future__ import annotations

import pytest

from sparkdon.errors import QueryExecutionError, SparqlSyntaxError
from sparkdon.protocol import SparqlProtocolServer
from sparkdon.remote import RemoteEndpoint
from sparkdon.session import LocalEndpoint, inline

EX = "PREFIX : <http://example.com/>\n"

LOCAL_TTL = """
@prefix : <http://example.com/> .
:NYC :boro :Manhattan , :Brooklyn , :Queens , :The_Bronx .
:Manhattan :grade "A" .
"""

REMOTE_TTL = """
@prefix : <http://example.com/> .
:Manhattan :pop 1694251 .
:Brooklyn :pop 2736074 .
:Queens :pop 2405464 .
:Yonkers :pop 211569 .
:Brooklyn :grade "B" .
"""


@pytest.fixture(scope="module")
def local(spark):
    return inline(LOCAL_TTL, spark)


@pytest.fixture(scope="module")
def served(spark):
    srv = SparqlProtocolServer(inline(REMOTE_TTL, spark)).start()
    yield srv
    srv.stop()


def test_service_joins_remote_bindings(local, served):
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?b")
    # The_Bronx has no remote pop row, Yonkers is not a local boro
    assert list(pdf["pop"]) == [2736074, 1694251, 2405464]


def test_service_bound_join_injects_values(local, served):
    served.queries.clear()
    local.select(
        EX + "SELECT ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }}")
    (remote_q,) = served.queries
    assert "VALUES (?b)" in remote_q
    assert "<http://example.com/The_Bronx>" in remote_q
    assert "<http://example.com/Yonkers>" not in remote_q


def test_service_above_cap_chunks_bound_join(local, served, monkeypatch):
    """r15 chunk ladder: anchors above the per-request cap split into
    ceil(n/cap) VALUES batches (FedX-style) instead of falling back to
    an unconstrained fetch; the disjoint chunks' answers concatenate to
    the same solution bag."""
    from sparkdon.compile import Compiler

    monkeypatch.setattr(Compiler, "SERVICE_VALUES_CAP", 2)
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?b")
    assert len(served.queries) == 2  # 4 distinct boros / cap 2
    for remote_q in served.queries:
        assert "VALUES" in remote_q
    assert list(pdf["pop"]) == [2736074, 1694251, 2405464]  # same answer


def test_service_ladder_exceeded_falls_back_to_unconstrained(
        local, served, monkeypatch):
    from sparkdon.compile import Compiler

    monkeypatch.setattr(Compiler, "SERVICE_VALUES_CAP", 2)
    monkeypatch.setattr(Compiler, "SERVICE_MAX_REQUESTS", 1)
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?b")
    (remote_q,) = served.queries
    assert "VALUES" not in remote_q  # 4 boros > cap 2 x 1 request
    assert list(pdf["pop"]) == [2736074, 1694251, 2405464]  # same answer


def test_service_count_probe_exits_ladder_on_dense_anchors(
        local, served, monkeypatch):
    """r15 adaptive ladder exit: when chunking would cost >= the probe
    threshold in requests, one remote COUNT decides — here the whole
    remote relation (4 pop rows) is no bigger than the 4-anchor upload,
    so the compiler fetches unconstrained: 2 requests total instead of
    4 chunked ones."""
    from sparkdon.compile import Compiler

    monkeypatch.setattr(Compiler, "SERVICE_VALUES_CAP", 1)
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?b")
    assert len(served.queries) == 2
    assert "COUNT" in served.queries[0]
    assert "VALUES" not in served.queries[1]
    assert list(pdf["pop"]) == [2736074, 1694251, 2405464]


def test_service_count_probe_failure_keeps_chunking(
        local, served, monkeypatch):
    """The COUNT probe is advisory: a remote that rejects aggregates
    still gets the chunked bound join, not an exception."""
    from sparkdon import remote as remote_mod
    from sparkdon.compile import Compiler

    monkeypatch.setattr(Compiler, "SERVICE_VALUES_CAP", 1)
    real = remote_mod.fetch_bindings

    def flaky(url, sparql, **kw):
        if "COUNT" in sparql:
            raise RuntimeError("no aggregates here")
        return real(url, sparql, **kw)

    monkeypatch.setattr(remote_mod, "fetch_bindings", flaky)
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?b")
    assert len(served.queries) == 4  # one VALUES chunk per anchor
    assert all("VALUES" in q for q in served.queries)
    assert list(pdf["pop"]) == [2736074, 1694251, 2405464]


def test_service_chunk_fetches_overlap_and_keep_order(
        local, served, monkeypatch):
    """r16: the ladder's chunk requests ride a bounded thread pool.
    Overlap must be real (two chunks in flight at once against a slowed
    endpoint) while the solution bag stays identical to the sequential
    loop's — the pool consumes results in chunk order."""
    import threading
    import time as _time

    from sparkdon import remote as remote_mod
    from sparkdon.compile import Compiler

    monkeypatch.setattr(Compiler, "SERVICE_VALUES_CAP", 2)
    real = remote_mod.fetch_bindings
    lock = threading.Lock()
    in_flight, peak = [0], [0]

    def slow(url, sparql, **kw):
        with lock:
            in_flight[0] += 1
            peak[0] = max(peak[0], in_flight[0])
        _time.sleep(0.2)
        try:
            return real(url, sparql, **kw)
        finally:
            with lock:
                in_flight[0] -= 1

    monkeypatch.setattr(remote_mod, "fetch_bindings", slow)
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?b")
    assert len(served.queries) == 2  # 4 distinct boros / cap 2
    assert peak[0] == 2              # both chunks were in flight at once
    assert list(pdf["pop"]) == [2736074, 1694251, 2405464]  # same answer


def test_service_harvest_is_filter_sharpened(local, served):
    """r15: a group FILTER over already-bound prefix vars restricts the
    injected VALUES (the SIP-harvest rule applied to federation) — the
    remote only evaluates anchors that can survive the filter."""
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        "  FILTER(?b != :Manhattan) "
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?b")
    (remote_q,) = served.queries
    assert "VALUES" in remote_q
    assert "Manhattan" not in remote_q  # filtered anchor never shipped
    assert list(pdf["pop"]) == [2736074, 2405464]


def test_service_harvest_skips_nullable_var_filters(local, served):
    """r16 advice (high): a deferred FILTER over an OPTIONAL-bound
    (nullable) prefix var must NOT sharpen the harvest — on harvest
    rows the var is NULL so the filter drops them, yet the SERVICE
    group itself binds the var and the MERGED row passes the filter at
    group end.  Pre-fix the all-null harvest hit the empty-harvest
    short-circuit and the whole query silently returned empty."""
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?g WHERE { :NYC :boro ?b ."
        "  OPTIONAL { ?b :grade ?g } "
        '  FILTER(?g = "B") '
        f"  SERVICE <{served.url}> {{ ?b :grade ?g }} }}")
    # only remote :Brooklyn :grade "B" merges with the null-?g prefix
    # row and survives the group-end filter
    assert list(pdf["b"]) == [":Brooklyn"]
    assert list(pdf["g"]) == ["B"]
    # the certain var ?b still ships as VALUES (sharpening on CERTAIN
    # vars is untouched); the nullable-?g filter must not have emptied
    # the anchor set
    (remote_q,) = served.queries
    assert "VALUES" in remote_q
    assert "Brooklyn" in remote_q


def test_service_harvest_skips_exists_filters(local, served):
    """r16 advice (medium): _expr_vars cannot see through EXISTS, so a
    deferred [NOT] EXISTS filter used to satisfy the sharpening guard
    vacuously and was applied to the harvest, where null-tolerant
    compat over-drops anchors the group-end evaluation (with the
    service-bound value) would keep.  EXISTS filters must only run at
    group end."""
    served.queries.clear()
    pdf = local.select(
        EX + "SELECT ?b ?g WHERE { :NYC :boro ?b ."
        "  OPTIONAL { ?b :grade ?g } "
        "  FILTER NOT EXISTS { ?x :grade ?g } "
        f"  SERVICE <{served.url}> {{ ?b :grade ?g }} }}")
    # remote binds ?g = "B" for :Brooklyn; no LOCAL node has grade "B",
    # so the group-end NOT EXISTS keeps exactly that row.  Pre-fix the
    # harvest anti-join matched every row (null ?g is compat with the
    # local "A" row; Manhattan's "A" matched directly) → empty harvest
    # → empty result.
    assert list(pdf["b"]) == [":Brooklyn"]
    assert list(pdf["g"]) == ["B"]


def test_service_first_in_group_fetches_whole_pattern(local, served):
    served.queries.clear()
    pdf = local.select(
        EX + f"SELECT ?b WHERE {{ SERVICE <{served.url}> {{ ?b :pop ?pop }} ."
        "  ?b :grade ?g }")
    (remote_q,) = served.queries
    assert "VALUES" not in remote_q  # no prior bindings to push
    assert list(pdf["b"]) == [":Manhattan"]


def test_service_silent_failure_is_unit(local):
    pdf = local.select(
        EX + "SELECT ?b WHERE { :NYC :boro ?b ."
        "  SERVICE SILENT <http://127.0.0.1:9/sparql> { ?b :pop ?pop } }")
    assert len(pdf) == 4  # all local rows survive, ?pop unbound


def test_service_failure_raises_without_silent(local):
    with pytest.raises(QueryExecutionError, match="cannot reach"):
        local.select(
            EX + "SELECT ?b WHERE { :NYC :boro ?b ."
            "  SERVICE <http://127.0.0.1:9/sparql> { ?b :pop ?pop } }")


def test_service_variable_endpoint_rejected(local):
    with pytest.raises(SparqlSyntaxError, match="variable endpoint"):
        local.select(EX + "SELECT ?b WHERE { SERVICE ?ep { ?b :pop ?o } }")


def test_service_bnode_bindings_skip_injection(spark, served):
    # local values that include a bnode cannot transfer across endpoints;
    # the injection must be skipped but the join still evaluated locally
    g = inline(
        """@prefix : <http://example.com/> .
        :NYC :boro [ :alias :Manhattan ] .
        :NYC :boro :Brooklyn .""",
        spark,
    )
    served.queries.clear()
    pdf = g.select(
        EX + "SELECT ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }}")
    (remote_q,) = served.queries
    assert "VALUES" not in remote_q
    assert list(pdf["pop"]) == [2736074]  # only :Brooklyn matches


def test_service_under_use_ids_stays_value_encoded(spark, served):
    # service vars must be excluded from id encoding: the remote relation
    # arrives as term structs, so an id-encoded local join side would
    # never match
    g = LocalEndpoint(spark, inline(LOCAL_TTL, spark).graph,
                      prefixes={"": "http://example.com/"}, use_ids=True)
    pdf = g.select(
        EX + "SELECT ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?pop")
    assert list(pdf["pop"]) == [1694251, 2405464, 2736074]


def test_remote_endpoint_client_against_protocol_server(spark, served):
    # the in-repo protocol client reads the in-repo protocol server
    ep = RemoteEndpoint(served.url, spark, prefixes={"": "http://example.com/"})
    pdf = ep.select("SELECT ?s ?pop WHERE { ?s :pop ?pop } ORDER BY DESC(?pop)")
    assert len(pdf) == 4
    assert str(pdf.iloc[0]["s"]) == ":Brooklyn"


def test_protocol_server_ask_and_update(spark):
    g = inline("@prefix : <http://example.com/> .\n:a :p :b .", spark)
    with SparqlProtocolServer(g) as srv:
        ep = RemoteEndpoint(srv.url, spark, prefixes={"": "http://example.com/"})
        assert ep.select("SELECT ?o { :a :p ?o }").shape[0] == 1
        srv.endpoint.update("PREFIX : <http://example.com/> "
                            "INSERT { :a :p :c } WHERE {}")
        assert ep.select("SELECT ?o { :a :p ?o }").shape[0] == 2


# ---------------------------------------------------------------------------
# DESCRIBE
# ---------------------------------------------------------------------------

DESCRIBE_TTL = """
@prefix : <http://example.com/> .
:Manhattan :pop 1694251 ; :mayor [ :name "Eric" ; :office [ :addr "City Hall" ] ] .
:Brooklyn :pop 2736074 .
:NYC :boro :Manhattan , :Brooklyn .
"""


@pytest.fixture(scope="module")
def desc_graph(spark):
    return inline(DESCRIBE_TTL, spark)


def test_describe_constant_follows_bnode_closure(desc_graph):
    d = desc_graph.describe(EX + "DESCRIBE :Manhattan")
    # pop + mayor + (name, office) + addr — two bnode hops deep
    assert d.count() == 5
    assert ":addr" in d.ttl()


def test_describe_variables_from_where(desc_graph):
    d = desc_graph.describe(EX + "DESCRIBE ?b WHERE { :NYC :boro ?b }")
    assert d.count() == 6  # Manhattan CBD (5) + Brooklyn (1)


def test_describe_star_ignores_literal_bindings(desc_graph):
    d = desc_graph.describe(EX + "DESCRIBE * WHERE { ?s :pop ?p }")
    assert d.count() == 6  # ?p binds literals — not describable


def test_describe_mixed_constant_and_var(desc_graph):
    d = desc_graph.describe(
        EX + "DESCRIBE :Brooklyn ?m WHERE { :Manhattan :mayor ?m }")
    # Brooklyn (1) + the mayor bnode subtree (name, office, addr)
    assert d.count() == 4


def test_describe_requires_describe_form(desc_graph):
    from sparkdon.errors import SparkdonError

    with pytest.raises(SparkdonError, match="DESCRIBE"):
        desc_graph.describe(EX + "SELECT ?s WHERE { ?s ?p ?o }")


def test_service_pooled_ladder_surfaces_first_chunk_failure(
        local, served, monkeypatch):
    """r17 (VERDICT r16 #6): a mid-ladder chunk failure under the fetch
    pool must surface exactly the exception the sequential loop would —
    the FIRST failing chunk in CHUNK order, regardless of which request
    fails first in wall-clock order.  ``pool.map`` guarantees results
    are consumed in submission order; this pins that contract so a
    refactor (e.g. to as_completed) can't silently reorder failure
    attribution."""
    from sparkdon import remote as remote_mod
    from sparkdon.compile import Compiler

    monkeypatch.setattr(Compiler, "SERVICE_VALUES_CAP", 1)
    real = remote_mod.fetch_bindings

    def failing(url, sparql, **kw):
        # two mid-ladder chunks fail, with distinct messages; the
        # Brooklyn chunk is made SLOWEST so wall-clock completion order
        # differs from chunk order when the pool overlaps requests
        import time as _time

        if "COUNT" in sparql:
            # keep the chunk ladder: the adaptive COUNT probe would
            # otherwise collapse this dense fixture to one request
            raise RuntimeError("no aggregates here")
        if "Brooklyn" in sparql and "VALUES" in sparql:
            _time.sleep(0.3)
            raise RuntimeError("chunk-failure:Brooklyn")
        if "Queens" in sparql and "VALUES" in sparql:
            raise RuntimeError("chunk-failure:Queens")
        return real(url, sparql, **kw)

    monkeypatch.setattr(remote_mod, "fetch_bindings", failing)
    q = (EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
         f"  SERVICE <{served.url}> {{ ?b :pop ?pop }} }} ORDER BY ?b")

    # sequential reference: one worker consumes chunks strictly in order
    monkeypatch.setattr(Compiler, "SERVICE_FETCH_POOL", 1)
    with pytest.raises(Exception) as seq_exc:
        local.select(q)
    assert "chunk-failure:" in str(seq_exc.value)

    # pooled run (the shipped configuration) must surface the SAME
    # chunk's exception even though completion order differs
    monkeypatch.setattr(Compiler, "SERVICE_FETCH_POOL", 6)
    with pytest.raises(Exception) as pool_exc:
        local.select(q)
    assert str(pool_exc.value) == str(seq_exc.value)

    # and SILENT still degrades the whole SERVICE group to the unit
    # solution under a pooled mid-ladder failure
    pdf = local.select(
        EX + "SELECT ?b ?pop WHERE { :NYC :boro ?b ."
        f"  SERVICE SILENT <{served.url}> {{ ?b :pop ?pop }} }}")
    assert len(pdf) == 4 and pdf["pop"].isnull().all()
