"""Regression tests for the round-3 ADVICE findings fixed in round 4
(ADVICE.md r3: sparql_source paging/schema, salted count semantics,
DISTINCT + hidden ORDER BY determinism; the x_salted_census oracle cast
is driver-gate-covered)."""

from __future__ import annotations

import threading
from http.server import HTTPServer

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mock_server_mod():
    from tests.test_remote import MockSparqlHandler

    server = HTTPServer(("127.0.0.1", 0), MockSparqlHandler)
    server.queries = []
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_port}/sparql", server
    server.shutdown()


def test_sparql_source_injects_order_by():
    """LIMIT/OFFSET stripes are independent HTTP requests — the wrapped
    subselect must carry a deterministic ORDER BY by default."""
    from pyspark.sql.types import StringType, StructField, StructType

    from sparkdon.sources.sparql_source import SparqlReader

    schema = StructType([StructField("s", StringType()),
                         StructField("label", StringType())])
    r = SparqlReader({"url": "http://x/sparql",
                      "query": "SELECT ?s ?label WHERE { ?s ?p ?label }"},
                     schema)
    q = r._effective_query()
    assert "ORDER BY ?s ?label" in q
    # explicit override
    r2 = SparqlReader({"url": "http://x/sparql", "orderby": "?label",
                       "query": "SELECT ?s ?label WHERE { ?s ?p ?label }"},
                      schema)
    assert "ORDER BY ?label" in r2._effective_query()


def test_sparql_source_orderby_none_single_partition():
    """Opting out of the injected order collapses to ONE partition —
    parallel stripes without a stable order can duplicate/drop rows."""
    from pyspark.sql.types import StringType, StructField, StructType

    from sparkdon.sources.sparql_source import SparqlReader

    schema = StructType([StructField("s", StringType())])
    r = SparqlReader({"url": "http://x/sparql", "orderby": "none",
                      "partitions": "8",
                      "query": "SELECT ?s WHERE { ?s ?p ?o }"}, schema)
    assert r.n_partitions == 1
    assert "ORDER BY" not in r._effective_query()


def test_sparql_source_schema_probe_wraps_user_limit(mock_server_mod):
    """schema() must survive a user query that already ends in LIMIT —
    the probe goes through the subselect wrapper, not a blind suffix."""
    from sparkdon.sources.sparql_source import SparqlDataSource

    url, server = mock_server_mod
    ds = SparqlDataSource(
        {"url": url, "query": "SELECT ?s ?label ?n WHERE { ?s ?p ?o } LIMIT 3"})
    schema = ds.schema()
    assert [f.name for f in schema.fields] == ["s", "label", "n"]
    sent = server.queries[-1]
    assert sent.count("LIMIT") == 2  # user LIMIT inside wrapper + probe LIMIT 1
    assert sent.rstrip().endswith("LIMIT 1")


def test_salted_count_skips_nulls(spark):
    """('count', col) must mean COUNT(col) — null-skipping — not
    COUNT(*), matching SQL semantics and the plain-groupBy twin."""
    from sparkdon.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("a", 3), ("b", None)],
        "k string, v int")
    got = {r["k"]: r["cnt"]
           for r in salted_agg(df, ["k"], {"cnt": ("count", "v")}).collect()}
    ref = {r["k"]: r["cnt"]
           for r in df.groupBy("k").agg(F.count("v").alias("cnt")).collect()}
    assert got == ref == {"a": 2, "b": 0}


def test_distinct_order_by_hidden_key_deterministic(spark):
    """SELECT DISTINCT ?name ORDER BY ?age: duplicate projected rows with
    different hidden sort keys must order by a DETERMINISTIC
    representative (min key), not an arbitrary surviving row."""
    from sparkdon.session import inline

    e = inline(
        "@prefix : <http://ex.com/> . "
        ':p1 :name "alice" ; :age 90 . '
        ':p2 :name "alice" ; :age 1 . '   # duplicate name, tiny age
        ':p3 :name "bob" ; :age 50 . ',
        spark)
    runs = [
        list(e.select(
            "SELECT DISTINCT ?name { ?x :name ?name ; :age ?age } ORDER BY ?age"
        )["name"])
        for _ in range(3)
    ]
    # min hidden key for alice is 1 < bob's 50 → alice always first
    assert all(r == ["alice", "bob"] for r in runs), runs
