"""I/O tests: N-Triples reader edge cases, triple-store layout and
partition pruning, distributed N-Triples writer round-trip."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F


NT_SAMPLE = """# full line comment
<http://ex.com/a> <http://ex.com/name> "Alice \\"A\\"\\tTabbed" .
<http://ex.com/a> <http://ex.com/age> "30"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex.com/a> <http://ex.com/label> "hallo"@de .
_:b1 <http://ex.com/knows> <http://ex.com/a> .

<http://ex.com/b> <http://ex.com/knows> _:b1 .
<http://ex.com/a> <http://ex.com/bs> "a\\\\n" .
"""


def test_read_ntriples_gz(spark, tmp_path):
    from sparkdon.io import read_ntriples

    p = tmp_path / "sample.nt.gz"
    with gzip.open(p, "wt") as f:
        f.write(NT_SAMPLE)
    df = read_ntriples(spark, str(p))
    rows = {(r["s"], r["p"]): r for r in df.collect()}
    assert len(rows) == 6
    assert rows[("a".join(["http://ex.com/", ""]), "http://ex.com/name")]["o"] == 'Alice "A"\tTabbed'
    age = rows[("http://ex.com/a", "http://ex.com/age")]
    assert age["o"] == "30" and age["o_dt"].endswith("integer")
    lab = rows[("http://ex.com/a", "http://ex.com/label")]
    assert lab["o_lang"] == "de"
    assert rows[("b1", "http://ex.com/knows")]["s_kind"] == "bnode"
    assert rows[("http://ex.com/b", "http://ex.com/knows")]["o_kind"] == "bnode"
    # \\n (escaped backslash + n) must stay backslash-n, not newline
    assert rows[("http://ex.com/a", "http://ex.com/bs")]["o"] == "a\\n"


def test_ntriples_writer_roundtrip(spark, tmp_path):
    from sparkdon.io import read_ntriples, write_ntriples
    from sparkdon.session import inline

    e = inline(
        """@prefix : <http://example.com/> .
        :a :p :b . :a :q "x y\tz" . :b :q "v"@en . :b :n 42 .""",
        spark,
    )
    out = tmp_path / "out.nt"
    write_ntriples(e.graph, str(out))
    again = read_ntriples(spark, str(out))
    orig = {tuple(r) for r in e.graph.collect()}
    back = {tuple(r) for r in again.collect()}
    assert orig == back


def test_triple_store_partition_pruning(spark, tmp_path):
    from sparkdon.io import read_triple_store, write_triple_store
    from sparkdon.session import inline

    e = inline(
        """@prefix : <http://example.com/> .
        :a :p1 :b . :c :p1 :d . :a :p2 "x" . :e :p3 "y" .""",
        spark,
    )
    path = str(tmp_path / "store")
    write_triple_store(e.graph, path)
    store = read_triple_store(spark, path)
    assert store.count() == 4
    filtered = store.filter(F.col("p") == "http://example.com/p1")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "isnotnull(p" in plan
    assert filtered.count() == 2
    # engine queries run against the persisted layout too
    from sparkdon.session import LocalEndpoint

    ep = LocalEndpoint(spark, store, prefixes={"": "http://example.com/"})
    df = ep.select("SELECT ?s { ?s :p1 ?o }")
    assert sorted(df["s"]) == [":a", ":c"]


def test_read_ntriples_malformed_lines(spark, tmp_path):
    from sparkdon.errors import SparkdonError
    from sparkdon.io import read_ntriples
    import pytest

    p = tmp_path / "bad.nt"
    p.write_text(
        "<http://a> <http://p> <http://b> .\n"
        "this line is garbage\n"
        '<http://a> <http://p> "ok" .\n'
        "<http://incomplete> <http://p>\n"
    )
    df = read_ntriples(spark, str(p))
    assert df.count() == 2  # malformed lines dropped, no empty-string rows
    assert all(r["p"] == "http://p" for r in df.collect())
    with pytest.raises(SparkdonError, match="malformed"):
        read_ntriples(spark, str(p), strict=True).count()


def test_nt_string_deterministic_on_dt_ties(spark):
    """Triples identical except datatype/lang must serialize in a stable
    order (the sort key includes o_dt/o_lang)."""
    from sparkdon.io import nt_string
    from sparkdon.terms import KIND_IRI, KIND_LIT

    rows = [
        (KIND_IRI, "urn:s", "urn:p", KIND_LIT, "1",
         "http://www.w3.org/2001/XMLSchema#long", None),
        (KIND_IRI, "urn:s", "urn:p", KIND_LIT, "1",
         "http://www.w3.org/2001/XMLSchema#int", None),
    ]
    schema = "s_kind string, s string, p string, o_kind string, o string, o_dt string, o_lang string"
    a = nt_string(spark.createDataFrame(rows, schema))
    b = nt_string(spark.createDataFrame(list(reversed(rows)), schema))
    assert a == b
    assert a.index("XMLSchema#int") < a.index("XMLSchema#long")
