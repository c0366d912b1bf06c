"""Term-dictionary encoding: round-trip fidelity and census equivalence."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparkdon.operators.dictionary import (
    build_dictionary, decode_column, encode_triples,
)
from sparkdon.rdfize import rdfize

SF = "/root/testdata/sf0.001"


def test_dictionary_census_equivalence(spark):
    triples = rdfize(spark, SF)
    dictionary = build_dictionary(triples)
    encoded = encode_triples(triples)
    assert encoded.count() == triples.count()

    # census on raw strings
    raw = {r["p"]: r["cnt"] for r in
           triples.groupBy("p").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # census on 8-byte ids, decoded at the edge
    enc = encoded.groupBy("p_id").agg(F.count(F.lit(1)).alias("cnt"))
    dec = decode_column(enc, "p_id", dictionary)
    got = {r["p_id_lex"]: r["cnt"] for r in dec.collect()}
    assert got == raw


def test_dictionary_distinguishes_lookalike_terms(spark):
    # IRI "x", plain "x", lang-tagged "x"@en, typed "x"^^dt: four ids
    rows = [
        ("iri", "s", "p", "iri", "x", None, None),
        ("iri", "s", "p", "lit", "x", None, None),
        ("iri", "s", "p", "lit", "x", None, "en"),
        ("iri", "s", "p", "lit", "x", "http://dt", None),
    ]
    from sparkdon.io import triples_df

    t = triples_df(spark, rows)
    d = build_dictionary(t)
    xs = d.filter(F.col("lex") == "x")
    assert xs.select("term_id").distinct().count() == 4


def test_encoded_join_matches_raw(spark):
    triples = rdfize(spark, SF)
    # 2-hop join customer -c_nationkey-> nation -n_name-> literal
    raw = (
        triples.filter(F.col("p") == "urn:p:c_nationkey").alias("a")
        .join(triples.filter(F.col("p") == "urn:p:n_name").alias("b"),
              F.col("a.o") == F.col("b.s"))
        .count()
    )
    enc = encode_triples(triples)

    def pid(name):  # predicate id = content hash, computable without the dict
        from sparkdon.operators.dictionary import NULL_SENTINEL

        return F.xxhash64(F.lit("iri"), F.lit(name),
                          F.lit(NULL_SENTINEL), F.lit(NULL_SENTINEL))

    a = enc.filter(F.col("p_id") == pid("urn:p:c_nationkey"))
    b = enc.filter(F.col("p_id") == pid("urn:p:n_name"))
    joined = a.alias("a").join(b.alias("b"), F.col("a.o_id") == F.col("b.s_id")).count()
    assert joined == raw


def test_dense_dictionary_ids_are_dense_and_sorted(spark):
    from sparkdon.operators.dictionary import build_dense_dictionary

    triples = rdfize(spark, SF)
    d = build_dense_dictionary(triples).cache()
    n = d.count()
    # dense: ids are exactly 0..n-1
    agg = d.agg(F.min("dense_id").alias("lo"), F.max("dense_id").alias("hi"),
                F.count_distinct("dense_id").alias("k")).collect()[0]
    assert (agg["lo"], agg["hi"], agg["k"]) == (0, n - 1, n)
    # sorted: id order follows (kind, lex) order, so co-occurring terms
    # (same namespace prefix) get adjacent ids — the delta-compression
    # property the dense mode exists for
    rows = d.orderBy("dense_id").select("kind", "lex").collect()
    keys = [(r["kind"], r["lex"]) for r in rows]
    assert keys == sorted(keys)
    d.unpersist()


def test_dense_encode_join_matches_raw(spark):
    from sparkdon.operators.dictionary import (
        build_dense_dictionary, encode_triples_dense,
    )

    triples = rdfize(spark, SF)
    d = build_dense_dictionary(triples).cache()
    enc = encode_triples_dense(triples, d).cache()
    assert enc.count() == triples.count()
    # every position resolved (no dangling null ids)
    assert enc.filter(F.col("s_id").isNull() | F.col("p_id").isNull()
                      | F.col("o_id").isNull()).count() == 0
    # the same 2-hop join as the content-hash test, on dense ids
    raw = (
        triples.filter(F.col("p") == "urn:p:c_nationkey").alias("a")
        .join(triples.filter(F.col("p") == "urn:p:n_name").alias("b"),
              F.col("a.o") == F.col("b.s"))
        .count()
    )
    pid = {r["lex"]: r["dense_id"]
           for r in d.filter(F.col("kind") == "iri")
           .filter(F.col("lex").isin("urn:p:c_nationkey", "urn:p:n_name"))
           .collect()}
    a = enc.filter(F.col("p_id") == pid["urn:p:c_nationkey"])
    b = enc.filter(F.col("p_id") == pid["urn:p:n_name"])
    joined = a.alias("a").join(b.alias("b"),
                               F.col("a.o_id") == F.col("b.s_id")).count()
    assert joined == raw
    enc.unpersist(); d.unpersist()
