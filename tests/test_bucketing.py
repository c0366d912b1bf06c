"""Bucketed co-located joins + AQE skew handling — plan-shape evidence
for the shuffle-avoidance legs of the 100 TB design."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    from sparkdon.operators.bucketing import write_bucketed

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders.select("o_orderkey", "o_custkey", "o_totalprice"),
                   "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(lineitem.select("l_orderkey", "l_quantity"),
                   "t_lineitem_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"])
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    """Same key, same bucket count on both sides -> the join consumes the
    write-time partitioning: ZERO Exchange in the executed plan (the
    unbucketed twin needs two)."""
    from sparkdon.operators.bucketing import bucketed

    o, li = (bucketed(spark, t) for t in bucketed_pair)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o.o_orderkey == li.l_orderkey).groupBy(
            "o_orderkey").agg(F.sum("l_quantity").alias("qty"))
        plan = plan_of(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() > 0

        plain_o = spark.read.parquet(f"{SF}/orders.parquet")
        plain_li = spark.read.parquet(f"{SF}/lineitem.parquet")
        plain = plan_of(plain_o.join(
            plain_li, plain_o.o_orderkey == plain_li.l_orderkey))
        assert "Exchange" in plain
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_plain(spark, bucketed_pair):
    """Bucketing is a layout change only — results must be identical to
    the unbucketed join."""
    from sparkdon.operators.bucketing import bucketed

    o, li = (bucketed(spark, t) for t in bucketed_pair)
    got = sorted((r.o_orderkey, float(r.qty)) for r in
                 o.join(li, o.o_orderkey == li.l_orderkey)
                 .groupBy("o_orderkey")
                 .agg(F.sum("l_quantity").alias("qty")).collect())
    po = spark.read.parquet(f"{SF}/orders.parquet")
    pl = spark.read.parquet(f"{SF}/lineitem.parquet")
    ref = sorted((r.o_orderkey, float(r.qty)) for r in
                 po.join(pl, po.o_orderkey == pl.l_orderkey)
                 .groupBy("o_orderkey")
                 .agg(F.sum("l_quantity").alias("qty")).collect())
    assert got == ref


def test_aqe_splits_skewed_join(spark):
    """AQE's skew-join handling must engage on a pathologically skewed
    key (one key holding ~95% of a 400k-row side): the executed adaptive
    plan marks the sort-merge join ``skew=true``."""
    big = spark.range(400_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"))
    small = spark.range(2_000).select(F.col("id").alias("k"),
                                      F.col("id").alias("extra"))
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        j = big.join(small, "k")
        # materialize THIS DataFrame's QueryExecution (count() would spawn
        # its own, leaving this adaptive plan un-finalized)
        j.collect()
        plan = plan_of(j)
        assert "skew=true" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_corpus_intra_dedup_is_exchange_free(spark):
    """The x_dedup_intra docstring's scale claim, demonstrated: on a
    doc_id-bucketed corpus, BOTH shuffles disappear — the (doc_id,
    chunk) dedup window is satisfied by the doc_id HashPartitioning
    (subset-of-clustering-keys rule) and the doc_id reassembly aggregate
    consumes the same layout.  Results must equal the plain-parquet run
    byte for byte."""
    import unittest.mock as mock

    from sparkdon import pipeline
    from sparkdon.operators.bucketing import write_bucketed

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_bucketed(docs.select("doc_id", "text"), "t_docs_b",
                   ["doc_id"], 8)
    try:
        plain = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_md5"])
                 for r in pipeline.x_dedup_intra(spark, SF).collect()}
        bdf = spark.table("t_docs_b")
        with mock.patch.object(pipeline, "table", lambda s, d, n: bdf):
            df = pipeline.x_dedup_intra(spark, SF)
            plan = plan_of(df)
            got = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["clean_md5"])
                   for r in df.collect()}
        assert "Exchange" not in plan, plan
        assert got == plain
    finally:
        spark.sql("DROP TABLE IF EXISTS t_docs_b")
