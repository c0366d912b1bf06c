"""soft_dedup_weights / x_soft_dedup — SlimPajama/D4-style cluster
downweighting (r14; battery-registered at the r16 swap): every near-dup
cluster member gets weight 1/|cluster| instead of a keep/drop bit, so
duplicated passages contribute one document's expected training mass.
Driver-style DuckDB oracle compare on the fixture here; random-corpus
coverage in test_fuzz_pipeline_oracles.py."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkdon.pipeline.clusters import (  # noqa: E402
    _SOFT_DEDUP_ORACLE,
    soft_dedup_weights,
    x_soft_dedup,
)

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows


def test_weights_on_planted_clusters(spark):
    # three exact copies + two unique docs: the copy cluster gets
    # weight 1/3 each (mass 1.0 total), uniques keep weight 1.0
    dup = "this exact passage repeats verbatim across three documents"
    rows = [(1, dup), (2, dup), (3, dup),
            (4, "a unique document about spark shuffles"),
            (5, "another unique document about parquet pruning")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in soft_dedup_weights(docs).collect()}
    assert len(out) == 5                       # weights never drop docs
    for i in (1, 2, 3):
        assert out[i].cluster_rep == 1
        assert out[i].cluster_size == 3
        assert abs(out[i].weight - 1 / 3) < 1e-12
    for i in (4, 5):
        assert out[i].cluster_size == 1 and out[i].weight == 1.0
    # expected training mass of the cluster is exactly one document
    assert abs(sum(out[i].weight for i in (1, 2, 3)) - 1.0) < 1e-12


def test_gate_matches_duckdb_oracle(spark):
    sf_dir = "/root/testdata/sf0.001"
    df = x_soft_dedup(spark, sf_dir)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    cur = con.execute(_SOFT_DEDUP_ORACLE)
    o_cols = [c[0] for c in cur.description]
    o_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows)
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_weights_consistent_with_keep_list(spark):
    """weight = 1/size must agree with x_dedup_clusters' components:
    exactly one keep per cluster, and sum(weight) == #clusters."""
    from sparkdon.pipeline.clusters import x_dedup_clusters

    sf_dir = "/root/testdata/sf0.001"
    w = {r.doc_id: r for r in x_soft_dedup(spark, sf_dir).collect()}
    k = {r.doc_id: r for r in x_dedup_clusters(spark, sf_dir).collect()}
    assert set(w) == set(k)
    for d, r in w.items():
        assert r.cluster_rep == k[d].cluster_rep
    n_clusters = len({r.cluster_rep for r in w.values()})
    assert abs(sum(r.weight for r in w.values()) - n_clusters) < 1e-9
    assert sum(r.keep for r in k.values()) == n_clusters
