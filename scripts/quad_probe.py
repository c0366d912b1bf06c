#!/usr/bin/env python3
"""Quad-store (named-graph) scale probe (round 15, VERDICT r14 #5).

The named-graph tier is pytest-green but had no probe at sf0.1-class
quad volume.  ``GRAPH ?g { ?x p+ ?y }`` evaluates closure paths over
EVERY named graph in one distributed plan by tagging each node lexical
with its graph IRI (``<g> <lex>`` — compile.py
``_compile_path_in_graph_var``), running the untagged path machinery,
then decoding ``?g`` back out of the tag.  The question this probe
answers: what does the tag/untag lane cost versus the flat-triple lane
at EQUAL row counts, and does the ratio hold at 10×?

Construction makes the two lanes logically identical: G disjoint
chain-graphs of length C whose node IRIs embed the graph id, so the
flat store's closure has exactly the same pair count as the per-graph
union — any wall difference is the tag machinery (concat/split per
node, the per-graph anchor cross, the tag-carrying shuffle widths),
not different work.

Usage: python scripts/quad_probe.py [n_graphs] [chain_len] [scale_mult]
Prints one JSON line: flat/tagged wall at 1x and scale_mult x, ratios.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def build(spark, n_graphs: int, chain: int):
    """(triples, quads): G disjoint chains, node IRIs graph-unique."""
    base = (spark.range(n_graphs * chain)
            .select((F.col("id") / chain).cast("long").alias("gi"),
                    (F.col("id") % chain).alias("ci"))
            .filter(F.col("ci") < chain - 1))
    s = F.concat(F.lit("urn:n:"), F.col("gi"), F.lit(":"), F.col("ci"))
    o = F.concat(F.lit("urn:n:"), F.col("gi"), F.lit(":"), F.col("ci") + 1)
    cols = [
        F.lit("iri").alias("s_kind"), s.alias("s"),
        F.lit("urn:p:next").alias("p"),
        F.lit("iri").alias("o_kind"), o.alias("o"),
        F.lit(None).cast("string").alias("o_dt"),
        F.lit(None).cast("string").alias("o_lang"),
    ]
    triples = base.select(*cols)
    quads = base.select(*cols, F.concat(F.lit("urn:g:"), F.col("gi"))
                        .alias("g"))
    # materialize so lane timings exclude the generator
    return triples.localCheckpoint(), quads.localCheckpoint()


def main() -> None:
    # chain 17 -> 16 BFS levels: short enough that per-iteration
    # fixed overhead doesn't drown the data term, long enough to be a
    # real closure; scaling multiplies GRAPH COUNT (width) — the axis
    # a graph-per-document quad store actually grows along
    n_graphs = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    chain = int(sys.argv[2]) if len(sys.argv) > 2 else 17
    mult = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("quad-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from sparkdon.session import LocalEndpoint

    out = {"n_graphs": n_graphs, "chain": chain, "mult": mult, "tiers": {}}
    expect_pairs_per_graph = chain * (chain - 1) // 2  # p+ over a chain

    # warm-up: pay whole-stage-codegen + closure-machinery JIT on a
    # tiny instance of BOTH lanes so lane order doesn't bias the timings
    wt, wq = build(spark, 2, chain)
    LocalEndpoint(spark, wt).select_raw(
        "SELECT ?x ?y { ?x <urn:p:next>+ ?y }").count()
    LocalEndpoint(spark, wt.limit(0), named=wq).select_raw(
        "SELECT ?g ?x ?y { GRAPH ?g { ?x <urn:p:next>+ ?y } }").count()

    for label, g in (("1x", n_graphs), (f"{mult}x", n_graphs * mult)):
        triples, quads = build(spark, g, chain)
        n_quads = quads.count()
        ep_flat = LocalEndpoint(spark, triples)
        ep_tag = LocalEndpoint(spark, triples.limit(0), named=quads)

        t0 = time.time()
        flat_n = ep_flat.select_raw(
            "SELECT ?x ?y { ?x <urn:p:next>+ ?y }").count()
        flat_s = round(time.time() - t0, 3)

        t0 = time.time()
        tag_n = ep_tag.select_raw(
            "SELECT ?g ?x ?y { GRAPH ?g { ?x <urn:p:next>+ ?y } }").count()
        tag_s = round(time.time() - t0, 3)

        assert flat_n == tag_n == g * expect_pairs_per_graph, (
            flat_n, tag_n, g * expect_pairs_per_graph)
        out["tiers"][label] = {
            "quads": n_quads, "closure_pairs": flat_n,
            "flat_s": flat_s, "tagged_s": tag_s,
            "tag_over_flat": round(tag_s / flat_s, 3)}
        print(json.dumps({label: out["tiers"][label]}), flush=True)

    t = out["tiers"]
    out["scale_ratio_flat"] = round(
        t[f"{mult}x"]["flat_s"] / t["1x"]["flat_s"], 2)
    out["scale_ratio_tagged"] = round(
        t[f"{mult}x"]["tagged_s"] / t["1x"]["tagged_s"], 2)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
