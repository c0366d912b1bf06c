#!/usr/bin/env python3
"""SERVICE federation scale probe (round 15, VERDICT r14 #4).

``sparql_service`` is the only SPARQL gate in the bench top-15, and the
reference corpus's hottest real path is exactly this shape (every
notebook queries remote DBpedia — BASELINE.md).  This probe measures
how the FedX-style bound join behaves as the LOCAL anchor cardinality
crosses ``SPARQLCompiler.SERVICE_VALUES_CAP`` (compile.py):

- below the cap the compiler injects ONE VALUES clause and the remote
  evaluates only the relevant slice (one request, transfer bounded by
  the anchor set's remote matches);
- above the cap it falls back to ONE unconstrained fetch of the whole
  remote relation and re-applies the restriction locally — round-trips
  NEVER scale with anchor cardinality (there is no per-anchor request
  loop to amortize), but transfer scales with the REMOTE relation.

The in-repo protocol server makes wall time an understatement of the
real above-cap cost (localhost transfer is free; DBpedia's is not), so
the probe records the honest scale metric alongside wall:
``remote_rows`` actually shipped vs ``result_rows`` the join kept.

Usage: python scripts/service_probe.py [sf_dir]
Prints one JSON line per anchor tier + a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("service-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    from sparkdon import remote as remote_mod
    from sparkdon.compile import Compiler
    from sparkdon.protocol import SparqlProtocolServer
    from sparkdon.rdf_queries import endpoint

    # remote side: the customer graph (sf0.1: 15k customers; the
    # unconstrained fallback ships every requested-predicate triple).
    # local side: nation + customer — the anchor pattern binds the
    # shared variable at three cardinalities bracketing the cap.
    remote_ep = endpoint(spark, sf_dir, tables=("customer",))

    stats = {"requests": 0, "remote_rows": 0}
    real_fetch = remote_mod.fetch_bindings

    def counting_fetch(url, sparql, **kw):
        doc = real_fetch(url, sparql, **kw)
        stats["requests"] += 1
        stats["remote_rows"] += len(doc.get("results", {}).get("bindings", []))
        return doc

    remote_mod.fetch_bindings = counting_fetch
    cap = Compiler.SERVICE_VALUES_CAP

    # (tier, local anchor group, service group) — the local group binds
    # the shared var; COUNT keeps the local plan cheap so the timing is
    # dominated by the federation machinery under test.
    tiers = [
        # 25 nation IRIs — the gate's own shape
        ("anchors_25",
         "?n p:n_name ?nation",
         "?c p:c_nationkey ?n"),
        # ~680 customer IRIs (acctbal in [-999.99, 9999.99] ~uniform,
        # > 9500 keeps ~4.5%) — below cap, 27x the gate's anchors
        ("anchors_680",
         "?c p:c_acctbal ?b FILTER(?b > 9500)",
         "?c p:c_mktsegment ?m"),
        # all 15k customers — 22x the previous tier, decisively above
        # cap: exercises the unconstrained-fetch fallback
        ("anchors_15k",
         "?c p:c_acctbal ?b",
         "?c p:c_mktsegment ?m"),
    ]
    out = {"sf_dir": sf_dir, "cap": cap, "tiers": {}}

    def run_tier(local_ep, url, name, anchor, svc):
        stats["requests"] = 0
        stats["remote_rows"] = 0
        q = (f"SELECT (COUNT(*) AS ?cnt) {{ {anchor} . "
             f"SERVICE <{url}> {{ {svc} }} }}")
        t0 = time.time()
        df = local_ep.select_raw(q)
        rows = df.collect()
        wall = round(time.time() - t0, 3)
        row = {"wall_s": wall, "requests": stats["requests"],
               "remote_rows": stats["remote_rows"],
               "joined_count": int(rows[0][0]["lex"]) if rows else 0}
        out["tiers"][name] = row
        print(json.dumps({name: row}), flush=True)

    with SparqlProtocolServer(remote_ep) as srv:
        local_ep = endpoint(spark, sf_dir, tables=("nation", "customer"))
        for name, anchor, svc in tiers:
            run_tier(local_ep, srv.url, name, anchor, svc)

    # round 16 (VERDICT r15 #4): the ABOVE-LADDER regime — more local
    # anchors than cap x max_req can ship (orders at sf0.1: 150k order
    # IRIs > 30k ladder capacity).  The compiler must abandon the bound
    # join after collecting at most cap*max_req+1 anchor rows, fetch
    # the service pattern UNCONSTRAINED in one request, and re-apply
    # the restriction in the local join — proving the fall-back stays
    # correct (joined_count = |orders|: every order has a status) and
    # bounded (requests never scale with anchors).
    remote_orders = endpoint(spark, sf_dir, tables=("orders",))
    with SparqlProtocolServer(remote_orders) as srv:
        local_orders = endpoint(spark, sf_dir, tables=("orders",))
        run_tier(local_orders, srv.url, "anchors_150k_above_ladder",
                 "?o p:o_totalprice ?t", "?o p:o_orderstatus ?s")

    remote_mod.fetch_bindings = real_fetch
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
