"""Seeded random property-path battery: random edge sets through the
engine's recursive path machinery vs a pure-Python reachability
reference.

paths.py is the hand-written 'hard 10%' (semi-naive fixpoint loops,
anchored BFS, SIP) — exactly where a wrong frontier dedup or off-by-one
iteration silently loses pairs.  Each case builds a random directed
graph over a small node space (cycles, self-loops, multi-predicate
edges all arise naturally), runs `p*` / `p+` / `^p` / `p1/p2` / `p?` /
`p1|p2` through the full engine, and compares the pair set against an
independent closure computed with plain Python sets.
"""

from __future__ import annotations

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkdon.session import inline  # noqa: E402

N_GRAPHS = 6
SEED = 20260815
NODES = 8


def random_graph(rng):
    """{pred: set[(s, o)]} over n0..n7 — dense enough for cycles."""
    edges = {"p": set(), "q": set()}
    for pred in edges:
        for _ in range(rng.randint(6, 14)):
            edges[pred].add((rng.randrange(NODES), rng.randrange(NODES)))
    return edges


def to_turtle(edges):
    lines = ["@prefix : <http://x.com/> ."]
    for pred, pairs in edges.items():
        for s, o in pairs:
            lines.append(f":n{s} :{pred} :n{o} .")
    return "\n".join(lines)


def ref_closure(pairs, reflexive_nodes=None):
    """Transitive closure of a pair set; with reflexive_nodes adds the
    zero-length pairs p* requires (every subject/object in the graph)."""
    reach = {}
    for s, o in pairs:
        reach.setdefault(s, set()).add(o)
    changed = True
    while changed:
        changed = False
        for s in list(reach):
            new = set()
            for mid in reach[s]:
                new |= reach.get(mid, set())
            if not new <= reach[s]:
                reach[s] |= new
                changed = True
    out = {(s, o) for s, os_ in reach.items() for o in os_}
    if reflexive_nodes is not None:
        out |= {(n, n) for n in reflexive_nodes}
    return out


def engine_pairs(e, path_expr):
    q = f"SELECT ?s ?o {{ ?s {path_expr} ?o }}"
    rows = e.select_raw(q).select("v_s", "v_o").collect()

    def node(t):
        lex = t[1]
        return int(lex.rsplit("n", 1)[-1])

    return {(node(r["v_s"]), node(r["v_o"])) for r in rows}


@pytest.fixture(scope="module")
def graphs(spark):
    rng = random.Random(SEED)
    out = []
    for _ in range(N_GRAPHS):
        edges = random_graph(rng)
        out.append((edges, inline(to_turtle(edges), spark)))
    return out


def test_path_star_and_plus(graphs):
    for edges, e in graphs:
        nodes = {x for prs in edges.values() for pr in prs for x in pr}
        p = edges["p"]
        assert engine_pairs(e, ":p+") == ref_closure(p)
        # p*: closure plus zero-length on EVERY term in the graph
        assert engine_pairs(e, ":p*") == ref_closure(p, reflexive_nodes=nodes)


def test_path_inverse_and_seq(graphs):
    for edges, e in graphs:
        p, q = edges["p"], edges["q"]
        assert engine_pairs(e, "^:p") == {(o, s) for s, o in p}
        want_seq = {(s, o2) for s, o in p for o1, o2 in q if o == o1}
        assert engine_pairs(e, ":p/:q") == want_seq


def test_path_alternation_and_optional(graphs):
    for edges, e in graphs:
        nodes = {x for prs in edges.values() for pr in prs for x in pr}
        p, q = edges["p"], edges["q"]
        assert engine_pairs(e, "(:p|:q)") == p | q
        assert engine_pairs(e, ":p?") == p | {(n, n) for n in nodes}


def test_path_inverse_plus(graphs):
    """(^:p)+ is the closure of the REVERSED edge set — frontier
    direction bugs show up here and nowhere else."""
    for edges, e in graphs:
        rev = {(o, s) for s, o in edges["p"]}
        assert engine_pairs(e, "(^:p)+") == ref_closure(rev)


def test_path_seq_into_star(graphs):
    """:p/:q* — one p-hop then ANY number of q-hops (zero included, so
    every p-edge endpoint survives): composing a plain step with a
    closure exercises the join between the BGP tier and the recursive
    tier."""
    for edges, e in graphs:
        p, q = edges["p"], edges["q"]
        qreach = {}
        for s, o in ref_closure(q):
            qreach.setdefault(s, set()).add(o)
        want = set(p)  # zero q-hops
        for s, o in p:
            for t in qreach.get(o, ()):
                want.add((s, t))
        assert engine_pairs(e, ":p/:q*") == want


def test_path_plus_over_sequence(graphs):
    """(:p/:q)+ — the closure's STEP is itself composite."""
    for edges, e in graphs:
        p, q = edges["p"], edges["q"]
        step = {(s, o2) for s, o in p for o1, o2 in q if o == o1}
        assert engine_pairs(e, "(:p/:q)+") == ref_closure(step)


def test_path_inverse_of_sequence(graphs):
    """^(:p/:q) reverses the composed relation (≡ ^:q/^:p)."""
    for edges, e in graphs:
        p, q = edges["p"], edges["q"]
        step = {(s, o2) for s, o in p for o1, o2 in q if o == o1}
        assert engine_pairs(e, "^(:p/:q)") == {(o, s) for s, o in step}


def test_path_star_over_alternation(graphs):
    for edges, e in graphs:
        nodes = {x for prs in edges.values() for pr in prs for x in pr}
        both = edges["p"] | edges["q"]
        assert engine_pairs(e, "(:p|:q)*") == ref_closure(
            both, reflexive_nodes=nodes)


def test_closure_id_and_struct_representations_agree(spark):
    """Round 10: the cost-based representation choice
    (paths.CLOSURE_IDS_MIN_STEP) must be invisible to results — the same
    closure evaluated on term structs and on forced 64-bit ids returns
    identical pairs, for both the full transitive closure and the
    anchored multi-cone BFS."""
    from sparkdon import paths
    from sparkdon.session import inline

    ttl = "@prefix : <http://example.com/> .\n" + "\n".join(
        f":n{i} :edge :n{(i * 7 + 3) % 23} ." for i in range(23)) + (
        "\n:n0 :edge :n5 . :n5 :edge :n0 .")  # cycle
    e = inline(ttl, spark)
    q_plus = "SELECT ?x ?y { ?x :edge+ ?y }"
    q_star = ("SELECT ?s ?x { VALUES ?s { :n0 :n7 } ?s :edge* ?x }")

    def rows(q):
        raw = e.select_raw(q)
        return sorted(tuple(r[c]["lex"] for c in raw.columns)
                      for r in raw.collect())

    old = paths.CLOSURE_IDS_MIN_STEP
    try:
        paths.CLOSURE_IDS_MIN_STEP = 10 ** 9  # struct path
        plus_struct, star_struct = rows(q_plus), rows(q_star)
        paths.CLOSURE_IDS_MIN_STEP = 0  # forced id path
        plus_ids, star_ids = rows(q_plus), rows(q_star)
    finally:
        paths.CLOSURE_IDS_MIN_STEP = old
    assert plus_ids == plus_struct and len(plus_struct) > 23
    assert star_ids == star_struct and len(star_struct) > 2


def test_deep_chain_closure_through_compaction(spark):
    """r16: a 30-node chain drives both semi-naive loops past
    ``paths._SEEN_COMPACT_LEVELS`` (24), exercising the generation-list
    compaction (the anti-join side collapses to one materialized frame
    mid-closure).  The pair set must still be the exact reference
    closure — for the full fixpoint (p+) and the anchored BFS (p*)."""
    from sparkdon.session import inline

    n = 30
    ttl = "@prefix : <http://x.com/> .\n" + "\n".join(
        f":n{i} :p :n{i + 1} ." for i in range(n - 1))
    e = inline(ttl, spark)
    raw = e.select_raw("SELECT ?s ?o { ?s :p+ ?o }")
    got = {(r["v_s"]["lex"], r["v_o"]["lex"]) for r in raw.collect()}
    want = {(f"http://x.com/n{i}", f"http://x.com/n{j}")
            for i in range(n) for j in range(i + 1, n)}
    assert got == want
    raw2 = e.select_raw("SELECT ?o { :n0 :p* ?o }")
    got2 = {r["v_o"]["lex"] for r in raw2.collect()}
    assert got2 == {f"http://x.com/n{i}" for i in range(n)}
