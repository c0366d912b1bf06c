"""Sideways information passing (SIP) for closure paths: a fully
unanchored ``?s p+ ?t`` whose endpoint the rest of the group binds BFSes
from the bound values (compile.py `_reorder_for_sip` + the prior-bindings
harvest) instead of computing the full transitive closure.  These tests
pin the semantics: textual order must not matter, zero-length pairs stay,
and possibly-unbound shared vars must NOT anchor (the null-tolerant
compatibility join needs the full closure)."""

from __future__ import annotations

from sparkdon.session import inline

TTL = """
@prefix : <http://example.com/> .
:a :link :b . :b :link :c . :c :link :d .
:x :link :y .
:root :pick :a ; :pick :x .
:other :pick :b .
:weird :opt :a .
"""


def test_sip_matches_both_textual_orders(spark):
    e = inline(TTL, spark)
    q_plain_first = "SELECT ?s ?t { :root :pick ?s . ?s :link+ ?t }"
    q_path_first = "SELECT ?s ?t { ?s :link+ ?t . :root :pick ?s }"
    r1 = sorted(map(repr, e.select_raw(q_plain_first).collect()))
    r2 = sorted(map(repr, e.select_raw(q_path_first).collect()))
    assert r1 == r2
    # :a's cone {b,c,d} plus :x's cone {y}
    assert len(r1) == 4


def test_sip_star_keeps_zero_length(spark):
    e = inline(TTL, spark)
    rows = e.select_raw(
        "SELECT ?s ?t { :other :pick ?s . ?s :link* ?t }").collect()
    # ?s = :b — zero-length (b,b) plus (b,c), (b,d)
    assert len(rows) == 3


def test_sip_filter_sharpens_anchor_set_losslessly(spark):
    e = inline(TTL, spark)
    # the filter's var is prefix-bound, so the harvest applies it; the
    # result must equal the unfiltered query restricted by hand
    rows = e.select_raw(
        "SELECT ?s ?t { :root :pick ?s . FILTER(STR(?s) = 'http://example.com/a') . "
        "?s :link+ ?t }").collect()
    assert sorted(r["v_t"]["lex"] for r in rows) == [
        "http://example.com/b", "http://example.com/c", "http://example.com/d"]


def test_uncertain_var_does_not_anchor(spark):
    """?s is uncertain (missing from one UNION branch): the engine must
    fall back to the full closure and the null-tolerant compatibility
    join, where the unbound-?s row merges with EVERY closure pair."""
    e = inline(TTL, spark)
    rows = e.select_raw(
        "SELECT ?s ?t { { :root :pick ?s } UNION { :weird :opt ?w } . "
        "?s :link+ ?t }").collect()
    # branch 1: :a cone (3) + :x cone (1); branch 2's unbound ?s merges
    # with all 7 closure pairs: (a,b)(a,c)(a,d)(b,c)(b,d)(c,d)(x,y)
    assert len(rows) == 11


def test_closure_retires_superseded_checkpoints(spark):
    """paths._retire: superseded BFS frames (step, base, empty frontier,
    compaction predecessors) release their pinned blocks inside the
    loop — a deep closure must not leave its ITERATION HISTORY in the
    block manager (the leak GC-thrashed a 200k-node depth-17 tree
    before the fix).

    What legitimately stays pinned is the RESULT's backing: the
    disjoint delta generations the returned lazy union reads
    (caller-lifetime, O(|closure|) bytes total because generations are
    disjoint).  On this fixture that is exactly 4 frames for the
    anchored ``+`` query (3 delta levels + the cycle-hits frame) and 3
    for the transitive ``*`` (step + 2 delta levels) = 7 worst case;
    Spark's ContextCleaner may release some earlier once the result
    DataFrames are unreferenced, so the measured count is ≤ that.  (The
    old ≤3 bound here was an accident of cleaner timing — it "passed"
    only when the JVM GC happened to run between the queries; the
    id-level pin sets are identical across the r16/r17 trees.)  A
    history leak would roughly double the count (step/base/anti-join
    temporaries per level), which this bound still catches."""
    e = inline(TTL, spark)
    jsc = spark.sparkContext._jsc
    before = jsc.getPersistentRDDs().size()
    e.select_raw("SELECT ?s ?t { :root :pick ?s . ?s :link+ ?t }").count()
    after_plus = jsc.getPersistentRDDs().size()
    # anchored +: retired step/base/empty-frontier; live = 3 gens + cycles
    assert after_plus - before <= 4
    e.select_raw("SELECT ?s ?t { ?s :link* ?t }").count()
    after = jsc.getPersistentRDDs().size()
    # transitive * adds at most step + 2 delta generations
    assert after - before <= 7


def test_sip_harvest_skips_nullable_var_filters(spark):
    """r16 advice (high, the SIP twin of the SERVICE fix): a deferred
    FILTER over an OPTIONAL-bound (nullable) prefix var must not
    sharpen the anchor harvest — the path pattern itself binds ?t, so
    the merged row can pass the group-end filter even though every
    harvest row has ?t NULL (pre-fix: all harvest rows dropped, empty
    anchor set, silently empty result)."""
    e = inline(TTL, spark)
    rows = e.select_raw(
        "SELECT ?s ?t { :root :pick ?s . OPTIONAL { ?s :alias ?t } . "
        "?s :link+ ?t . FILTER(?t = :d) }").collect()
    assert [(r["v_s"]["lex"], r["v_t"]["lex"]) for r in rows] == [
        ("http://example.com/a", "http://example.com/d")]


def test_sip_harvest_skips_exists_filters(spark):
    """r16 advice (medium): [NOT] EXISTS filters report no vars to
    _expr_vars, so the sharpening guard admitted them vacuously; they
    must only run at group end."""
    e = inline(TTL, spark)
    rows = e.select_raw(
        "SELECT ?s ?t { :root :pick ?s . OPTIONAL { ?s :alias ?t } . "
        "?s :link+ ?t . FILTER NOT EXISTS { ?z :pick ?t } }").collect()
    # pick'd nodes are {a, x, b}; the closure rows whose ?t is one of
    # those must drop at GROUP END (not by emptying the anchor set):
    # from :a → {b(dropped), c, d}, from :x → {y}
    got = sorted((r["v_s"]["lex"].split("/")[-1],
                  r["v_t"]["lex"].split("/")[-1]) for r in rows)
    assert got == [("a", "c"), ("a", "d"), ("x", "y")]
