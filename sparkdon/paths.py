"""Property-path evaluation — the recursive tier (SURVEY.md §2.8, §4.2).

Catalyst has no recursion, so ``p*`` / ``p+`` (G3/G4), bnode closure (G5)
and rule fixpoints (G7) run as driver-controlled semi-naive loops:

    frontier ← seed
    while frontier ≠ ∅:
        frontier ← (frontier ⋈ step) − seen     # one distributed join
        frontier.localCheckpoint()               # cut lineage growth
        seen ← seen ∪ frontier

Each iteration is one shuffle join; ``localCheckpoint()`` keeps the plan
from growing linearly with iterations (SURVEY.md §4.2 item 1).  Anchored
closures (a constant on either end — the common case in the corpus, e.g.
``?x rdfs:subClassOf* :Agent``) BFS from the anchor so the working set is
the reachable cone, not the full relation; only a fully unanchored
``?x p* ?y`` pays for the complete transitive closure.

Reference exercisers: ``rdfs:subClassOf*`` DBpedia_Schema_Queries#cell77-82,
``rdfs:member+`` Inference_Over_RDF_Containers#cell58, ``^rdfs:member``
from a literal anchor #cell56,64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdon.algebra import Path
from sparkdon.errors import QueryExecutionError
from sparkdon.terms import BNode, IRI, KIND_BNODE, KIND_IRI, KIND_LIT, Literal, make_term

#: iteration guard for runaway graphs; each iteration is one BFS level, so
#: this bounds path length, not data size.
MAX_ITERATIONS = 200


def _pairs_for_link(compiler, iri: IRI) -> DataFrame:
    t = compiler.triples.filter(F.col("p") == str(iri))
    return t.select(
        make_term(F.col("s_kind"), F.col("s")).alias("start"),
        make_term(F.col("o_kind"), F.col("o"), F.col("o_dt"), F.col("o_lang")).alias("end"),
    )


def _const_struct_row(term):
    if isinstance(term, IRI):
        return (KIND_IRI, str(term), None, None)
    if isinstance(term, BNode):
        return (KIND_BNODE, str(term), None, None)
    if isinstance(term, Literal):
        return (KIND_LIT, term.lex, term.datatype, term.lang)
    raise QueryExecutionError(f"bad path anchor {term!r}")


TERM_STRUCT_DDL = "struct<kind:string,lex:string,dt:string,lang:string>"


def eval_pairs(compiler, path) -> DataFrame:
    """Evaluate a (non-closure) path expression to a (start, end) relation."""
    if isinstance(path, IRI):
        return _pairs_for_link(compiler, path)
    if not isinstance(path, Path):
        raise QueryExecutionError(f"unsupported path {path!r}")
    if path.op == "link":
        return _pairs_for_link(compiler, path.parts[0])
    if path.op == "inv":
        inner = eval_pairs(compiler, path.parts[0])
        return inner.select(F.col("end").alias("start"), F.col("start").alias("end"))
    if path.op == "seq":
        left = eval_pairs(compiler, path.parts[0]).withColumnRenamed("end", "mid")
        right = eval_pairs(compiler, path.parts[1]).withColumnRenamed("start", "mid")
        return left.join(right, on="mid").select("start", "end")
    if path.op == "alt":
        return eval_pairs(compiler, path.parts[0]).unionByName(
            eval_pairs(compiler, path.parts[1])
        )
    if path.op == "nps":
        # Negated property set (spec §18.4): forward triples whose
        # predicate is not in the forward set, unioned with reversed
        # triples whose predicate is not in the inverse set.  Each branch
        # is one predicate NOT-IN filter over the triple scan.
        fwd, inv = path.parts
        t = compiler.triples
        outs = []
        if fwd or not inv:  # `!()` matches every forward triple
            tf = t.filter(~F.col("p").isin([str(i) for i in fwd])) if fwd else t
            outs.append(tf.select(
                make_term(F.col("s_kind"), F.col("s")).alias("start"),
                make_term(F.col("o_kind"), F.col("o"), F.col("o_dt"),
                          F.col("o_lang")).alias("end")))
        if inv:
            ti = t.filter(~F.col("p").isin([str(i) for i in inv]))
            outs.append(ti.select(
                make_term(F.col("o_kind"), F.col("o"), F.col("o_dt"),
                          F.col("o_lang")).alias("start"),
                make_term(F.col("s_kind"), F.col("s")).alias("end")))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out
    if path.op in ("star", "plus", "opt"):
        # A closure NESTED inside a composite path (:p/:q*, (^:p)+/..,
        # (:p*|:q)): evaluate the inner relation and close it with the
        # shared semi-naive machinery.  Zero-length arms (star/opt)
        # match every term in the graph per spec §18.4 ZeroOrMorePath —
        # the same domain the top-level unanchored evaluation uses.
        # This is deliberately the FULL closure: nesting denies the
        # anchored-BFS/SIP fast paths their anchor, and a full closure
        # joined into the rest of the sequence is the general answer
        # (the documented last-resort cost, same as unanchored p*).
        inner = eval_pairs(compiler, path.parts[0])
        if path.op == "opt":
            closed = inner
        elif path.op == "plus":
            return transitive_closure(inner)
        else:
            closed = transitive_closure(inner)
        zero = all_nodes(compiler).select(
            F.col("node").alias("start"), F.col("node").alias("end"))
        return closed.unionByName(zero).distinct()
    raise QueryExecutionError(f"unsupported path op {path.op}")


def all_nodes(compiler) -> DataFrame:
    """Every term occurring in the graph (zero-length path domain)."""
    t = compiler.triples
    subs = t.select(make_term(F.col("s_kind"), F.col("s")).alias("node"))
    objs = t.select(
        make_term(F.col("o_kind"), F.col("o"), F.col("o_dt"), F.col("o_lang")).alias("node")
    )
    return subs.unionByName(objs).distinct()


def _retire(df: DataFrame | None) -> None:
    """Release the pinned blocks of a SUPERSEDED ``localCheckpoint`` frame.

    Every BFS level checkpoints a new generation; without this, a deep
    closure pins O(depth) copies of seen/frontier in the block manager
    and a long session accumulates them until executors GC-thrash (the
    leak reproduces on a 200k-node depth-17 tree).  The frame must be
    provably dead: a released checkpoint is unrecoverable (lineage was
    truncated).  Best-effort via the LogicalRDD handle — if the internal
    accessor ever changes, closures degrade to the old pinned-forever
    behavior rather than failing."""
    if df is None:
        return
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


#: Run the semi-naive closure loops on 64-bit term ids instead of term
#: structs (round 10).  Every BFS level is a shuffle join + a subtract;
#: with raw terms those shuffles move ~60-120-byte (kind, lex, dt, lang)
#: structs PER ITERATION — at 100 TB the iterated string-key shuffles
#: dominate closure cost.  Id mode hashes each endpoint once up front
#: (operators/dictionary.term_id — xxhash64, join-free, deterministic),
#: runs the whole fixpoint on 8-byte longs (≈3.4× less raw shuffle
#: measured, single-long join hashing), and decodes the final pairs with
#: two id→term joins against a decode map built from the step relation.
#: Same trust model as the compiler's ``use_ids`` join mode: id equality
#: ⇔ term equality modulo the documented 2⁻⁶⁵-per-pair xxhash64 odds.
#: Toggle exists for A/B measurement (scripts/shuffle_bytes.py rows in
#: PERF.md), not as a correctness hedge.
CLOSURE_IDS = True

#: Cost-based representation choice: encoding pays two fixed jobs (the
#: id map + decode-map checkpoint, then the final decode joins) to
#: shrink every BFS level's shuffle.  Isolated quiet-host best-of-3 at
#: sf0.1 (PERF.md round 10) measured that fixed cost at ~1.2 s per
#: closure on graphs whose whole step relation is ~15k rows — pure
#: overhead there, while at 10⁸+ step rows the per-level savings
#: dominate by construction.  So the wrappers count the RAW step plan
#: (a scan-side aggregate, no shuffle, no materialization — the id
#: path must never pay a struct-relation shuffle, that being its whole
#: point) and encode only at or above this bar; the same decision
#: shape as AQE's size-based plan choices.  Raw rows over-count vs
#: distinct rows, which only errs toward ids on duplicate-heavy
#: relations — where id-side dedup is exactly the cheap path anyway.
#: The 100× scale probe's
#: replica graph (~1.5M step rows) exercises the id path; the sf0.01
#: driver gates exercise the struct path, and the ``*_ids`` gates force
#: the id path via ``CLOSURE_IDS_MIN_STEP = 0`` so BOTH representations
#: stay oracle-green every round.
CLOSURE_IDS_MIN_STEP = 1_000_000


def _sid(struct_col):
    """Term-struct column → 64-bit content-hash id (shared ``term_id``)."""
    from sparkdon.operators.dictionary import term_id

    return term_id(struct_col["kind"], struct_col["lex"],
                   struct_col["dt"], struct_col["lang"])


def _encode_step(step: DataFrame, extra_nodes: DataFrame | None = None
                 ) -> tuple[DataFrame, DataFrame]:
    """Encode a (start, end) struct relation to long ids.

    Returns ``(encoded_step, decode_map)`` where the decode map is the
    distinct (id, term) pairs over every node of the step relation (plus
    ``extra_nodes`` — anchors may have no edges yet still appear in the
    zero-length output).  The map is checkpointed once; the closure
    result references it lazily, so it stays pinned exactly as long as
    the returned closure frame itself."""
    nodes = (step.select(F.col("start").alias("node"))
             .unionByName(step.select(F.col("end").alias("node"))))
    if extra_nodes is not None:
        nodes = nodes.unionByName(extra_nodes.select("node"))
    dec = (nodes.distinct()
           .select(_sid(F.col("node")).alias("__nid"), F.col("node"))
           .localCheckpoint(eager=True))
    enc = step.select(_sid(F.col("start")).alias("start"),
                      _sid(F.col("end")).alias("end"))
    return enc, dec


def _decode_pairs(ids: DataFrame, dec: DataFrame, *cols: str) -> DataFrame:
    """Join id columns back to term structs (inner — every id in the
    closure originates from the decode map's node set)."""
    out = ids
    for c in cols:
        d = dec.select(F.col("__nid").alias(c),
                       F.col("node").alias("__dec_" + c))
        out = out.join(d, on=c, how="inner")
    return out.select(*[F.col("__dec_" + c).alias(c) for c in cols])


def transitive_closure(step: DataFrame) -> DataFrame:
    """Full semi-naive transitive closure of a (start, end) relation.

    Representation is chosen by measured size (see
    :data:`CLOSURE_IDS_MIN_STEP`): big step relations iterate on 8-byte
    term ids and decode at the edge; small ones skip the fixed
    encode/decode cost.  The decision counts the RAW step plan — a
    scan-side aggregate with no shuffle — so the id path never
    materializes the struct relation at all: its distinct runs on the
    16-byte encoded rows (the whole point of the mode), and the struct
    path keeps its original distinct+checkpoint.  The loop body is
    representation-agnostic."""
    if CLOSURE_IDS and step.count() >= CLOSURE_IDS_MIN_STEP:
        enc, dec = _encode_step(step)
        enc = enc.distinct().localCheckpoint(eager=True)
        closed = _closure_loop(enc)
        return _decode_pairs(closed, dec, "start", "end")
    return _closure_loop(step.distinct().localCheckpoint(eager=True))


def _closure_loop(step: DataFrame) -> DataFrame:
    """The semi-naive loop (column-type-agnostic: structs or longs;
    ``step`` must arrive distinct + checkpointed).

    The step relation is materialized once up front: every iteration
    joins AND subtracts against it, and without the checkpoint each
    iteration would re-execute the step's whole upstream plan (for the
    rdf-ized gate graphs, a 14-branch union scan).  Superseded
    generations are retired as soon as the next one materializes, so
    pinned storage stays O(|closure|), not O(depth · |closure|)."""
    seen = step
    delta = seen
    for _ in range(MAX_ITERATIONS):
        new = (
            delta.withColumnRenamed("end", "mid")
            .join(step.withColumnRenamed("start", "mid"), on="mid")
            .select("start", "end")
            .distinct()
        )
        old_delta = delta
        delta = new.subtract(seen).localCheckpoint(eager=True)
        if old_delta is not seen and old_delta is not step:
            _retire(old_delta)
        if delta.isEmpty():
            _retire(delta)
            if seen is not step:
                _retire(step)
            return seen
        old_seen = seen
        seen = seen.unionByName(delta).localCheckpoint(eager=True)
        if old_seen is not step:
            _retire(old_seen)
    raise QueryExecutionError("path closure did not converge")


def anchored_closure(spark, step: DataFrame, anchors: DataFrame,
                     forward: bool, include_zero: bool) -> DataFrame:
    """BFS closure from a set of anchor nodes, with per-anchor provenance.

    With the id representation (chosen by measured step size, see
    :data:`CLOSURE_IDS_MIN_STEP`) the BFS frontier carries (anchor_id,
    node_id) long pairs — 16 bytes per row through every per-level
    shuffle — and the final (anchor, node) pairs decode via two id→term
    joins.  The loop body (:func:`_anchored_loop`) is
    representation-agnostic."""
    if CLOSURE_IDS and step.count() >= CLOSURE_IDS_MIN_STEP:
        enc_step, dec = _encode_step(step, extra_nodes=anchors)
        enc_step = enc_step.localCheckpoint(eager=True)
        enc_anchors = anchors.select(_sid(F.col("node")).alias("node"))
        pairs = _anchored_loop(spark, enc_step, enc_anchors, forward,
                               include_zero)
        return _decode_pairs(pairs, dec, "anchor", "node")
    return _anchored_loop(spark, step.localCheckpoint(eager=True), anchors,
                          forward, include_zero)


def _anchored_loop(spark, step: DataFrame, anchors: DataFrame,
                   forward: bool, include_zero: bool) -> DataFrame:
    """The anchored-BFS loop (column-type-agnostic: structs or longs;
    ``step`` must arrive checkpointed).

    anchors: one-column DF ``node``.  Returns (anchor, node) pairs where
    ``node`` is reachable from ``anchor`` along ≥1 steps (≥0 with
    ``include_zero``).  The frontier carries the anchor column and
    ``seen`` is keyed on the (anchor, node) PAIR, so a whole anchor set
    (VALUES-driven or SIP-harvested) BFSes in one sequence of distributed
    joins — overlapping cones don't truncate each other, and each level
    is still one shuffle join regardless of anchor count.  The working
    set is the union of the anchors' reachable cones, never the full
    transitive closure.

    Distance-≥1 pairs are ``seen − base`` plus the anchors a cycle leads
    back to: the per-level ``nxt ∩ base`` side-accumulator (a ≤|anchors|
    frame, checkpointed eagerly) replaces the old lazy ``reached`` union
    chain, whose plan referenced EVERY frontier generation and therefore
    kept all of them pinned.  Superseded generations retire per level."""
    step_ckpt = step  # the caller's checkpointed frame — retired at exit
    if not forward:
        # lazy swap over the pinned blocks; no second materialization
        step = step.select(F.col("end").alias("start"), F.col("start").alias("end"))
    base = anchors.select(F.col("node").alias("anchor"), F.col("node")).distinct() \
        .localCheckpoint(eager=True)
    seen = base
    frontier = base
    cycles: DataFrame | None = None  # (anchor, anchor) pairs re-reached at ≥1
    for _ in range(MAX_ITERATIONS):
        nxt = (
            frontier.join(step, frontier["node"] == step["start"])
            .select(frontier["anchor"], step["end"].alias("node"))
            .distinct()
        )
        if not include_zero:
            # star results take (a, a) from base anyway — only plus needs
            # to know a cycle re-reached an anchor
            cyc = (nxt.join(base, ["anchor", "node"], "left_semi")
                   if cycles is None else
                   cycles.unionByName(
                       nxt.join(base, ["anchor", "node"], "left_semi"))
                   .distinct())
            old_cycles = cycles
            cycles = cyc.localCheckpoint(eager=True)
            _retire(old_cycles)
        old_frontier = frontier
        frontier = nxt.subtract(seen).localCheckpoint(eager=True)
        if old_frontier is not base and old_frontier is not seen:
            _retire(old_frontier)
        if frontier.isEmpty():
            _retire(frontier)
            break
        old_seen = seen
        seen = seen.unionByName(frontier).localCheckpoint(eager=True)
        if old_seen is not base:
            _retire(old_seen)
    else:
        raise QueryExecutionError("path closure did not converge")
    _retire(step_ckpt)
    if include_zero:
        if seen is not base:
            _retire(base)
        return seen  # (anchor, anchor) zero-length pairs + everything reached
    reached = seen.subtract(base)
    if cycles is not None:
        reached = reached.unionByName(cycles).distinct()
    result = reached.localCheckpoint(eager=True)
    if seen is not base:
        _retire(seen)
    _retire(base)
    _retire(cycles)
    return result


def eval_path(compiler, path, start_const, end_const,
              start_anchors=None, end_anchors=None) -> DataFrame:
    """Full path evaluation → (start, end) term-struct pairs.

    Closure paths dispatch on anchoring; everything else is joins/unions
    over the step relation.  ``start_anchors``/``end_anchors`` optionally
    carry a VALUES-derived anchor TERM LIST for a var endpoint — the
    closure then BFSes the anchors' cones (with per-anchor provenance)
    instead of computing the full transitive closure.
    """
    spark = compiler.spark
    if isinstance(path, Path) and path.op in ("star", "plus", "opt"):
        inner = path.parts[0]
        step = eval_pairs(compiler, inner)
        include_zero = path.op in ("star", "opt")
        if path.op == "opt":
            zero = all_nodes(compiler).select(
                F.col("node").alias("start"), F.col("node").alias("end"))
            return step.unionByName(zero).distinct()
        # anchors arrive as a term LIST (constants / VALUES) or as a
        # one-column ``node`` DATAFRAME (sideways information passing: the
        # already-joined group prefix supplies the bound endpoint values
        # without any driver-side collect)
        fwd = bwd = None
        if start_const is not None:
            fwd = [start_const]
        elif start_anchors is not None:
            fwd = start_anchors
        if fwd is None:
            if end_const is not None:
                bwd = [end_const]
            elif end_anchors is not None:
                bwd = end_anchors
        if fwd is not None or bwd is not None:
            forward = fwd is not None
            src = fwd if forward else bwd
            anchors = (src if isinstance(src, DataFrame)
                       else spark.createDataFrame(
                           [(_const_struct_row(t),) for t in src],
                           f"node {TERM_STRUCT_DDL}"))
            pairs = anchored_closure(spark, step, anchors, forward, include_zero)
            if forward:
                return pairs.select(F.col("anchor").alias("start"),
                                    F.col("node").alias("end"))
            return pairs.select(F.col("node").alias("start"),
                                F.col("anchor").alias("end"))
        closure = transitive_closure(step)
        if include_zero:
            zero = all_nodes(compiler).select(
                F.col("node").alias("start"), F.col("node").alias("end"))
            closure = closure.unionByName(zero).distinct()
        return closure
    return eval_pairs(compiler, path)


def fixpoint_union(store: DataFrame, produce_new, max_iterations: int = MAX_ITERATIONS
                   ) -> DataFrame:
    """Forward-chaining rule closure (G7): repeatedly apply
    ``produce_new(store) -> new_triples_df`` and union until no new triples.

    Used by the session layer for INSERT-WHERE rules run to fixpoint
    (Inference_Over_RDF_Containers#cell17,26,33)."""
    current = store.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        new = produce_new(current).subtract(current).localCheckpoint(eager=True)
        if new.isEmpty():
            _retire(new)
            return current
        old = current
        current = current.unionByName(new).localCheckpoint(eager=True)
        _retire(old)
        _retire(new)
    raise QueryExecutionError("rule fixpoint did not converge")
