"""Training-example assembly: distributed prefix-sum sequence packing,
corpus keep/pack capstones, shard writer.

Split out of the former monolithic ``sparkdon/pipeline.py`` (round 9);
every gate registers into the shared :mod:`sparkdon.pipeline` registry,
so ``pipeline.QUERIES`` / ``pipeline.ORACLE`` and every public name are
unchanged for callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._registry import register, table
from .clusters import _doc_components
from .dedup import _DUCK_BANDS
from .text import (_BIGRAMS_EXPR, _DUCK_BIGRAMS, _duck_rep_bad,
                   _rep_bad_spark)


PACK_SEQ_LEN = 512


def _prefix_pack(spark, d: DataFrame,
                 extra_order: tuple[str, ...] = (),
                 wide_ids: bool = False,
                 unit_span: bool = True) -> DataFrame:
    """Two-pass distributed prefix sum over (doc_id, n_tok): adds
    ``start_tok`` — each row's global token offset in doc_id order.
    Pass 1 buckets rows into contiguous doc_id ranges and takes
    per-bucket totals; pass 2 turns those into running bucket offsets
    (a window over #buckets rows — driver-scale) and adds the
    within-bucket cumulative sum.  The result is identical to the naive
    single-partition ``SUM() OVER (ORDER BY doc_id)`` but never
    collapses the data to one partition.

    The bucket is ARITHMETIC — equal-width id ranges from one (min,
    max) aggregate — not ``repartitionByRange`` + ``spark_partition_id``:
    the range partitioner's boundaries come from nondeterministic
    sampling, and this frame is consumed by TWO branches (totals and
    windowed cumsum), so correctness there would silently hinge on
    physical Exchange reuse giving both branches the same boundaries.
    An expression-derived bucket is the same value in every branch by
    construction.  Sparse/clustered ids only skew bucket SIZES (a
    performance matter); contiguity, which correctness needs, always
    holds.  The (min, max) pair rides along as a broadcast one-row
    frame, so the whole builder stays lazy — no driver action until the
    caller runs the plan."""
    p = spark.sparkContext.defaultParallelism
    mm = d.agg(F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"))
    if wide_ids:
        # ids spanning the full int64 range (xxhash64 order keys from
        # pack_and_shard) overflow both the (hi - lo) span and the *p
        # product under ANSI mode, so the width arithmetic runs in
        # DOUBLE.  Double conversion of int64 is monotone, so the
        # equal-width-ish buckets stay CONTIGUOUS (the correctness
        # requirement); rounding only skews bucket sizes, like sparse
        # ids already could.  The gated entries keep the exact integer
        # form below — their plans are driver-verified as-is.
        lo = F.col("_lo").cast("double")
        if unit_span:
            span = F.col("_hi").cast("double") - lo + 1.0
            bucket = F.least(
                F.lit(p - 1),
                F.floor((F.col("doc_id").cast("double") - lo) * p / span)
            ).cast("int")
        else:
            # fractional keys (curriculum scores in [0,1]): the +1.0
            # above is unit-ID spacing and would collapse a [0,1] span
            # to half the buckets (a [0.85,0.99] band to ~1/8) — use
            # the ACTUAL span; x == hi folds into the last bucket via
            # least, and a constant key (span 0 → NaN → null bucket)
            # degrades to one bucket, coalesced to 0 (no curriculum
            # signal to preserve; pack without order_col instead)
            span = F.col("_hi").cast("double") - lo
            # ANSI raises on double x/0 too, so the constant-key case
            # (span 0) must branch, not coalesce a NaN
            bucket = F.when(
                span > 0.0,
                F.least(
                    F.lit(p - 1),
                    F.floor((F.col("doc_id").cast("double") - lo)
                            * p / span)).cast("int")
            ).otherwise(F.lit(0))
    else:
        bucket = F.least(
            F.lit(p - 1),
            F.floor((F.col("doc_id") - F.col("_lo")) * p
                    / (F.col("_hi") - F.col("_lo") + 1))
        ).cast("int")
    dd = (d.crossJoin(F.broadcast(mm))
          .withColumn("b", bucket).drop("_lo", "_hi"))
    per = dd.groupBy("b").agg(F.sum("n_tok").alias("bs"))
    wo = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    offs = per.select(
        "b", F.coalesce(F.sum("bs").over(wo), F.lit(0)).alias("boff"))
    # extra_order breaks ties when doc_id is a derived (hashable-
    # collision) order key — see pack_and_shard's string-id path
    wl = Window.partitionBy("b").orderBy("doc_id", *extra_order) \
        .rowsBetween(Window.unboundedPreceding, -1)
    return (
        dd.withColumn("local", F.coalesce(F.sum("n_tok").over(wl), F.lit(0)))
        .join(F.broadcast(offs), "b")
        .withColumn("start_tok", F.col("local") + F.col("boff"))
        .drop("b", "local", "boff")
    )


#: shared CTE chain for the corpus capstones: LSH bands → pair graph →
#: recursive-CTE connected components → per-doc features (bigrams,
#: token count).  ``x_corpus_keep`` selects the gate bits from it;
#: ``x_corpus_pack`` extends the chain with the kept-doc prefix sum.
_CORPUS_KEEP_CTES = (
    "WITH RECURSIVE "
    + _DUCK_BANDS[len("WITH "):] +
    ", pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a "
    "  JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id), "
    "edges AS (SELECT d1 AS a, d2 AS b FROM pairs "
    "  UNION SELECT d2, d1 FROM pairs), "
    "reach(node, lab) AS ("
    "  SELECT doc_id, doc_id FROM documents "
    "  UNION "
    "  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b), "
    "comp AS (SELECT node AS doc_id, MIN(lab) AS rep FROM reach GROUP BY node), "
    "feat AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    f"grams AS (SELECT doc_id, {_DUCK_BIGRAMS} AS g, len(t) AS n_tok "
    " FROM feat) "
)


@register(
    "x_corpus_keep",
    # composition of the cluster / repetition / length gates into the
    # final per-document keep decision a cleaning pipeline emits
    _CORPUS_KEEP_CTES +
    "SELECT c.doc_id, "
    "CASE WHEN c.doc_id = c.rep THEN 1 ELSE 0 END AS uniq_ok, "
    f"CASE WHEN {_duck_rep_bad('g')} THEN 0 ELSE 1 END AS rep_ok, "
    "CASE WHEN n_tok BETWEEN 20 AND 2000 THEN 1 ELSE 0 END AS len_ok, "
    "CASE WHEN c.doc_id = c.rep AND n_tok BETWEEN 20 AND 2000 "
    f" AND NOT ({_duck_rep_bad('g')}) THEN 1 ELSE 0 END AS keep "
    "FROM comp c JOIN grams USING (doc_id)",
)
def x_corpus_keep(spark, sf_dir):
    """The pipeline capstone: one keep/drop decision per document,
    composing the near-dup cluster resolution (keep only component
    representatives), the repetition filter (duplicate-bigram < 30 %),
    and the length gate (20–2000 tokens) — i.e. the actual output a
    corpus-cleaning pipeline writes before training.

    100 TB shape: the per-doc feature columns are narrow maps over the
    same documents scan; the only non-trivial input is the component
    frame, whose propagation is id-only; the final assembly is one join
    keyed on doc_id (broadcast-eligible whenever the dup set is small).
    The DuckDB oracle recomputes every stage — recursive-CTE components
    included — so the composite decision is verified end-to-end, not
    just its parts.  The component frame itself is shared with
    ``x_dedup_clusters`` via the per-(session, fixture) memo — computed
    once, consumed twice, as the real pipeline would."""
    return _corpus_keep_frame(spark, sf_dir).select(
        "doc_id", "uniq_ok", "rep_ok", "len_ok", "keep")


def _corpus_keep_frame(spark, sf_dir) -> DataFrame:
    """(doc_id, n_tok, uniq_ok, rep_ok, len_ok, keep) — the capstone
    gate bits plus the token count, shared by ``x_corpus_keep`` and the
    packing capstone ``x_corpus_pack``."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    comp = _doc_components(spark, sf_dir)
    feat = docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.expr(_BIGRAMS_EXPR).alias("g"),
    )
    n, d = F.size("g"), F.size(F.array_distinct("g"))
    rep_bad = _rep_bad_spark(n, d)
    len_ok = F.col("n_tok").between(20, 2000)
    uniq_ok = F.col("node") == F.col("rep")
    return (
        comp.join(feat, comp.node == feat.doc_id)
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.when(uniq_ok, 1).otherwise(0).cast("long").alias("uniq_ok"),
            F.when(rep_bad, 0).otherwise(1).cast("long").alias("rep_ok"),
            F.when(len_ok, 1).otherwise(0).cast("long").alias("len_ok"),
            F.when(uniq_ok & len_ok & ~rep_bad, 1).otherwise(0)
            .cast("long").alias("keep"),
        )
    )


@register(
    "x_corpus_pack",
    _CORPUS_KEEP_CTES +
    ", keepq AS (SELECT c.doc_id, CAST(n_tok AS BIGINT) AS n_tok "
    " FROM comp c JOIN grams USING (doc_id) "
    " WHERE c.doc_id = c.rep AND n_tok BETWEEN 20 AND 2000 "
    f" AND NOT ({_duck_rep_bad('g')})), "
    "c2 AS (SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER ("
    " ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    " AS BIGINT) AS start_tok FROM keepq) "
    "SELECT doc_id, n_tok, start_tok, "
    f"CAST(FLOOR(start_tok / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id, "
    f"CAST(start_tok % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset "
    "FROM c2",
)
def x_corpus_pack(spark, sf_dir):
    """The full corpus-to-training-batches flow in one verified gate:
    near-dup cluster resolution + repetition + length gates decide the
    keep set (same composition as ``x_corpus_keep``), and the SURVIVORS
    are packed into fixed 512-token training sequences with the two-pass
    distributed prefix sum of ``x_pack_sequences`` — clean → select →
    pack, i.e. what a training pipeline actually writes out.  The
    DuckDB oracle recomputes everything end-to-end: recursive-CTE
    components, the gate bits, and the kept-doc cumulative sum.

    100 TB shape: the union of its parts — id-only component
    propagation, narrow feature maps, one doc_id join, then the
    prefix-sum's two bounded shuffles.  Nothing new is added on top of
    the audited stages; the gate proves they compose."""
    kept = (_corpus_keep_frame(spark, sf_dir)
            .filter(F.col("keep") == 1).select("doc_id", "n_tok"))
    n = PACK_SEQ_LEN
    packed = _prefix_pack(spark, kept)
    return packed.select(
        "doc_id", "n_tok", "start_tok",
        F.floor(F.col("start_tok") / n).cast("long").alias("seq_id"),
        (F.col("start_tok") % n).alias("seq_offset"),
    )


@register(
    "x_pack_sequences",
    "WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
    " AS n_tok FROM documents), "
    "c AS (SELECT doc_id, n_tok, CAST(COALESCE(SUM(n_tok) OVER ("
    " ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
    " AS BIGINT) AS start_tok FROM d) "
    "SELECT doc_id, n_tok, start_tok, "
    f"CAST(FLOOR(start_tok / {PACK_SEQ_LEN}) AS BIGINT) AS seq_id, "
    f"CAST(start_tok % {PACK_SEQ_LEN} AS BIGINT) AS seq_offset, "
    f"CAST(FLOOR((start_tok + n_tok - 1) / {PACK_SEQ_LEN}) AS BIGINT) AS end_seq "
    "FROM c",
)
def x_pack_sequences(spark, sf_dir):
    """Document packing — the step that turns a cleaned corpus into
    fixed-length training sequences: concatenate documents in doc_id
    order and cut every ``PACK_SEQ_LEN`` tokens.  Each document gets its
    global token offset, the sequence it starts in, its offset within
    that sequence, and the sequence it ends in (documents may span
    boundaries).  The whole assignment is one exact global prefix sum
    over token counts.

    The oracle states the semantics as the naive single-order window
    (``SUM() OVER (ORDER BY doc_id)``); the Spark plan computes the SAME
    sum as a two-pass distributed prefix sum — the shape that survives
    100 TB where a global-order window collapses to one partition:

    1. range-partition by doc_id (contiguous id ranges per partition);
    2. per-partition token totals → running bucket offsets (a window
       over #partitions rows — driver-scale, not data-scale);
    3. within-bucket cumulative sum + broadcast bucket offset.

    The result is bucket-boundary-independent, so the (sampled, hence
    unpinned) range boundaries cannot change a single output value."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    return _seq_assign(_prefix_pack(spark, d), PACK_SEQ_LEN)


def _seq_assign(packed: DataFrame, seq_len: int) -> DataFrame:
    """(doc_id, n_tok, start_tok) → the sequence-assignment columns
    (shared by the gate and :func:`pack_and_shard`, so the packing
    arithmetic has exactly one definition)."""
    return packed.select(
        "doc_id", "n_tok", "start_tok",
        F.floor(F.col("start_tok") / seq_len).cast("long").alias("seq_id"),
        (F.col("start_tok") % seq_len).alias("seq_offset"),
        F.floor((F.col("start_tok") + F.col("n_tok") - 1) / seq_len)
        .cast("long").alias("end_seq"),
    )


def _shard_write(packed: DataFrame, out_dir: str,
                 n_shards: int) -> DataFrame:
    """RANGE-partition on the computed ``seq_id`` (the one write-side
    shuffle — no global sort) and write one parquet file per shard;
    returns the re-read frame for verification."""
    (packed.repartitionByRange(n_shards, "seq_id", "doc_id")
     .write.mode("overwrite").parquet(out_dir))
    return packed.sparkSession.read.parquet(out_dir)


def pack_and_shard(docs: DataFrame, out_dir: str, n_shards: int = 8,
                   seq_len: int = PACK_SEQ_LEN,
                   text_col: str = "text",
                   n_tok_col: str | None = None,
                   order_col: str | None = None,
                   ascending: bool = True,
                   shuffle_seed: int | None = None) -> DataFrame:
    """Frame-level write side: pack ANY curated (doc_id, text) frame
    into fixed-``seq_len`` training sequences and materialize
    ``n_shards`` contiguous parquet shards — the terminal stage of a
    crawl → clean → select pipeline (where :func:`write_training_shards`
    is hardwired to the fixture-corpus gate).

    Token counts default to the shared whitespace tokenizer
    (:func:`sparkdon.pipeline.text.nonempty_tokens`): curated text is
    newline-joined (c4_clean_lines), so a split on single spaces would
    undercount every line boundary and a loader tokenizing on
    whitespace would overrun ``seq_len``.  Pass ``n_tok_col`` naming a
    precomputed count column for tokenizer-accurate packing — e.g.
    ``size(bpe_tokens)`` from
    :func:`sparkdon.pipeline.text.bpe_encode`, so sequences cut at the
    REAL token budget the trained tokenizer will produce, not the
    whitespace proxy.

    Packing order: numeric doc_ids pack in id order (the gate
    semantics); string ids (crawl URLs, UUID record ids) pack in
    deterministic ``xxhash64(doc_id)`` order — a content-stable corpus
    shuffle, the order training wants anyway — with the original id
    carried through and hash ties broken by the id itself, so the
    assignment is exact and reproducible, never sampling-dependent.
    Pass ``order_col`` (a numeric column, e.g. the classifier's
    ``quality_p``) for CURRICULUM packing — shards then stream in
    score order (``ascending=False`` for best-first), ties broken by
    doc_id so the layout stays exact and reproducible; a null score
    fails the job loudly like a bad token count.

    Pass ``shuffle_seed`` for EPOCH re-shuffling: the packing order
    becomes ``xxhash64(doc_id, seed)`` — a fresh deterministic
    permutation per seed, so each training epoch streams the corpus in
    a different (but exactly reproducible) order without any extra
    shuffle beyond the one packing already pays.  Applies to numeric
    ids too (overriding their default id order); mutually exclusive
    with ``order_col`` — a curriculum IS an order.

    Same 100 TB shape as the gate: two-pass prefix sum (never a
    single-partition window; ``wide_ids`` arithmetic, since real ids
    may span int64), then one ``repartitionByRange`` write shuffle.
    Returns the re-read frame for verification."""
    return _shard_write(
        pack_assignment(docs, seq_len=seq_len, text_col=text_col,
                        n_tok_col=n_tok_col, order_col=order_col,
                        ascending=ascending, shuffle_seed=shuffle_seed),
        out_dir, n_shards)


def pack_assignment(docs: DataFrame, seq_len: int = PACK_SEQ_LEN,
                    text_col: str = "text",
                    n_tok_col: str | None = None,
                    order_col: str | None = None,
                    ascending: bool = True,
                    shuffle_seed: int | None = None) -> DataFrame:
    """:func:`pack_and_shard`'s document → sequence assignment as a
    frame (no files): (doc_id, n_tok, start_tok, seq_id, seq_offset,
    end_seq) under the same ordering rules — doc_id order for numeric
    ids, ``xxhash64(doc_id)`` shuffle order for string ids, score order
    for ``order_col`` curriculum, ``xxhash64(doc_id, seed)`` for
    ``shuffle_seed`` epoch re-shuffles.  Split out so the assignment
    arithmetic is testable/verifiable without a write side (and so a
    caller can join it back to the corpus before materializing)."""
    from pyspark.sql.types import NumericType

    from .text import nonempty_tokens

    if order_col is not None and shuffle_seed is not None:
        raise ValueError("pack_assignment: order_col and shuffle_seed "
                         "are mutually exclusive — a curriculum IS an "
                         "order")
    if shuffle_seed is not None and (
            not isinstance(shuffle_seed, int)
            or isinstance(shuffle_seed, bool)):
        raise ValueError(f"shuffle_seed must be an int, "
                         f"got {shuffle_seed!r}")
    spark = docs.sparkSession
    if n_tok_col:
        # first externally-supplied value on the prefix-sum path: a
        # NULL count would silently drop the doc from the window sum
        # and a negative one would shift every later offset — fail the
        # job instead of writing corrupt shards
        c = F.col(n_tok_col)
        n_tok = F.when(c.isNotNull() & (c >= 0), c.cast("long")) \
            .otherwise(F.raise_error(F.concat(
                F.lit(f"pack_and_shard: {n_tok_col} must be non-null "
                      "and >= 0, got "),
                F.coalesce(c.cast("string"), F.lit("NULL")))))
    else:
        n_tok = F.size(nonempty_tokens(F.col(text_col))).cast("long")
    def pack_by_key(key, unit_span=True):
        # shared derived-key scaffolding: original ids carried through
        # with ties broken by id, so the assignment is exact
        d = docs.select(
            F.col("doc_id").alias("orig_id"),
            key.alias("doc_id"), n_tok.alias("n_tok"))
        return _prefix_pack(spark, d, extra_order=("orig_id",),
                            wide_ids=True, unit_span=unit_span) \
            .drop("doc_id").withColumnRenamed("orig_id", "doc_id")

    if order_col:
        # curriculum order: the score becomes the prefix-sum sort key
        # (negated for best-first so the bucketing arithmetic stays
        # ascending); infinities poison the bucket span exactly like
        # NaN, so all three fail loudly
        oc = F.col(order_col).cast("double")
        finite = (oc.isNotNull() & ~F.isnan(oc)
                  & (oc > float("-inf")) & (oc < float("inf")))
        oc = F.when(finite, oc).otherwise(F.raise_error(F.lit(
            f"pack_and_shard: null/NaN/inf {order_col} — curriculum "
            "order needs a finite score on every document")))
        packed = pack_by_key(oc if ascending else -oc, unit_span=False)
    elif shuffle_seed is not None:
        # epoch re-shuffle: the seed rides INSIDE the hash (a second
        # xxhash64 argument), so each seed is an independent
        # deterministic permutation — same machinery as the string-id
        # path, same ties-by-original-id exactness.  The id is cast to
        # string so numeric and string corpora shuffle through one code
        # path (and so epoch orders are stable across an id-type
        # migration).
        packed = pack_by_key(F.xxhash64(F.col("doc_id").cast("string"),
                                        F.lit(int(shuffle_seed))))
    elif isinstance(docs.schema["doc_id"].dataType, NumericType):
        packed = _prefix_pack(
            spark, docs.select("doc_id", n_tok.alias("n_tok")),
            wide_ids=True)
    else:
        packed = pack_by_key(F.xxhash64("doc_id"))
    return _seq_assign(packed, seq_len)


def write_training_shards(spark, sf_dir, out_dir: str,
                          n_shards: int = 8) -> DataFrame:
    """The pipeline's write side: materialize the packed corpus
    (``x_pack_sequences``' doc → sequence assignment) into
    ``n_shards`` parquet shards, RANGE-partitioned on ``seq_id`` so
    each shard holds a contiguous block of training sequences — the
    layout a data loader streams sequentially, resumes by (shard,
    seq_id) checkpoint, and shuffles at the shard level.  Exactly one
    file per shard (each range partition writes its own file), sizes
    balanced by the range partitioner's sampling.  Returns the
    re-read frame for verification.

    100 TB shape: ``repartitionByRange`` is the one shuffle (keyed on
    the already-computed global sequence order — no global sort);
    everything upstream is the audited two-pass prefix sum.  Shard
    count scales to taste (one per loader worker); parquet predicate
    pushdown on ``seq_id`` gives random access within a shard."""
    return _shard_write(x_pack_sequences(spark, sf_dir), out_dir, n_shards)


# ---------------------------------------------------------------------------
# stride-overlap window chunking (r15 — UNREGISTERED r17+ swap candidate)
# ---------------------------------------------------------------------------

#: long-context training-window geometry: 32-token windows advancing by
#: 24 (8-token overlap, the GPT-2-style stride that keeps every token's
#: left context ≥ overlap except at document start)
CHUNK_SEQ_LEN = 32
CHUNK_STRIDE = 24


def chunk_windows(docs: DataFrame, seq_len: int = CHUNK_SEQ_LEN,
                  stride: int = CHUNK_STRIDE) -> DataFrame:
    """Overlapping training-window chunking — the long-document prep
    pass that turns each document into ``seq_len``-token windows
    advancing by ``stride`` tokens (windows overlap by
    ``seq_len - stride``; the final window may be short; a document
    shorter than ``seq_len`` yields exactly one window).  Returns
    ``(doc_id, chunk_id, start_tok, n_tok, chunk)`` with exact token
    offsets, so a downstream tokenizer/packer can reproduce document
    positions.  Null-text documents yield no windows (chunking nothing
    is nothing — documented, and the oracle agrees, so the explode
    row-loss class the r13 battery polices cannot bite silently).

    Distinct from :func:`~sparkdon.pipeline.dedup.x_chunk_dedup`'s
    chunker, which is NON-overlapping passage dedup; this one exists
    for model-input construction, where stride < seq_len is the point.

    100 TB shape: tokenize once per row into a materialized array
    column (its alias is referenced twice — the window-count bound and
    the slice — so Catalyst cannot re-inline the split per window: the
    r12 quadratic-tokenization lesson), then ONE narrow
    explode(sequence) per document and a codegen'd ``slice`` per
    window.  No shuffle anywhere — partitioning follows the scan, and
    window count per task is bounded by the task's token count over
    ``stride``."""
    toks = (docs.filter(F.col("text").isNotNull())
            .select("doc_id", F.split("text", " ").alias("t")))
    n_windows = F.floor((F.size("t") - 1) / stride) + 1
    w = toks.select(
        "doc_id", "t",
        F.explode(F.sequence(F.lit(0),
                             (n_windows - 1).cast("int"))).alias("chunk_id"))
    start = F.col("chunk_id").cast("long") * stride
    piece = F.slice("t", (start + 1).cast("int"), seq_len)
    return w.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.alias("start_tok"),
        F.size(piece).cast("long").alias("n_tok"),
        F.concat_ws(" ", piece).alias("chunk"))


def _chunk_stride_oracle(seq_len: int = CHUNK_SEQ_LEN,
                         stride: int = CHUNK_STRIDE) -> str:
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
        " FROM documents WHERE text IS NOT NULL), "
        "w AS (SELECT doc_id, t, unnest(generate_series(0, "
        f" CAST(floor((len(t) - 1) / {stride}) AS BIGINT))) AS chunk_id "
        " FROM toks) "
        "SELECT doc_id, chunk_id, "
        f"chunk_id * {stride} AS start_tok, "
        f"CAST(len(t[chunk_id * {stride} + 1 : "
        f" chunk_id * {stride} + {seq_len}]) AS BIGINT) AS n_tok, "
        f"array_to_string(t[chunk_id * {stride} + 1 : "
        f" chunk_id * {stride} + {seq_len}], ' ') AS chunk FROM w"
    )


#: DuckDB oracle for :func:`x_chunk_stride` — module-level like
#: `_TRIM_ORACLE`/`_DECONTAM_ORACLE` so the fuzz battery and
#: seed_sweep can pair it with the unregistered gate
_CHUNK_STRIDE_ORACLE = _chunk_stride_oracle()


@register("x_chunk_stride", _CHUNK_STRIDE_ORACLE)
def x_chunk_stride(spark, sf_dir):
    """Gate-style wrapper for :func:`chunk_windows` on the documents
    table.  Built and oracle-verified in r15, REGISTERED at the r17
    cycle-boundary swap (took the battery slot of the retired
    ``x_lm_score``, whose explode → tf → vocab-agg → join-back skeleton
    ``x_lm_bigram`` and ``x_tfidf_topk`` keep in the battery).
    Dossier: byte-exact oracle compare at both gate scales,
    coverage/overlap/stitching invariants, random-corpus battery row,
    permanent seed_sweep docs-tier slot, honest noop-sink probes
    10× = 1.51 / 100× = 12.4 (zero-exchange, plan-asserted)."""
    # r17: spread_narrow_scan before chunk_windows was tried and
    # REVERTED (guide §1 measure-first): the fixture's single-partition
    # explode is already cheap, and the spread shuffles the FULL text
    # payload to buy parallelism it can't use — min-of-3 noop-sink at
    # sf0.1/local[32]: 0.383 s zero-exchange vs 0.450 s spread.  The
    # zero-Exchange shape stays plan-pinned in tests/test_chunk_stride.py.
    return chunk_windows(table(spark, sf_dir, "documents"))
