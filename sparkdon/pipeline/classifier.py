"""Hashed bag-of-n-gram linear quality classifier — the fastText-style
learned page filter (beyond reference parity, LLM-pipeline tier).

Public pattern: Joulin et al. 2016 ("Bag of Tricks for Efficient Text
Classification") plus the CCNet / GPT-3 / LLaMA curation recipe — train
a linear classifier over hashed word-n-gram features to discriminate
reference text (Wikipedia/books) from raw crawl, then keep crawl pages
scoring above a threshold.  This complements the two neighbours it
composes with: :func:`sparkdon.pipeline.text.quality_lr_train` (a
4-feature dense LR over hand heuristics) and DSIR
(:func:`sparkdon.pipeline.sampling.dsir_weights`, a *generative*
importance weight) — this one is the *discriminative* sparse model the
public pipelines actually deploy at crawl scale.

Spark-first shapes (the 100 TB story):

- **Features are one narrow JVM projection** — tokens → flattened
  {1..n}-grams → ``pmod(xxhash64(gram), buckets)`` — no vocabulary, no
  fit step, no Python, corpus-size-independent width.
- **Scoring is zero-shuffle.** The trained weight vector (``buckets``
  doubles, ~64 KB at the default 8192) travels as ONE array literal in
  the plan; per-doc score is ``bias + mean(w[bucket])`` via
  ``aggregate(transform(...))`` — whole-stage-codegen per-row work,
  no Exchange, no broadcast table, safe inside a streaming micro-batch.
- **Training is batch gradient descent with ONE bounded job per
  iteration** over a persisted feature frame: a sentinel bucket (−1)
  appended to every document's feature bag carries the bias-gradient
  and loss terms through the same explode → per-bucket partial agg
  that computes the weight gradient — one map-side-combined shuffle
  whose fan-in is ``buckets + 1``, never corpus size; ≤ ``buckets + 1``
  rows collected.  Driver state is the D-vector — no feature matrix,
  no per-doc state ever leaves the executors.
- **Deterministic.** Fixed zero init, fixed step, gradient/loss sums
  reduced through DECIMAL(28,12) so partition order cannot flip the
  trajectory (same discipline as ``quality_lr_train``); xxhash64 is
  seed-fixed, so a model trained today scores identically tomorrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "hashed_doc_features",
    "fasttext_train",
    "fasttext_score",
    "fasttext_filter",
    "fasttext_pr_table",
    "save_fasttext",
    "load_fasttext",
]

#: gradient/loss accumulator type — high-precision decimal so the fold
#: is exact and partition-order independent (float sums are not)
_DEC = "decimal(28,12)"


def hashed_doc_features(docs: DataFrame, buckets: int = 8192,
                        ngram: int = 2,
                        text_col: str = "text",
                        char_ngrams: tuple | None = None,
                        hash: str = "xxhash64") -> DataFrame:
    """Append ``_feats: array<int>`` — one hashed bucket per {1..ngram}-
    gram occurrence (a bag: duplicates kept, the count IS the feature
    value after the mean normalization in scoring).

    ``char_ngrams=(minn, maxn)`` additionally hashes character n-grams
    WITHIN each word (fastText's ``-minn/-maxn``, prefixed ``c#`` to
    separate them from word grams — a literal token that itself starts
    with ``c#`` can still collide, which is ordinary hash-bucket noise,
    not a correctness issue) — the sub-word features that keep the
    classifier robust to typos and inflection on noisy crawl text: a
    misspelled held-out word still shares most of its character grams
    with the training form.  Still one narrow JVM projection — nested
    ``transform`` over the token array, no Python.

    Null text gets an EMPTY bag (scores the bias, like an empty doc) —
    without the coalesce a null would propagate to a null score that
    ``fasttext_filter`` drops with no signal and the gradient sums skip
    silently.  ``_toks``/``_feats`` are reserved intermediates; a frame
    already carrying them fails loudly instead of being clobbered.

    Tokens materialize in their own projection before the gram lambdas
    slice them — the gopher_repetition lesson: an inline ``split`` gets
    re-inlined per gram position and turns tokenization quadratic.
    Catalyst keeps the two projections apart because ``_toks`` is
    referenced once per gram order.

    ``hash`` picks the bucket hash: ``"xxhash64"`` (default — fastest,
    JVM-native) or ``"md5"`` (first 8 hex digits as an unsigned 32-bit
    int — engine-portable, the same construction the simhash DuckDB
    oracle replicates; use for cross-engine-verified models).  The
    choice rides in the trained model dict, so scoring always hashes
    the way training did."""
    from .text import nonempty_tokens, word_ngrams

    if hash not in ("xxhash64", "md5"):
        raise ValueError(f"hash must be 'xxhash64' or 'md5', got {hash!r}")

    for c in ("_toks", "_feats"):
        if c in docs.columns:
            raise ValueError(
                f"hashed_doc_features: column {c!r} is reserved")
    toked = docs.withColumn(
        "_toks",
        F.coalesce(nonempty_tokens(F.col(text_col)),
                   F.array().cast("array<string>")))
    parts = [word_ngrams(F.col("_toks"), n) for n in range(1, ngram + 1)]
    if char_ngrams:
        if (len(char_ngrams) != 2
                or not all(isinstance(n, int) and not isinstance(n, bool)
                           for n in char_ngrams)
                or not 1 <= char_ngrams[0] <= char_ngrams[1]):
            raise ValueError(f"char_ngrams must be an int pair "
                             f"(minn, maxn) with 1 <= minn <= maxn, "
                             f"got {char_ngrams!r}")
        minn, maxn = char_ngrams
        def _grams_of(n):
            # closure factory, NOT `lambda w, n=n`: pyspark treats a
            # two-parameter lambda as (element, index) and would bind
            # the array INDEX to n
            def g(w):
                # substrings of length n, guarded like word_ngrams
                # (sequence(1, 0) DESCENDS; ANSI slice start)
                return F.when(
                    F.length(w) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.length(w) - (n - 1)),
                        lambda i: F.concat(F.lit("c#"),
                                           w.substr(i, F.lit(n))))
                ).otherwise(F.array().cast("array<string>"))
            return g

        for n in range(minn, maxn + 1):
            parts.append(F.flatten(F.transform(F.col("_toks"),
                                               _grams_of(n))))
    grams = F.flatten(F.array(*parts))
    if hash == "md5":
        def _bucket(g):
            return F.pmod(F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
                          .cast("long"), F.lit(buckets)).cast("int")
    else:
        def _bucket(g):
            return F.pmod(F.xxhash64(g), F.lit(buckets)).cast("int")
    return toked.withColumn(
        "_feats", F.transform(grams, _bucket)).drop("_toks")


def _score_expr(w: list, bias: float) -> F.Column:
    """``bias + mean(w[f] for f in _feats)`` as one narrow expression.
    The weight vector enters as a parsed ``array(...)`` SQL string that
    constant-folds to a SINGLE array literal — NOT ``F.lit(list)``,
    whose per-element py4j conversion measured 4.0 s at 8192 buckets
    (it was the whole training-iteration overhead; the string parse is
    0.3 s).  An empty document scores the bias alone (mean guard, not
    ANSI x/0); a non-finite weight (diverged run) fails loudly here
    rather than producing an unparseable plan."""
    import math

    if not all(map(math.isfinite, w)) or not math.isfinite(bias):
        raise ValueError("non-finite model weights (diverged training? "
                         "lower lr)")
    wlit = F.expr(
        "array(" + ",".join(f"{float(x)!r}D" for x in w) + ")")
    total = F.aggregate(
        F.transform("_feats", lambda f: F.element_at(wlit, f + 1)),
        F.lit(0.0), lambda a, x: a + x)
    n = F.greatest(F.size("_feats"), F.lit(1))
    return F.lit(float(bias)) + total / n


def fasttext_train(docs: DataFrame, label_col: str = "y",
                   buckets: int = 8192, ngram: int = 2,
                   iters: int = 30, lr: float = 2.0, l2: float = 0.0,
                   text_col: str = "text",
                   char_ngrams: tuple | None = None,
                   hash: str = "xxhash64") -> dict:
    """Train the hashed-n-gram logistic model; returns the model dict
    ``{w, bias, losses, buckets, ngram, text_col, char_ngrams, hash}``
    consumed by :func:`fasttext_score` / :func:`fasttext_filter` —
    every featurization knob rides in the dict, so a persisted model
    always scores with the features it trained on.

    ``label_col`` is a 0/1 double on ``docs`` (1 = keep-quality — e.g.
    reference corpus rows unioned over raw-crawl rows).  Per iteration
    ONE job: every document's bag gets a sentinel bucket −1 appended,
    so the single explode → per-bucket partial agg carries the weight
    gradient (real buckets, ``err/n`` terms), the bias gradient and the
    loss (sentinel rows, ``err``/``loss`` terms) together — halving the
    per-iteration job count, which at small scale IS the wall-clock.
    The feature frame is persisted once — training never re-tokenizes."""
    from ._registry import binary_logloss, sigmoid

    feat = (hashed_doc_features(docs, buckets, ngram, text_col,
                                char_ngrams, hash=hash)
            .select(F.col(label_col).cast("double").alias("_y"),
                    "_feats")
            .persist())
    try:
        n_docs = feat.count()
        if n_docs == 0:
            raise ValueError("fasttext_train: empty training frame")
        w = [0.0] * buckets
        bias = 0.0
        losses: list[float] = []
        for _ in range(iters):
            p = sigmoid(_score_expr(w, bias))
            scored = feat.select(
                "_feats",
                (p - F.col("_y")).alias("_err"),
                F.greatest(F.size("_feats"), F.lit(1)).alias("_n"),
                binary_logloss(p, F.col("_y")).alias("_loss"))
            rows = (scored
                    .select("_err", "_n", "_loss",
                            F.explode(F.concat(
                                "_feats",
                                F.array(F.lit(-1).cast("int"))))
                            .alias("_b"))
                    .groupBy("_b")
                    .agg(F.sum(F.when(F.col("_b") == -1, F.col("_err"))
                               .otherwise(F.col("_err") / F.col("_n"))
                               .cast(_DEC)).alias("g"),
                         F.sum(F.when(F.col("_b") == -1, F.col("_loss"))
                               .otherwise(F.lit(0.0))
                               .cast(_DEC)).alias("loss"))
                    .collect())
            g = {r["_b"]: float(r["g"]) for r in rows}
            loss = sum(float(r["loss"]) for r in rows if r["_b"] == -1)
            w = [wi - lr * (g.get(i, 0.0) / n_docs + l2 * wi)
                 for i, wi in enumerate(w)]
            bias -= lr * g.get(-1, 0.0) / n_docs
            losses.append(loss / n_docs)
        return {"w": w, "bias": bias, "losses": losses,
                "buckets": buckets, "ngram": ngram,
                "text_col": text_col,
                "char_ngrams": list(char_ngrams) if char_ngrams
                else None,
                "hash": hash}
    finally:
        feat.unpersist()


def fasttext_score(docs: DataFrame, model: dict,
                   out_col: str = "quality_p") -> DataFrame:
    """Append ``out_col`` = P(quality) per document — one narrow
    zero-shuffle projection (weights ride as an array literal), so it
    drops into batch scans and streaming micro-batches alike.  A frame
    already carrying ``out_col`` fails loudly rather than being
    silently overwritten."""
    from ._registry import sigmoid

    if out_col in docs.columns:
        raise ValueError(
            f"fasttext_score: column {out_col!r} already exists — "
            "pass a different out_col")
    cn = model.get("char_ngrams")
    feat = hashed_doc_features(
        docs, model["buckets"], model["ngram"],
        model.get("text_col", "text"),
        tuple(cn) if cn else None,
        hash=model.get("hash", "xxhash64"))
    p = sigmoid(_score_expr(model["w"], model["bias"]))
    return feat.withColumn(out_col, p).drop("_feats")


def fasttext_filter(docs: DataFrame, model: dict,
                    threshold: float = 0.5) -> DataFrame:
    """Keep documents scoring ≥ ``threshold`` — the deployed shape of
    the quality filter (CCNet keeps the top slice; tune the threshold
    against a held-out labeled sample).  The score rides in a reserved
    intermediate, so a caller's own ``quality_p`` column passes through
    untouched."""
    tmp = "_ft_score"
    if tmp in docs.columns:
        raise ValueError(f"fasttext_filter: column {tmp!r} is reserved")
    return (fasttext_score(docs, model, out_col=tmp)
            .filter(F.col(tmp) >= threshold)
            .drop(tmp))


def fasttext_pr_table(docs: DataFrame, model: dict,
                      label_col: str = "y",
                      thresholds: tuple = tuple(
                          i / 10 for i in range(1, 10))) -> DataFrame:
    """Threshold calibration against a held-out LABELED sample:
    (threshold, keep_frac, precision, recall) per candidate threshold —
    the table a curator reads to pick ``fasttext_filter``'s cut
    (CCNet-style: choose by target keep-rate, sanity-check precision).

    ONE job regardless of threshold count: each threshold contributes
    three conditional-count aggregates to a single narrow pass over the
    scored frame (no explode, no shuffle beyond the partial agg);
    empty-sample and zero-denominator cells are null, not an ANSI
    divide error.  A null LABEL fails the job loudly — a sum would
    silently skip it while the kept-count still included it, skewing
    precision with no signal."""
    for c in ("_y", "_p"):
        if c in docs.columns:
            raise ValueError(f"fasttext_pr_table: column {c!r} is "
                             "reserved")
    y = F.col(label_col).cast("double")
    y = F.when(y.isNotNull(), y).otherwise(F.raise_error(F.lit(
        f"fasttext_pr_table: null label in {label_col!r} — a held-out "
        "calibration sample must be fully labeled")))
    scored = fasttext_score(docs.select(y.alias("_y"), "*"), model,
                            out_col="_p")
    aggs = [F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("pos")]
    for i, t in enumerate(thresholds):
        kept = F.col("_p") >= float(t)
        aggs += [
            F.sum(kept.cast("long")).alias(f"k{i}"),
            F.sum((kept & (F.col("_y") == 1.0)).cast("long"))
            .alias(f"tp{i}")]
    r = scored.agg(*aggs).collect()[0]
    n, pos = r["n"], float(r["pos"] or 0.0)
    rows = []
    for i, t in enumerate(thresholds):
        k, tp = r[f"k{i}"] or 0, float(r[f"tp{i}"] or 0.0)
        rows.append((float(t),
                     k / n if n else None,
                     tp / k if k else None,
                     tp / pos if pos else None))
    return docs.sparkSession.createDataFrame(
        rows, "threshold double, keep_frac double, "
              "precision double, recall double")


def save_fasttext(model: dict, path: str) -> None:
    """Persist the trained model (a dict of driver-side floats — the
    tokenizer-artifact scale, ~64 KB) as one JSON file; the losses ride
    along for audit.  The write is ATOMIC (temp file + ``os.replace``
    in the target directory): re-saving over a good model must never
    leave a truncated artifact if the process dies mid-dump."""
    import json
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(model, fh)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def load_fasttext(path: str) -> dict:
    """Load a :func:`save_fasttext` model; scores are bit-identical to
    the in-memory original (weights are exact JSON doubles)."""
    import json

    with open(path) as fh:
        return json.load(fh)
