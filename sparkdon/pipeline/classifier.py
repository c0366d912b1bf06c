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
- **Training is batch gradient descent with two bounded jobs per
  iteration** over a persisted feature frame: a global partial-agg for
  loss + bias gradient (no shuffle, one row to the driver) and an
  explode → per-bucket partial agg for the weight gradient (ONE
  map-side-combined shuffle whose fan-in is ``buckets``, never corpus
  size; ≤ ``buckets`` rows collected).  Driver state is the D-vector —
  no feature matrix, no per-doc state ever leaves the executors.
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
]

#: gradient/loss accumulator type — high-precision decimal so the fold
#: is exact and partition-order independent (float sums are not)
_DEC = "decimal(28,12)"


def hashed_doc_features(docs: DataFrame, buckets: int = 8192,
                        ngram: int = 2,
                        text_col: str = "text") -> DataFrame:
    """Append ``_feats: array<int>`` — one hashed bucket per {1..ngram}-
    gram occurrence (a bag: duplicates kept, the count IS the feature
    value after the mean normalization in scoring).

    Tokens materialize in their own projection before the gram lambdas
    slice them — the gopher_repetition lesson: an inline ``split`` gets
    re-inlined per gram position and turns tokenization quadratic.
    Catalyst keeps the two projections apart because ``_toks`` is
    referenced once per gram order."""
    from .text import nonempty_tokens, word_ngrams

    toked = docs.withColumn("_toks", nonempty_tokens(F.col(text_col)))
    grams = F.flatten(F.array(*[
        word_ngrams(F.col("_toks"), n) for n in range(1, ngram + 1)]))
    return toked.withColumn(
        "_feats",
        F.transform(grams,
                    lambda g: F.pmod(F.xxhash64(g), F.lit(buckets))
                    .cast("int"))).drop("_toks")


def _score_expr(w: list, bias: float) -> F.Column:
    """``bias + mean(w[f] for f in _feats)`` as one narrow expression.
    The weight vector is a SINGLE array literal (not ``buckets``
    expression nodes), so the plan stays small and codegen-friendly;
    an empty document scores the bias alone (mean guard, not ANSI x/0)."""
    wlit = F.lit([float(x) for x in w])
    total = F.aggregate(
        F.transform("_feats", lambda f: F.element_at(wlit, f + 1)),
        F.lit(0.0), lambda a, x: a + x)
    n = F.greatest(F.size("_feats"), F.lit(1))
    return F.lit(float(bias)) + total / n


def fasttext_train(docs: DataFrame, label_col: str = "y",
                   buckets: int = 8192, ngram: int = 2,
                   iters: int = 30, lr: float = 2.0, l2: float = 0.0,
                   text_col: str = "text") -> dict:
    """Train the hashed-n-gram logistic model; returns the model dict
    ``{w, bias, losses, buckets, ngram}`` consumed by
    :func:`fasttext_score` / :func:`fasttext_filter`.

    ``label_col`` is a 0/1 double on ``docs`` (1 = keep-quality — e.g.
    reference corpus rows unioned over raw-crawl rows).  Per iteration:
    one narrow global agg (loss, bias gradient, N-guarded) and one
    explode → bucket partial agg (the only shuffle; ``buckets``-row
    fan-in, map-side combined).  The feature frame is persisted once —
    training never re-tokenizes."""
    feat = (hashed_doc_features(docs, buckets, ngram, text_col)
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
            z = _score_expr(w, bias)
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            scored = feat.select(
                "_feats",
                (p - F.col("_y")).alias("_err"),
                F.greatest(F.size("_feats"), F.lit(1)).alias("_n"),
                (-(F.col("_y")
                   * F.log(F.greatest(p, F.lit(1e-12)))
                   + (1.0 - F.col("_y"))
                   * F.log(F.greatest(1.0 - p, F.lit(1e-12)))))
                .alias("_loss"))
            head = scored.agg(
                F.sum(F.col("_err").cast(_DEC)).alias("gb"),
                F.sum(F.col("_loss").cast(_DEC)).alias("loss"),
            ).collect()[0]
            grad_rows = (scored
                         .select((F.col("_err") / F.col("_n"))
                                 .alias("_g"),
                                 F.explode("_feats").alias("_b"))
                         .groupBy("_b")
                         .agg(F.sum(F.col("_g").cast(_DEC)).alias("g"))
                         .collect())
            g = {r["_b"]: float(r["g"]) for r in grad_rows}
            w = [wi - lr * (g.get(i, 0.0) / n_docs + l2 * wi)
                 for i, wi in enumerate(w)]
            bias -= lr * float(head["gb"]) / n_docs
            losses.append(float(head["loss"]) / n_docs)
        return {"w": w, "bias": bias, "losses": losses,
                "buckets": buckets, "ngram": ngram,
                "text_col": text_col}
    finally:
        feat.unpersist()


def fasttext_score(docs: DataFrame, model: dict,
                   out_col: str = "quality_p") -> DataFrame:
    """Append ``out_col`` = P(quality) per document — one narrow
    zero-shuffle projection (weights ride as an array literal), so it
    drops into batch scans and streaming micro-batches alike."""
    feat = hashed_doc_features(
        docs, model["buckets"], model["ngram"],
        model.get("text_col", "text"))
    z = _score_expr(model["w"], model["bias"])
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feat.withColumn(out_col, p).drop("_feats")


def fasttext_filter(docs: DataFrame, model: dict,
                    threshold: float = 0.5) -> DataFrame:
    """Keep documents scoring ≥ ``threshold`` — the deployed shape of
    the quality filter (CCNet keeps the top slice; tune the threshold
    against a held-out labeled sample)."""
    return (fasttext_score(docs, model)
            .filter(F.col("quality_p") >= threshold)
            .drop("quality_p"))
