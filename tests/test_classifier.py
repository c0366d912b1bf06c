"""Hashed bag-of-n-gram quality classifier (pipeline/classifier.py,
round 12): the fastText-style learned page filter — feature hashing,
deterministic distributed training, zero-shuffle scoring."""

import random

import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.classifier import (fasttext_filter,
                                          fasttext_pr_table,
                                          fasttext_score, fasttext_train,
                                          hashed_doc_features,
                                          load_fasttext, save_fasttext)

WIKI = ["the", "of", "history", "city", "a", "century", "population",
        "was", "is", "river", "founded", "university"]
SPAM = ["buy", "cheap", "viagra", "casino", "win", "click", "here",
        "free", "pills", "jackpot", "xxx", "bonus"]


def _corpus(spark, n=120, seed=0, labeled=True):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        vocab = WIKI if i % 2 == 0 else SPAM
        text = " ".join(rng.choices(vocab, k=30))
        rows.append((i, text, float(i % 2 == 0)) if labeled
                    else (i, text))
    schema = ("doc_id long, text string, y double" if labeled
              else "doc_id long, text string")
    return spark.createDataFrame(rows, schema)


def test_features_hashed_bag(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, "   ")],
        "doc_id long, text string")
    out = {r.doc_id: r._feats
           for r in hashed_doc_features(df, buckets=64).collect()}
    # doc 1: 3 unigrams + 2 bigrams = 5 occurrences, duplicates KEPT
    assert len(out[1]) == 5
    assert all(0 <= f < 64 for f in out[1])
    # "a" occurs twice → same bucket twice (bag semantics)
    assert len(set(out[1])) < 5
    # empty / whitespace-only docs get an empty bag, not a crash
    assert out[2] == [] and out[3] == []


def test_train_loss_monotone_and_separates(spark):
    docs = _corpus(spark)
    model = fasttext_train(docs, buckets=512, iters=20)
    losses = model["losses"]
    assert len(losses) == 20
    # batch GD at the default step on a separable planted corpus:
    # strictly decreasing log-loss from the 0.693 zero-init point
    assert losses[0] == pytest.approx(0.6931, abs=5e-3)
    assert all(b < a for a, b in zip(losses, losses[1:]))
    # held-out generalization: a DIFFERENT seed draws unseen docs from
    # the same two distributions
    held = _corpus(spark, n=60, seed=99)
    scored = fasttext_score(held, model).collect()
    acc = sum((r.quality_p >= 0.5) == (r.y == 1.0)
              for r in scored) / len(scored)
    assert acc >= 0.95  # majority baseline is 0.5


def test_train_deterministic(spark):
    docs = _corpus(spark, n=40)
    m1 = fasttext_train(docs, buckets=128, iters=5)
    # different partitioning must not flip the trajectory (decimal sums)
    m2 = fasttext_train(docs.repartition(7), buckets=128, iters=5)
    assert m1["w"] == m2["w"]
    assert m1["bias"] == m2["bias"]
    assert m1["losses"] == m2["losses"]


def test_score_plan_narrow_and_python_free(spark):
    docs = _corpus(spark, n=8, labeled=False)
    # both featurizations: the char-gram branch must stay inside the
    # same narrow zero-shuffle projection contract
    for cn in (None, [3, 4]):
        model = {"w": [0.1] * 64, "bias": -0.2, "buckets": 64,
                 "ngram": 2, "losses": [], "char_ngrams": cn}
        scored = fasttext_score(docs, model)
        plan = scored._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan \
            and "ArrowEvalPython" not in plan
        # zero-shuffle: weights ride as a literal, no broadcast table,
        # no Exchange — safe in a streaming micro-batch
        assert "Exchange" not in plan, plan
        rows = scored.collect()
        assert set(scored.columns) == {"doc_id", "text", "quality_p"}
        assert all(0.0 <= r.quality_p <= 1.0 for r in rows)


def test_empty_doc_scores_bias_only(spark):
    # null text must behave like empty text (bias-only score), never a
    # null score that fasttext_filter would drop with no signal
    docs = spark.createDataFrame([(1, ""), (2, None)],
                                 "doc_id long, text string")
    model = {"w": [5.0] * 16, "bias": 0.0, "buckets": 16, "ngram": 2}
    ps = [r.quality_p for r in fasttext_score(docs, model).collect()]
    assert ps == pytest.approx([0.5, 0.5])  # sigmoid(bias) both


def test_null_text_trains_like_empty(spark):
    """All-null-text frames train on the bias alone (finite losses) —
    the review found float(None) crashes when every sum is null."""
    docs = spark.createDataFrame(
        [(1, None, 1.0), (2, None, 0.0)],
        "doc_id long, text string, y double")
    model = fasttext_train(docs, buckets=16, iters=3)
    assert all(l == pytest.approx(0.693, abs=0.01) or l > 0
               for l in model["losses"])
    assert model["w"] == [0.0] * 16  # no features → no weight updates


def test_reserved_and_existing_columns_fail_loudly(spark):
    model = {"w": [0.0] * 16, "bias": 0.0, "buckets": 16, "ngram": 2}
    has_p = spark.createDataFrame(
        [(1, "a", 0.9)], "doc_id long, text string, quality_p double")
    with pytest.raises(ValueError, match="already exists"):
        fasttext_score(has_p, model)
    # a caller's own quality_p column passes through filter untouched
    kept = fasttext_filter(has_p, model, threshold=0.4)
    assert kept.columns == ["doc_id", "text", "quality_p"]
    assert kept.collect()[0].quality_p == 0.9
    has_feats = spark.createDataFrame(
        [(1, "a", [1])], "doc_id long, text string, _feats array<int>")
    with pytest.raises(ValueError, match="reserved"):
        hashed_doc_features(has_feats)


def test_filter_threshold(spark):
    docs = _corpus(spark)
    model = fasttext_train(docs, buckets=512, iters=20)
    kept = fasttext_filter(docs.drop("y"), model, threshold=0.5)
    ids = [r.doc_id for r in kept.collect()]
    # the planted corpus is perfectly separable at this size
    assert ids and all(i % 2 == 0 for i in ids)
    assert "quality_p" not in kept.columns


def test_train_empty_frame_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, y double")
    with pytest.raises(ValueError, match="empty training frame"):
        fasttext_train(empty, buckets=16, iters=1)


def test_l2_shrinks_weights(spark):
    docs = _corpus(spark, n=40)
    m0 = fasttext_train(docs, buckets=128, iters=10, l2=0.0)
    m1 = fasttext_train(docs, buckets=128, iters=10, l2=0.1)
    n0 = sum(x * x for x in m0["w"])
    n1 = sum(x * x for x in m1["w"])
    assert n1 < n0


def test_pr_table_calibration(spark):
    docs = _corpus(spark)
    model = fasttext_train(docs, buckets=512, iters=20)
    held = _corpus(spark, n=80, seed=42)
    tab = {r.threshold: r for r in
           fasttext_pr_table(held, model).collect()}
    assert set(tab) == {i / 10 for i in range(1, 10)}
    # keep_frac decreases with threshold; on the separable corpus the
    # mid thresholds are near-perfect
    keeps = [tab[i / 10].keep_frac for i in range(1, 10)]
    assert keeps == sorted(keeps, reverse=True)
    assert tab[0.5].precision >= 0.95 and tab[0.5].recall >= 0.95
    # the half of held docs that is positive bounds keep_frac at 0.5
    # once precision is perfect
    assert tab[0.9].keep_frac <= 0.55


def test_pr_table_jobs_constant_in_thresholds(spark):
    """Thresholds add agg COLUMNS, not data passes: the Spark job count
    (AQE may split one action into a fixed small number) must be
    IDENTICAL for 2 and 9 thresholds.  Pinned via status-tracker job
    groups."""
    docs = _corpus(spark, n=8)
    model = {"w": [0.0] * 64, "bias": 0.0, "buckets": 64, "ngram": 2}
    sc = spark.sparkContext

    def njobs(thresholds, tag):
        sc.setJobGroup(tag, "pin pass-count property")
        try:
            tab = fasttext_pr_table(docs, model, thresholds=thresholds)
        finally:
            sc.setJobGroup(None, None)
        assert tab.count() == len(thresholds)
        return len(sc.statusTracker().getJobIdsForGroup(tag))

    few = njobs((0.3, 0.7), "prt_few")
    many = njobs(tuple(i / 10 for i in range(1, 10)), "prt_many")
    assert few == many <= 2, (few, many)


def test_pr_table_null_label_fails_loudly(spark):
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    docs = spark.createDataFrame(
        [(1, "a b", 1.0), (2, "c d", None)],
        "doc_id long, text string, y double")
    model = {"w": [0.0] * 64, "bias": 0.0, "buckets": 64, "ngram": 2}
    with pytest.raises(SparkRuntimeException, match="null label"):
        fasttext_pr_table(docs, model).collect()


def test_save_load_roundtrip(spark, tmp_path):
    docs = _corpus(spark, n=40)
    model = fasttext_train(docs, buckets=128, iters=5)
    path = str(tmp_path / "model.json")
    save_fasttext(model, path)
    loaded = load_fasttext(path)
    assert loaded["w"] == model["w"]  # exact JSON double round-trip
    assert loaded["bias"] == model["bias"]
    held = _corpus(spark, n=10, seed=5, labeled=False)
    a = [r.quality_p for r in fasttext_score(held, model)
         .orderBy("doc_id").collect()]
    b = [r.quality_p for r in fasttext_score(held, loaded)
         .orderBy("doc_id").collect()]
    assert a == b  # bit-identical scores
    # atomic re-save: overwriting an existing model never truncates it
    save_fasttext(loaded, path)
    assert load_fasttext(path)["w"] == model["w"]
    import os
    assert not [f for f in os.listdir(os.path.dirname(path))
                if f.endswith(".tmp")]  # no temp litter


def test_streaming_score_composes(spark, tmp_path):
    """The zero-shuffle scorer drops into a streaming micro-batch —
    the deployed shape: filter crawl docs as they land."""
    docs = _corpus(spark, n=20, labeled=False)
    src = str(tmp_path / "in")
    docs.write.parquet(src)
    model = fasttext_train(_corpus(spark, n=60, seed=3),
                           buckets=256, iters=10)
    stream = spark.readStream.schema("doc_id long, text string") \
        .parquet(src)
    out = fasttext_score(stream, model)
    q = (out.writeStream.format("memory").queryName("ft_scored")
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish in time"
    got = spark.sql("select * from ft_scored").collect()
    assert len(got) == 20
    assert all(0.0 <= r.quality_p <= 1.0 for r in got)


def test_char_ngram_features(spark):
    """char_ngrams=(3,3): each word contributes its character trigrams
    (c#-tagged so they never collide with word grams) alongside the
    word features."""
    df = spark.createDataFrame([(1, "abcd ef")],
                               "doc_id long, text string")
    out = hashed_doc_features(df, buckets=1 << 20, ngram=1,
                              char_ngrams=(3, 3)).collect()[0]._feats
    # 2 word unigrams + trigrams of "abcd" (abc, bcd) + none from "ef"
    assert len(out) == 4
    # (True, True) would silently train minn=maxn=1 — bool is not an
    # int here (ADVICE r12, low)
    for bad in ((0, 3), (3.0, 4.0), (3,), (4, 3), (True, True)):
        with pytest.raises(ValueError, match="char_ngrams"):
            hashed_doc_features(df, char_ngrams=bad)


def test_char_ngrams_give_typo_robustness(spark):
    """The fastText sub-word property: a held-out corpus with TYPO'D
    words (one char dropped per word) still classifies well with char
    n-grams, while the word-gram-only model degrades toward chance —
    the reason real crawl-quality filters train with -minn/-maxn."""
    import random

    rng = random.Random(11)

    def corrupt(text):
        # drop one char from EVERY multi-char word: the word-gram model
        # has seen none of these spellings; char grams mostly survive
        ws = []
        for w in text.split():
            if len(w) > 1:
                i = rng.randrange(len(w))
                w = w[:i] + w[i + 1:]
            ws.append(w)
        return " ".join(ws)

    train = _corpus(spark, n=160, seed=0)
    held_rows = [(r.doc_id, corrupt(r.text), r.y)
                 for r in _corpus(spark, n=60, seed=77).collect()]
    held = spark.createDataFrame(
        held_rows, "doc_id long, text string, y double")

    def acc(model):
        scored = fasttext_score(held, model).collect()
        return sum((r.quality_p >= 0.5) == (r.y == 1.0)
                   for r in scored) / len(scored)

    chars = fasttext_train(train, buckets=2048, iters=15,
                           char_ngrams=(3, 4))
    words = fasttext_train(train, buckets=2048, iters=15)
    a_chars, a_words = acc(chars), acc(words)
    assert a_chars >= 0.9
    assert a_chars > a_words  # sub-word features carry the typo case


def test_md5_hash_option_trains_and_scores(spark):
    """hash='md5' (the oracle-portable bucket hash for the r15-staged
    driver gate) rides in the model dict: scoring hashes the way
    training did, and the two hashes genuinely bucket differently."""
    docs = _corpus(spark, n=60)
    m = fasttext_train(docs, buckets=256, iters=5, hash="md5")
    assert m["hash"] == "md5"
    scored = fasttext_score(docs, m).collect()
    assert all(0.0 < r.quality_p < 1.0 for r in scored)
    fx = {r.doc_id: r._feats for r in
          hashed_doc_features(docs, buckets=256).collect()}
    fm = {r.doc_id: r._feats for r in
          hashed_doc_features(docs, buckets=256, hash="md5").collect()}
    assert fx[0] != fm[0] and len(fx[0]) == len(fm[0])
    with pytest.raises(ValueError, match="hash"):
        hashed_doc_features(docs, hash="sha1")
