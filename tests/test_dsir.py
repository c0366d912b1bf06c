"""DSIR-style importance resampling (pipeline/sampling.py, round 11):
hashed n-gram importance weights toward a target distribution, and
Gumbel-top-k resampling that moves the selected set's distribution
toward the target."""

import pytest

from sparkdon.pipeline.sampling import (dsir_features, dsir_resample,
                                        dsir_weights)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_corpus(spark, seed=0):
    # two planted "domains": wiki-ish and code-ish token distributions
    import random

    rng = random.Random(seed)
    wiki = ["the", "of", "history", "city", "century", "population"]
    code = ["def", "return", "import", "class", "self", "lambda"]
    rows = []
    for i in range(120):
        vocab = wiki if i % 2 == 0 else code
        rows.append((i, " ".join(rng.choices(vocab, k=40))))
    return _docs(spark, rows)


def test_weights_prefer_on_distribution_docs(spark):
    source = _mk_corpus(spark)
    # target: pure wiki-ish text
    import random

    rng = random.Random(7)
    wiki = ["the", "of", "history", "city", "century", "population"]
    target = _docs(spark, [
        (1000 + i, " ".join(rng.choices(wiki, k=40))) for i in range(30)])
    w = {r.doc_id: r.log_weight for r in
         dsir_weights(source, target).collect()}
    assert len(w) == 120
    wiki_w = [w[i] for i in range(120) if i % 2 == 0]
    code_w = [w[i] for i in range(120) if i % 2 == 1]
    # every wiki doc outweighs every code doc on this planted corpus
    assert min(wiki_w) > max(code_w)


def test_resample_moves_distribution_toward_target(spark):
    source = _mk_corpus(spark)
    import random

    rng = random.Random(7)
    wiki = ["the", "of", "history", "city", "century", "population"]
    target = _docs(spark, [
        (1000 + i, " ".join(rng.choices(wiki, k=40))) for i in range(30)])
    picked = dsir_resample(source, target, k=30).collect()
    assert len(picked) == 30
    # overwhelmingly wiki-ish picks (source is 50/50)
    n_wiki = sum(1 for r in picked if r.doc_id % 2 == 0)
    assert n_wiki >= 27
    # deterministic: same inputs, same selection
    again = dsir_resample(source, target, k=30).collect()
    assert sorted(r.doc_id for r in picked) == sorted(r.doc_id for r in again)


def test_features_hashed_and_bounded(spark):
    docs = _docs(spark, [(1, "a b a"), (2, "")])
    f = dsir_features(docs, buckets=16, ngram=2).collect()
    assert all(0 <= r.bucket < 16 for r in f)
    ids = {r.doc_id for r in f}
    assert ids == {1}                      # empty doc yields no features
    # "a b a": unigrams a,b,a + bigrams "a b","b a" → total cnt 5
    assert sum(r.cnt for r in f) == 5


def test_high_temperature_flattens_selection(spark):
    source = _mk_corpus(spark)
    import random

    rng = random.Random(7)
    wiki = ["the", "of", "history", "city", "century", "population"]
    target = _docs(spark, [
        (1000 + i, " ".join(rng.choices(wiki, k=40))) for i in range(30)])
    hot = dsir_resample(source, target, k=40, temperature=1e6).collect()
    n_wiki_hot = sum(1 for r in hot if r.doc_id % 2 == 0)
    # T→∞ ≈ uniform draw from a 50/50 corpus
    assert 10 <= n_wiki_hot <= 30


def test_whitespace_does_not_shift_weights(spark):
    # r11 review: phantom edge grams from raw split perturbed weights
    # of byte-identical content with a trailing space
    src = _docs(spark, [(1, "a b a"), (2, " a b a ")])
    f = dsir_features(src, buckets=64, ngram=2)
    by_doc = {}
    for r in f.collect():
        by_doc.setdefault(r.doc_id, []).append((r.bucket, r.cnt))
    assert sorted(by_doc[1]) == sorted(by_doc[2])
    tgt = _docs(spark, [(10, "a b a b")])
    w = {r.doc_id: r.log_weight for r in dsir_weights(src, tgt).collect()}
    assert w[1] == pytest.approx(w[2])
