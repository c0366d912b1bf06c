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


# --- x_dsir_weights: the r18 battery-swap candidate (round 16) -------------

def _oracle_rows(sql, sf_dir):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    cur = con.execute(sql)
    return [d[0] for d in cur.description], cur.fetchall()


def test_x_dsir_weights_matches_oracle(spark):
    """Driver-style compare (rows / columns / values) on the sf0.001
    fixture — the r18 candidate's admission evidence, same pattern as
    x_trim_spans/x_soft_dedup before their r16 registration."""
    import importlib.util
    import os

    from sparkdon.pipeline.sampling import _DSIR_ORACLE, x_dsir_weights

    spec = importlib.util.spec_from_file_location(
        "check_correctness",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "check_correctness.py"))
    check = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(check)
    sf_dir = "/root/testdata/sf0.001"
    df = x_dsir_weights(spark, sf_dir)
    s_cols, s_rows = df.columns, [tuple(r) for r in df.collect()]
    o_cols, o_rows = _oracle_rows(_DSIR_ORACLE, sf_dir)
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) > 0
    assert check.canon_rows(s_cols, s_rows) == check.canon_rows(o_cols, o_rows)


def test_scaled_weights_upweight_target_like_docs(spark):
    """Semantics on a PLANTED corpus (the production wiki-target
    deployment): documents sharing the target slice's vocabulary must
    average a higher importance weight toward it than documents from a
    disjoint vocabulary."""
    import random

    from pyspark.sql import functions as F

    from sparkdon.pipeline.sampling import dsir_logweights_scaled

    rng = random.Random(7)
    wiki_vocab = [f"enc{i}" for i in range(40)]
    web_vocab = [f"spam{i}" for i in range(40)]
    rows = []
    for i in range(120):
        src = "wiki" if i % 3 == 0 else "web"
        vocab = wiki_vocab if src == "wiki" else web_vocab
        rows.append((i, " ".join(rng.choices(vocab, k=30)), src))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    w = dsir_logweights_scaled(
        docs, docs.filter(F.col("source") == "wiki"))
    j = w.join(docs.select("doc_id", "source"), "doc_id")
    means = {r["source"]: r["m"] for r in j.groupBy("source")
             .agg(F.avg("log_weight_scaled").alias("m")).collect()}
    assert means["wiki"] > means["web"]


def test_scaled_weights_empty_target_is_uniform_prior(spark):
    """An empty target slice degrades to the smoothing prior on both
    sides of the ratio — still defined, no crash, every gram-bearing
    doc present."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.sampling import dsir_logweights_scaled

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a a"), (3, "")], "doc_id long, text string")
    w = dsir_logweights_scaled(docs, docs.filter(F.lit(False)))
    rows = {r.doc_id: r.log_weight_scaled for r in w.collect()}
    assert set(rows) == {1, 2}  # doc 3 has no grams

def test_scaled_weights_rank_like_raw_weights(spark):
    """The 1e-6 bucket quantization must not reorder the fixture's
    documents materially: the scaled and raw paths agree on the
    top-decile membership (hash choice differs — xxhash64 vs md5 — so
    exact rank equality is not expected, only distribution-level
    agreement on a corpus whose weights are well separated)."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.sampling import (dsir_logweights_scaled,
                                            dsir_weights)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 5 == 0)
    scaled = dsir_logweights_scaled(docs, tgt)
    raw = dsir_weights(docs, tgt, buckets=4096)
    k = scaled.count() // 10
    top_s = {r.doc_id for r in scaled.orderBy(
        F.desc("log_weight_scaled"), "doc_id").limit(k).collect()}
    top_r = {r.doc_id for r in raw.orderBy(
        F.desc("log_weight"), "doc_id").limit(k).collect()}
    assert len(top_s & top_r) >= int(0.7 * k)
