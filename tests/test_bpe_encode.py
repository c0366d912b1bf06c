"""bpe_encode (pipeline/text.py, round 12): the ENCODE half of the BPE
loop — apply a trained merge list to documents in one Arrow stage, and
feed tokenizer-accurate counts into pack_and_shard."""

import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.text import bpe_encode, bpe_train_merges


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def _ref_apply(word, merges):
    """The one reference greedy apply (paired scan, equivalent to the
    trainer's fold) — shared by every equivalence test here so the
    reference semantics live in one place."""
    syms = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_hand_fixed_merges(spark):
    merges = [("l", "o"), ("lo", "w")]
    out = {r.doc_id: r.bpe_tokens for r in bpe_encode(
        _docs(spark, ["low lower", "lowest", "slow"]),
        merges).collect()}
    assert out[0] == ["low", "low", "e", "r"]
    assert out[1] == ["low", "e", "s", "t"]
    # merge applies mid-word too ("s" prefix does not block it)
    assert out[2] == ["s", "low"]


def test_merge_order_and_runs(spark):
    # chained merges apply in training order: (a,b) first, then (ab,c)
    out1 = bpe_encode(_docs(spark, ["abcabc"]),
                      [("a", "b"), ("ab", "c")]).collect()[0].bpe_tokens
    assert out1 == ["abc", "abc"]
    # left-to-right greedy on runs: "aaa" + (a,a) → [aa, a], never [a, aa]
    out2 = bpe_encode(_docs(spark, ["aaa aaaa"]),
                      [("a", "a")]).collect()[0].bpe_tokens
    assert out2 == ["aa", "a", "aa", "aa"]


def test_encode_reproduces_trainer_apply(spark):
    """Training then encoding the SAME corpus must reproduce the
    trainer's own final symbol sequences — the defining equivalence of
    the train/encode pair (both apply merges in order, left-to-right
    greedy)."""
    texts = ["low low low lower lowest",
             "new newer newest new new",
             "aaa aaab low newer",
             "widest wide wide wider"]
    docs = _docs(spark, texts)
    merges = bpe_train_merges(docs, n_merges=8)
    assert len(merges) >= 5

    for r in bpe_encode(docs, merges).collect():
        toks = r.bpe_tokens
        words = texts[r.doc_id].split()
        want = [t for w in words for t in _ref_apply(w, merges)]
        assert toks == want
        # segmentation invariant: concatenation restores the words
        assert "".join(toks) == "".join(words)


def test_trainer_and_encoder_share_tokenization(spark):
    """Curated text is newline-joined: the trainer must see the same
    whitespace words the encoder splits — a single-space trainer split
    would learn merges containing '\\n' that the encoder can never
    apply (review finding, r12)."""
    texts = ["end.\nNext line here", "end.\nNext time", "end.\nNext"]
    docs = _docs(spark, texts)
    merges = bpe_train_merges(docs, n_merges=6)
    # no learned symbol may span the newline boundary
    assert all("\n" not in a + b for a, b in merges)
    for r in bpe_encode(docs, merges).collect():
        toks = r.bpe_tokens
        words = texts[r.doc_id].split()
        assert "".join(toks) == "".join(words)
        # "end." appears in every doc → trained to one symbol, and the
        # encoder reproduces it
        assert "end." in toks


def test_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None)], "doc_id long, text string")
    out = {r.doc_id: r.bpe_tokens
           for r in bpe_encode(df, [("a", "b")]).collect()}
    assert out[1] == [] and out[2] == [] and out[3] == []


def test_plan_single_arrow_stage_no_shuffle(spark):
    df = bpe_encode(_docs(spark, ["a b"]), [("a", "b")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert plan.count("MapInPandas") == 1, plan


def test_pack_and_shard_with_bpe_counts(spark, tmp_path):
    """n_tok_col routes the precomputed BPE count into the prefix-sum:
    a doc whose whitespace count (2) differs from its BPE count (6)
    must occupy 6 token slots in the packed layout."""
    from sparkdon.pipeline.packing import pack_and_shard

    docs = _docs(spark, ["abc def", "xyz"])
    enc = bpe_encode(docs, [])  # no merges → per-char symbols: 6 and 3
    counted = enc.withColumn("n_bpe", F.size("bpe_tokens")) \
        .drop("bpe_tokens")
    out = pack_and_shard(counted, str(tmp_path / "shards"),
                         n_shards=1, seq_len=4, n_tok_col="n_bpe")
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].start_tok == 0
    # doc 0 spans 6 BPE tokens (not 2 whitespace words), so doc 1
    # starts at global token 6 — in the second 4-token sequence
    assert rows[1].start_tok == 6
    assert rows[1].seq_id > rows[0].seq_id


def test_pack_and_shard_rejects_bad_counts(spark, tmp_path):
    """A null or negative supplied count must fail the job loudly, not
    corrupt the prefix sum (review finding, r12)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from sparkdon.pipeline.packing import pack_and_shard

    for bad in (None, -3):
        docs = spark.createDataFrame(
            [(0, "a b", 2), (1, "c", bad)],
            "doc_id long, text string, n_bpe int")
        with pytest.raises(SparkRuntimeException, match="non-null"):
            pack_and_shard(docs, str(tmp_path / f"s{bad}"),
                           n_shards=1, seq_len=4, n_tok_col="n_bpe")


def test_fuzz_train_encode_equivalence(spark):
    """Hypothesis-style battery on ONE Spark action: random small
    corpora (short alphabet → dense merge opportunities), train, then
    encode the training corpus itself — the encoder must reproduce the
    trainer's final segmentation and the concatenation invariant on
    every doc.  Random generation is driver-side (a Spark action per
    hypothesis example would take minutes); 25 seeded corpora."""
    import random

    for seed in range(25):
        rng = random.Random(seed)
        words = ["".join(rng.choices("abc", k=rng.randint(1, 6)))
                 for _ in range(rng.randint(3, 12))]
        texts = [" ".join(rng.choices(words, k=rng.randint(1, 15)))
                 for _ in range(rng.randint(2, 6))]
        docs = _docs(spark, texts)
        merges = bpe_train_merges(docs, n_merges=rng.randint(1, 6))

        for r in bpe_encode(docs, merges).collect():
            toks = r.bpe_tokens
            ws = texts[r.doc_id].split()
            assert toks == [t for w in ws
                            for t in _ref_apply(w, merges)], \
                (seed, texts[r.doc_id], merges)
            assert "".join(toks) == "".join(ws)


def test_fuzz_local_vs_distributed_trainer(spark):
    """The local-histogram fast path must produce the IDENTICAL merge
    list to the distributed iteration — same counts, same (count desc,
    pair lex) tie-break, same <2 stop — on 12 random dense corpora."""
    import random

    for seed in range(12):
        rng = random.Random(1000 + seed)
        words = ["".join(rng.choices("abcd", k=rng.randint(1, 6)))
                 for _ in range(rng.randint(3, 10))]
        texts = [" ".join(rng.choices(words, k=rng.randint(1, 12)))
                 for _ in range(rng.randint(2, 5))]
        docs = _docs(spark, texts)
        n = rng.randint(1, 7)
        local = bpe_train_merges(docs, n_merges=n)
        dist = bpe_train_merges(docs, n_merges=n, local_max_vocab=0)
        assert local == dist, (seed, texts, local, dist)


def test_local_trainer_handles_real_merge_counts(spark):
    """500 merges in seconds via the local-histogram path — the scale a
    real tokenizer needs, impractical as 500 Spark jobs.  (The sf
    fixture corpora top out at 89 mergeable pairs, so this plants a
    2k-word vocabulary with every word repeated.)"""
    import random

    rng = random.Random(3)
    words = ["".join(rng.choices("abcdefghijklmnopqrstuvwxyz",
                                 k=rng.randint(6, 12)))
             for _ in range(2000)]
    texts = [" ".join(rng.choices(words, k=40)) for _ in range(200)]
    merges = bpe_train_merges(_docs(spark, texts), n_merges=500)
    assert len(merges) == 500
    assert len(set(merges)) == 500  # a pair never merges twice
    # prefix closure: every merge's parts are chars or outputs of
    # EARLIER merges (built incrementally — the full-list version would
    # miss an ordering bug)
    known: set = set()
    for a, b in merges:
        assert len(a) == 1 or a in known, (a, b)
        assert len(b) == 1 or b in known, (a, b)
        known.add(a + b)
    # and the encoder applies the full 500-merge list (inverted index
    # keeps this cheap) with the concatenation invariant intact
    for r in bpe_encode(_docs(spark, texts[:20]), merges).collect():
        assert "".join(r.bpe_tokens) == "".join(r.text.split())


def test_backslash_and_quote_symbols_both_paths(spark):
    """A winning pair containing a backslash or quote must not corrupt
    the distributed loop's SQL splice (review finding, r12): both
    trainer paths produce the same merges and the encoder applies
    them."""
    texts = [r"c:\dir c:\dir c:\dir it's it's it's"] * 3
    docs = _docs(spark, texts)
    local = bpe_train_merges(docs, n_merges=4)
    dist = bpe_train_merges(docs, n_merges=4, local_max_vocab=0)
    assert local == dist
    assert any("\\" in a + b for a, b in local)  # the case is exercised
    for r in bpe_encode(docs, local).collect():
        assert "".join(r.bpe_tokens) == "".join(texts[r.doc_id].split())


def test_encoder_long_unsegmented_token_bounded(spark):
    """A 50k-char whitespace-free token (base64 blob, minified JS) must
    encode in bounded time: the substring probe is capped at the
    longest merge key (review finding, r12 — uncapped it was O(len³))."""
    import time

    blob = "ab" * 25000  # 50k chars, merges apply densely
    merges = [("a", "b"), ("ab", "ab")]
    s = time.time()
    out = bpe_encode(_docs(spark, [blob]), merges).collect()[0].bpe_tokens
    assert time.time() - s < 30  # uncapped: ~1e13 char-ops, hours
    assert out == ["abab"] * 12500


def test_merges_txt_roundtrip(spark, tmp_path):
    """The trained artifact round-trips through the standard merges.txt
    line format (subword-nmt / HF tokenizers shape) and drives the
    encoder identically."""
    from sparkdon.pipeline.text import load_bpe_merges, save_bpe_merges

    docs = _docs(spark, ["low low lower lowest", "low lowest new"])
    merges = bpe_train_merges(docs, n_merges=6)
    path = str(tmp_path / "merges.txt")
    save_bpe_merges(merges, path)
    with open(path) as fh:
        first = fh.readline()
    assert first.startswith("#version")
    loaded = load_bpe_merges(path)
    assert loaded == merges
    a = [r.bpe_tokens for r in
         bpe_encode(docs, merges).orderBy("doc_id").collect()]
    b = [r.bpe_tokens for r in
         bpe_encode(docs, loaded).orderBy("doc_id").collect()]
    assert a == b
    # whitespace-bearing pairs cannot be represented — loud error
    with pytest.raises(ValueError, match="whitespace"):
        save_bpe_merges([("a b", "c")], path)
    assert load_bpe_merges(path) == merges  # failed save left file intact



def test_unicode_whitespace_stays_in_token(spark):
    """Trainer and encoder agree on WHICH whitespace splits words: Java
    \\s (nonempty_tokens) is the ASCII class, so NBSP/U+2028 are
    ordinary characters on BOTH sides — a Python str.split() encoder
    would see different words than the trainer and break byte-identical
    train/encode equivalence (ADVICE r12, medium)."""
    nbsp, lsep = " ", " "
    texts = [f"aa{nbsp}bb aa{nbsp}bb", f"aa{nbsp}bb cc{lsep}dd",
             f"cc{lsep}dd ee"]
    docs = _docs(spark, texts)
    merges = bpe_train_merges(docs, n_merges=8)
    # NBSP-spanning merges are legitimate here precisely because the
    # shared tokenizer keeps NBSP inside the word
    assert any(nbsp in a + b for a, b in merges)
    for r in bpe_encode(docs, merges).collect():
        toks = r.bpe_tokens
        # rejoining tokens reproduces the ASCII-whitespace words
        import re
        words = [w for w in re.split("[ \t\n\x0b\f\r]+", texts[r.doc_id])
                 if w]
        assert "".join(toks) == "".join(words)
    # the frequent NBSP word trains to one symbol and the encoder
    # reproduces it — the equivalence the ADVICE finding showed broken
    out0 = bpe_encode(docs, merges).orderBy("doc_id").collect()[0]
    assert f"aa{nbsp}bb" in out0.bpe_tokens


def test_malformed_merges_line_raises(tmp_path):
    """A three-field merges.txt line is a malformed file, not the pair
    ('a', 'b c') — such a merge could never apply (ADVICE r12, low)."""
    from sparkdon.pipeline.text import load_bpe_merges

    path = str(tmp_path / "merges.txt")
    with open(path, "w") as fh:
        fh.write("#version: 0.2\na b c\n")
    with pytest.raises(ValueError, match="malformed"):
        load_bpe_merges(path)
    with open(path, "w") as fh:
        fh.write("a \n")  # empty right field
    with pytest.raises(ValueError, match="malformed"):
        load_bpe_merges(path)
