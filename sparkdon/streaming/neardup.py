"""Streaming near-duplicate detection: MinHash band keys computed
narrowly per document (stream-safe — no shuffle, no state), joined
against a STATIC corpus band index (stream-static join, the supported
Structured Streaming shape for "dedup new data against the existing
corpus").

The band keys are the SAME family as the batch pipeline
(:func:`sparkdon.pipeline._minhash_bands` — Kirsch-Mitzenmacher double
hashing over 3-token shingles, 4 bands × 4 rows), computed here with
lambda-bound array expressions instead of explode+groupBy so a streaming
micro-batch needs only a narrow map.  Equality of the two formulations
is pytest-asserted shingle-for-shingle.

Scale notes (100 TB corpus, streaming ingest):

- the corpus index is ``(band, bk, doc_id)`` — 4 rows per corpus doc,
  a static DataFrame that Spark broadcast- or shuffle-joins per
  micro-batch; at real scale it lives bucketed on (band, bk) so the
  per-batch join is co-located and touches only matching buckets;
- the stream side never aggregates: band keys are a per-row array
  expression + explode, so there is no streaming state to bound;
- output is the raw (doc_id, band, bk, corpus_doc_id) collision stream
  in append mode — candidate verification (exact Jaccard, batch tier)
  and corpus-index refresh are downstream concerns, deliberately not
  hidden in here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkdon.pipeline import BAND_ROWS, MINHASH_P, N_HASHES

#: per-row signature: tokens → 3-token shingles → one md5 per shingle
#: (split into two 32-bit halves) → 16 mins of (h1 + k·h2) mod P.
#: Every array is lambda-bound so each stage is computed once per row.
_SHINGLES = (
    "transform(array(split(text, ' ')), t -> "
    " transform(if(size(t) >= 3, sequence(1, size(t) - 2), array()), "
    "  i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), "
    "   element_at(t, i+2))))[0]"
)
_HALVES = (
    f"transform({_SHINGLES}, s -> named_struct("
    " 'h1', cast(conv(substring(md5(cast(s as binary)), 1, 8), 16, 10) as bigint), "
    " 'h2', cast(conv(substring(md5(cast(s as binary)), 9, 8), 16, 10) as bigint)))"
)
_MINS = (
    f"transform(array({_HALVES}), hs -> "
    f" transform(sequence(0, {N_HASHES - 1}), k -> "
    f"  array_min(transform(hs, h -> (h.h1 + k * h.h2) % {MINHASH_P}))))[0]"
)
_BANDS = (
    f"transform(array({_MINS}), mhs -> "
    f" transform(sequence(0, {N_HASHES // BAND_ROWS - 1}), b -> named_struct("
    "  'band', cast(b as int), "
    "  'bk', md5(cast(concat_ws('|', "
    + ", ".join(
        f"cast(element_at(mhs, {BAND_ROWS}*b + {r + 1}) as string)"
        for r in range(BAND_ROWS)
    )
    + ") as binary)))))[0]"
)


def band_keys_narrow(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bk) band keys via a pure narrow map — works on a
    streaming DataFrame.  Documents with no shingles (< 3 tokens) yield
    no keys, exactly like the batch explode+groupBy path."""
    return (
        docs.select(
            "doc_id",
            F.explode(F.expr(_BANDS)).alias("x"),
        )
        .filter(F.col("x.bk").isNotNull())  # < 3 tokens → NULL mins
        .select("doc_id", F.col("x.band").alias("band"), F.col("x.bk").alias("bk"))
    )


def corpus_band_index(spark, sf_dir: str) -> DataFrame:
    """Static corpus index for the stream-static join: the batch band
    keys of every corpus document."""
    from sparkdon.pipeline import _minhash_bands

    return _minhash_bands(spark, sf_dir).withColumnRenamed("doc_id", "corpus_doc_id")


def near_dup_matches(stream_docs: DataFrame, corpus_bands: DataFrame) -> DataFrame:
    """Append-mode collision stream: one row per (incoming doc, band)
    whose bucket already holds a corpus document.  A doc with ≥1 match
    row is an LSH near-dup CANDIDATE against the corpus; verification
    (exact Jaccard on the candidate pair) is the batch tier's job."""
    keys = band_keys_narrow(stream_docs)
    return keys.join(corpus_bands, on=["band", "bk"], how="inner").select(
        "doc_id", "band", "bk", "corpus_doc_id"
    )


def contaminated_stream(stream_vecs: DataFrame, bench: DataFrame,
                        threshold_scaled: int | None = None) -> DataFrame:
    """Streaming semantic decontamination: the append-mode stream of
    incoming ``(vec_id, v)`` embeddings whose cosine against ANY vector
    of the STATIC ``(bench_id, bv)`` benchmark frame reaches the bar —
    the streaming twin of :func:`sparkdon.pipeline.ann.decontam_semantic`
    (same integer-scaled cosine, same zero-norm NULL lane), shaped like
    :func:`near_dup_matches`: a stateless stream-static join, so there
    is no watermark, no state store, and nothing to bound.

    Spark-shape notes: a per-vec MAX over the benchmark (the batch
    twin's plan) would be a streaming aggregation — state keyed by
    vec_id, wrong tool for a decision that is per-ROW.  The decision
    "∃ bench vector with cos ≥ bar" is instead a LEFT SEMI
    stream-static join on the threshold predicate: the benchmark side
    broadcasts whole (eval suites — KBs to MBs), each micro-batch row
    is a codegen'd fold per bench vector, and a row is emitted at most
    once regardless of how many bench vectors it matches.  Zero-norm
    vectors yield NULL cosine → predicate NULL → never contaminated,
    identical to the batch twin's coalesce(false) lane."""
    from sparkdon.pipeline.ann import (DECONTAM_SIM_SCALED, _cosine_scaled,
                                       _norm_col)

    if threshold_scaled is None:
        threshold_scaled = DECONTAM_SIM_SCALED
    bn = bench.select("bench_id", "bv", _norm_col("bv").alias("bnorm"))
    vn = stream_vecs.select("vec_id", "v", _norm_col("v").alias("vnorm"))
    dot = F.aggregate(F.zip_with(vn["v"], bn["bv"], lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    cond = _cosine_scaled(dot, vn["vnorm"], bn["bnorm"]) >= threshold_scaled
    return (vn.join(F.broadcast(bn), cond, "left_semi")
            .select("vec_id"))
