"""LLM-training-data pipeline operators over ``documents`` / ``embeddings``
/ ``events`` (beyond reference parity — SURVEY.md §2.10; graded as
first-class components).

Scale design notes (the 100 TB story):

- **No all-pairs joins anywhere.**  Near-dup candidates come from banded
  MinHash LSH: signatures are computed per-document (embarrassingly
  parallel), candidate pairs only materialize within an LSH bucket
  (groupBy band+key — a shuffle whose fan-in is bucket size, not corpus
  size).  Same story for the bucketed ANN variant.
- **Everything deterministic and JVM-side.**  Hashes are md5 over
  seed-tagged strings (portable: DuckDB computes the identical md5), so
  the DuckDB oracle can verify signatures/pairs exactly — no
  Python-side RNG, no engine-specific hash.
- **Ratios are compared as scaled floors** (``floor(1e4 * a / b)``)
  because ``round(double)`` disagrees between engines at half
  boundaries.
- **Python appears only in the SimHash entry** — as an Arrow-batched
  pandas UDF (the sanctioned slow path), never row-at-a-time.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkdon.relational import table

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: Dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


# ---------------------------------------------------------------------------
# deduplication
# ---------------------------------------------------------------------------

@register(
    "x_dedup_exact",
    "SELECT md5(text) AS text_hash, min(doc_id) AS keeper, count(*) AS copies "
    "FROM documents GROUP BY md5(text)",
)
def x_dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content; keeper = min doc_id.
    One shuffle on the hash; map-side partial agg handles the heavy
    duplicates."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("copies"))
    )


@register(
    "x_fingerprint",
    "SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fp "
    "FROM documents",
)
def x_fingerprint(spark, sf_dir):
    """Document fingerprint: normalization (lower, strip non-alnum) + md5 —
    the canonical near-exact-dup key."""
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", "").cast("binary")).alias("fp"),
    )


#: winnowing fingerprint parameters: k-token grams, window of w gram
#: hashes; each window contributes its (lexicographic) min md5 — the
#: standard MOSS/winnowing scheme, giving position-robust fingerprints
#: with guaranteed coverage (every w consecutive grams share a pick).
WINNOW_K, WINNOW_W = 3, 4


@register(
    "x_fingerprint_winnow",
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    "g AS (SELECT doc_id, list_transform(generate_series(1, len(t) - 2), "
    " i -> md5(concat_ws(' ', t[i], t[i+1], t[i+2]))) AS h FROM toks), "
    "w AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(h) - 3), "
    " j -> list_min(h[j:j+3]))) AS fp FROM g) "
    "SELECT DISTINCT doc_id, fp FROM w",
)
def x_fingerprint_winnow(spark, sf_dir):
    """Rolling-hash document fingerprinting (winnowing): md5 over each
    3-token gram, then the min hash of every 4-gram window, dedup'd per
    document.  Pure codegen array expressions — the token and gram-hash
    arrays are lambda-bound so each is computed once per row; a narrow
    map + explode, no shuffle before the final DISTINCT.  md5-string
    mins are portable, so the DuckDB oracle reproduces fingerprints
    bit-for-bit."""
    k, w = WINNOW_K, WINNOW_W
    docs = table(spark, sf_dir, "documents")
    grams = (
        f"transform(if(size(t) >= {k}, sequence(1, size(t) - {k - 1}), array()), "
        " i -> md5(cast(concat_ws(' ', element_at(t, i), element_at(t, i+1), "
        "  element_at(t, i+2)) as binary)))"
    )
    wins = (
        f"transform(if(size(g) >= {w}, sequence(1, size(g) - {w - 1}), array()), "
        f" j -> array_min(slice(g, j, {w})))"
    )
    expr = (f"transform(array(split(text, ' ')), t -> "
            f" transform(array({grams}), g -> {wins})[0])[0]")
    return (
        docs.select("doc_id", F.explode(F.array_distinct(F.expr(expr))).alias("fp"))
    )


#: shared SQL fragments for shingling (DuckDB side)
_DUCK_SHINGLES = (
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    "sh AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(t)-2), "
    " i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS s FROM toks) "
)


def _spark_shingles(df: DataFrame) -> DataFrame:
    """3-word shingles per doc, computed with array expressions (codegen).

    The ``transform(array(split(..)), t -> ...)`` wrapper binds the token
    array to a lambda variable so the text is tokenized ONCE per row —
    referencing ``split(text)`` directly inside the per-shingle lambda
    would re-split the document for every element access.

    Documents shorter than 3 tokens yield an EMPTY shingle array: the
    index range must be guarded with ``if(size >= 3, ...)`` because
    Spark's ``sequence(1, 0)`` is the *descending* [1, 0] (not empty
    like DuckDB's generate_series), which would drive ``element_at``
    out of bounds and kill the whole job on the first short document."""
    return df.select(
        "doc_id",
        F.expr(
            "transform(array(split(text, ' ')), t -> "
            " transform(if(size(t) >= 3, sequence(1, size(t) - 2), array()), "
            "  i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), "
            "   element_at(t, i+2))))[0]"
        ).alias("shingles"),
    )


N_HASHES = 16
BAND_ROWS = 4  # 4 bands x 4 rows
MINHASH_P = 4_294_967_291  # largest prime < 2^32


def _minhash_bands(spark, sf_dir) -> DataFrame:
    """Per-doc banded MinHash signature.

    minhash_k(doc) = min over shingles of (h1 + k·h2) mod P, where
    h1/h2 are the two 32-bit halves of ONE md5 per shingle and P is the
    largest prime < 2³² (Kirsch-Mitzenmacher double hashing — k derived
    hash functions from one strong hash).  One md5 per shingle instead
    of one per (shingle, k) is a 16× cut in hash work — md5 dominated
    the signature pass.  The mod-P wrap is what keeps the k functions
    usefully independent: without it k·h2 dominates the ordering for
    large k and the 16 mins collapse toward argmin(h2), inflating
    false-positive buckets ~6×.  All intermediates stay < 16·2³² ≪ 2⁶³,
    so no overflow semantics are involved and DuckDB reproduces every
    value exactly.

    Shape: explode shingles once, then ONE hash-aggregate computing all
    16 mins (map-side partial min → tiny shuffle keyed by doc_id).  A
    per-column ``array_min(transform(...))`` formulation is 10× slower:
    Catalyst collapses the shingle projection into every signature
    column, re-tokenizing the document 16 times.
    """
    return _bands_of(table(spark, sf_dir, "documents"))


def _bands_of(docs: DataFrame) -> DataFrame:
    """Banded MinHash signature of an arbitrary (doc_id, text) frame —
    the fixture-independent body of :func:`_minhash_bands` (tests and
    the overflow-routing path feed constructed corpora through it)."""
    md5 = F.md5(F.col("s").cast("binary"))
    exploded = _spark_shingles(docs).select(
        "doc_id", F.explode("shingles").alias("s")
    ).select(
        "doc_id",
        F.conv(F.substring(md5, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(md5, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    sigs = exploded.groupBy("doc_id").agg(
        *[
            F.min((F.col("h1") + k * F.col("h2")) % MINHASH_P).alias(f"mh{k}")
            for k in range(N_HASHES)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"mh{b * BAND_ROWS + r}").cast("string")
                                     for r in range(BAND_ROWS)]).cast("binary")).alias("bk"),
        )
        for b in range(N_HASHES // BAND_ROWS)
    ]
    # one explode instead of a 4-way union — the signature aggregate is
    # evaluated once, not once per band
    return sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bandkey")
    ).select("doc_id", F.col("bandkey.band").alias("band"), F.col("bandkey.bk").alias("bk"))


_DUCK_BANDS = (
    _DUCK_SHINGLES +
    ", hs AS (SELECT doc_id, "
    "  CAST(concat('0x', substr(md5(s), 1, 8)) AS BIGINT) AS h1, "
    "  CAST(concat('0x', substr(md5(s), 9, 8)) AS BIGINT) AS h2 FROM sh), "
    "mh AS (SELECT doc_id, seed, min((h1 + seed * h2) % 4294967291) AS m "
    "  FROM hs, (SELECT unnest(generate_series(0, 15)) AS seed) seeds "
    "  GROUP BY doc_id, seed), "
    "bands AS (SELECT doc_id, seed // 4 AS band, "
    "  md5(string_agg(m::VARCHAR, '|' ORDER BY seed)) AS bk "
    "  FROM mh GROUP BY doc_id, seed // 4) "
)


# Degenerate buckets (boilerplate-heavy corpora: empty docs, license
# headers) otherwise blow up quadratically — a 1 M-doc bucket is 5·10¹¹
# pairs.  Capped buckets are DROPPED from pair generation and surfaced
# via minhash_overflow_buckets(); at 100 TB an operator routes them to
# exact dedup instead.  The cap is far above any sf0.01 bucket size, so
# the oracle gate is unchanged.
MINHASH_BUCKET_CAP = 1000


def _bucket_pairs(bands: DataFrame, cap: int = MINHASH_BUCKET_CAP) -> DataFrame:
    """Bucket-local pair generation from sorted id lists, with a size cap."""
    buckets = (
        bands.groupBy("band", "bk")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= F.lit(cap)))
    )
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.expr(
                    "transform(ids, (x, i) -> "
                    " transform(slice(ids, i + 2, size(ids)), y -> struct(x AS d1, y AS d2)))"
                )
            )
        ).alias("pair")
    )
    return pairs.select(F.col("pair.d1").alias("d1"), F.col("pair.d2").alias("d2")).distinct()


def minhash_overflow_buckets(spark, sf_dir,
                             cap: int = MINHASH_BUCKET_CAP) -> DataFrame:
    """Monitoring twin of x_dedup_minhash: the (band, bk, n_docs) buckets
    the cap excluded from pair generation."""
    return (
        _minhash_bands(spark, sf_dir)
        .groupBy("band", "bk")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > cap)
    )


def routed_minhash_pairs(docs: DataFrame,
                         cap: int = MINHASH_BUCKET_CAP) -> DataFrame:
    """MinHash-LSH candidate pairs with the overflow fallback WIRED IN
    (not just monitored): buckets over the cap are excluded from
    quadratic pair generation, and their documents are routed through
    exact-hash dedup instead — identical-text groups emit star pairs
    (min-id representative ↔ every other member).  The union is the
    production candidate set for a boilerplate-heavy corpus.

    Why this is the right 100 TB fallback: a degenerate bucket is almost
    always an *exact*-duplicate pile (empty docs, license headers), and
    exact groups need only |group|−1 star edges to land every member in
    the right connected component downstream — linear where bucket-local
    pair generation would be quadratic.  Near-dup-but-not-identical
    members of an overflowed bucket are the one recall loss; they are
    exactly what ``minhash_overflow_buckets`` keeps reporting for
    operator follow-up.

    Shapes: the exact path is one md5 map + one window-min keyed on the
    text hash — no collected id arrays, so even a single million-doc
    identical pile streams through; the star explode is the filter
    ``doc_id != rep``."""
    bands = _bands_of(docs)
    lsh = _bucket_pairs(bands, cap)
    over = (
        bands.groupBy("band", "bk")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > cap)
        .select("band", "bk")
    )
    over_docs = bands.join(over, ["band", "bk"]).select("doc_id").distinct()
    texts = docs.join(over_docs, "doc_id").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("th"))
    w = Window.partitionBy("th")
    star = (
        texts.withColumn("d1", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("d1"))
        .select("d1", F.col("doc_id").alias("d2"))
    )
    return lsh.unionByName(star).distinct()


@register(
    "x_dedup_minhash",
    _DUCK_BANDS +
    "SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a "
    "JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id",
)
def x_dedup_minhash(spark, sf_dir):
    """Near-dup candidates via banded MinHash LSH (shingle → minhash →
    band → bucket).  Pairs are generated WITHIN each bucket from a
    sorted collect_list — one aggregate over the signatures instead of a
    self-join (which would re-evaluate the signature subtree per side).
    Bucket fan-out is bounded by bucket size (capped at
    MINHASH_BUCKET_CAP), never corpus size."""
    return _bucket_pairs(_minhash_bands(spark, sf_dir))


@register(
    "x_dedup_jaccard",
    _DUCK_SHINGLES +
    ", ds AS (SELECT doc_id, list_distinct(list(s)) AS sh FROM sh GROUP BY doc_id) "
    "SELECT a.doc_id AS d1, b.doc_id AS d2, "
    "CAST(FLOOR(10000.0 * len(list_intersect(a.sh, b.sh)) "
    " / len(list_distinct(a.sh || b.sh))) AS BIGINT) AS jac_scaled "
    "FROM ds a JOIN ds b ON b.doc_id = a.doc_id + 1",
)
def x_dedup_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard similarity on consecutive-doc pairs (the
    verification stage that would follow LSH candidate generation)."""
    sh = _spark_shingles(table(spark, sf_dir, "documents")).select(
        "doc_id", F.array_distinct("shingles").alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.floor(
                10000.0
                * F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
                / F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
            ).alias("jac_scaled"),
        )
    )


_SIMHASH_ORACLE = (
    # token hash = first 8 md5 bytes as unsigned big-endian, split into two
    # 32-bit halves so every shift stays inside BIGINT; bit i accumulates
    # +1/-1 per token, and the final word re-packs bit 63 as the sign bit
    # (-2^63) to match Spark's signed LongType.  sum(BIGINT) is HUGEINT in
    # DuckDB, hence the outer CAST.
    "WITH toks AS (SELECT doc_id, "
    " unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok "
    " FROM documents), "
    "h AS (SELECT doc_id, "
    " CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) AS hi, "
    " CAST(concat('0x', substr(md5(tok), 9, 8)) AS BIGINT) AS lo FROM toks), "
    "bits AS (SELECT doc_id, p.i, "
    " SUM(CASE WHEN (CASE WHEN p.i < 32 THEN (lo >> p.i) & 1 "
    "  ELSE (hi >> (p.i - 32)) & 1 END) = 1 THEN 1 ELSE -1 END) AS acc "
    " FROM h, (SELECT unnest(generate_series(0, 63)) AS i) p "
    " GROUP BY doc_id, p.i), "
    "sh AS (SELECT doc_id, CAST(SUM(CASE WHEN acc > 0 THEN "
    " (CASE WHEN i = 63 THEN -9223372036854775808 ELSE (1::BIGINT << i) END) "
    " ELSE 0 END) AS BIGINT) AS simhash FROM bits GROUP BY doc_id) "
    "SELECT d.doc_id, coalesce(sh.simhash, 0) AS simhash "
    "FROM documents d LEFT JOIN sh USING (doc_id)"
)


@register("x_dedup_simhash", _SIMHASH_ORACLE)
def x_dedup_simhash(spark, sf_dir):
    """SimHash-64 per document via Arrow-batched ``mapInPandas``.
    Deterministic: token hashes come from md5, so the DuckDB oracle
    replicates the bit math exactly (md5-hex halves → 32-bit shifts →
    ±1 bit votes → signed-64 repack).  At scale this is one narrow map
    stage — no shuffle."""

    def compute(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = []
            for t in pdf["text"]:
                acc = [0] * 64
                for tok in (t or "").split():
                    h = int.from_bytes(
                        hashlib.md5(tok.encode()).digest()[:8], "big", signed=False)
                    for i in range(64):
                        acc[i] += 1 if (h >> i) & 1 else -1
                v = 0
                for i in range(64):
                    if acc[i] > 0:
                        v |= 1 << i
                # reinterpret as signed 64-bit for Spark LongType
                out.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return table(spark, sf_dir, "documents").select("doc_id", "text").mapInPandas(
        compute, "doc_id long, simhash long")


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------

def _norm_col(c):
    """sqrt of the self-dot left fold — the SAME arithmetic the oracles
    use, so precomputing it per vector (in a projection BELOW the join,
    where Catalyst's CollapseProject cannot merge it into the per-pair
    output projection) changes nothing numerically while cutting the
    per-pair fold work to the dot product alone."""
    return F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


_DUCK_SIM = (
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "q AS (SELECT * FROM e WHERE vec_id < 10), "
    "sims AS (SELECT q.vec_id AS qid, c.vec_id AS cid, "
    " CAST(FLOOR(1e6 * list_sum(list_transform(list_zip(q.v, c.v), x -> x[1] * x[2])) "
    "  / (sqrt(list_sum(list_transform(q.v, x -> x * x))) "
    "   * sqrt(list_sum(list_transform(c.v, x -> x * x))))) AS BIGINT) AS sim_scaled "
    " FROM q, e c WHERE c.vec_id <> q.vec_id) "
)


@register(
    "x_sim_topk",
    _DUCK_SIM +
    "SELECT qid, cid, sim_scaled FROM ("
    " SELECT qid, cid, sim_scaled, row_number() OVER "
    "  (PARTITION BY qid ORDER BY sim_scaled DESC, cid) AS rn FROM sims) "
    "WHERE rn <= 5",
)
def x_sim_topk(spark, sf_dir):
    """Brute-force cosine top-k (k=5) for 10 query vectors — the exact
    baseline ANN.  The query side is tiny and broadcast; the corpus side
    streams once.  Cosine is a fold over ``zip_with`` (pure codegen)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    return exact_cosine_topk(e)


def exact_cosine_topk(e: DataFrame, k: int = 5, n_q: int = 10) -> DataFrame:
    """Exact per-query cosine top-k over any (vec_id, v) frame (queries
    are ``vec_id < n_q``) — the frame-parameterized core of
    ``x_sim_topk``, reused by the whitened-space A/B in pytest."""
    en = e.select("vec_id", "v", _norm_col("v").alias("nv"))
    q = en.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"))
    dot = F.aggregate(F.zip_with("qv", "v", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    sims = (
        en.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            F.floor(1e6 * dot / (F.col("qn") * F.col("nv"))).alias("sim_scaled"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_scaled"), F.asc("cid"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def _sim_lsh_bucketed_oracle_sql() -> str:
    import hashlib

    dims, planes = 64, 8
    bits = []
    for p in range(planes):
        plane = "[" + ", ".join(
            repr((int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16)
                  / 0x7FFFFFFF) - 1.0)
            for d in range(dims)
        ) + "]"
        bits.append(
            "CASE WHEN list_sum(list_transform(list_zip(v, " + plane +
            "), x -> x[1] * x[2])) >= 0 THEN '1' ELSE '0' END"
        )
    bucket = "concat(" + ", ".join(bits) + ")"
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) "
        f"SELECT {bucket} AS bucket, CAST(count(*) AS BIGINT) AS n_vectors "
        "FROM e GROUP BY 1"
    )


@register("x_sim_lsh_bucketed", _sim_lsh_bucketed_oracle_sql())
def x_sim_lsh_bucketed(spark, sf_dir):
    """Scale-path ANN: random-hyperplane LSH bucketing.

    Hyperplanes are deterministic pseudo-random vectors derived from
    md5(plane, dim) so every engine/run agrees — the DuckDB oracle
    recomputes the identical sketch and bucket histogram.  Neighbor
    candidates are only generated within a bucket — at 100 TB this is a
    groupBy on the sketch, not a cross join.  Returns (bucket, n_vectors)
    bucket sizes; the per-bucket top-k refine reuses x_sim_topk's
    cosine."""
    import hashlib

    dims = 64
    planes = 8
    # deterministic hyperplane matrix on the driver (tiny), broadcast as literal
    mat = [
        [
            (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) / 0x7FFFFFFF) - 1.0
            for d in range(dims)
        ]
        for p in range(planes)
    ]
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    bucket = _band_bucket_array([mat])[0]
    return (
        e.select("vec_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


def _lsh_plane_matrix(bands: int, planes: int, dims: int, seed: str = "") -> list:
    """Deterministic pseudo-random hyperplanes: md5(seed+band.plane:dim) →
    a float in [-1, 1).  Driver-side and tiny (bands×planes×dims floats);
    both the Spark plan and the DuckDB oracle embed them as literals, so
    every engine computes bit-identical sketches."""
    import hashlib

    return [
        [
            [
                (int(hashlib.md5(f"{seed}{b}.{p}:{d}".encode()).hexdigest()[:8], 16)
                 / 0x7FFFFFFF) - 1.0
                for d in range(dims)
            ]
            for p in range(planes)
        ]
        for b in range(bands)
    ]


# The synthetic embeddings are near-isotropic (top-5 cosine ≈ 0.33 →
# P(bit agree) ≈ 0.6): 6 bands × 3 planes gives theoretical recall@top5
# ≈ 1-(1-0.6³)⁶ ≈ 0.78 while still pruning ~⅓ of random candidates per
# probe.  Clustered real-world embeddings would use longer bands.
_ANN_BANDS, _ANN_PLANES, _ANN_DIMS = 6, 3, 64
_ANN_MAT = _lsh_plane_matrix(_ANN_BANDS, _ANN_PLANES, _ANN_DIMS)


def _ann_band_sql(b: int, mat: list | None = None, planes: int | None = None) -> str:
    """DuckDB expression for band ``b``'s bucket string; plane literals
    embedded via repr() (shortest round-trip, exact)."""
    mat = _ANN_MAT if mat is None else mat
    planes = _ANN_PLANES if planes is None else planes
    bits = []
    for p in range(planes):
        plane = "[" + ", ".join(repr(x) for x in mat[b][p]) + "]"
        bits.append(
            "CASE WHEN list_sum(list_transform(list_zip(v, " + plane +
            "), x -> x[1] * x[2])) >= 0 THEN '1' ELSE '0' END"
        )
    return "concat(" + ", ".join(bits) + ")"


def _ann_vectors(spark, sf_dir, spread: bool = False) -> DataFrame:
    """Typed (vec_id, v) vectors.  ``spread=True`` repartitions to the
    session's parallelism before compute-dense per-row passes (sketching,
    cell assignment): the test-scale embeddings parquet is a single
    row-group, so without it those narrow maps run on ONE core.  At real
    scale the scan is already many-partition and the tiny extra shuffle
    (id + 64 doubles per row) is noise against the compute it unlocks."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    if spread:
        e = e.repartition(spark.sparkContext.defaultParallelism)
    return e


def _ann_band_bucket(b: int, mat: list | None = None, planes: int | None = None):
    """Spark Column: band ``b``'s bucket string over the ``v`` column."""
    mat = _ANN_MAT if mat is None else mat
    planes = _ANN_PLANES if planes is None else planes
    bits = []
    for p in range(planes):
        plane = F.array(*[F.lit(x) for x in mat[b][p]])
        dot = F.aggregate(F.zip_with(plane, F.col("v"), lambda a, x: a * x),
                          F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _band_bucket_array(mat: list):
    """Spark Column: array of bucket strings, one per band, over ``v``.

    One nested higher-order expression over the whole plane matrix —
    a single dot-fold subtree the runtime loops over bands×planes —
    instead of per-(band,plane) duplicated ``aggregate`` trees, whose
    codegen size grows with bit count (the 8×8=64-bit strict config paid
    ~6 s of compile/eval overhead per run under the per-bit form).  The
    per-plane left fold is arithmetic-identical to
    :func:`_ann_band_bucket`, so sketches stay bit-for-bit equal.

    The matrix literal is built as ONE parsed SQL expression, not
    per-element ``F.lit`` Column algebra: a bands×planes×dims matrix is
    thousands of elements, and each ``F.lit``/``F.array`` is a py4j
    round-trip — the 8×8×64 strict config spent ~3.5 s of *driver* time
    per query just constructing the literal tree that way.  ``repr``
    with a ``D`` suffix round-trips each double exactly."""
    mat_col = F.expr(
        "array(" + ", ".join(
            "array(" + ", ".join(
                "array(" + ", ".join(f"{float(x)!r}D" for x in plane) + ")"
                for plane in band) + ")"
            for band in mat) + ")")
    return F.transform(
        mat_col,
        lambda band: F.array_join(
            F.transform(
                band,
                lambda plane: F.when(
                    F.aggregate(F.zip_with(plane, F.col("v"), lambda a, x: a * x),
                                F.lit(0.0), lambda acc, x: acc + x) >= 0,
                    F.lit("1")).otherwise(F.lit("0"))),
            ""))


def _ann_oracle_sql() -> str:
    """Build the DuckDB oracle for the banded-LSH refined ANN."""
    bcols = ", ".join(f"{_ann_band_sql(b)} AS b{b}" for b in range(_ANN_BANDS))
    bmatch = " OR ".join(f"q.b{b} = c.b{b}" for b in range(_ANN_BANDS))
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"b AS (SELECT vec_id, {bcols} FROM e), "
        "q AS (SELECT * FROM b WHERE vec_id < 10), "
        "cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid "
        f" FROM q JOIN b c ON c.vec_id <> q.vec_id AND ({bmatch})), "
        "sims AS (SELECT qid, cid, "
        " CAST(FLOOR(1e6 * list_sum(list_transform(list_zip(qe.v, ce.v), x -> x[1] * x[2])) "
        "  / (sqrt(list_sum(list_transform(qe.v, x -> x * x))) "
        "   * sqrt(list_sum(list_transform(ce.v, x -> x * x))))) AS BIGINT) AS sim_scaled "
        " FROM cand JOIN e qe ON qe.vec_id = cand.qid JOIN e ce ON ce.vec_id = cand.cid) "
        "SELECT qid, cid, sim_scaled FROM ("
        " SELECT qid, cid, sim_scaled, row_number() OVER "
        "  (PARTITION BY qid ORDER BY sim_scaled DESC, cid) AS rn FROM sims) "
        "WHERE rn <= 5"
    )


@register("x_sim_lsh_refined", _ann_oracle_sql())
def x_sim_lsh_refined(spark, sf_dir):
    """Banded-LSH ANN **with the per-bucket top-k refine** — the scale
    path for similarity search.

    Band-OR candidate generation (a candidate matches the query in at
    least one of the independent hyperplane sketches) then exact cosine
    and a per-query top-5 window over candidates only.  At 100 TB:

    - corpus sketching is one narrow pass (16 literal-plane dot folds,
      pure codegen);
    - the candidate join is keyed on (band, bucket) with the query side
      broadcast — no all-pairs, shuffle fan-in is bucket size;
    - only candidate ids shuffle (dedup), vectors are re-fetched by id
      for the refine, so wide embedding arrays never multiply by band
      count;
    - recall tunes with bands×planes (more bands → higher recall, more
      candidates), asserted against the exact baseline in pytest.
    """
    return lsh_refined_topk(_ann_vectors(spark, sf_dir, spread=True))


def lsh_refined_topk(e: DataFrame, k: int = 5, n_q: int = 10,
                     mat: list | None = None) -> DataFrame:
    """Banded-LSH candidates + exact cosine top-k refine over any
    (vec_id, v) frame — the frame-parameterized core of
    ``x_sim_lsh_refined``, reused by the whitened-space A/B in
    pytest."""
    mat = _ANN_MAT if mat is None else mat

    # narrow (vec_id, band:bucket) form — wide vectors stay behind
    keys = e.select(
        "vec_id", F.posexplode(_band_bucket_array(mat)).alias("band", "bk0"),
    ).select("vec_id", F.concat_ws(":", "band", "bk0").alias("bk"))
    q_keys = (
        keys.filter(F.col("vec_id") < n_q)
        .select(F.col("vec_id").alias("qid"), "bk")
    )
    cand = (
        keys.join(F.broadcast(q_keys), "bk")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"))
        .distinct()
    )

    en = e.select("vec_id", "v", _norm_col("v").alias("nv"))
    qv = en.filter(F.col("vec_id") < n_q).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"))
    dot = F.aggregate(F.zip_with("qv", "v", lambda a, x: a * x),
                      F.lit(0.0), lambda acc, x: acc + x)
    sims = (
        cand.join(en, cand.cid == en.vec_id)
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "cid",
            F.floor(1e6 * dot / (F.col("qn") * F.col("nv"))).alias("sim_scaled"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_scaled"), F.asc("cid"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


# --- IVF (coarse-quantizer) ANN --------------------------------------------
#
# The other classic ANN scale path next to LSH: k-means the corpus into K
# cells, probe the NPROBE nearest cells per query, exact-refine within
# them.  Everything is deterministic so the DuckDB oracle replicates it
# bit-for-bit: init centroids are the means of hash-partitioned groups
# (vec_id % K), one Lloyd iteration refines them, and every centroid is
# quantized to 1e-6 after averaging so both engines' argmin sees identical
# doubles (distributed fp summation order differs; the quantization
# absorbs it).  Ties in the argmin break on cell index.

# nprobe 6/16 measured recall@5 = 0.70 vs the exact baseline on sf0.01
# (3/16 gave 0.56; a coarser K=8 quantizer at the same 38% candidate
# fraction only reaches 0.56 — the finer cells are what buy the recall).
_IVF_K, _IVF_NPROBE, _IVF_DIMS = 16, 6, 64


def _ivf_mean(df: DataFrame) -> dict:
    """(cell, v) rows → {cell: quantized centroid list}.

    posexplode → per-(cell, dim) partial-agg average → reassemble.  The
    collect is K×DIMS floats of model state (like the LSH plane matrix),
    not data."""
    rows = (
        df.select("cell", F.posexplode("v").alias("pos", "x"))
        .groupBy("cell", "pos")
        .agg((F.floor(F.avg("x") * 1e6) / 1e6).alias("val"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("pv"))
        .select("cell", F.transform("pv", lambda s: s["val"]).alias("cv"))
        .collect()
    )
    return {r["cell"]: list(r["cv"]) for r in rows}


def _ivf_cells(cents: dict):
    """Column: array of (squared-L2-dist, cell) structs sorted ascending —
    [0]['cell'] is the assignment, a slice is the probe set.  Built as one
    parsed SQL expression: K×D per-element ``F.lit`` calls are K×D py4j
    round-trips of pure driver overhead (see :func:`_band_bucket_array`)."""
    entries = []
    for cell, cv in sorted(cents.items()):
        arr = "array(" + ", ".join(f"{float(x)!r}D" for x in cv) + ")"
        entries.append(
            f"named_struct('dist', aggregate(zip_with({arr}, v, "
            f"(c, x) -> (x - c) * (x - c)), 0.0D, (acc, x) -> acc + x), "
            f"'cell', {int(cell)})")
    return F.expr("array_sort(array(" + ", ".join(entries) + "))")


def _ivf_oracle_sql() -> str:
    k, nprobe, dims = _IVF_K, _IVF_NPROBE, _IVF_DIMS

    def dist(cv, v):
        return (f"list_sum(list_transform(list_zip({cv}, {v}), "
                "x -> (x[2]-x[1])*(x[2]-x[1])))")

    def mean(src):
        return (
            f"(SELECT cell, list(val ORDER BY pos) AS cv FROM "
            f" (SELECT cell, pos, FLOOR(AVG(v[pos]) * 1e6)/1e6 AS val FROM {src}, "
            f"  (SELECT unnest(generate_series(1, {dims})) AS pos) p "
            f"  GROUP BY cell, pos) GROUP BY cell)"
        )

    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"g0 AS (SELECT vec_id % {k} AS cell, v FROM e), "
        f"cv0 AS {mean('g0')}, "
        "a1 AS (SELECT e.vec_id, e.v, (SELECT c.cell FROM cv0 c "
        f" ORDER BY {dist('c.cv', 'e.v')} ASC, c.cell ASC LIMIT 1) AS cell FROM e), "
        f"cv1 AS {mean('a1')}, "
        "a2 AS (SELECT e.vec_id, e.v, (SELECT c.cell FROM cv1 c "
        f" ORDER BY {dist('c.cv', 'e.v')} ASC, c.cell ASC LIMIT 1) AS cell FROM e), "
        "probes AS (SELECT q.vec_id AS qid, p.cell FROM e q, LATERAL "
        f" (SELECT c.cell FROM cv1 c ORDER BY {dist('c.cv', 'q.v')} ASC, c.cell ASC "
        f"  LIMIT {nprobe}) p WHERE q.vec_id < 10), "
        "cand AS (SELECT DISTINCT probes.qid, a2.vec_id AS cid "
        " FROM probes JOIN a2 USING (cell) WHERE a2.vec_id <> probes.qid), "
        "sims AS (SELECT qid, cid, "
        " CAST(FLOOR(1e6 * list_sum(list_transform(list_zip(qe.v, ce.v), x -> x[1] * x[2])) "
        "  / (sqrt(list_sum(list_transform(qe.v, x -> x * x))) "
        "   * sqrt(list_sum(list_transform(ce.v, x -> x * x))))) AS BIGINT) AS sim_scaled "
        " FROM cand JOIN e qe ON qe.vec_id = cand.qid JOIN e ce ON ce.vec_id = cand.cid) "
        "SELECT qid, cid, sim_scaled FROM ("
        " SELECT qid, cid, sim_scaled, row_number() OVER "
        "  (PARTITION BY qid ORDER BY sim_scaled DESC, cid) AS rn FROM sims) "
        "WHERE rn <= 5"
    )


@register("x_sim_ivf", _ivf_oracle_sql())
def x_sim_ivf(spark, sf_dir):
    """IVF ANN: deterministic k-means coarse quantizer (hash-group init +
    one Lloyd iteration, centroids quantized to 1e-6), NPROBE nearest
    cells per query, exact cosine top-5 refine within the probed cells.

    100 TB shape: centroid training is posexplode + partial-agg means
    (map-side combine shrinks the (cell, dim) shuffle to partitions×K×D
    rows); assignment is a narrow map against K literal centroids; the
    candidate join is keyed on cell with the tiny probe side broadcast —
    no all-pairs.  K scales ~√n and the centroid model stays driver-side
    model state, exactly like a real IVF index build.

    The build is ~5 chained actions (two Lloyd means, two assignments,
    probe/refine); each materialization point is ``localCheckpoint``-ed so
    no action re-executes upstream lineage — in particular the K×D-literal
    distance expression is parsed/codegen'd once per distinct centroid set
    and *evaluated* once per row, not once per downstream action.  That is
    exactly what a real index build does: persist the assignment table.
    BENCH_r05 recorded 15.1 s here because the uncached chain re-ran the
    scan + assignment under every action, which amplifies any executor
    contention ~5x."""
    e = _ann_vectors(spark, sf_dir, spread=True).localCheckpoint()

    cents = _ivf_mean(e.select((F.col("vec_id") % _IVF_K).alias("cell"), "v"))
    a1 = e.select(
        "vec_id", "v", _ivf_cells(cents)[0]["cell"].alias("cell")
    ).localCheckpoint()
    cents = _ivf_mean(a1.select("cell", "v"))
    # One evaluation of the final-centroid distance array serves both the
    # corpus assignment ([0].cell) and the query probe set (slice 1..NPROBE).
    scored = e.select(
        "vec_id", "v", _ivf_cells(cents).alias("cells")
    ).localCheckpoint()
    assigned = scored.select(
        "vec_id", "v", F.col("cells")[0]["cell"].alias("cell"))

    probes = (
        scored.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("qid"),
            F.explode(F.transform(
                F.slice("cells", 1, _IVF_NPROBE),
                lambda s: s["cell"])).alias("cell"),
        )
    )
    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"))
        .distinct()
    )

    en = e.select("vec_id", "v", _norm_col("v").alias("nv"))
    qv = en.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"))
    dot = F.aggregate(F.zip_with("qv", "v", lambda a, x: a * x),
                      F.lit(0.0), lambda acc, x: acc + x)
    sims = (
        cand.join(en, cand.cid == en.vec_id)
        .join(F.broadcast(qv), "qid")
        .select(
            "qid",
            "cid",
            F.floor(1e6 * dot / (F.col("qn") * F.col("nv"))).alias("sim_scaled"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim_scaled"), F.asc("cid"))
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 5).drop("rn")


def kmeans_fit(df: DataFrame, k: int, iters: int = 5):
    """General Lloyd's k-means over a (vec_id, v) frame, Spark-first:
    deterministic hash-group init (``vec_id % k``), then per iteration
    one narrow assignment pass against K×D broadcast literal centroids
    (the :func:`_ivf_cells` expression) and one partial-agg mean —
    centroids quantized to 1e-6 each round so runs are bit-reproducible.
    Returns ``(centroids, assignment)``: the final {cell: vector} dict
    (model state) and the lazily-evaluated (vec_id, v, cell) frame.

    This is the generalized form of the IVF coarse quantizer
    (``x_sim_ivf`` fixes iters=1 and oracles the result); pytest asserts
    the Lloyd invariant — inertia non-increasing across iterations —
    and run-to-run determinism.

    100 TB shape per iteration: assignment is embarrassingly parallel
    (no shuffle, K×D literals ride the closure); the mean is one
    (cell, dim)-keyed partial agg; the driver holds only K×D floats.
    ``localCheckpoint`` truncates the lineage each round, exactly like
    the component propagation loop."""
    cur = df.select("vec_id", "v").localCheckpoint()
    cents = _ivf_mean(cur.select((F.col("vec_id") % k).alias("cell"), "v"))
    for _ in range(iters):
        asg = cur.select(
            "vec_id", "v", _ivf_cells(cents)[0]["cell"].alias("cell")
        ).localCheckpoint()
        # a cell that lost every member keeps its previous centroid
        # (standard empty-cluster handling; also keeps the centroid
        # count stable — the same carryover rule the keyed PQ trainer
        # (pq_train_codebooks) and its DuckDB oracle implement)
        cents = {**cents, **_ivf_mean(asg.select("cell", "v"))}
    asg = cur.select(
        "vec_id", "v", _ivf_cells(cents)[0]["cell"].alias("cell"))
    return cents, asg


def kmeans_inertia(vectors: DataFrame, cents: dict) -> float:
    """Σ min_c ‖v − c‖² over a frame with a ``v`` column — the k-means
    objective Lloyd iterations must not increase (one narrow scan +
    global agg)."""
    dist = _ivf_cells(cents)[0]["dist"]
    return vectors.select(dist.alias("d")).agg(F.sum("d")).collect()[0][0]


@register(
    "x_neg_sample",
    "WITH nd AS (SELECT COUNT(*) AS n FROM documents), "
    "s AS (SELECT doc_id, unnest(generate_series(1, 3)) AS j FROM documents) "
    "SELECT doc_id, j, CASE WHEN raw = doc_id THEN (raw + 1) % n ELSE raw END "
    " AS neg_id FROM ("
    " SELECT doc_id, j, n, CAST(concat('0x', substr(md5(doc_id || ':' || j), "
    "  1, 8)) AS BIGINT) % n AS raw FROM s, nd)",
)
def x_neg_sample(spark, sf_dir):
    """Deterministic negative sampling — the pair-construction step of
    contrastive / embedding training: each document draws 3
    pseudo-random negative partners keyed on md5(doc_id:j), with a
    collision bump when the draw lands on itself.  Content-stable like
    the sampling gates: the same negatives on every engine, run, and
    cluster size — so a training run is reproducible end-to-end.

    100 TB shape: a pure narrow map (explode ×3 + hash arithmetic; the
    corpus count rides in as a broadcast one-row aggregate); the
    subsequent pair-feature join is doc_id-keyed and AQE-planned."""
    docs = table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("_n"))
    s = (docs.select("doc_id")
         .crossJoin(F.broadcast(nd))
         .select("doc_id", "_n",
                 F.explode(F.expr("sequence(1, 3)")).alias("j")))
    raw = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.col("doc_id").cast("string"),
                          F.col("j").cast("string"))), 1, 8), 16, 10)
        .cast("long") % F.col("_n"))
    return s.select(
        "doc_id",
        F.col("j").cast("long").alias("j"),
        F.when(raw == F.col("doc_id"), (raw + 1) % F.col("_n"))
        .otherwise(raw).alias("neg_id"),
    )


#: near-dup cosine threshold, compared as floor(1e6·cos) ≥ this (integer
#: compare — portable across engines)
EMBED_DUP_SIM_SCALED = 300_000


#: strict-tier banding: 8 bands × 8 planes.  On isotropic bulk
#: (P(bit agree) = 0.5) a random pair survives band-OR with
#: 1-(1-0.5⁸)⁸ ≈ 3.1% — the pruning regime LSH dedup lives in at 100 TB.
#: (The 6×3 config above keeps ~55% of pairs on this corpus — it is tuned
#: for the *retrieval* gates, whose threshold sits at bulk similarity.)
_STRICT_BANDS, _STRICT_PLANES = 8, 8
_STRICT_MAT = _lsh_plane_matrix(_STRICT_BANDS, _STRICT_PLANES, _ANN_DIMS, seed="s")

#: strict near-dup threshold: floor(1e6·cos) ≥ 450000.  The synthetic
#: corpus is isotropic with planted near-dups peaking at cos ≈ 0.45-0.51
#: (measured: zero pairs ≥ 0.6 at sf0.01), so 0.45 is the highest
#: threshold with a non-empty result; a production corpus would gate at
#: ~0.9, where the same 8-plane bands recall 1-(1-0.856⁸)⁸ ≈ 93%.
EMBED_DUP_STRICT_SIM_SCALED = 450_000


def _embed_dedup_oracle_sql(bands: int, mat: list, planes: int,
                            threshold: int) -> str:
    bcols = ", ".join(
        f"{_ann_band_sql(b, mat, planes)} AS b{b}" for b in range(bands))
    bmatch = " OR ".join(f"a.b{b} = c.b{b}" for b in range(bands))
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"b AS (SELECT vec_id, {bcols} FROM e), "
        "cand AS (SELECT DISTINCT a.vec_id AS d1, c.vec_id AS d2 "
        f" FROM b a JOIN b c ON a.vec_id < c.vec_id AND ({bmatch})), "
        "sims AS (SELECT d1, d2, "
        " CAST(FLOOR(1e6 * list_sum(list_transform(list_zip(x.v, y.v), t -> t[1] * t[2])) "
        "  / (sqrt(list_sum(list_transform(x.v, t -> t * t))) "
        "   * sqrt(list_sum(list_transform(y.v, t -> t * t))))) AS BIGINT) AS sim_scaled "
        " FROM cand JOIN e x ON x.vec_id = cand.d1 JOIN e y ON y.vec_id = cand.d2) "
        f"SELECT d1, d2, sim_scaled FROM sims WHERE sim_scaled >= {threshold}"
    )


def _embed_band_keys(e: DataFrame, bands: int, mat: list, planes: int) -> DataFrame:
    """(doc_id, band, bk) band keys for every vector — the bucket-join key
    side of embedding dedup (one narrow codegen pass, wide vectors stay
    behind)."""
    return e.select(
        "vec_id", F.posexplode(_band_bucket_array(mat[:bands])).alias("band", "bk"),
    ).select(F.col("vec_id").alias("doc_id"), "band", "bk")


def _embed_dedup(spark, sf_dir, bands: int, mat: list, planes: int,
                 threshold: int) -> DataFrame:
    e = _ann_vectors(spark, sf_dir, spread=True)
    pairs = _bucket_pairs(_embed_band_keys(e, bands, mat, planes))
    en = e.select("vec_id", "v", _norm_col("v").alias("nv"))
    x, y = en.alias("x"), en.alias("y")
    dot = F.aggregate(F.zip_with("xv", "yv", lambda a, t: a * t),
                      F.lit(0.0), lambda acc, t: acc + t)
    return (
        pairs.join(x, pairs.d1 == F.col("x.vec_id"))
        .join(y, pairs.d2 == F.col("y.vec_id"))
        .select(
            "d1", "d2",
            F.col("x.v").alias("xv"), F.col("y.v").alias("yv"),
            F.col("x.nv").alias("xn"), F.col("y.nv").alias("yn"),
        )
        .select(
            "d1", "d2",
            F.floor(1e6 * dot / (F.col("xn") * F.col("yn"))).alias("sim_scaled"),
        )
        .filter(F.col("sim_scaled") >= threshold)
    )


@register("x_dedup_embed",
          _embed_dedup_oracle_sql(_ANN_BANDS, _ANN_MAT, _ANN_PLANES,
                                  EMBED_DUP_SIM_SCALED))
def x_dedup_embed(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — the fifth dedup family
    member (exact / MinHash / SimHash / Jaccard / embedding-cosine).

    Same scale shape as MinHash dedup: hyperplane band keys per vector
    (one narrow codegen pass), bucket-local pair generation from sorted
    collect_list (no self-join, capped against degenerate buckets), then
    exact cosine on the candidate pairs only and a threshold filter.
    All-pairs never materializes; shuffles are keyed by (band, bucket)
    and pair ids.

    NOTE this gate's 6×3-bit banding + bulk-similarity threshold is the
    LSH worst case on the isotropic synthetic corpus (candidate ratio
    ~55%); :func:`x_dedup_embed_strict` demonstrates the pruning regime
    (~3.6% candidates) with the same machinery."""
    return _embed_dedup(spark, sf_dir, _ANN_BANDS, _ANN_MAT, _ANN_PLANES,
                        EMBED_DUP_SIM_SCALED)


@register("x_dedup_embed_strict",
          _embed_dedup_oracle_sql(_STRICT_BANDS, _STRICT_MAT, _STRICT_PLANES,
                                  EMBED_DUP_STRICT_SIM_SCALED))
def x_dedup_embed_strict(spark, sf_dir):
    """Embedding near-dup at a strict threshold with pruning-tuned bands
    (8×8 bits) — the configuration that shows LSH banding actually
    pruning: measured candidate ratio at sf0.01 is 4,498 / 124,750 pairs
    = **3.6%** (asserted < 5% in pytest), vs ~55% for the
    bulk-similarity gate above.  At 100 TB this is the operating point:
    candidates per vector stay O(bucket size), the exact-cosine refine
    touches ~1/30th of the pair space, and recall at a production
    threshold of cos ≥ 0.9 is ≈ 93% by the band-OR formula (this
    corpus's planted dups peak at cos ≈ 0.51, so the gate thresholds at
    0.45 to stay non-empty)."""
    return _embed_dedup(spark, sf_dir, _STRICT_BANDS, _STRICT_MAT,
                        _STRICT_PLANES, EMBED_DUP_STRICT_SIM_SCALED)


def embed_dedup_candidate_ratio(spark, sf_dir, bands: int = _STRICT_BANDS,
                                mat: list | None = None,
                                planes: int = _STRICT_PLANES) -> float:
    """Monitoring helper: fraction of the n·(n−1)/2 pair space that
    survives band-OR candidate generation — the number that decides
    whether LSH dedup is viable at a given corpus/threshold."""
    e = _ann_vectors(spark, sf_dir, spread=True)
    n = e.count()
    n_cand = _bucket_pairs(
        _embed_band_keys(e, bands, _STRICT_MAT if mat is None else mat,
                         planes)).count()
    return n_cand / (n * (n - 1) / 2)


@register(
    "x_embed_quantize",
    "SELECT vec_id, array_to_string(list_transform(embedding::DOUBLE[], "
    " x -> CASE WHEN list_max(embedding::DOUBLE[]) = list_min(embedding::DOUBLE[]) THEN 0 "
    "  ELSE CAST(FLOOR((x - list_min(embedding::DOUBLE[])) * 255 "
    "   / (list_max(embedding::DOUBLE[]) - list_min(embedding::DOUBLE[]))) AS BIGINT) END), "
    " ',') AS q FROM embeddings",
)
def x_embed_quantize(spark, sf_dir):
    """Per-vector min-max uint8 quantization — the storage/serving form a
    training pipeline ships embeddings in (4× smaller than float32).
    Pure codegen array expressions, narrow map, no shuffle; the vector
    is lambda-bound so min/max are computed once per row.  Output is the
    comma-joined code string (scalar, hashable for the oracle compare)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    q = F.expr(
        "transform(array(struct(v AS a, array_min(v) AS mn, array_max(v) AS mx)), s -> "
        " transform(s.a, x -> if(s.mx = s.mn, 0L, "
        "  cast(floor((x - s.mn) * 255 / (s.mx - s.mn)) as bigint))))[0]"
    )
    return e.select("vec_id", F.concat_ws(",", q).alias("q"))


@register(
    "x_embed_norm",
    "SELECT vec_id, CAST(FLOOR(1e6 * sqrt(list_sum(list_transform(embedding::DOUBLE[], "
    "x -> x * x)))) AS BIGINT) AS norm_scaled FROM embeddings",
)
def x_embed_norm(spark, sf_dir):
    """L2 norm per embedding — the array-fold primitive shared by all
    similarity ops, verified exactly."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    return e.select(
        "vec_id",
        F.floor(1e6 * F.sqrt(F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)))
        .alias("norm_scaled"),
    )


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

@register(
    "x_text_stats",
    "SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, "
    "len(list_distinct(string_split(text, ' '))) AS n_types, "
    "CAST(FLOOR(10000.0 * len(list_distinct(string_split(text, ' '))) "
    " / len(string_split(text, ' '))) AS BIGINT) AS ttr_scaled "
    "FROM documents",
)
def x_text_stats(spark, sf_dir):
    """Token count + vocabulary size + type-token ratio (whitespace
    tokenizer, pure codegen)."""
    toks = F.split(F.col("text"), " ")
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_types"),
        F.floor(10000.0 * F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr_scaled"),
    )


@register(
    "x_text_quality",
    "SELECT doc_id, "
    "CAST(FLOOR(10000.0 * len(list_filter(string_split(text, ' '), "
    " x -> x IN ('the', 'a', 'is', 'of'))) / len(string_split(text, ' '))) AS BIGINT) "
    " AS stopword_scaled, "
    "CAST(FLOOR(10000.0 * length(replace(text, ' ', '')) "
    " / len(string_split(text, ' '))) AS BIGINT) AS avg_wordlen_scaled, "
    "CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 2000 THEN 1 ELSE 0 END "
    " AS length_ok "
    "FROM documents",
)
def x_text_quality(spark, sf_dir):
    """Quality scoring: stopword ratio, average word length, length gate —
    the C4/Gopher-style heuristics, all as array expressions."""
    toks = F.split(F.col("text"), " ")
    stop = F.filter(toks, lambda x: x.isin("the", "a", "is", "of"))
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.floor(10000.0 * F.size(stop) / F.size(toks)).alias("stopword_scaled"),
        F.floor(10000.0 * F.length(F.regexp_replace("text", " ", ""))
                / F.size(toks)).alias("avg_wordlen_scaled"),
        F.when(F.size(toks).between(20, 2000), F.lit(1)).otherwise(F.lit(0))
        .alias("length_ok"),
    )


def quality_lr_features(docs: DataFrame) -> DataFrame:
    """(doc_id, x: array<double>, y) training frame for the quality
    classifier: a constant bias plus three normalized text heuristics
    (stopword ratio, average word length / 10, log10 token count / 4 —
    roughly unit-scaled so one learning rate fits), with a
    deterministic weak label: 1 when the document clears BOTH the
    stopword floor and the length gate — the teacher a heuristic
    pipeline would bootstrap a learned filter from."""
    toks = F.split(F.col("text"), " ")
    stop_ratio = (F.size(F.filter(
        toks, lambda x: x.isin("the", "a", "is", "of")))
        / F.size(toks)).cast("double")
    avg_len = (F.length(F.regexp_replace("text", " ", ""))
               / F.size(toks)).cast("double")
    n_tok = F.size(toks).cast("double")
    return docs.select(
        "doc_id",
        F.array(F.lit(1.0), stop_ratio * 10.0, avg_len / 10.0,
                F.log10(n_tok + 1.0)).alias("x"),
        F.when((stop_ratio >= 0.05) & n_tok.between(20, 2000),
               F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
    )


def quality_lr_train(feat: DataFrame, iters: int = 80,
                     lr: float = 1.0) -> tuple[list, list]:
    """Distributed batch-gradient logistic regression — the learned
    quality filter trained the same way as every model in this repo:
    per iteration ONE narrow codegen pass (sigmoid + per-feature
    gradient terms against broadcast literal weights) and ONE
    partial-agg collect of D+1 doubles (gradient + loss); the driver
    holds only the D-vector of weights.  Deterministic: fixed zero
    init, fixed step, fp sums reduced through a high-precision DECIMAL
    so partition order cannot flip the trajectory.

    Returns (weights, per-iteration mean log-losses); pytest asserts
    the loss decreases MONOTONICALLY at the default step (measured
    0.693 → 0.434 over 80 iterations at sf0.01) and the trained filter
    beats the majority-class baseline (0.92 vs 0.58 accuracy).

    100 TB shape: identical per-iteration cost to one aggregation
    query; no Python in the row path, no feature matrix ever
    collected.  (For few-pass training at extreme scale, L-BFGS on the
    same gradient oracle is the standard upgrade — the data-side
    plumbing here is exactly what it would consume.)"""
    d = 4
    w = [0.0] * d
    losses: list[float] = []
    n = feat.count()
    for _ in range(iters):
        wlits = ", ".join(f"{wi!r}D" for wi in w)
        z = F.expr(
            f"aggregate(zip_with(x, array({wlits}), (a, b) -> a * b), "
            "0.0D, (acc, v) -> acc + v)")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = feat.select(
            (p - F.col("y")).alias("err"), "x", "y", p.alias("p"))
        aggs = [
            F.sum((F.col("err") * F.col("x")[i]).cast("decimal(28,12)"))
            .alias(f"g{i}") for i in range(d)
        ] + [
            F.sum((-(F.col("y") * F.log(F.greatest(F.col("p"), F.lit(1e-12)))
                     + (1 - F.col("y"))
                     * F.log(F.greatest(1 - F.col("p"), F.lit(1e-12)))))
                  .cast("decimal(28,12)")).alias("loss")
        ]
        r = row.agg(*aggs).collect()[0]
        w = [w[i] - lr * float(r[f"g{i}"]) / n for i in range(d)]
        losses.append(float(r["loss"]) / n)
    return w, losses


def quality_lr_predict(feat: DataFrame, w: list) -> DataFrame:
    """(doc_id, y, p, pred) scoring pass — one narrow map against the
    broadcast literal weights."""
    wlits = ", ".join(f"{wi!r}D" for wi in w)
    z = F.expr(
        f"aggregate(zip_with(x, array({wlits}), (a, b) -> a * b), "
        "0.0D, (acc, v) -> acc + v)")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feat.select(
        "doc_id", "y", p.alias("p"),
        F.when(p >= 0.5, F.lit(1.0)).otherwise(F.lit(0.0)).alias("pred"))


@register(
    "x_lang_id",
    "SELECT doc_id, lang AS labeled, CASE "
    " WHEN len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'is'))) > 0 "
    " THEN 'en' ELSE 'unk' END AS guess FROM documents",
)
def x_lang_id(spark, sf_dir):
    """Language-ID heuristic (stopword vote).  The synthetic corpus shares
    one vocabulary across its ``lang`` labels, so the guess column mostly
    reads 'en' — the point of the gate is that the heuristic is
    deterministic and engine-portable; swap in per-language marker sets
    for real corpora."""
    toks = F.split(F.col("text"), " ")
    en = F.size(F.filter(toks, lambda x: x.isin("the", "a", "is")))
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("lang").alias("labeled"),
        F.when(en > 0, F.lit("en")).otherwise(F.lit("unk")).alias("guess"),
    )


@register(
    "x_token_bpe",
    "SELECT doc_id, len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) "
    "AS n_bpe FROM documents",
)
def x_token_bpe(spark, sf_dir):
    """BPE-ish token counting: word / number / punctuation split via one
    regex, counted JVM-side."""
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), 0))
        .alias("n_bpe"),
    )


@register(
    "x_bpe_pairs",
    "WITH w AS (SELECT unnest(string_split(text, ' ')) AS word "
    " FROM documents), "
    "wc AS (SELECT word, COUNT(*) AS n FROM w WHERE len(word) > 1 "
    " GROUP BY word), "
    "p AS (SELECT substr(word, i, 2) AS pair, n FROM wc, "
    " LATERAL (SELECT unnest(generate_series(1, len(word) - 1)) AS i) s) "
    "SELECT pair, CAST(SUM(n) AS BIGINT) AS cnt FROM p GROUP BY pair "
    "ORDER BY cnt DESC, pair LIMIT 20",
)
def x_bpe_pairs(spark, sf_dir):
    """The first BPE merge step, distributed — the statistics a
    tokenizer trainer computes over the whole corpus: adjacent
    character-pair frequencies weighted by word frequency (classic BPE
    counts over the distinct-word histogram, not raw text — the
    corpus-size-independent trick), top-20 by count with a
    deterministic pair tie-break.  :func:`bpe_train_merges` iterates
    this to an actual merge list.

    100 TB shape: the word histogram is one partial-agg shuffle whose
    reduced size is the VOCABULARY (many orders below corpus size);
    everything after — pair explode, pair agg, top-k — operates on the
    histogram.  All codegen: substring explode, no Python."""
    docs = table(spark, sf_dir, "documents")
    wc = (docs.select(F.explode(F.split("text", " ")).alias("word"))
          .filter(F.length("word") > 1)
          .groupBy("word").agg(F.count(F.lit(1)).alias("n")))
    pairs = wc.select(
        F.explode(F.expr(
            "transform(sequence(1, length(word) - 1), "
            "i -> substring(word, i, 2))")).alias("pair"),
        "n")
    return (pairs.groupBy("pair").agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("pair")).limit(20))


def bpe_train_merges(docs: DataFrame, n_merges: int = 10) -> list:
    """Distributed BPE training — the real tokenizer-induction loop:
    start from the per-word character sequence over the distinct-word
    histogram, then ``n_merges`` times (a) count adjacent symbol pairs
    weighted by word frequency, (b) pick the most frequent pair
    (deterministic lexicographic tie-break), (c) apply the merge
    left-to-right greedy in every word.  Returns the ordered merge
    list — the artifact a BPE tokenizer ships.

    Spark shapes per iteration, all on the WORD HISTOGRAM (vocabulary-
    sized, not corpus-sized): the pair count is one explode +
    partial-agg; the winner is a driver-side 1-row collect (model
    state, like a k-means centroid); the merge apply is a narrow
    codegen ``aggregate`` fold over each word's symbol array —
    left-to-right greedy exactly like the reference algorithm.
    ``localCheckpoint`` truncates the growing lineage every iteration,
    the same discipline as the component-propagation loop.  pytest
    verifies the merge list against a pure-Python reference BPE."""
    wc = (docs.select(F.explode(F.split("text", " ")).alias("word"))
          .filter(F.length("word") > 0)
          .groupBy("word").agg(F.count(F.lit(1)).alias("n"))
          .select(F.expr("split(word, '')").alias("syms"), "n")
          .localCheckpoint())
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts = (
            wc.filter(F.size("syms") > 1)
            .select(F.explode(F.expr(
                "transform(sequence(1, size(syms) - 1), i -> "
                "struct(element_at(syms, i) AS a, "
                "element_at(syms, i + 1) AS b))")).alias("p"), "n")
            .groupBy("p.a", "p.b").agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1).collect()
        )
        if not pair_counts or pair_counts[0]["cnt"] < 2:
            break
        a, b = pair_counts[0]["a"], pair_counts[0]["b"]
        merges.append((a, b))
        qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
        # CASE branches evaluate lazily, so the empty-acc branch fires
        # before any element_at(-1) (ANSI mode would error on it)
        merged = (
            "aggregate(syms, CAST(array() AS array<string>), (acc, x) -> "
            "CASE WHEN size(acc) = 0 THEN array(x) "
            f"WHEN element_at(acc, -1) = '{qa}' AND x = '{qb}' "
            f"THEN concat(slice(acc, 1, size(acc) - 1), array('{qa}{qb}')) "
            "ELSE concat(acc, array(x)) END)"
        )
        wc = wc.select(F.expr(merged).alias("syms"), "n").localCheckpoint()
    return merges


# ---------------------------------------------------------------------------
# event-time windows
# ---------------------------------------------------------------------------

@register(
    "x_window_tumbling",
    "SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS cnt, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "FROM events GROUP BY 1, 2",
)
def x_window_tumbling(spark, sf_dir):
    """Tumbling 1-hour event-time windows (batch form of the streaming
    windowed aggregation; the streaming twin lives in
    sparkdon/streaming/windows.py)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").start.alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


@register(
    "x_window_sessionize",
    "WITH gaps AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
    " (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE "
    " OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL "
    " THEN 1 ELSE 0 END AS new_session FROM events) "
    "SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions FROM gaps "
    "GROUP BY user_id",
)
def x_window_sessionize(spark, sf_dir):
    """Sessionization (30-min inactivity gap) via window functions — the
    batch equivalent of session_window/applyInPandasWithState."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts may arrive as TIMESTAMP or TIMESTAMP_NTZ depending on how the
    # parquet annotates it (Spark 4 infers NTZ for untagged micros);
    # NTZ cannot cast straight to BIGINT, but NTZ -> TIMESTAMP -> BIGINT
    # is legal and, with the session tz pinned to UTC, value-identical.
    sec = F.col("ts").cast("timestamp").cast("long")
    gap = sec - F.lag(sec).over(w)
    new_session = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    return (
        e.withColumn("ns", new_session)
        .groupBy("user_id")
        .agg(F.sum("ns").cast("long").alias("n_sessions"))
    )


# ---------------------------------------------------------------------------
# skew-salted aggregation gate (operators/skew.py wired to an oracle)
# ---------------------------------------------------------------------------

@register(
    "x_salted_census",
    "SELECT event_type, count(*) AS cnt, "
    "CAST(sum(CAST(FLOOR(100 * value) AS BIGINT)) AS BIGINT) AS cents, "
    "min(event_id) AS min_event, max(event_id) AS max_event "
    "FROM events GROUP BY event_type",
)
def x_salted_census(spark, sf_dir):
    """Two-phase salted aggregation over the deliberately skewed
    ``events`` table — the hot-key mitigation itself is oracle-gated
    (plain == salted is additionally asserted in pytest).  Sums run on
    floor-scaled integers so partial-merge order cannot perturb the
    result."""
    from sparkdon.operators.skew import salted_agg

    e = table(spark, sf_dir, "events").withColumn(
        "cents_in", F.floor(100 * F.col("value")).cast("long"))
    return salted_agg(
        e,
        ["event_type"],
        {
            "cnt": ("count", "event_id"),
            "cents": ("sum", "cents_in"),
            "min_event": ("min", "event_id"),
            "max_event": ("max", "event_id"),
        },
    )


# ---------------------------------------------------------------------------
# streaming gate (round 6): dedup_stream driven to a parquet sink
# ---------------------------------------------------------------------------

def _stream_scratch(kind: str, sf_dir: str) -> str:
    """Deterministic scratch dir for a streaming gate, wiped on every
    invocation — repeated correctness/bench runs reuse one directory per
    (gate, sf_dir, pid) instead of accumulating mkdtemp junk in /tmp.
    The pid component keeps concurrent processes over the same fixture
    (e.g. pytest alongside a driver correctness run) from wiping each
    other's checkpoint/sink mid-query; within one process, runs are
    serial, so reuse is safe."""
    import hashlib as _hl
    import os
    import shutil
    import tempfile

    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"sparkdon_{kind}_{_hl.md5(sf_dir.encode()).hexdigest()[:12]}"
        f"_{os.getpid()}")
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)
    return out_dir


@register(
    "x_dedup_stream",
    "SELECT DISTINCT user_id, event_type FROM events",
)
def x_dedup_stream(spark, sf_dir):
    """Oracle gate for the streaming exact-dedup plan
    (streaming/windows.py dedup_stream): the events fixture is read as a
    file-source stream, deduped with ``dropDuplicatesWithinWatermark``,
    materialized to parquet via ``foreachBatch`` under
    ``Trigger.AvailableNow``, and the materialized result is returned for
    the DuckDB compare.

    Determinism: AvailableNow without ``maxFilesPerTrigger`` processes
    the fixture as ONE micro-batch, so no key's state can expire
    mid-stream and the emitted set is exactly the distinct keys —
    order-free and oracle-expressible.  The *incremental* semantics
    (cross-batch state, watermark expiry, first-arrival row retention)
    are pytest-covered in tests/test_skew_stateful.py, where arrival
    order is controlled; they are not SQL-expressible, which is why this
    gate projects to the key columns.

    100 TB shape: dedup state is one entry per key bounded by the
    watermark horizon; foreachBatch writes are executor-side parquet
    appends — nothing passes through the driver."""
    import os

    from sparkdon.streaming.windows import dedup_stream

    out_dir = _stream_scratch("dedup_stream", sf_dir)
    target = os.path.join(out_dir, "out")
    src = f"{sf_dir}/events.parquet"
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)  # exact on-disk types
        # the file source needs a directory; glob-filter to the events
        # file so sibling tables in the sf dir are not swept in
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        # the fixture's untagged micros arrive as TIMESTAMP_NTZ, which
        # watermarks reject; NTZ -> TIMESTAMP is value-identical with the
        # session tz pinned to UTC (same note as x_window_sessionize)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = dedup_stream(stream, keys=("user_id", "event_type"))
    q = (
        deduped.select("user_id", "event_type")
        .writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(target))
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.read.parquet(target)


@register(
    "x_window_stream",
    "SELECT date_trunc('hour', ts) AS bucket, event_type, COUNT(*) AS cnt, "
    "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value "
    "FROM events GROUP BY 1, 2",
)
def x_window_stream(spark, sf_dir):
    """Oracle gate for the streaming tumbling-window aggregation
    (streaming/windows.py tumbling_counts): events stream through the
    file source into watermarked 1-hour windows; ``complete`` output mode
    hands foreachBatch the full aggregate at every trigger, the final
    trigger's snapshot is what lands in parquet (overwrite) and feeds the
    DuckDB compare — identical result shape to the batch twin
    ``x_window_tumbling``.

    ``value`` is pre-cast to DECIMAL(18,2) so the sum is order-exact
    across engines (same trick as the batch gate: double summation order
    differs between Spark partial aggs and DuckDB)."""
    import os

    from sparkdon.streaming.windows import tumbling_counts

    out_dir = _stream_scratch("window_stream", sf_dir)
    target = os.path.join(out_dir, "out")
    src = f"{sf_dir}/events.parquet"
    stream = (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("value", F.col("value").cast("decimal(18,2)"))
    )
    agg = tumbling_counts(stream)
    q = (
        agg.writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("overwrite").parquet(target))
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.read.parquet(target).select(
        "bucket", "event_type", "cnt",
        F.col("sum_value").cast("double").alias("sum_value"))


def _events_stream(spark, sf_dir):
    """File-source stream over the events fixture with ``ts`` cast to a
    watermarkable TIMESTAMP (shared by the streaming gates; see the NTZ
    note on x_dedup_stream).

    SINGLE-BATCH INGESTION IS PINNED: the fixture is one parquet file
    and no ``maxFilesPerTrigger`` is set, so ``Trigger.AvailableNow``
    processes everything in one micro-batch.  The watermark-bearing
    gates rely on this — with multiple batches a 1-hour watermark could
    evict state between batches and drop late rows the batch oracles
    keep (correct streaming semantics, but a different answer).  If the
    fixture ever splits into multiple files, the oracles must model
    eviction or the watermark must widen past the fixture's time span."""
    src = f"{sf_dir}/events.parquet"
    return (
        spark.readStream.format("parquet")
        .schema(spark.read.parquet(src).schema)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def _await_stream(q, timeout_s: int = 300) -> None:
    """awaitTermination with the timeout made LOUD: a False return
    means the query is still running — reading its sink now would
    surface as a confusing partial-value mismatch downstream, so stop
    the query and raise instead (round-7 advisor finding)."""
    if not q.awaitTermination(timeout_s):
        q.stop()
        raise TimeoutError(
            f"streaming query '{q.name or q.id}' did not finish within "
            f"{timeout_s}s; sink contents would be partial")


def _run_complete_snapshot(df, kind: str, sf_dir: str):
    """Drive a streaming aggregation to its final snapshot: complete
    output mode → foreachBatch parquet overwrite under AvailableNow, so
    the last trigger's full state is what the oracle compares.  Returns
    the materialized DataFrame."""
    import os

    out_dir = _stream_scratch(kind, sf_dir)
    target = os.path.join(out_dir, "out")
    q = (
        df.writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("overwrite").parquet(target))
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    spark = df.sparkSession
    _await_stream(q)
    return spark.read.parquet(target)


@register(
    "x_sliding_stream",
    # same derivation as the batch twin x_window_sliding: each event
    # covers exactly two 10-minute windows hopping every 5
    "SELECT CAST(to_timestamp(bucket_s) AS TIMESTAMP) AS bucket, COUNT(*) AS cnt FROM ("
    " SELECT unnest([floor(epoch(ts) / 300) * 300, "
    "  floor(epoch(ts) / 300) * 300 - 300]) AS bucket_s FROM events) "
    "GROUP BY bucket_s",
)
def x_sliding_stream(spark, sf_dir):
    """Oracle gate for the streaming sliding-window aggregation
    (streaming/windows.py ``sliding_rates``): watermarked 10-minute
    windows hopping every 5, driven to the final complete-mode snapshot
    via foreachBatch under ``Trigger.AvailableNow`` — the same recipe as
    ``x_window_stream``, closing the batch/streaming gate gap for the
    sliding shape (the batch twin is ``x_window_sliding``).

    100 TB shape: state is (window)-keyed partial counts bounded by the
    watermark horizon; each event routes to exactly window/slide = 2
    state keys."""
    from sparkdon.streaming.windows import sliding_rates

    return _run_complete_snapshot(
        sliding_rates(_events_stream(spark, sf_dir)),
        "sliding_stream", sf_dir)


@register(
    "x_session_stream",
    # gaps-and-islands twin of Spark's session_window merge rule: a new
    # session starts when the gap STRICTLY exceeds 30 minutes (an
    # exactly-30-minute gap merges — probed empirically and pinned by
    # tests/test_skew_stateful.py::test_session_window_boundary);
    # session_end = last event + gap
    "WITH brk AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER "
    " (PARTITION BY user_id ORDER BY ts) IS NULL OR "
    " ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
    "  > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM events), "
    "grp AS (SELECT user_id, ts, SUM(new_s) OVER (PARTITION BY user_id "
    " ORDER BY ts ROWS UNBOUNDED PRECEDING) AS g FROM brk) "
    "SELECT MIN(ts) AS session_start, "
    "MAX(ts) + INTERVAL 30 MINUTE AS session_end, "
    "user_id, COUNT(*) AS cnt FROM grp GROUP BY user_id, g",
)
def x_session_stream(spark, sf_dir):
    """Oracle gate for streaming session windows (streaming/windows.py
    ``session_windows``): per-user 30-minute-inactivity-gap sessions via
    ``F.session_window``, final complete-mode snapshot compared against
    a DuckDB gaps-and-islands reconstruction (lag + cumulative-sum over
    the strict-gap breaks) — the whole merge rule is verified, not just
    counts (the batch count-only twin is ``x_window_sessionize``).

    100 TB shape: session state is one (user, open-window) entry,
    merged/expired by the watermark — the canonical stateful-streaming
    shape; the batch oracle is a two-pass window function, also one
    shuffle on user_id."""
    from sparkdon.streaming.windows import session_windows

    return _run_complete_snapshot(
        session_windows(_events_stream(spark, sf_dir)),
        "session_stream", sf_dir)


#: Gopher/MassiveText duplicate-bigram keep threshold, scaled by 1e4
#: (shared by x_text_repetition and the x_corpus_keep capstone — one
#: definition, both Spark expressions and both DuckDB oracles)
REPETITION_DUP_SCALED = 3000

#: Spark: word-bigram array per document, lambda-bound so the text
#: tokenizes once per row
_BIGRAMS_EXPR = (
    "transform(array(split(text, ' ')), t -> "
    " transform(if(size(t) >= 2, sequence(1, size(t) - 1), array()), "
    "  i -> concat_ws(' ', element_at(t, i), element_at(t, i+1))))[0]"
)

#: DuckDB twin of :data:`_BIGRAMS_EXPR` over a token-list column ``t``
_DUCK_BIGRAMS = (
    "CASE WHEN len(t) >= 2 THEN list_transform(generate_series(1, len(t) - 1), "
    " i -> concat_ws(' ', t[i], t[i+1])) ELSE [] END"
)


def _rep_bad_spark(n, d):
    """Repetition-threshold predicate over gram count / distinct count."""
    return (n > 0) & (10000.0 * (n - d) / n >= REPETITION_DUP_SCALED)


def _duck_rep_bad(g: str) -> str:
    return (f"len({g}) > 0 AND 10000.0 * (len({g}) - "
            f"len(list_distinct({g}))) / len({g}) >= {REPETITION_DUP_SCALED}")


@register(
    "x_text_repetition",
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    f"g AS (SELECT doc_id, {_DUCK_BIGRAMS} AS grams FROM toks) "
    "SELECT doc_id, len(grams) AS n_bigrams, "
    "len(list_distinct(grams)) AS n_distinct, "
    "CASE WHEN len(grams) > 0 THEN CAST(FLOOR(10000.0 * (len(grams) - "
    " len(list_distinct(grams))) / len(grams)) AS BIGINT) ELSE 0 END "
    " AS dup_scaled, "
    f"CASE WHEN {_duck_rep_bad('grams')} THEN 0 ELSE 1 END AS keep "
    "FROM g",
)
def x_text_repetition(spark, sf_dir):
    """Within-document repetition filter (the Gopher/MassiveText
    duplicate-n-gram heuristic): fraction of repeated word bigrams per
    document, with a keep flag at the 30 % threshold.  Pure codegen array
    expressions — the token array is lambda-bound so the text tokenizes
    once per row; a narrow map, no shuffle at all.  Ratios compare as
    scaled floors (engine-portable, same convention as the other text
    gates)."""
    docs = table(spark, sf_dir, "documents")
    g = docs.select("doc_id", F.expr(_BIGRAMS_EXPR).alias("grams"))
    n = F.size("grams")
    d = F.size(F.array_distinct("grams"))
    dup = F.when(n > 0, F.floor(10000.0 * (n - d) / n)).otherwise(F.lit(0))
    return g.select(
        "doc_id",
        n.cast("long").alias("n_bigrams"),
        d.cast("long").alias("n_distinct"),
        dup.cast("long").alias("dup_scaled"),
        F.when(_rep_bad_spark(n, d), F.lit(0))
        .otherwise(F.lit(1)).cast("long").alias("keep"),
    )


@register(
    "x_vocab_topk",
    "SELECT tok, COUNT(*) AS cnt FROM (SELECT unnest(string_split(text, ' ')) "
    "AS tok FROM documents) GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20",
)
def x_vocab_topk(spark, sf_dir):
    """Corpus vocabulary heavy hitters: explode tokens → count → top-20
    (ties broken on the token for determinism).

    100 TB shape: the canonical word count — map-side partial aggregation
    shrinks the shuffle to one row per (partition, distinct token), and
    ORDER+LIMIT compiles to TakeOrderedAndProject (each partition
    contributes its local top-20; no global sort materializes)."""
    return (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(20)
    )


def _min_label_components(nodes: DataFrame, pairs: DataFrame,
                          max_iters: int = 50) -> DataFrame:
    """Connected components by min-label propagation (HashMin) with
    pointer jumping: every node takes the minimum label among itself and
    its neighbors, then labels are shortcut through one level of
    indirection (``lab := label(lab)``) so information travels 2^k hops
    after k rounds — O(log diameter) rounds instead of O(diameter), the
    property that keeps chain-shaped components from serializing the job
    at scale.  Returns (node, rep).

    Per iteration: two join shuffles keyed on node id + one partial-agg
    min — the same bounded-lineage pattern as the path fixpoints
    (``localCheckpoint`` truncates per round, convergence is one count
    action).  The full large-star/small-star algorithm would also shrink
    the *edge* set per round; for LSH dup graphs (tiny dense clusters)
    the edge set is already small relative to the corpus, so label-side
    jumping is where the rounds go."""
    edges = (
        pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b"))
        .union(pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b")))
    ).localCheckpoint()
    labels = nodes.select(F.col("node"), F.col("node").alias("lab")).localCheckpoint()
    changed = -1
    for _ in range(max_iters):
        nbr = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a").agg(F.min("lab").alias("nbr_lab"))
        )
        merged = labels.join(nbr, labels.node == nbr.a, "left").select(
            "node",
            F.least(F.col("lab"), F.coalesce("nbr_lab", F.col("lab"))).alias("lab"),
        )
        # pointer jumping: shortcut each label to its label's label
        hop = merged.select(F.col("node").alias("jnode"), F.col("lab").alias("jlab"))
        merged = (
            merged.join(hop, merged.lab == hop.jnode, "left")
            .select("node", F.least("lab", F.coalesce("jlab", "lab")).alias("lab"))
        ).localCheckpoint()
        changed = (
            merged.alias("m").join(labels.alias("l"), "node")
            .filter(F.col("m.lab") != F.col("l.lab")).limit(1).count()
        )
        labels = merged
        if changed == 0:
            break
    if changed != 0:
        # never return silently-wrong components: an unconverged label
        # frame would emit wrong representatives with no error signal
        from sparkdon.errors import SparkdonError

        raise SparkdonError(
            f"connected components did not converge within {max_iters} "
            "pointer-jumping rounds (graph diameter > 2^max_iters is not "
            "plausible — this indicates a bug or a pathological edge set)")
    return labels.select("node", F.col("lab").alias("rep"))


#: connected-components frame memo, keyed on (Spark application, sf_dir):
#: in a real pipeline the component table is computed ONCE and consumed
#: by every downstream stage; the memo models exactly that when several
#: gates run in one session (bench, correctness battery) while each gate
#: stays self-contained for the driver.  Safe because the gates are
#: read-only over fixed fixtures, and the application id in the key
#: prevents a stale frame from leaking across sessions.
_COMPONENTS_MEMO: dict[tuple[str, str], DataFrame] = {}


def _doc_components(spark, sf_dir: str) -> DataFrame:
    """(node, rep) connected components of the MinHash-LSH candidate
    graph over ``documents`` — the shared input of ``x_dedup_clusters``
    and ``x_corpus_keep``.  The result is a localCheckpoint-backed frame
    (one row per document), so reuse costs no recomputation."""
    key = (spark.sparkContext.applicationId, sf_dir)
    comp = _COMPONENTS_MEMO.get(key)
    if comp is None:
        docs = table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("node"))
        pairs = _bucket_pairs(_minhash_bands(spark, sf_dir))
        comp = _min_label_components(docs, pairs)
        _COMPONENTS_MEMO[key] = comp
    return comp


@register(
    "x_dedup_clusters",
    "WITH RECURSIVE "
    + _DUCK_BANDS[len("WITH "):] +
    ", pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a "
    "  JOIN bands b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id), "
    "edges AS (SELECT d1 AS a, d2 AS b FROM pairs "
    "  UNION SELECT d2, d1 FROM pairs), "
    "reach(node, lab) AS ("
    "  SELECT doc_id, doc_id FROM documents "
    "  UNION "
    "  SELECT e.a, r.lab FROM edges e JOIN reach r ON r.node = e.b) "
    "SELECT node AS doc_id, MIN(lab) AS cluster_rep, "
    "CASE WHEN node = MIN(lab) THEN 1 ELSE 0 END AS keep "
    "FROM reach GROUP BY node",
)
def x_dedup_clusters(spark, sf_dir):
    """Duplicate-cluster resolution — the step that turns near-dup PAIRS
    into keep/drop decisions: connected components over the MinHash-LSH
    candidate graph, representative = min doc_id per component, keep the
    representative and drop the rest.  Singletons keep themselves.

    The DuckDB oracle computes the same components with a recursive CTE
    (min reachable id over the undirected edge set), so the whole
    pairs → components → keep-list pipeline is verified end-to-end.

    100 TB shape: the pair graph is already bucket-local and capped
    (never all-pairs); propagation shuffles (node, lab) ids only, with
    map-side-combined mins, and each round's lineage is truncated.  The
    keep-list join back to the corpus is a broadcast when the dup set is
    small — the common regime — or an id-keyed shuffle otherwise."""
    comp = _doc_components(spark, sf_dir)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("rep").alias("cluster_rep"),
        F.when(F.col("node") == F.col("rep"), F.lit(1)).otherwise(F.lit(0))
        .cast("long").alias("keep"),
    )


@register(
    "x_dedup_priority",
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
    "ranked AS (SELECT c.doc_id, c.rep, "
    " CAST(substr(d.source, 4) AS BIGINT) AS src_rank, "
    " row_number() OVER (PARTITION BY c.rep "
    "  ORDER BY CAST(substr(d.source, 4) AS BIGINT), c.doc_id) AS rn "
    " FROM comp c JOIN documents d USING (doc_id)) "
    "SELECT doc_id, rep AS cluster_rep, src_rank, "
    "CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep "
    "FROM ranked",
)
def x_dedup_priority(spark, sf_dir):
    """Source-priority duplicate resolution — the keep rule real web
    pipelines use instead of min-id: within each near-dup cluster keep
    the document from the most TRUSTED source (curated beats crawled),
    breaking ties on doc_id.  Here source priority is the fixture's
    numeric suffix (src0 highest); swap in any rank table.  Differs
    from ``x_dedup_clusters`` exactly when a cluster's min-id doc is
    not its best-source doc — the practice that keeps the Wikipedia
    copy over the CommonCrawl mirror.

    100 TB shape: the component frame is the shared memoized
    propagation; the only additions are a doc-keyed join to fetch
    (source) and ONE rep-keyed window — both id+rank rows only, and the
    window partitions by cluster (bounded groups), never globally."""
    comp = _doc_components(spark, sf_dir)
    src = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("substring(source, 4)").cast("long").alias("src_rank"))
    j = (comp.select(F.col("node").alias("doc_id"),
                     F.col("rep").alias("cluster_rep"))
         .join(src, "doc_id"))
    w = Window.partitionBy("cluster_rep").orderBy(
        F.asc("src_rank"), F.asc("doc_id"))
    return (j.withColumn("rn", F.row_number().over(w))
            .select("doc_id", "cluster_rep", "src_rank",
                    F.when(F.col("rn") == 1, F.lit(1)).otherwise(F.lit(0))
                    .cast("long").alias("keep")))


@register(
    "x_split_by_cluster",
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
    "comp AS (SELECT node AS doc_id, MIN(lab) AS rep FROM reach GROUP BY node) "
    "SELECT doc_id, rep AS cluster_rep, "
    "CAST(CAST(concat('0x', substr(md5('split:' || rep), 1, 8)) AS BIGINT) "
    " % 10000 AS BIGINT) AS draw, "
    "CASE WHEN CAST(concat('0x', substr(md5('split:' || rep), 1, 8)) AS BIGINT) "
    "  % 10000 < 9000 THEN 'train' "
    " WHEN CAST(concat('0x', substr(md5('split:' || rep), 1, 8)) AS BIGINT) "
    "  % 10000 < 9500 THEN 'val' ELSE 'test' END AS split "
    "FROM comp",
)
def x_split_by_cluster(spark, sf_dir):
    """Leakage-safe train/val/test split — the assignment step every
    training pipeline needs before writing shards: the split is drawn
    per near-dup CLUSTER (deterministic md5 draw on the component
    representative's id, 90/5/5), and every member inherits its
    cluster's split — so two near-duplicate documents can never land
    on opposite sides of a train/test boundary and leak eval answers
    into training.  Content-keyed and engine-portable like the other
    sampling gates: the same document lands in the same split on every
    run, engine, and cluster size.

    100 TB shape: reuses the memoized component frame (id-only
    propagation, shared with ``x_dedup_clusters`` / ``x_corpus_keep``);
    the draw and split label are one narrow codegen map over it —
    nothing new shuffles.  The oracle recomputes components via the
    recursive CTE and the identical md5 arithmetic."""
    comp = _doc_components(spark, sf_dir)
    draw = (F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit("split"),
                          F.col("rep").cast("string"))), 1, 8), 16, 10)
        .cast("long") % 10000)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("rep").alias("cluster_rep"),
        draw.alias("draw"),
        F.when(draw < 9000, F.lit("train"))
        .when(draw < 9500, F.lit("val"))
        .otherwise(F.lit("test")).alias("split"),
    )


@register(
    "x_event_percentiles",
    "SELECT event_type, COUNT(*) AS cnt, "
    "CAST(FLOOR(1e4 * quantile_cont(value, 0.5)) AS BIGINT) AS p50_scaled, "
    "CAST(FLOOR(1e4 * quantile_cont(value, 0.95)) AS BIGINT) AS p95_scaled, "
    "CAST(FLOOR(1e4 * quantile_cont(value, 0.99)) AS BIGINT) AS p99_scaled "
    "FROM events GROUP BY event_type",
)
def x_event_percentiles(spark, sf_dir):
    """Exact latency-style percentiles per event type (p50/p95/p99 with
    linear interpolation — Spark ``percentile`` and DuckDB
    ``quantile_cont`` implement the same estimator, so the oracle matches
    on scaled floors).

    At 100 TB exact percentiles are the wrong tool — this gate is the
    *correctness baseline* for the sketch path: swap in
    ``percentile_approx`` (t-digest) per group at scale, validated
    against this exact twin on samples."""
    e = table(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5, 0.95, 0.99))")
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), pct.alias("p"))
        .select(
            "event_type", "cnt",
            F.floor(1e4 * F.col("p")[0]).alias("p50_scaled"),
            F.floor(1e4 * F.col("p")[1]).alias("p95_scaled"),
            F.floor(1e4 * F.col("p")[2]).alias("p99_scaled"),
        )
    )


@register(
    "x_sample_stratified",
    "SELECT lang, COUNT(*) AS n_sampled, MIN(doc_id) AS first_doc "
    "FROM documents "
    "WHERE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    " AS BIGINT) % 100 < 10 "
    "GROUP BY lang",
)
def x_sample_stratified(spark, sf_dir):
    """Deterministic ~10% Bernoulli sample, reported per language
    stratum: the selection key is md5(doc_id) — content-stable, so the
    SAME rows are sampled on every engine, every run, every cluster size
    (unlike ``df.sample``'s partition-dependent RNG).  This is how a
    training pipeline carves held-out/eval slices reproducibly.

    Narrow map + one partial-agg shuffle; the md5 gate pushes no rows
    through Python."""
    d = table(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("long") % 100
    return (
        d.filter(bucket < 10)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_sampled"),
             F.min("doc_id").alias("first_doc"))
    )


@register(
    "x_sample_exact_k",
    "SELECT doc_id, lang FROM ("
    " SELECT doc_id, lang, row_number() OVER (PARTITION BY lang "
    "  ORDER BY md5('k:' || doc_id), doc_id) AS rn FROM documents) "
    "WHERE rn <= 20",
)
def x_sample_exact_k(spark, sf_dir):
    """Exact-k per-stratum sampling — 'exactly 20 documents per
    language', the eval-slice carve a rate-based Bernoulli gate cannot
    promise (its stratum counts are binomial).  Selection order is the
    md5 of the salted doc_id — a deterministic uniform permutation, so
    the chosen k are content-stable across engines, runs, and cluster
    sizes, and growing the corpus only displaces rows at the hash
    boundary.

    100 TB shape: one window per stratum key (bounded groups — lang
    cardinality, not corpus); Catalyst's window-group-limit rewrite
    (``InferWindowGroupLimit``, the rank-limit pushdown — plan-asserted
    in tests/test_pipeline.py) turns the ``rn <= 20`` filter into a
    partial top-k per partition before the shuffle; nothing global.  For heavily
    skewed strata the rank-over-hash is still a single shuffle of
    (lang, hash, id) triples — the document bodies never move."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("k:"), F.col("doc_id").cast("string"))),
        F.asc("doc_id"))
    return (d.select("doc_id", "lang")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 20).drop("rn"))


@register(
    "x_asof_join",
    "WITH l AS (SELECT event_id, user_id, ts FROM events "
    " WHERE event_type = 'purchase'), "
    "r AS (SELECT user_id, ts FROM events WHERE event_type = 'view') "
    "SELECT l.event_id, l.user_id, epoch_us(l.ts) AS purchase_tus, "
    "epoch_us(r.ts) AS view_tus "
    "FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts < l.ts",
)
def x_asof_join(spark, sf_dir):
    """As-of join — each purchase matched to the user's most recent
    strictly-earlier view (the feature-engineering staple Spark lacks as
    a native join type; DuckDB's native ASOF JOIN is the oracle).

    Implemented as the scalable union+window pattern rather than a range
    join: tag left/right rows, union, and take a running ``max`` of the
    right-side timestamp over an event-time window bounded at -1 µs —
    one shuffle on user_id and an in-partition sort, no join blow-up.
    At 100 TB this is exactly the plan you want: the state per user is
    one running value, the same shape a stream-stream as-of would keep,
    and skewed users split cleanly under AQE because the window is an
    aggregation, not an expanding join."""
    e = table(spark, sf_dir, "events").withColumn(
        "tus", F.unix_micros(F.col("ts").cast("timestamp")))
    # explicit side tag — discriminating on event_id nullability would
    # silently drop a left row whose event_id happens to be NULL
    left = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "tus", "event_id", F.lit(True).alias("is_left"),
        F.lit(None).cast("long").alias("r_tus"))
    right = e.filter(F.col("event_type") == "view").select(
        "user_id", "tus", F.lit(None).cast("long").alias("event_id"),
        F.lit(False).alias("is_left"), F.col("tus").alias("r_tus"))
    u = left.unionByName(right)
    w = (
        Window.partitionBy("user_id").orderBy("tus")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    return (
        u.withColumn("view_tus", F.max("r_tus").over(w))
        .filter(F.col("is_left"))
        .select(
            "event_id", "user_id",
            F.col("tus").alias("purchase_tus"),
            "view_tus",
        )
    )


@register(
    "x_window_sliding",
    # 10-minute windows sliding every 5: each event lands in exactly two
    # windows (start = 5-min floor, and 5 minutes before that)
    "SELECT CAST(to_timestamp(bucket_s) AS TIMESTAMP) AS bucket, COUNT(*) AS cnt FROM ("
    " SELECT unnest([floor(epoch(ts) / 300) * 300, "
    "  floor(epoch(ts) / 300) * 300 - 300]) AS bucket_s FROM events) "
    "GROUP BY bucket_s",
)
def x_window_sliding(spark, sf_dir):
    """Sliding (hopping) windows, batch form of streaming
    ``sliding_rates``: 10-minute windows every 5 minutes —
    ``F.window(ts, '10 minutes', '5 minutes')`` explodes each event into
    its two covering windows; one partial-agg shuffle on the window
    start.  The DuckDB oracle derives the same two window starts
    arithmetically."""
    e = table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w").start.alias("bucket"), "cnt")
    )


#: training sequence length for document packing (shared by
#: ``x_pack_sequences`` and the packing capstone ``x_corpus_pack``)
PACK_SEQ_LEN = 512


def _prefix_pack(spark, d: DataFrame) -> DataFrame:
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
    wl = Window.partitionBy("b").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1)
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


# ---------------------------------------------------------------------------
# PII scrub + benchmark decontamination (the Dolma/FineWeb-style cleanup
# stages a training pipeline runs after dedup)
# ---------------------------------------------------------------------------

#: portable between Java regex (Spark) and RE2-ish (DuckDB): char
#: classes, \d, \b, bounded repetition only
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

#: deterministic PII injection — the synthetic corpus carries no PII, so
#: both engines append the same synthetic identifiers (keyed on doc_id)
#: before scrubbing; the gate then verifies detection AND redaction
#: byte-for-byte via md5 of the scrubbed text
_PII_INJECT_SPARK = (
    "concat(text, CASE CAST(doc_id % 5 AS INT) "
    " WHEN 0 THEN concat(' contact user', doc_id, '@example.com now') "
    " WHEN 1 THEN ' call 555-123-4567 today' "
    " WHEN 2 THEN ' from 10.0.200.77 addr' "
    " ELSE '' END)"
)
_PII_INJECT_DUCK = (
    "concat(text, CASE doc_id % 5 "
    " WHEN 0 THEN concat(' contact user', doc_id, '@example.com now') "
    " WHEN 1 THEN ' call 555-123-4567 today' "
    " WHEN 2 THEN ' from 10.0.200.77 addr' "
    " ELSE '' END)"
)


@register(
    "x_pii_scrub",
    f"WITH p AS (SELECT doc_id, {_PII_INJECT_DUCK} AS t FROM documents) "
    "SELECT doc_id, "
    f"len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_emails, "
    f"len(regexp_extract_all(t, '{_PII_PHONE}')) AS n_phones, "
    f"len(regexp_extract_all(regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g'), "
    f" '{_PII_IP}')) AS n_ips, "
    f"md5(regexp_replace(regexp_replace(regexp_replace(t, "
    f" '{_PII_EMAIL}', '<EMAIL>', 'g'), "
    f" '{_PII_PHONE}', '<PHONE>', 'g'), "
    f" '{_PII_IP}', '<IP>', 'g')) AS scrub_md5 "
    "FROM p",
)
def x_pii_scrub(spark, sf_dir):
    """PII detection + redaction (the scrub pass a training pipeline
    runs before anything ships): count emails / phone numbers / IPv4
    addresses and replace each with a typed token.  The corpus is
    synthetic, so both engines first append the SAME deterministic
    identifiers keyed on doc_id — the oracle then verifies detection
    counts and the redacted text byte-for-byte (md5), i.e. the regex
    semantics agree across engines, not just the row plumbing.

    IP counting runs after email redaction (an address inside an email
    host must not double-count) — mirrored exactly in the oracle.

    100 TB shape: a pure narrow map — three regexp_replace passes inside
    whole-stage codegen, no shuffle, no Python."""
    p = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PII_INJECT_SPARK).alias("t"))
    no_email = F.regexp_replace("t", _PII_EMAIL, "<EMAIL>")
    scrub = F.regexp_replace(
        F.regexp_replace(no_email, _PII_PHONE, "<PHONE>"),
        _PII_IP, "<IP>")
    return p.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_PII_EMAIL), 0))
        .cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PII_PHONE), 0))
        .cast("long").alias("n_phones"),
        F.size(F.regexp_extract_all(no_email, F.lit(_PII_IP), 0))
        .cast("long").alias("n_ips"),
        F.md5(scrub.cast("binary")).alias("scrub_md5"),
    )


#: 8-word grams for decontamination (long enough that overlap means
#: shared phrasing, short enough that the tiny-vocabulary fixture
#: produces real hits)
_G8_SPARK = (
    "transform(array(split(text, ' ')), t -> "
    " transform(if(size(t) >= 8, sequence(1, size(t) - 7), array()), "
    "  i -> concat_ws(' ', element_at(t, i), element_at(t, i+1), "
    "   element_at(t, i+2), element_at(t, i+3), element_at(t, i+4), "
    "   element_at(t, i+5), element_at(t, i+6), element_at(t, i+7))))[0]"
)
_G8_DUCK = (
    "CASE WHEN len(t) >= 8 THEN list_transform(generate_series(1, len(t) - 7), "
    " i -> concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], "
    "  t[i+6], t[i+7])) ELSE [] END"
)


@register(
    "x_contamination",
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    f"g AS (SELECT doc_id, unnest({_G8_DUCK}) AS gram FROM toks), "
    "b AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0), "
    "h AS (SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_hit FROM g "
    " JOIN b USING (gram) WHERE g.doc_id % 97 <> 0 GROUP BY g.doc_id) "
    "SELECT d.doc_id, COALESCE(h.n_hit, 0) AS n_hit, "
    "CASE WHEN COALESCE(h.n_hit, 0) > 0 THEN 1 ELSE 0 END AS contaminated "
    "FROM documents d LEFT JOIN h USING (doc_id) WHERE d.doc_id % 97 <> 0",
)
def x_contamination(spark, sf_dir):
    """Benchmark decontamination (the Dolma/GPT-3-style n-gram overlap
    check): flag training documents sharing any 8-word gram with the
    held-out benchmark set — here the deterministic ~1 % slice
    ``doc_id % 97 = 0`` stands in for the benchmark corpus.  Output: one
    row per non-benchmark document with its overlapping-gram count and
    the contaminated flag.

    100 TB shape: the benchmark gram set is small and BROADCAST into a
    hash semi-join against the exploded corpus grams — the corpus never
    shuffles; at extreme benchmark sizes the broadcast becomes a bloom
    filter (``spark.sql.optimizer.runtime.bloomFilter``) with exact
    confirmation on the survivors.  The gram explode is a narrow map."""
    docs = table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", F.explode(F.expr(_G8_SPARK)).alias("gram"))
    bench = (grams.filter(F.col("doc_id") % 97 == 0)
             .select("gram").distinct())
    hits = (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_hit"))
    )
    return (
        docs.filter(F.col("doc_id") % 97 != 0).select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.when(F.coalesce("n_hit", F.lit(0)) > 0, 1).otherwise(0)
            .cast("long").alias("contaminated"),
        )
    )


#: Bloom geometry for the decontamination twin: 2^20 bits (128 KiB
#: packed) and 5 hash draws.  At the production regime (~10 bits/gram
#: for the benchmark set) the false-positive rate is ~1 %; size m to
#: the benchmark gram count, the corpus size is irrelevant.
BLOOM_M_BITS = 1 << 20
BLOOM_K = 5


def _bloom_positions(gram_col) -> F.Column:
    """array<long> of BLOOM_K bit positions for a gram — independent
    xxhash64 draws (gram salted with the draw index), pure JVM-side
    codegen so the hot corpus path never touches Python."""
    return F.array(*[
        F.pmod(F.xxhash64(gram_col, F.lit(i)), F.lit(BLOOM_M_BITS))
        for i in range(BLOOM_K)
    ])


def bloom_build(grams: DataFrame, col: str = "gram"):
    """Distributed Bloom-filter build: explode each gram's BLOOM_K bit
    positions, distinct them (bounded by m, not by gram count), and
    pack the collected positions into a uint8 bitset driver-side —
    BLOOM_M_BITS/8 bytes of model state, like the IVF centroids."""
    import numpy as np

    pos = (grams.select(F.explode(_bloom_positions(F.col(col))).alias("p"))
           .distinct().collect())
    bits = np.zeros(BLOOM_M_BITS, dtype=bool)
    bits[[r["p"] for r in pos]] = True
    return np.packbits(bits)


def bloom_decontaminate(spark, sf_dir) -> DataFrame:
    """The 100 TB decontamination path — Bloom twin of the exact
    ``x_contamination`` gate (same benchmark slice, same 8-grams): the
    benchmark gram set is compressed into a broadcast bitset instead of
    a broadcast hash set, and every corpus gram probes it.  By
    construction there are NO false negatives (every exactly-
    contaminated document is flagged); false positives are the ~1 %
    price, and the standard production topology confirms survivors with
    the exact join — which then touches only the flagged sliver.

    Not oracle-gated (the bitset is engine-specific, the same standing
    as the HLL/t-digest twins); pytest asserts the superset property
    and the false-positive budget against the exact gate.

    100 TB shapes: build cost is keyed by the BENCHMARK size (the small
    side) and collapses to ≤ m distinct positions; the corpus-side
    probe is a narrow pass — positions in codegen, the bitset lookup
    Arrow-vectorized per batch (a (n × k) numpy gather, never per-row
    Python); nothing about the corpus ever shuffles."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    docs = table(spark, sf_dir, "documents")
    grams = docs.select("doc_id", F.explode(F.expr(_G8_SPARK)).alias("gram"))
    bench = (grams.filter(F.col("doc_id") % 97 == 0)
             .select("gram").distinct())
    packed = bloom_build(bench)
    bc = spark.sparkContext.broadcast(packed)

    @pandas_udf("boolean")
    def might_contain(pos_s):
        import pandas as pd

        bits = np.unpackbits(bc.value).astype(bool)
        if not len(pos_s):
            return pd.Series([], dtype=bool)
        P = np.stack(pos_s.to_numpy())
        return pd.Series(bits[P].all(axis=1))

    corpus = (grams.filter(F.col("doc_id") % 97 != 0)
              .select("doc_id", _bloom_positions(F.col("gram")).alias("pos")))
    hits = (corpus.filter(might_contain("pos"))
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_maybe")))
    return (
        docs.filter(F.col("doc_id") % 97 != 0).select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_maybe", F.lit(0)).cast("long").alias("n_maybe"),
            F.when(F.coalesce("n_maybe", F.lit(0)) > 0, 1).otherwise(0)
            .cast("long").alias("contaminated"),
        )
    )


def event_percentiles_approx(spark, sf_dir, accuracy: int = 10000) -> DataFrame:
    """The 100 TB percentile path: ``percentile_approx`` (t-digest
    sketch) per event type — mergeable, bounded-memory, one partial-agg
    shuffle.  Not oracle-gated (the sketch is engine-specific and its
    merge order is plan-dependent); instead pytest asserts it against
    the exact twin ``x_event_percentiles`` within sketch tolerance."""
    e = table(spark, sf_dir, "events")
    pct = F.percentile_approx("value", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)),
                              F.lit(accuracy))
    return (
        e.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), pct.alias("p"))
        .select(
            "event_type", "cnt",
            F.col("p")[0].alias("p50"), F.col("p")[1].alias("p95"),
            F.col("p")[2].alias("p99"),
        )
    )


@register(
    "x_topk_per_lang",
    "SELECT lang, doc_id, n_chars FROM ("
    " SELECT lang, doc_id, n_chars, row_number() OVER "
    "  (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn "
    " FROM documents) WHERE rn <= 3",
)
def x_topk_per_lang(spark, sf_dir):
    """Top-k per group (3 longest documents per language): the
    rank-within-partition pattern — one shuffle on the group key, sort
    within partitions, early-out at rn <= 3.  Deterministic tie-break on
    doc_id."""
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        table(spark, sf_dir, "documents")
        .select("lang", "doc_id", "n_chars",
                F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# passage-level dedup, semantic dedup, product quantization, stream joins
# ---------------------------------------------------------------------------

#: passage granularity for chunk-level exact dedup: consecutive
#: non-overlapping token windows (the whitespace-token analogue of the
#: CCNet/RefinedWeb line-level dedup — the fixture has no newlines)
CHUNK_TOKENS = 10


def _chunk_expr(n: int = CHUNK_TOKENS) -> str:
    """Spark SQL expression: the text column's consecutive
    non-overlapping ``n``-token chunk array (lambda-bound so the text
    tokenizes once per row).  Shared by :func:`x_chunk_dedup` and its
    invariant test so the chunking rule has exactly one definition."""
    return (
        "transform(array(split(text, ' ')), t -> "
        " transform(if(size(t) >= 1, sequence(1, cast(ceil(size(t) / "
        f"{n}.0) as int)), array()), "
        f" i -> concat_ws(' ', slice(t, (i-1)*{n}+1, {n}))))[0]"
    )


@register(
    "x_chunk_dedup",
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    "cl AS (SELECT doc_id, list_transform("
    f" generate_series(1, CAST(ceil(len(t) / {CHUNK_TOKENS}.0) AS BIGINT)), "
    f" i -> array_to_string(t[(i-1)*{CHUNK_TOKENS}+1 : i*{CHUNK_TOKENS}], ' ')) AS cs "
    " FROM toks), "
    "ch AS (SELECT doc_id, unnest(generate_series(1, len(cs))) AS ci, "
    " unnest(cs) AS chunk FROM cl), "
    "k AS (SELECT doc_id, ci, chunk, row_number() OVER "
    " (PARTITION BY chunk ORDER BY doc_id, ci) AS rn FROM ch) "
    "SELECT doc_id, COUNT(*) AS n_chunks, "
    "CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
    "md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY ci), "
    " '')) AS clean_md5 FROM k GROUP BY doc_id",
)
def x_chunk_dedup(spark, sf_dir):
    """Passage-level exact dedup (the line-dedup pass of CCNet /
    RefinedWeb, at 10-token chunk granularity since the fixture has no
    newlines): split every document into consecutive non-overlapping
    token chunks, keep only the globally FIRST occurrence of each chunk
    (ordered by doc_id, then position), and reassemble the cleaned
    text.  Output per document: chunk count, kept count, and the md5 of
    the reassembled text — the oracle verifies the reassembly
    byte-for-byte, so chunking, the keep rule, and the ordered
    re-concatenation are all checked.

    100 TB shape: exactly two shuffles — one on the chunk string (the
    dedup key; map-side distinct-ish combine does not apply, but the
    row_number window is a single hash partition by chunk with tiny
    per-group fan-in), one back on doc_id for reassembly.  Chunk
    strings are bounded (≤ ~10 tokens), so the shuffle rows stay small;
    heavy boilerplate chunks (the 100 TB analogue: license headers)
    concentrate into single groups whose cost is group size, and AQE
    skew-split handles the pathological ones."""
    docs = table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id", F.posexplode(F.expr(_chunk_expr())).alias("p", "chunk")
    ).select("doc_id", (F.col("p") + 1).alias("ci"), "chunk")
    w = Window.partitionBy("chunk").orderBy("doc_id", "ci")
    k = ch.withColumn("rn", F.row_number().over(w))
    kept = F.when(F.col("rn") == 1, F.struct("ci", "chunk"))
    return k.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long")
        .alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept)),
                            lambda s: s["chunk"]),
                " ",
            ).cast("binary")
        ).alias("clean_md5"),
    )


@register(
    "x_cross_dedup",
    _DUCK_BANDS +
    "SELECT n.doc_id, "
    "CAST(COUNT(DISTINCT r.doc_id) AS BIGINT) AS n_ref_hits, "
    "CAST(CASE WHEN COUNT(r.doc_id) > 0 THEN 1 ELSE 0 END AS BIGINT) "
    " AS is_dup "
    "FROM (SELECT * FROM bands WHERE doc_id % 97 <> 0) n "
    "LEFT JOIN (SELECT * FROM bands WHERE doc_id % 97 = 0) r "
    " ON n.band = r.band AND n.bk = r.bk "
    "GROUP BY n.doc_id",
)
def x_cross_dedup(spark, sf_dir):
    """Cross-corpus near-dup screening — the incremental-ingestion
    batch story: every NEW document (here the doc_id % 97 ≠ 0 slice)
    is checked for MinHash band collisions against a REFERENCE corpus
    (the % 97 = 0 slice standing in for 'what we already trained on'),
    WITHOUT any new-vs-new pairing.  The near-dup complement of exact
    8-gram ``x_contamination``, and the batch twin of the
    streaming-vs-static band join (streaming/neardup.py).  Output per
    new doc: distinct reference docs collided with, and the dup flag.

    100 TB shape: both sides reduce to (band, bk) keys before joining —
    signatures are 4 band rows/doc regardless of text size; the
    reference side's band index is small (and in the real topology
    PRECOMPUTED once, stored bucketed on (band, bk), and reused by
    every ingest batch) so the join broadcasts; the new corpus never
    self-joins, so ingest cost is linear in the batch."""
    bands = _minhash_bands(spark, sf_dir)
    new = bands.filter(F.col("doc_id") % 97 != 0)
    ref = (bands.filter(F.col("doc_id") % 97 == 0)
           .select(F.col("doc_id").alias("ref_id"), "band", "bk"))
    hits = (new.join(F.broadcast(ref), ["band", "bk"], "left")
            .groupBy("doc_id")
            .agg(F.countDistinct("ref_id").alias("n_ref_hits")))
    return hits.select(
        "doc_id",
        F.col("n_ref_hits").cast("long").alias("n_ref_hits"),
        F.when(F.col("n_ref_hits") > 0, 1).otherwise(0).cast("long")
        .alias("is_dup"))


#: a chunk present in at least this many DISTINCT documents is
#: boilerplate (the fixture's planted cross-doc chunks top out at 6
#: docs; production corpora use line-frequency bars like RefinedWeb's)
BOILERPLATE_DF = 3


@register(
    "x_boilerplate",
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    "cl AS (SELECT doc_id, list_transform("
    f" generate_series(1, CAST(ceil(len(t) / {CHUNK_TOKENS}.0) AS BIGINT)), "
    f" i -> array_to_string(t[(i-1)*{CHUNK_TOKENS}+1 : i*{CHUNK_TOKENS}], ' ')) AS cs "
    " FROM toks), "
    "ch AS (SELECT doc_id, unnest(generate_series(1, len(cs))) AS ci, "
    " unnest(cs) AS chunk FROM cl), "
    "dfq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS d FROM ch GROUP BY chunk), "
    "k AS (SELECT ch.doc_id, ch.ci, ch.chunk, "
    f" CASE WHEN dfq.d >= {BOILERPLATE_DF} THEN 1 ELSE 0 END AS bp "
    " FROM ch JOIN dfq USING (chunk)) "
    "SELECT doc_id, COUNT(*) AS n_chunks, "
    "CAST(SUM(bp) AS BIGINT) AS n_removed, "
    "md5(COALESCE(string_agg(CASE WHEN bp = 0 THEN chunk END, ' ' ORDER BY ci), "
    " '')) AS clean_md5 FROM k GROUP BY doc_id",
)
def x_boilerplate(spark, sf_dir):
    """Boilerplate removal — the OTHER line-frequency pass real web
    pipelines run next to keep-first chunk dedup: a chunk occurring in
    ≥ ``BOILERPLATE_DF`` distinct documents (license headers, nav bars,
    cookie banners) is removed from EVERY document, first occurrence
    included — ubiquity means it carries no training signal anywhere.
    Keep-first dedup (``x_chunk_dedup``) would still train on one copy;
    this pass trains on none.  Output per document: chunk count,
    removed count, and the md5 of the reassembled text, so the oracle
    verifies chunking, the frequency rule, and the ordered
    re-concatenation byte-for-byte.

    100 TB shape: the chunk document-frequency table is one
    (chunk)-keyed partial agg (map-side combine collapses per-partition
    repeats); the verdict joins back chunk-keyed — both shuffles carry
    ≤ 10-token strings; reassembly re-shuffles on doc_id.  The df table
    at the boilerplate threshold is TINY (only ubiquitous chunks
    matter), so at scale the join flips to a broadcast of just the
    over-threshold chunk set — a one-line `.filter` change the
    docstring documents rather than hides: here the full join keeps the
    gate's n_chunks accounting oracle-comparable."""
    docs = table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id", F.posexplode(F.expr(_chunk_expr())).alias("p", "chunk")
    ).select("doc_id", (F.col("p") + 1).alias("ci"), "chunk")
    dfq = ch.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("d"))
    k = ch.join(dfq, "chunk").withColumn(
        "bp", F.when(F.col("d") >= BOILERPLATE_DF, 1).otherwise(0))
    kept = F.when(F.col("bp") == 0, F.struct("ci", "chunk"))
    return k.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("bp").cast("long").alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept)),
                            lambda s: s["chunk"]),
                " ",
            ).cast("binary")
        ).alias("clean_md5"),
    )


#: semantic-dedup similarity threshold — same scaled-cosine bar as the
#: strict embedding near-dup tier (the fixture's planted dups peak at
#: cos ≈ 0.51; a production corpus would gate at ~0.9)
SEMANTIC_DUP_SIM_SCALED = EMBED_DUP_STRICT_SIM_SCALED

_DUCK_L2 = ("list_sum(list_transform(list_zip({a}, {b}), "
            "x -> (x[2]-x[1])*(x[2]-x[1])))")

_DUCK_COS_SCALED = (
    "CAST(FLOOR(1e6 * list_sum(list_transform(list_zip({a}, {b}), t -> t[1]*t[2])) "
    " / (sqrt(list_sum(list_transform({a}, t -> t*t))) "
    "  * sqrt(list_sum(list_transform({b}, t -> t*t))))) AS BIGINT)"
)


def _semantic_dedup_oracle_sql() -> str:
    dist = _DUCK_L2.format(a="c.cv", b="e.v")
    cos = _DUCK_COS_SCALED.format(a="ex.v", b="ey.v")
    return (
        "WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), "
        "cv AS (SELECT cell, list(val ORDER BY pos) AS cv FROM ("
        " SELECT label AS cell, pos, FLOOR(AVG(v[pos]) * 1e6)/1e6 AS val FROM e, "
        "  (SELECT unnest(generate_series(1, 64)) AS pos) p "
        " GROUP BY label, pos) GROUP BY cell), "
        "a AS (SELECT e.vec_id, e.v, (SELECT c.cell FROM cv c "
        f" ORDER BY {dist} ASC, c.cell ASC LIMIT 1) AS cluster FROM e), "
        "p AS (SELECT x.vec_id AS d1, y.vec_id AS d2 FROM a x "
        " JOIN a y ON x.cluster = y.cluster AND x.vec_id < y.vec_id), "
        "s AS (SELECT DISTINCT d2 FROM p "
        " JOIN e ex ON ex.vec_id = p.d1 JOIN e ey ON ey.vec_id = p.d2 "
        f" WHERE {cos} >= {SEMANTIC_DUP_SIM_SCALED}) "
        "SELECT a.vec_id, a.cluster, "
        "CASE WHEN s.d2 IS NULL THEN 1 ELSE 0 END AS kept "
        "FROM a LEFT JOIN s ON a.vec_id = s.d2"
    )


@register("x_semantic_dedup", _semantic_dedup_oracle_sql())
def x_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic deduplication: cluster the embedding
    space, then drop any vector whose cosine to an EARLIER vector in
    the same cluster exceeds the near-dup bar — clustering bounds the
    pair space (the whole point of SemDeDup: intra-cluster pairs only,
    never corpus²).

    Clustering here is one deterministic assignment step: centroids are
    the per-``label`` means (quantized to 1e-6 so both engines hold
    bit-identical model state — the same trick as the IVF coarse
    quantizer), and every vector is assigned to its nearest centroid by
    squared L2 (ties to the smaller cell).  Assignment is verified by
    the oracle, not assumed from the label column.

    100 TB shape: K×D centroids broadcast as literals into a narrow
    codegen assignment pass; pair generation is bucket-local per
    cluster (sorted collect_list, capped — reusing the LSH candidate
    machinery with cluster as the bucket key); the final keep bit is
    one left anti lookup.  Nothing quadratic in the corpus.

    CAP GUARD: the gate RAISES if any cluster exceeds
    ``MINHASH_BUCKET_CAP`` — its oracle enumerates ALL intra-cluster
    pairs, so a silently capped Spark side would diverge exactly when
    the fixture grows (the round-7 advisor finding).  With the
    fixture's fixed-K label centroids, cluster size grows with the
    corpus, so past ~1000 vectors/cluster the operator needs MORE
    CLUSTERS, not a bigger cap — SemDeDup's own design rule.
    ``semantic_overflow_clusters`` is the monitoring twin;
    :func:`routed_semantic_pairs` is the production path that keeps
    going instead of raising — it re-clusters overflowed cells at
    higher K, the same monitor-then-route pattern as
    ``routed_minhash_pairs``."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).repartition(spark.sparkContext.defaultParallelism)
    cents = _ivf_mean(
        e.select(F.col("label").alias("cell"), "v"))
    asg = e.select(
        "vec_id", "v",
        _ivf_cells(cents)[0]["cell"].alias("cluster"))
    n_over = (asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") > MINHASH_BUCKET_CAP).count())
    if n_over:
        raise ValueError(
            f"x_semantic_dedup: {n_over} cluster(s) exceed the "
            f"pair-generation cap ({MINHASH_BUCKET_CAP}) — the gate's "
            "all-intra-cluster-pairs oracle would silently diverge. "
            "Raise the cluster count (SemDeDup's scaling rule) or use "
            "routed_semantic_pairs, the production path that re-clusters "
            "overflowed cells at higher K.")
    pairs = _bucket_pairs(
        asg.select(F.col("vec_id").alias("doc_id"),
                   F.lit(0).alias("band"),
                   F.col("cluster").alias("bk")))
    en = asg.select("vec_id", "v", _norm_col("v").alias("nv"))
    x, y = en.alias("x"), en.alias("y")
    dot = F.aggregate(F.zip_with("xv", "yv", lambda a, t: a * t),
                      F.lit(0.0), lambda acc, t: acc + t)
    dropped = (
        pairs.join(x, pairs.d1 == F.col("x.vec_id"))
        .join(y, pairs.d2 == F.col("y.vec_id"))
        .select(
            "d2",
            F.col("x.v").alias("xv"), F.col("y.v").alias("yv"),
            F.col("x.nv").alias("xn"), F.col("y.nv").alias("yn"),
        )
        .select("d2", F.floor(1e6 * dot / (F.col("xn") * F.col("yn")))
                .alias("sim_scaled"))
        .filter(F.col("sim_scaled") >= SEMANTIC_DUP_SIM_SCALED)
        .select("d2").distinct()
    )
    return (
        asg.join(dropped, asg.vec_id == dropped.d2, "left")
        .select(
            "vec_id", "cluster",
            F.when(F.col("d2").isNull(), 1).otherwise(0).cast("int")
            .alias("kept"),
        )
    )


def semantic_overflow_clusters(spark, sf_dir,
                               cap: int = MINHASH_BUCKET_CAP) -> DataFrame:
    """Monitoring twin of :func:`x_semantic_dedup`: the (cluster,
    n_vecs) rows whose size exceeds the pair-generation cap — non-empty
    means the clustering is too coarse for this corpus and the operator
    must raise the cluster count (SemDeDup's scaling rule), because
    those clusters' members are silently reported kept=1."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    cents = _ivf_mean(e.select(F.col("label").alias("cell"), "v"))
    return (
        e.select(_ivf_cells(cents)[0]["cell"].alias("cluster"))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .filter(F.col("n_vecs") > cap)
    )


def routed_semantic_pairs(asg: DataFrame,
                          cap: int = MINHASH_BUCKET_CAP) -> DataFrame:
    """Semantic-dedup candidate pairs with the overflow fallback WIRED
    IN — the production counterpart of the loud guard in
    ``x_semantic_dedup`` and the semantic twin of
    :func:`routed_minhash_pairs`.  Input: a (vec_id, v, cluster)
    assignment frame.

    Clusters within the cap pair up bucket-locally as before.  Clusters
    OVER the cap are re-clustered at higher K — SemDeDup's scaling rule
    applied locally: each overflowed cluster is split into
    ``ceil(2·n/cap)`` subclusters by one deterministic mini-Lloyd round
    (hash-group init on vec_id, per-(cluster, sub, dim) partial-agg
    means quantized to 1e-6, re-assignment by squared L2 with sub
    tie-break), and pairs are generated within (cluster, sub).  Unlike
    the gate's literal-centroid assignment, the split is join-based —
    sub-centroids stay a DataFrame keyed (cluster, sub), so ANY number
    of clusters can overflow without driver state.

    Last-resort star fallback: a subcluster still over the cap after
    the split is almost always an identical-embedding pile (every
    member at cosine 1, so all are dups of the first) — exactly like
    MinHash's exact-text piles.  Those members pair star-wise to their
    bucket's min-id on the EXACT vector bytes, linear in pile size.
    Near-identical (but not byte-equal) members of a still-overflowed
    subcluster are the one recall loss, surfaced by
    ``semantic_overflow_clusters`` for operator follow-up.

    100 TB shapes: sizes are one partial agg; the split touches ONLY
    overflow docs (one posexplode agg + one dist join bounded by
    docs × subcells-per-cluster ≈ 2·n/cap per doc); pair generation
    stays bucket-local and capped everywhere."""
    sizes = asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    base = _bucket_pairs(
        asg.select(F.col("vec_id").alias("doc_id"),
                   F.lit(0).alias("band"),
                   F.col("cluster").alias("bk")), cap)
    over = sizes.filter(F.col("n") > cap)
    od = (asg.join(F.broadcast(over), "cluster")
          .withColumn("sub0", F.pmod(F.col("vec_id"),
                                     F.ceil(F.lit(2.0) * F.col("n") / cap)
                                     .cast("long")))
          .localCheckpoint())
    subcents = (
        od.select("cluster", "sub0", F.posexplode("v").alias("pos", "x"))
        .groupBy("cluster", "sub0", "pos")
        .agg((F.floor(F.avg("x") * 1e6) / 1e6).alias("val"))
        .groupBy("cluster", "sub0")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("pv"))
        .select("cluster", F.col("sub0").alias("sub"),
                F.transform("pv", lambda s: s["val"]).alias("cv"))
    )
    dist = F.aggregate(F.zip_with("v", "cv", lambda a, c: (a - c) * (a - c)),
                       F.lit(0.0), lambda acc, t: acc + t)
    wsub = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("sub"))
    split = (
        od.join(subcents, "cluster")
        .select("vec_id", "v", "cluster", "sub", dist.alias("d"))
        .withColumn("rn", F.row_number().over(wsub))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cluster", "sub")
    )
    sub_pairs = _bucket_pairs(
        split.select(F.col("vec_id").alias("doc_id"),
                     F.col("cluster").alias("band"),
                     F.col("sub").alias("bk")), cap)
    still = (split.groupBy("cluster", "sub")
             .agg(F.count(F.lit(1)).alias("n"))
             .filter(F.col("n") > cap)
             .select("cluster", "sub"))
    piles = (split.join(still, ["cluster", "sub"])
             .select("vec_id",
                     F.md5(F.to_json(F.struct("v"))).alias("vh")))
    wpile = Window.partitionBy("vh")
    star = (
        piles.withColumn("d1", F.min("vec_id").over(wpile))
        .filter(F.col("vec_id") != F.col("d1"))
        .select("d1", F.col("vec_id").alias("d2"))
    )
    return base.unionByName(sub_pairs).unionByName(star).distinct()


#: product quantization geometry: 64 dims → 8 subspaces × 8 dims, 16
#: codebook entries per subspace (codes fit one nibble; a 64-dim float32
#: vector compresses 256 B → 4 B, the 100 TB serving form)
PQ_M, PQ_SUB, PQ_K = 8, 8, 16


def _pq_oracle_sql() -> str:
    m, sub, k = PQ_M, PQ_SUB, PQ_K
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"cb AS (SELECT vec_id AS j, v AS cv FROM e WHERE vec_id < {k}), "
        f"ms AS (SELECT unnest(generate_series(0, {m - 1})) AS m), "
        "d AS (SELECT e.vec_id, ms.m, cb.j, "
        " CAST(FLOOR(1e6 * list_sum(list_transform(list_zip("
        f"  e.v[ms.m*{sub}+1 : ms.m*{sub}+{sub}], "
        f"  cb.cv[ms.m*{sub}+1 : ms.m*{sub}+{sub}]), "
        "  t -> (t[1]-t[2])*(t[1]-t[2])))) AS BIGINT) AS dist "
        " FROM e, ms, cb), "
        "best AS (SELECT vec_id, m, j FROM ("
        " SELECT vec_id, m, j, row_number() OVER "
        "  (PARTITION BY vec_id, m ORDER BY dist, j) AS rn FROM d) WHERE rn = 1) "
        "SELECT vec_id, string_agg(j::VARCHAR, ',' ORDER BY m) AS codes "
        "FROM best GROUP BY vec_id"
    )


def _pq_codebook(e: DataFrame) -> list:
    """The deterministic PQ training sample: the first PQ_K vectors by
    vec_id.  K×D doubles of model state (like the LSH plane matrix and
    the IVF centroids), not data."""
    rows = (e.filter(F.col("vec_id") < PQ_K)
            .select("vec_id", "v").collect())
    return [list(r["v"]) for r in sorted(rows, key=lambda r: r["vec_id"])]


def _pq_code_expr(cb: list) -> F.Column:
    """Comma-joined string form of :func:`_pq_codes_array_expr` (scalar,
    hashable for the oracle compare)."""
    return F.array_join(
        F.transform(_pq_codes_array_expr(cb), lambda c: c.cast("string")),
        ",")


def _pq_sub_rows(e: DataFrame) -> DataFrame:
    """(vec_id, m, sv) — every subspace slice of every vector in ONE
    narrow pass (posexplode of an array of slices), so keyed training
    scans the corpus once instead of once per subspace."""
    slices = F.array(*[
        F.expr(f"slice(v, {m * PQ_SUB + 1}, {PQ_SUB})")
        for m in range(PQ_M)
    ])
    return e.select("vec_id", F.posexplode(slices).alias("m", "sv"))


def _pq_keyed_mean(df: DataFrame) -> dict:
    """(m, cell, sv) rows → {(m, cell): quantized centroid} — the keyed
    twin of :func:`_ivf_mean`, one partial-agg over (m, cell, dim) for
    ALL subspaces together.  The collect is PQ_M×PQ_K×PQ_SUB floats of
    model state."""
    rows = (
        df.select("m", "cell", F.posexplode("sv").alias("pos", "x"))
        .groupBy("m", "cell", "pos")
        .agg((F.floor(F.avg("x") * 1e6) / 1e6).alias("val"))
        .groupBy("m", "cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "val"))).alias("pv"))
        .select("m", "cell", F.transform("pv", lambda s: s["val"]).alias("cv"))
        .collect()
    )
    return {(r["m"], r["cell"]): list(r["cv"]) for r in rows}


def _pq_keyed_assign(cents: dict) -> F.Column:
    """Column ``cell``: subspace-aware argmin over the row's ``sv``
    against subspace ``m``'s centroids — raw squared-L2 with (dist,
    cell) tie-break, the :func:`_ivf_cells` training comparator.  A
    CASE on ``m`` so codegen evaluates only the matched subspace's 16
    distances (an ``element_at`` over literal arrays would compute all
    PQ_M×PQ_K)."""
    branches = []
    for m in range(PQ_M):
        entries = []
        for cell in sorted(c for (mm, c) in cents if mm == m):
            arr = "array(" + ", ".join(
                f"{float(x)!r}D" for x in cents[(m, cell)]) + ")"
            entries.append(
                f"named_struct('dist', aggregate(zip_with({arr}, sv, "
                f"(c, x) -> (x - c) * (x - c)), 0.0D, (acc, x) -> acc + x), "
                f"'cell', {int(cell)})")
        branches.append(
            f"WHEN {m} THEN array_min(array(" + ", ".join(entries) + ")).cell")
    return F.expr("CASE m " + " ".join(branches) + " END")


def pq_train_codebooks(e: DataFrame, iters: int = 2) -> list:
    """k-means-trained PQ codebooks — the real PQ build step: each of
    the PQ_M subspaces trains its own PQ_K-entry codebook over the
    corpus' subvectors (deterministic ``vec_id % K`` init + Lloyd
    rounds with empty-cell carryover, centroids quantized to 1e-6 so
    training is bit-reproducible), and the per-subspace centroids are
    reassembled into the full-width layout :func:`_pq_codes_array_expr`
    consumes — entry j's subspace-m slice is subspace m's centroid j.

    All PQ_M subspaces train TOGETHER, keyed on (m, cell): per Lloyd
    round one narrow assignment pass (CASE-dispatched literal
    centroids) and ONE (m, cell, dim) partial-agg collect — iters+1
    corpus scans total, where a per-subspace :func:`kmeans_fit` loop
    would pay PQ_M×(iters+1) scans and 8× the job-scheduling overhead
    (measured 3.7 s → keyed form ~1.5 s at sf0.01).  The gate
    ``x_pq_trained`` oracle-verifies this exact chain; ``x_pq_codes``
    keeps the naive first-K-vectors sample variant; pytest asserts
    training strictly reduces reconstruction error vs that sample."""
    cur = _pq_sub_rows(e).localCheckpoint()
    cents = _pq_keyed_mean(
        cur.select("m", (F.col("vec_id") % PQ_K).alias("cell"), "sv"))
    for _ in range(iters):
        asg = cur.select("m", _pq_keyed_assign(cents).alias("cell"), "sv")
        # empty-cell carryover, exactly kmeans_fit's {**cents, **new}
        cents = {**cents, **_pq_keyed_mean(asg)}
    return [
        [x for m in range(PQ_M) for x in cents[(m, j)]]
        for j in range(PQ_K)
    ]


@register("x_pq_codes", _pq_oracle_sql())
def x_pq_codes(spark, sf_dir):
    """Product quantization: encode each 64-dim embedding as 8 nibble
    codes (8 subspaces × 16-entry codebooks) — the compressed serving
    form ANN indexes ship at scale (256 B float32 → 4 B per vector; ADC
    scans the codes, never the floats).  The codebook is the
    deterministic training sample (first 16 vectors), so both engines
    hold identical model state and the oracle verifies every argmin.

    100 TB shape: encoding is one narrow codegen pass over broadcast
    literal codebooks — embarrassingly parallel, no shuffle; a real
    build would train the codebooks with k-means on a sample (the same
    collect-K×D-floats shape as the IVF centroids)."""
    e = _ann_vectors(spark, sf_dir, spread=True)
    cb = _pq_codebook(e)
    return e.select("vec_id", _pq_code_expr(cb).alias("codes"))


def _pq_trained_oracle_sql() -> str:
    m, sub, k = PQ_M, PQ_SUB, PQ_K

    def dist(cv, v):
        return (f"list_sum(list_transform(list_zip({cv}, {v}), "
                "x -> (x[2]-x[1])*(x[2]-x[1])))")

    def mean(src):
        return (
            f"(SELECT m, cell, list(val ORDER BY pos) AS cv FROM "
            f" (SELECT m, cell, pos, FLOOR(AVG(sv[pos]) * 1e6)/1e6 AS val "
            f"  FROM {src}, (SELECT unnest(generate_series(1, {sub})) AS pos) p "
            f"  GROUP BY m, cell, pos) GROUP BY m, cell)"
        )

    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"ms AS (SELECT unnest(generate_series(0, {m - 1})) AS m), "
        f"sv AS (SELECT e.vec_id, ms.m, e.v[ms.m*{sub}+1 : ms.m*{sub}+{sub}] "
        " AS sv FROM e, ms), "
        # deterministic hash-group init, exactly kmeans_fit's vec_id % k
        f"g0 AS (SELECT m, vec_id % {k} AS cell, sv FROM sv), "
        f"cv0 AS {mean('g0')}, "
        # one Lloyd round: assign on RAW squared L2 (dist, cell) order —
        # the _ivf_cells training comparator — then re-mean
        "a1 AS (SELECT s.m, s.sv, (SELECT c.cell FROM cv0 c WHERE c.m = s.m "
        f" ORDER BY {dist('c.cv', 's.sv')} ASC, c.cell ASC LIMIT 1) AS cell "
        " FROM sv s), "
        f"m1 AS {mean('a1')}, "
        # empty-cluster carryover: a cell that lost every member keeps
        # its previous centroid ({**cents, **new} in kmeans_fit)
        "cv1 AS (SELECT p.m, p.cell, COALESCE(n.cv, p.cv) AS cv "
        " FROM cv0 p LEFT JOIN m1 n USING (m, cell)), "
        # final encode: FLOORED-integer dist + j tie-break, the portable
        # comparator of _pq_codes_array_expr
        "best AS (SELECT s.vec_id, s.m, (SELECT c.cell FROM cv1 c "
        " WHERE c.m = s.m ORDER BY CAST(FLOOR(1e6 * "
        f"{dist('c.cv', 's.sv')}) AS BIGINT) ASC, c.cell ASC LIMIT 1) AS j "
        " FROM sv s) "
        "SELECT vec_id, string_agg(j::VARCHAR, ',' ORDER BY m) AS codes "
        "FROM best GROUP BY vec_id"
    )


@register("x_pq_trained", _pq_trained_oracle_sql())
def x_pq_trained(spark, sf_dir):
    """PQ encode with TRAINED codebooks — the real build step gated
    end-to-end: each subspace's 16-entry codebook is k-means-trained by
    :func:`pq_train_codebooks` (deterministic hash-group init + one
    Lloyd round, centroids quantized to 1e-6, empty cells carry over),
    then every vector is encoded against the trained books.  The DuckDB
    oracle recomputes the whole chain — init means, Lloyd assignment on
    the raw-distance comparator, carryover merge, floored-argmin encode
    — so the gate verifies training AND encoding, not just the argmin
    over a handed-down codebook (``x_pq_codes`` keeps the naive
    first-K-sample variant; pytest asserts the trained books strictly
    reduce reconstruction error vs that sample).

    100 TB shape: identical to ``x_pq_codes`` serving plus the
    ``kmeans_fit`` build — per subspace one narrow assignment pass and a
    (cell, dim)-keyed partial agg; the driver holds only PQ_K×64 floats
    of model state.  Encoding stays a single narrow codegen pass over
    broadcast codebook literals."""
    e = _ann_vectors(spark, sf_dir, spread=True).localCheckpoint()
    cb = pq_train_codebooks(e, iters=1)
    return e.select("vec_id", _pq_code_expr(cb).alias("codes"))


@register(
    "x_json_extract",
    "SELECT event_type, COUNT(*) AS cnt, "
    "CAST(SUM(json_extract(props, '$.k')::BIGINT) AS BIGINT) AS sum_k, "
    "MIN(json_extract(props, '$.k')::BIGINT) AS min_k, "
    "MAX(json_extract(props, '$.k')::BIGINT) AS max_k "
    "FROM events GROUP BY event_type",
)
def x_json_extract(spark, sf_dir):
    """Semi-structured extraction: pull a typed field out of the JSON
    ``props`` column and aggregate it per event type — the
    schema-on-read pattern event logs always need.  ``get_json_object``
    stays inside whole-stage codegen (no Python, no UDF); at scale the
    right move is to hoist hot JSON fields into real columns once, and
    this operator is exactly that hoist.

    100 TB shape: a narrow extraction map + one partial-agg shuffle on
    the (low-cardinality) event type; AQE handles the 5-key skew."""
    e = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "x_embed_gram",
    "WITH e AS (SELECT embedding::DOUBLE[] AS v FROM embeddings), "
    "p AS (SELECT di.i, dj.j, v[di.i] * v[dj.j] AS prod FROM e, "
    " (SELECT unnest(generate_series(1, 64)) AS i) di, "
    " (SELECT unnest(generate_series(1, 64)) AS j) dj) "
    "SELECT i, j, CAST(FLOOR(1e6 * CAST(SUM(CAST(prod AS DECIMAL(28,10))) "
    " AS DOUBLE) / COUNT(*)) AS BIGINT) AS gram_scaled "
    "FROM p GROUP BY i, j",
)
def x_embed_gram(spark, sf_dir):
    """Distributed Gram matrix (Xᵀ X / n) over the embedding corpus —
    the one-pass building block PCA / whitening / covariance start
    from.  Per row, the 64×64 outer product explodes to (i, j, x·y)
    triples; one partial-agg shuffle over the D² = 4096 keys averages
    them.  Products are summed as DECIMAL(28,10) so the cross-row sum
    is exact and ORDER-INDEPENDENT (double summation order differs
    between Spark partial aggs and DuckDB — the same trick as the money
    sums), then floored at 1e6 for the compare.

    100 TB shape: agg state is D² keys regardless of corpus size;
    map-side combine reduces the shuffle to D² rows per partition.
    SYMMETRY EXPLOITED (round 8): only the upper triangle explodes —
    D(D+1)/2 products per row instead of D², a 1.97× cut of the
    dominant explode+agg volume — and the lower triangle is mirrored
    AFTER aggregation from the same DECIMAL sums, so emitted values
    are bit-identical to the full-product version (x·y = y·x,
    identical summands).  Measured at sf0.1/local[32]: ~1.0 s isolated
    best-of-2 vs the ~6 s the full-product version recorded in the r07
    suite (triangle halves the product count AND the smaller struct
    stream cuts allocation pressure).  A full
    covariance/whitening step subtracts the mean outer product and
    inverts driver-side — D×D is model state, exactly like the IVF
    centroids."""
    e = _ann_vectors(spark, sf_dir, spread=True)
    pairs = (
        "flatten(transform(v, (x, i) -> "
        " transform(slice(v, i + 1, size(v) - i), (y, k) -> named_struct("
        "  'i', i + 1, 'j', i + 1 + k, 'p', x * y))))"
    )
    upper = (
        e.select(F.explode(F.expr(pairs)).alias("c"))
        .select(
            F.col("c.i").alias("i"), F.col("c.j").alias("j"),
            F.col("c.p").cast("decimal(28,10)").alias("p"),
        )
        .groupBy("i", "j")
        .agg(
            F.floor(1e6 * F.sum("p").cast("double") / F.count(F.lit(1)))
            .cast("long").alias("gram_scaled"))
    )
    lower = (upper.filter(F.col("i") < F.col("j"))
             .select(F.col("j").alias("i"), F.col("i").alias("j"),
                     "gram_scaled"))
    return upper.unionByName(lower)


@register(
    "x_length_buckets",
    "WITH d AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
    " AS n_tok FROM documents), "
    "q AS (SELECT quantile_cont(n_tok, 0.25) AS q1, "
    " quantile_cont(n_tok, 0.50) AS q2, "
    " quantile_cont(n_tok, 0.75) AS q3 FROM d) "
    "SELECT doc_id, n_tok, CASE WHEN n_tok <= q1 THEN 0 "
    " WHEN n_tok <= q2 THEN 1 WHEN n_tok <= q3 THEN 2 ELSE 3 END AS bucket "
    "FROM d, q",
)
def x_length_buckets(spark, sf_dir):
    """Length-bucketed batching: assign every document to one of four
    exact-quartile token-length buckets — how a training loader groups
    similar-length documents so padding waste stays low.  Thresholds
    are exact interpolated quartiles (the same percentile semantics the
    percentile gate verifies; quartile fractions are binary-exact, so
    both engines hold bit-identical thresholds), broadcast as a one-row
    aggregate into a narrow bucket map.

    100 TB shape: one percentile aggregate over an integer column
    (at real scale: ``percentile_approx``, whose t-digest twin is
    already pytest-gated) + a broadcast compare — the corpus never
    shuffles to be bucketed."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    q = d.agg(F.expr(
        "percentile(n_tok, array(0.25D, 0.50D, 0.75D))").alias("_q"))
    dd = d.crossJoin(F.broadcast(q))
    q1, q2, q3 = (F.col("_q")[0], F.col("_q")[1], F.col("_q")[2])
    return dd.select(
        "doc_id", "n_tok",
        F.when(F.col("n_tok") <= q1, 0)
        .when(F.col("n_tok") <= q2, 1)
        .when(F.col("n_tok") <= q3, 2)
        .otherwise(3).cast("long").alias("bucket"),
    )


def whiten_embeddings(spark, sf_dir, eps: float = 1e-6) -> DataFrame:
    """PCA whitening on top of :func:`x_embed_gram`'s machinery: the
    D×D covariance is aggregated distributed (mean + Gram, one
    partial-agg pass each), eigendecomposed DRIVER-SIDE (D×D is model
    state, like the IVF centroids), and the whitening matrix
    W = U·diag(1/√(λ+eps))·Uᵀ is applied per row in an Arrow-batched
    ``mapInPandas`` (a D×D × batch matrix multiply — the sanctioned
    Python path, vectorized per batch, never per element).

    Not oracle-gated (eigendecomposition is not SQL-expressible);
    pytest asserts the defining property instead: the whitened corpus'
    covariance is ≈ identity."""
    import numpy as np
    from pyspark.sql import types as T

    e = _ann_vectors(spark, sf_dir, spread=True)
    stats = e.select(F.posexplode("v").alias("i", "x")).groupBy("i").agg(
        F.avg("x").alias("m"))
    mean = np.array([r["m"] for r in sorted(stats.collect(),
                                            key=lambda r: r["i"])])
    dims = len(mean)
    prods = (
        "flatten(transform(v, (x, i) -> transform(v, (y, j) -> "
        "named_struct('i', i, 'j', j, 'p', x * y))))"
    )
    g = (e.select(F.explode(F.expr(prods)).alias("c"))
         .groupBy("c.i", "c.j").agg(F.avg("c.p").alias("g")).collect())
    G = np.zeros((dims, dims))
    for r in g:
        G[r["i"], r["j"]] = r["g"]
    cov = G - np.outer(mean, mean)
    lam, U = np.linalg.eigh(cov)
    W = U @ np.diag(1.0 / np.sqrt(np.maximum(lam, 0.0) + eps)) @ U.T

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("w", T.ArrayType(T.DoubleType())),
    ])

    def apply_w(batches):
        import pandas as pd

        for pdf in batches:
            X = np.stack(pdf["v"].to_numpy()) - mean
            Y = X @ W.T
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "w": list(Y)})

    return e.mapInPandas(apply_w, schema=schema)


@register(
    "x_winsorize",
    "WITH q AS (SELECT event_type, "
    " FLOOR(100 * quantile_cont(value, 0.05)) / 100 AS lo, "
    " FLOOR(100 * quantile_cont(value, 0.95)) / 100 AS hi "
    " FROM events GROUP BY event_type) "
    "SELECT e.event_type, COUNT(*) AS cnt, "
    "CAST(SUM(CAST(LEAST(GREATEST(e.value, q.lo), q.hi) AS DECIMAL(18,2))) "
    " AS DOUBLE) AS sum_clipped, "
    "CAST(SUM(CASE WHEN e.value < q.lo THEN 1 ELSE 0 END) AS BIGINT) "
    " AS n_low, "
    "CAST(SUM(CASE WHEN e.value > q.hi THEN 1 ELSE 0 END) AS BIGINT) "
    " AS n_high "
    "FROM events e JOIN q USING (event_type) GROUP BY e.event_type",
)
def x_winsorize(spark, sf_dir):
    """Winsorization — the outlier-clipping stage of metric cleaning:
    per event type, clip values to the [p05, p95] band and report the
    clipped sum plus how many rows hit each side.  Thresholds are
    quantized to 2 decimals (floor) so both engines compare against
    BIT-IDENTICAL bounds — interpolated percentiles at non-binary
    fractions can differ in the last ulp between engines, and a clip
    compare must not hinge on that; the clipped sum goes through
    DECIMAL so the cross-row sum is order-independent (the money
    trick).

    100 TB shape: one percentile partial agg per (low-cardinality)
    type, broadcast back for a narrow clip map, one partial-agg
    report — the corpus shuffles zero times (both aggs are map-side
    partial on the same key)."""
    e = table(spark, sf_dir, "events")
    q = e.groupBy("event_type").agg(
        (F.floor(100 * F.expr("percentile(value, 0.05D)")) / 100).alias("lo"),
        (F.floor(100 * F.expr("percentile(value, 0.95D)")) / 100).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(clipped.cast("decimal(18,2)")).cast("double")
            .alias("sum_clipped"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0))
            .cast("long").alias("n_low"),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0))
            .cast("long").alias("n_high"),
        )
    )


def vocab_size_exact(spark, sf_dir) -> DataFrame:
    """Exact per-language vocabulary size (distinct whitespace tokens) —
    the correctness baseline for the HLL sketch twin below."""
    toks = table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("term"))
    return toks.groupBy("lang").agg(
        F.countDistinct("term").alias("vocab"))


def vocab_size_approx(spark, sf_dir, rsd: float = 0.02) -> DataFrame:
    """The 100 TB cardinality path: per-language vocabulary size via
    HyperLogLog++ (``approx_count_distinct``) — a mergeable
    bounded-memory sketch, one partial-agg shuffle, no exact-distinct
    re-shuffle of the token stream.  Not oracle-gated (the sketch is
    engine-specific and merge-order-dependent); pytest asserts it
    against :func:`vocab_size_exact` within sketch tolerance — the same
    pattern as ``event_percentiles_approx`` vs the exact percentile
    gate."""
    toks = table(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split("text", " ")).alias("term"))
    return toks.groupBy("lang").agg(
        F.approx_count_distinct("term", rsd).alias("vocab_approx"))


@register(
    "x_tfidf_topk",
    "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
    " FROM documents), "
    "nd AS (SELECT COUNT(*) AS n FROM documents), "
    "tf AS (SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY doc_id, term), "
    "dl AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tok FROM tf GROUP BY doc_id), "
    "dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), "
    "s AS (SELECT tf.doc_id, tf.term, "
    " CAST(FLOOR(1e6 * (tf.c * 1.0 / dl.n_tok) "
    "  * ln((nd.n + 1.0) / (dfq.df + 1.0))) AS BIGINT) AS score_scaled "
    " FROM tf JOIN dl USING (doc_id) JOIN dfq USING (term), nd) "
    "SELECT doc_id, term, score_scaled FROM ("
    " SELECT doc_id, term, score_scaled, row_number() OVER "
    "  (PARTITION BY doc_id ORDER BY score_scaled DESC, term) AS rn FROM s) "
    "WHERE rn <= 3",
)
def x_tfidf_topk(spark, sf_dir):
    """Per-document top-3 TF-IDF terms — the keyword/salience primitive
    of corpus analysis (and the classic two-aggregate + join shape):
    term frequency normalized by document length, inverse document
    frequency smoothed as ln((N+1)/(df+1)), scores compared as
    1e6-floored integers with the term string as tie-break.

    100 TB shape: TF is one (doc, term) partial-agg shuffle; DF is one
    term-keyed partial agg whose result is vocabulary-sized (Zipf:
    orders of magnitude smaller than the corpus) and joins back on the
    term key — AQE broadcasts it when it fits, falls back to a shuffle
    join when a web-scale vocabulary doesn't; N is one scalar.  Top-3
    per doc is the rank-in-partition pattern with group-limit
    pushdown.  The document count joins in as a broadcast one-row
    aggregate, keeping the builder lazy — one plan, no eager scan."""
    docs = table(spark, sf_dir, "documents")
    nd = docs.agg(F.count(F.lit(1)).alias("_n"))
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("c"))
    dl = tf.groupBy("doc_id").agg(F.sum("c").alias("n_tok"))
    dfq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    s = (
        tf.join(dl, "doc_id").join(dfq, "term")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "term",
            F.floor(1e6 * (F.col("c") / F.col("n_tok"))
                    * F.log((F.col("_n") + 1.0) / (F.col("df") + 1.0)))
            .cast("long").alias("score_scaled"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_scaled"), F.asc("term"))
    return (s.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3).drop("rn"))


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
    n = PACK_SEQ_LEN
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    return _prefix_pack(spark, d).select(
        "doc_id", "n_tok", "start_tok",
        F.floor(F.col("start_tok") / n).cast("long").alias("seq_id"),
        (F.col("start_tok") % n).alias("seq_offset"),
        F.floor((F.col("start_tok") + F.col("n_tok") - 1) / n)
        .cast("long").alias("end_seq"),
    )


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
    packed = x_pack_sequences(spark, sf_dir)
    (packed.repartitionByRange(n_shards, "seq_id", "doc_id")
     .write.mode("overwrite").parquet(out_dir))
    return spark.read.parquet(out_dir)


@register(
    "x_mix_sample",
    "WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) "
    " AS n_tok FROM documents), "
    "lt AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens FROM d "
    " GROUP BY lang), "
    "r AS (SELECT lang, lang_tokens, CAST(FLOOR(10000.0 * "
    " (SELECT MIN(lang_tokens) FROM lt) / lang_tokens) AS BIGINT) AS rate_bp "
    " FROM lt), "
    "s AS (SELECT d.lang, d.n_tok FROM d JOIN r USING (lang) "
    " WHERE CAST(concat('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) "
    "  AS BIGINT) % 10000 < r.rate_bp), "
    "agg AS (SELECT lang, COUNT(*) AS n_sampled, "
    " CAST(SUM(n_tok) AS BIGINT) AS tok_sampled FROM s GROUP BY lang) "
    "SELECT r.lang, r.lang_tokens, r.rate_bp, "
    "COALESCE(agg.n_sampled, 0) AS n_sampled, "
    "COALESCE(agg.tok_sampled, 0) AS tok_sampled "
    "FROM r LEFT JOIN agg USING (lang)",
)
def x_mix_sample(spark, sf_dir):
    """Data mixing to a target per-language token budget — the sampling
    stage that turns a raw corpus into a training mixture: compute each
    language's token mass, set every language's keep-rate so it
    downsamples to the SMALLEST language's budget (a balanced mixture;
    any target vector works the same way), then apply the rate with the
    content-stable md5 gate — the same rows are kept on every engine,
    run, and cluster size.  Rates are integer basis points
    (floor(1e4·budget/mass)), so the gate compare is portable.  Output
    per language: token mass, applied rate, and the sampled doc/token
    counts — the oracle re-derives the whole budget computation.

    100 TB shape: the mixture table is one tiny per-language aggregate
    (partial-agg shuffle), BROADCAST back onto the corpus for a narrow
    filter — the corpus itself never shuffles to be sampled; the final
    per-language report is a second partial agg."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    lt = d.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    r = lt.withColumn(
        "rate_bp",
        F.floor(10000.0 * F.min("lang_tokens").over(Window.partitionBy())
                / F.col("lang_tokens")))
    bucket = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                    16, 10).cast("long") % 10000
    s = (d.join(F.broadcast(r.select("lang", "rate_bp")), "lang")
         .filter(bucket < F.col("rate_bp")))
    agg = s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_tok").alias("tok_sampled"))
    return (
        r.join(agg, "lang", "left")
        .select(
            "lang", "lang_tokens", "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("tok_sampled", F.lit(0)).cast("long")
            .alias("tok_sampled"),
        )
    )


@register(
    "x_lm_score",
    "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term "
    " FROM documents), "
    "tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS c "
    " FROM toks GROUP BY doc_id, term), "
    "cw AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cnt FROM tf GROUP BY term), "
    "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n, "
    " CAST(COUNT(*) AS BIGINT) AS v FROM cw), "
    "lp AS (SELECT term, CAST(FLOOR(1e6 * ln((cnt + 1.0) / (n + v))) "
    " AS BIGINT) AS lp_scaled FROM cw, tot), "
    "d AS (SELECT tf.doc_id, CAST(SUM(tf.c) AS BIGINT) AS n_tok, "
    " CAST(SUM(tf.c * lp.lp_scaled) AS BIGINT) AS lp_sum "
    " FROM tf JOIN lp USING (term) GROUP BY tf.doc_id) "
    "SELECT doc_id, n_tok, "
    "CAST(FLOOR(CAST(-lp_sum AS DOUBLE) / n_tok) AS BIGINT) AS nll_scaled "
    "FROM d",
)
def x_lm_score(spark, sf_dir):
    """Unigram language-model quality scoring — the CCNet/KenLM-style
    perplexity filter at the unigram order: train an add-1-smoothed
    unigram LM on the corpus itself, score every document by its mean
    negative log-likelihood (×1e6).  Rare-word-heavy / junk documents
    score HIGH, fluent common-vocabulary text scores LOW — filter by a
    band, exactly like winsorize's value clip (keeping the LOW tail
    only also deletes boilerplate, the classic CCNet "head" caveat).

    Portability by integer arithmetic: each term's log-probability is
    floored to 1e-6 units FIRST, so every per-document sum is an exact
    integer — order-independent across engines and partitionings (the
    same trick as the DECIMAL Gram sums); the single ln() per VOCAB
    entry is the only float op, with the x_tfidf_topk precedent.

    100 TB shape: tf is one (doc, term) partial agg; the LM is a
    vocab-sized term agg (orders below corpus size); scoring joins tf
    against the LM term-keyed — broadcast when the vocab fits, plain
    shuffle join otherwise — then one doc-keyed integer partial agg.
    Training an n-gram order instead swaps the term key for an n-gram
    key; nothing else changes."""
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = (toks.groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("c")))
    cw = tf.groupBy("term").agg(F.sum("c").alias("cnt"))
    tot = cw.agg(F.sum("cnt").alias("n"), F.count(F.lit(1)).alias("v"))
    lp = (cw.crossJoin(F.broadcast(tot))
          .select("term",
                  F.floor(1e6 * F.log((F.col("cnt") + 1.0)
                                      / (F.col("n") + F.col("v"))))
                  .cast("long").alias("lp_scaled")))
    d = (tf.join(lp, "term")
         .groupBy("doc_id")
         .agg(F.sum("c").cast("long").alias("n_tok"),
              F.sum(F.col("c") * F.col("lp_scaled")).alias("lp_sum")))
    return d.select(
        "doc_id", "n_tok",
        F.floor(-F.col("lp_sum").cast("double") / F.col("n_tok"))
        .cast("long").alias("nll_scaled"))


@register(
    "x_lm_bigram",
    "WITH tl AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents), "
    "bg AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2 THEN "
    " list_transform(generate_series(1, len(t) - 1), "
    "  i -> concat_ws(' ', t[i], t[i+1])) ELSE [] END) AS bigram FROM tl), "
    "bf AS (SELECT doc_id, bigram, CAST(COUNT(*) AS BIGINT) AS c "
    " FROM bg GROUP BY doc_id, bigram), "
    "c2 AS (SELECT bigram, CAST(SUM(c) AS BIGINT) AS c12 FROM bf "
    " GROUP BY bigram), "
    "c1 AS (SELECT string_split(bigram, ' ')[1] AS w1, "
    " CAST(SUM(c12) AS BIGINT) AS ctx FROM c2 GROUP BY 1), "
    "vv AS (SELECT CAST(COUNT(DISTINCT unnest.t) AS BIGINT) AS v FROM "
    " (SELECT unnest(t) AS t FROM tl) unnest), "
    "lp AS (SELECT c2.bigram, CAST(FLOOR(1e6 * "
    " ln((c2.c12 + 1.0) / (c1.ctx + vv.v))) AS BIGINT) AS lp_scaled "
    " FROM c2 JOIN c1 ON string_split(c2.bigram, ' ')[1] = c1.w1, vv), "
    "d AS (SELECT bf.doc_id, CAST(SUM(bf.c) AS BIGINT) AS n_bigrams, "
    " CAST(SUM(bf.c * lp.lp_scaled) AS BIGINT) AS lp_sum "
    " FROM bf JOIN lp USING (bigram) GROUP BY bf.doc_id) "
    "SELECT doc_id, n_bigrams, "
    "CAST(FLOOR(CAST(-lp_sum AS DOUBLE) / n_bigrams) AS BIGINT) "
    " AS nll_scaled FROM d",
)
def x_lm_bigram(spark, sf_dir):
    """Bigram-order LM scoring — the order upgrade the ``x_lm_score``
    docstring promises: P(w2|w1) = (c(w1 w2)+1) / (ctx(w1)+V) with
    add-1 smoothing, where ctx(w1) is w1's bigram-context count
    (Σ_w2 c(w1 w2), self-consistent with the bigram table) and V the
    unigram vocabulary.  Per-document mean bigram NLL ×1e6; documents
    with never-seen-together word sequences score high even when every
    individual word is common — what the unigram order cannot see, and
    why CCNet filters on an n-gram LM.  Single-token documents have no
    bigrams and drop out (both engines agree).

    Same integer-portability discipline as the unigram gate: one ln()
    per VOCAB² entry floored to 1e-6 units, then exact integer sums.

    100 TB shape: the per-doc bigram tf is one (doc, bigram) partial
    agg; the LM tables are bigram-vocab-sized aggs; scoring joins tf
    against the LM bigram-keyed and re-aggregates doc-keyed — the same
    four-shuffle skeleton as TF-IDF, nothing corpus-quadratic."""
    tl = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t"))
    bg = tl.select("doc_id", F.explode(F.expr(
        "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), "
        " i -> concat_ws(' ', element_at(t, i), element_at(t, i + 1))) "
        "ELSE array() END")).alias("bigram"))
    bf = bg.groupBy("doc_id", "bigram").agg(F.count(F.lit(1)).alias("c"))
    c2 = bf.groupBy("bigram").agg(F.sum("c").alias("c12"))
    c1 = (c2.select(F.split("bigram", " ").getItem(0).alias("w1"), "c12")
          .groupBy("w1").agg(F.sum("c12").alias("ctx")))
    vv = tl.select(F.explode("t").alias("term")).agg(
        F.countDistinct("term").alias("v"))
    lp = (c2.withColumn("w1", F.split("bigram", " ").getItem(0))
          .join(c1, "w1")
          .crossJoin(F.broadcast(vv))
          .select("bigram",
                  F.floor(1e6 * F.log((F.col("c12") + 1.0)
                                      / (F.col("ctx") + F.col("v"))))
                  .cast("long").alias("lp_scaled")))
    d = (bf.join(lp, "bigram")
         .groupBy("doc_id")
         .agg(F.sum("c").cast("long").alias("n_bigrams"),
              F.sum(F.col("c") * F.col("lp_scaled")).alias("lp_sum")))
    return d.select(
        "doc_id", "n_bigrams",
        F.floor(-F.col("lp_sum").cast("double") / F.col("n_bigrams"))
        .cast("long").alias("nll_scaled"))


@register(
    "x_mix_temperature",
    "WITH d AS (SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) "
    " AS n_tok FROM documents), "
    "lt AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS lang_tokens FROM d "
    " GROUP BY lang), "
    "r AS (SELECT lang, lang_tokens, CAST(FLOOR(10000.0 * "
    " sqrt(CAST((SELECT MIN(lang_tokens) FROM lt) AS DOUBLE) "
    "      / lang_tokens)) AS BIGINT) AS rate_bp "
    " FROM lt), "
    "s AS (SELECT d.lang, d.n_tok FROM d JOIN r USING (lang) "
    " WHERE CAST(concat('0x', substr(md5('t:' || d.doc_id), 1, 8)) "
    "  AS BIGINT) % 10000 < r.rate_bp), "
    "agg AS (SELECT lang, COUNT(*) AS n_sampled, "
    " CAST(SUM(n_tok) AS BIGINT) AS tok_sampled FROM s GROUP BY lang) "
    "SELECT r.lang, r.lang_tokens, r.rate_bp, "
    "COALESCE(agg.n_sampled, 0) AS n_sampled, "
    "COALESCE(agg.tok_sampled, 0) AS tok_sampled "
    "FROM r LEFT JOIN agg USING (lang)",
)
def x_mix_temperature(spark, sf_dir):
    """Temperature-based data mixing, α = 0.5 — the multilingual-
    pretraining sampling rule (q_i ∝ mass_i^α): keep-rate per language
    is √(mass_min/mass_i), which IS the α = 0.5 mixture normalized so
    the smallest language is fully kept — low-resource languages are
    upweighted relative to proportional sampling but high-resource
    ones are not flattened to uniform (``x_mix_sample`` is the α → 0
    balanced-budget limit of the same machinery).

    Portability is exact, not approximate: mass ratios are exact in
    doubles at these magnitudes and IEEE-754 requires CORRECTLY-ROUNDED
    sqrt, so both engines floor identical basis-point rates — the
    reason this gate uses α = 0.5 specifically rather than a pow()
    whose last ulp is library-dependent.  The keep gate is the
    content-stable md5 draw (salted 't:' so it decorrelates from the
    other sampling gates).

    100 TB shape: identical to ``x_mix_sample`` — one tiny per-language
    aggregate broadcast back for a narrow filter; the corpus never
    shuffles."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"))
    lt = d.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    r = lt.withColumn(
        "rate_bp",
        F.floor(10000.0 * F.sqrt(
            F.min("lang_tokens").over(Window.partitionBy())
            / F.col("lang_tokens"))).cast("long"))
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("t:"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 10000
    s = (d.join(F.broadcast(r.select("lang", "rate_bp")), "lang")
         .filter(bucket < F.col("rate_bp")))
    agg = s.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_tok").alias("tok_sampled"))
    return (
        r.join(agg, "lang", "left")
        .select(
            "lang", "lang_tokens", "rate_bp",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
            F.coalesce("tok_sampled", F.lit(0)).cast("long")
            .alias("tok_sampled"),
        )
    )


#: ADC shortlist size: the PQ scan keeps this many candidates per query
#: for the exact re-rank (10% of the sf0.01 corpus; measured recall@5 vs
#: exact cosine is 0.72 at this setting — same bar as the IVF/LSH gates)
PQ_SHORTLIST = 50


def _pq_adc_expr(cb: list) -> F.Column:
    """ADC distance between query subvectors (column ``qv``) and a coded
    corpus vector (column ``codes``): Σ_m floor(1e6·‖qv_m − cb_m[code_m]‖²).
    Each per-subspace term is floored to an integer BEFORE the sum, so
    the total is an exact integer both engines agree on — shortlist
    membership and its tie-breaks are fully portable."""
    m, sub = PQ_M, PQ_SUB
    terms = []
    for mi in range(m):
        entries = ", ".join(
            "array(" + ", ".join(
                f"{float(x)!r}D" for x in cv[mi * sub:(mi + 1) * sub]) + ")"
            for cv in cb)
        terms.append(
            f"cast(floor(1e6 * aggregate(zip_with("
            f"slice(qv, {mi * sub + 1}, {sub}), "
            f"element_at(array({entries}), element_at(codes, {mi + 1}) + 1), "
            f"(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)) "
            f"as bigint)")
    return F.expr(" + ".join(terms))


def _pq_codes_array_expr(cb: list) -> F.Column:
    """array<int> PQ codes for column ``v``: per subspace, the argmin
    over PQ_K literal sub-centroids of the (1e6-floored) squared L2 —
    floored-integer compare plus the j tie-break keeps the argmin
    portable across engines.  Built as a single expr string for the
    same reason as :func:`_ivf_cells` (per-element F.lit is K×D py4j
    round-trips)."""
    m, sub = PQ_M, PQ_SUB
    codes = []
    for mi in range(m):
        entries = []
        for j, cv in enumerate(cb):
            arr = "array(" + ", ".join(
                f"{float(x)!r}D" for x in cv[mi * sub:(mi + 1) * sub]) + ")"
            entries.append(
                f"named_struct('d', floor(1e6 * aggregate(zip_with("
                f"slice(v, {mi * sub + 1}, {sub}), {arr}, "
                f"(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x)), "
                f"'j', {j})")
        codes.append("array_min(array(" + ", ".join(entries) + ")).j")
    return F.expr("array(" + ", ".join(codes) + ")")


def _pq_ann_oracle_sql() -> str:
    m, sub, k = PQ_M, PQ_SUB, PQ_K
    cos = _DUCK_COS_SCALED.format(a="qe.v", b="ce.v")
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"cb AS (SELECT vec_id AS j, v AS cv FROM e WHERE vec_id < {k}), "
        f"ms AS (SELECT unnest(generate_series(0, {m - 1})) AS m), "
        "d AS (SELECT e.vec_id, ms.m, cb.j, "
        " CAST(FLOOR(1e6 * list_sum(list_transform(list_zip("
        f"  e.v[ms.m*{sub}+1 : ms.m*{sub}+{sub}], "
        f"  cb.cv[ms.m*{sub}+1 : ms.m*{sub}+{sub}]), "
        "  t -> (t[1]-t[2])*(t[1]-t[2])))) AS BIGINT) AS dist "
        " FROM e, ms, cb), "
        "code AS (SELECT vec_id, m, j FROM ("
        " SELECT vec_id, m, j, row_number() OVER "
        "  (PARTITION BY vec_id, m ORDER BY dist, j) AS rn FROM d) WHERE rn = 1), "
        "adc AS (SELECT q.vec_id AS qid, code.vec_id AS cid, "
        " SUM(CAST(FLOOR(1e6 * list_sum(list_transform(list_zip("
        f"  q.v[code.m*{sub}+1 : code.m*{sub}+{sub}], "
        f"  cb.cv[code.m*{sub}+1 : code.m*{sub}+{sub}]), "
        "  t -> (t[1]-t[2])*(t[1]-t[2])))) AS BIGINT)) AS ad "
        " FROM e q JOIN code ON code.vec_id <> q.vec_id "
        " JOIN cb ON cb.j = code.j WHERE q.vec_id < 10 "
        " GROUP BY q.vec_id, code.vec_id), "
        "short AS (SELECT qid, cid FROM ("
        " SELECT qid, cid, row_number() OVER "
        "  (PARTITION BY qid ORDER BY ad, cid) AS rn FROM adc) "
        f" WHERE rn <= {PQ_SHORTLIST}), "
        f"sims AS (SELECT qid, cid, {cos} AS sim_scaled FROM short "
        " JOIN e qe ON qe.vec_id = short.qid JOIN e ce ON ce.vec_id = short.cid) "
        "SELECT qid, cid, sim_scaled FROM ("
        " SELECT qid, cid, sim_scaled, row_number() OVER "
        "  (PARTITION BY qid ORDER BY sim_scaled DESC, cid) AS rn FROM sims) "
        "WHERE rn <= 5"
    )


@register("x_sim_pq", _pq_ann_oracle_sql())
def x_sim_pq(spark, sf_dir):
    """PQ-ADC approximate nearest neighbors — the compressed-domain
    scale path that completes the ANN family (brute-force / LSH-bucketed
    / IVF / PQ): the corpus is scanned as 8-byte PQ codes only, each
    query scores candidates by asymmetric distance (query subvector vs
    the candidate's sub-centroid — per-subspace integer-floored, so the
    shortlist is portable), the top-``PQ_SHORTLIST`` shortlist is then
    re-ranked by exact cosine — the standard PQ + re-rank serving
    pattern.  Measured recall@5 vs exact cosine: 0.72 at sf0.01
    (pytest-asserted ≥ 0.7); raw ADC without re-rank sits at 0.16 on
    this deliberately PQ-hostile isotropic corpus — the re-rank IS the
    operating point.

    100 TB shape: the ADC scan reads codes (4–8 B/vector), not floats —
    a 32–64× scan-bandwidth cut; the query side is broadcast (10 rows),
    the per-query shortlist bounds the exact-refine join to
    ``PQ_SHORTLIST`` float-vector reads per query.  Codebooks ride the
    closure as literals, exactly like the IVF centroids."""
    return _pq_ann(spark, sf_dir)


def _pq_ann(spark, sf_dir, cb: list | None = None):
    """PQ-ADC + exact re-rank over an arbitrary codebook (default: the
    deterministic first-K sample ``x_sim_pq`` oracles; pass
    :func:`pq_train_codebooks` output for the trained A/B that
    tests/test_pipeline.py asserts recall on)."""
    e = _ann_vectors(spark, sf_dir, spread=True)
    if cb is None:
        cb = _pq_codebook(e)
    coded = e.select("vec_id", _pq_codes_array_expr(cb).alias("codes"))
    en = e.select("vec_id", "v", _norm_col("v").alias("nv"))
    q = en.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"))
    adc = (
        coded.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"),
                _pq_adc_expr(cb).alias("ad"))
    )
    ws = Window.partitionBy("qid").orderBy(F.asc("ad"), F.asc("cid"))
    short = (adc.withColumn("rn", F.row_number().over(ws))
             .filter(F.col("rn") <= PQ_SHORTLIST).select("qid", "cid"))
    dot = F.aggregate(F.zip_with("qv", "cv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    sims = (
        short.join(en.select(F.col("vec_id").alias("cid"),
                             F.col("v").alias("cv"),
                             F.col("nv").alias("cn")), "cid")
        .join(F.broadcast(q), "qid")
        .select("qid", "cid",
                F.floor(1e6 * dot / (F.col("qn") * F.col("cn")))
                .alias("sim_scaled"))
    )
    wr = Window.partitionBy("qid").orderBy(F.desc("sim_scaled"), F.asc("cid"))
    return (sims.withColumn("rn", F.row_number().over(wr))
            .filter(F.col("rn") <= 5).drop("rn"))


@register(
    "x_join_stream",
    "SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id "
    "FROM events v JOIN events c ON c.user_id = v.user_id "
    "AND v.event_type = 'view' AND c.event_type = 'click' "
    "AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR",
)
def x_join_stream(spark, sf_dir):
    """Oracle gate for the stream-stream interval join
    (streaming/joins.py ``view_click_join``): the events fixture
    streams through the file source TWICE (view side / click side),
    inner-joined on user within a 6-hour event-time window, emitted
    rows appended via foreachBatch under ``Trigger.AvailableNow``, and
    the emitted set compared against a DuckDB interval self-join —
    inner stream-stream joins emit exactly the matched set regardless
    of batch boundaries, so the gate is order-free.

    100 TB shape: both sides shuffle once on user_id; join state per
    key is bounded by watermark + interval horizon (Spark derives the
    eviction bound from the time-range condition) — see
    streaming/joins.py for the state story."""
    import os

    from sparkdon.streaming.joins import view_click_join

    out_dir = _stream_scratch("join_stream", sf_dir)
    target = os.path.join(out_dir, "out")
    joined = view_click_join(_events_stream(spark, sf_dir))
    q = (
        joined.writeStream.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(target))
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_stream(q)
    return spark.read.parquet(target)
