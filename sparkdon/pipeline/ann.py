"""Embedding-space operators: cosine top-k, LSH / IVF ANN, k-means,
embedding dedup (LSH-banded + semantic), quantize/normalize, Gram matrix,
whitening.

Split out of the former monolithic ``sparkdon/pipeline.py`` (round 9);
every gate registers into the shared :mod:`sparkdon.pipeline` registry,
so ``pipeline.QUERIES`` / ``pipeline.ORACLE`` and every public name are
unchanged for callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._registry import pin_shared, register, retired, table
from .dedup import MINHASH_BUCKET_CAP, _bucket_pairs


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


def _cosine_scaled(dot, na, nb):
    """``floor(1e6·cos)`` with the zero-norm guard shared by every
    per-pair cosine site: cosine against a ZERO vector is undefined —
    emit NULL, exactly the DuckDB oracles' division-by-zero result
    (r13 random-corpus fuzz find: the unguarded divide is a job-killing
    ArithmeticException under ANSI mode, and zero embeddings are
    routine on real corpora — empty documents embed to zero).  Both
    engines rank NULLs LAST under the shared sim DESC, cid ASC
    tie-break, so top-k stays engine-identical."""
    denom = na * nb
    return F.when(denom > 0, F.floor(1e6 * dot / denom))


_DUCK_SIM = (
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
    "q AS (SELECT * FROM e WHERE vec_id < 10), "
    "sims AS (SELECT q.vec_id AS qid, c.vec_id AS cid, "
    " CAST(FLOOR(1e6 * list_sum(list_transform(list_zip(q.v, c.v), x -> x[1] * x[2])) "
    "  / (sqrt(list_sum(list_transform(q.v, x -> x * x))) "
    "   * sqrt(list_sum(list_transform(c.v, x -> x * x))))) AS BIGINT) AS sim_scaled "
    " FROM q, e c WHERE c.vec_id <> q.vec_id) "
)


@retired(
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
    streams once.  Cosine is a fold over ``zip_with`` (pure codegen).

    RETIRED from the battery at the r17 cycle-boundary swap (gave its
    slot to ``x_decontam_embed``/``x_chunk_stride``): its ENTIRE plan —
    broadcast query side + zip_with cosine fold + ``salted_qid_topk`` —
    is the exact-refine sub-plan every surviving ANN gate executes
    (``x_sim_lsh_refined``/``x_sim_ivf`` inline it; the PQ gates via
    ``_cosine_rerank``), so the slot verified nothing the survivors
    don't.  It remains the recall baseline for every ANN pytest and
    keeps its driver-style oracle compare in
    tests/test_retired_gates.py."""
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
            _cosine_scaled(dot, F.col("qn"), F.col("nv")).alias("sim_scaled"),
        )
    )
    # salted two-stage top-k (round 11): the brute-force frame has the
    # whole corpus as every query's candidate set, the worst case for a
    # single per-qid window
    return salted_qid_topk(sims, k=k)


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
    # eagerly checkpointed: the vector frame feeds band-key generation,
    # the candidate refine side and the query side — without it each
    # plan arm re-runs the scan + repartition (+ norm fold); the r16
    # "before" plan shows 20 Exchanges from exactly this duplication
    return lsh_refined_topk(
        _ann_vectors(spark, sf_dir, spread=True).transform(pin_shared))


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
            _cosine_scaled(dot, F.col("qn"), F.col("nv")).alias("sim_scaled"),
        )
    )
    # salted two-stage top-k (round 11): bucket skew means one hot LSH
    # bucket can hand a single query most of the corpus as candidates
    return salted_qid_topk(sims, k=k)


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


def _ivf_mean(df: DataFrame, dims: int = _IVF_DIMS) -> dict:
    """(cell, v) rows → {cell: quantized centroid list}.

    ONE cell-keyed aggregate with ``dims`` per-dimension averages
    (optimization r16, guide §2.3/§2.4): the former posexplode form
    multiplied every row ×dims and paid a second (cell)-keyed exchange
    for the reassembly ``collect_list`` — column-wise ``avg(v[i])``
    aggregates the identical per-(cell, dim) value multisets in one
    partial-agg pass, so the shuffle carries K rows of dims doubles
    instead of K×dims rows, and one Exchange instead of two.  The 1e-6
    centroid quantization absorbs summation-order noise exactly as
    before (it exists because distributed fp summation order already
    varied run-to-run).  The collect is K×DIMS floats of model state
    (like the LSH plane matrix), not data.

    The column-wise form hard-codes ``dims`` where the old posexplode
    was length-agnostic, so the vector length is ASSERTED in the same
    aggregate (two extra agg columns, no extra pass): a longer vector
    would silently truncate and a shorter one would average nulls (or
    throw an opaque ArrayIndexOutOfBounds under ANSI) — fail loudly
    with a clear message instead (r17, advisor find).  ``F.get`` is the
    null-safe element access (no ANSI throw), so the length check is
    what reports, not the accessor."""
    rows = (
        df.groupBy("cell")
        .agg(*[(F.floor(F.avg(F.get(F.col("v"), i)) * 1e6) / 1e6)
               .alias(f"c{i}")
               for i in range(dims)],
             F.min(F.size("v")).alias("_lmin"),
             F.max(F.size("v")).alias("_lmax"))
        .collect()
    )
    bad = {(r["_lmin"], r["_lmax"]) for r in rows} - {(dims, dims)}
    if bad:
        raise ValueError(
            f"_ivf_mean: expected {dims}-dim vectors, saw lengths "
            f"{sorted(set(x for t in bad for x in t))} — pass dims= or "
            "fix the input frame")
    return {r["cell"]: [r[f"c{i}"] for i in range(dims)] for r in rows}


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

    The build chains actions (two Lloyd means, probe/refine); the frames
    REUSED across actions are ``localCheckpoint``-ed so no action
    re-executes upstream lineage — in particular the K×D-literal distance
    expression is parsed/codegen'd once per distinct centroid set and
    *evaluated* once per row, not once per downstream action.  That is
    exactly what a real index build does: persist the assignment table.
    BENCH_r05 recorded 15.1 s here because the uncached chain re-ran the
    scan + assignment under every action, which amplifies any executor
    contention ~5x.  r16 trims the action count further (guide §1.2
    "remove passes"): the first-round assignment frame, consumed by
    exactly ONE action (its Lloyd mean), is not checkpointed at all.
    Checkpoint eagerness (r17 action-count cut, VERDICT r16 #2 /
    guide §1.2): ``e`` is LAZY — its first consumer is the init
    ``_ivf_mean`` collect, a synchronous single-threaded driver action
    that materializes the blocks inside its own job (no broadcast arm
    exists yet, so the r16 concurrent-materialization hazard cannot
    occur); every later consumer reads the blocks.  ``scored`` below
    stays EAGER: its first consumers are the broadcast ``probes`` arm
    and the main ``assigned`` side of ONE final job — exactly the
    concurrent case the r16 policy requires eager for (a fully-lazy
    variant was tried in r16 and reverted: concurrent first
    materialization duplicates the subtree and convoys on the block
    manager)."""
    e = _ann_vectors(spark, sf_dir, spread=True).transform(pin_shared, eager=False)

    cents = _ivf_mean(e.select((F.col("vec_id") % _IVF_K).alias("cell"), "v"))
    a1 = e.select(
        "vec_id", "v", _ivf_cells(cents)[0]["cell"].alias("cell"))
    cents = _ivf_mean(a1.select("cell", "v"))
    # One evaluation of the final-centroid distance array serves both the
    # corpus assignment ([0].cell) and the query probe set (slice
    # 1..NPROBE).  The checkpoint stores ONLY what its consumers read —
    # assignment cell + probe cells, NOT the vector or the full K-entry
    # distance array (r17, guide §2.2 "fewer bytes": the candidate join
    # below never touches v, and the refine tail re-reads `e`'s blocks;
    # the in-projection subexpression elimination evaluates the sorted
    # distance array once per row for both columns).  Payload per row
    # drops from vec + K structs (~800 B) to a long + 1+NPROBE ints.
    cells = _ivf_cells(cents)
    scored = e.select(
        "vec_id",
        cells[0]["cell"].alias("cell"),
        F.transform(F.slice(cells, 1, _IVF_NPROBE),
                    lambda s: s["cell"]).alias("pcells"),
    ).transform(pin_shared)
    assigned = scored.select("vec_id", "cell")

    probes = (
        scored.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("qid"),
            F.explode("pcells").alias("cell"),
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
            _cosine_scaled(dot, F.col("qn"), F.col("nv")).alias("sim_scaled"),
        )
    )
    return salted_qid_topk(sims, k=5)


def salted_qid_topk(sims: DataFrame, k: int = 5, nsalts: int = 32,
                    order: list | None = None) -> DataFrame:
    """Two-stage per-qid top-k over a (qid, cid, score) frame, identical
    output to the single ``Window.partitionBy("qid")`` form: stage 1
    takes the local top-k within (qid, cid-hash-salt) over ``nsalts``
    deterministic salts, stage 2 the global per-qid top-k over the
    ≤ nsalts·k survivors.  The union of per-salt top-k supersets the
    global top-k and both stages share the same total-order tie-break
    (default cosine: sim DESC, cid ASC; PQ-ADC passes ``order`` of
    ad ASC, cid ASC), so the result — and every gate's oracle — is
    unchanged.

    100 TB shape: a single per-qid window caps parallelism at the query
    count and pins each query's WHOLE candidate set on one task (the
    x_sim_ivfpq 100× probe measured a 12.6× decade slope from exactly
    this before its salted rewrite, PERF.md round-10); salting bounds
    per-task rows at |cand|/nsalts and scales task count with
    queries×nsalts.  Round 11 ports this shape to every remaining
    per-qid shortlist (x_sim_topk, x_sim_lsh_refined, the _pq_ann ADC
    stage) per VERDICT r10 #2."""
    order = order if order is not None else [F.desc("sim_scaled"), F.asc("cid")]
    salt = F.pmod(F.crc32(F.col("cid").cast("string")), F.lit(nsalts))
    salted = Window.partitionBy("qid", salt).orderBy(*order)
    w = Window.partitionBy("qid").orderBy(*order)
    return (sims.withColumn("rn", F.row_number().over(salted))
            .filter(F.col("rn") <= k).drop("rn")
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k).drop("rn"))


def kmeans_fit(df: DataFrame, k: int, iters: int = 5,
               dims: int = _IVF_DIMS):
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
    the component propagation loop (LAZY — the init ``_ivf_mean``
    collect is always the first consumer and materializes the blocks in
    its own synchronous job; r17 action-count cut)."""
    cur = df.select("vec_id", "v").transform(pin_shared, eager=False)
    cents = _ivf_mean(cur.select((F.col("vec_id") % k).alias("cell"), "v"),
                      dims=dims)
    for _ in range(iters):
        # consumed once (by the mean below) — no checkpoint needed; cur's
        # checkpoint keeps the lineage shallow across rounds (r16 trim)
        asg = cur.select(
            "vec_id", "v", _ivf_cells(cents)[0]["cell"].alias("cell"))
        # a cell that lost every member keeps its previous centroid
        # (standard empty-cluster handling; also keeps the centroid
        # count stable — the same carryover rule the keyed PQ trainer
        # (pq_train_codebooks) and its DuckDB oracle implement)
        cents = {**cents, **_ivf_mean(asg.select("cell", "v"), dims=dims)}
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
    # eagerly checkpointed: the vector frame feeds band-key generation and
    # BOTH cosine sides of the pair refine — three plan arms that would
    # each re-run the scan + repartition + (for x/y) the norm fold
    # (guide §2.4: share one evaluation instead of duplicating subtrees)
    e = _ann_vectors(spark, sf_dir, spread=True).transform(pin_shared)
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
            _cosine_scaled(dot, F.col("xn"), F.col("yn")).alias("sim_scaled"),
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


@retired(
    "x_embed_norm",
    "SELECT vec_id, CAST(FLOOR(1e6 * sqrt(list_sum(list_transform(embedding::DOUBLE[], "
    "x -> x * x)))) AS BIGINT) AS norm_scaled FROM embeddings",
)
def x_embed_norm(spark, sf_dir):
    """L2 norm per embedding — the array-fold primitive shared by all
    similarity ops, verified exactly.  RETIRED from the battery at the
    r16 swap (same narrow zero-shuffle projection plan shape as the
    surviving ``x_embed_quantize``); the driver-style compare continues
    in tests/test_retired_gates.py."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    return e.select(
        "vec_id",
        F.floor(1e6 * F.sqrt(F.aggregate(
            F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)))
        .alias("norm_scaled"),
    )


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
    # LAZY checkpoint (r17 action-count cut, VERDICT r16 #2): e's first
    # consumer is the centroid ``_ivf_mean`` collect — a synchronous
    # driver action that materializes the blocks inside its own job, so
    # the r16 concurrent-materialization hazard (lazy frame raced by a
    # broadcast-build thread) cannot occur; later consumers read blocks
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).repartition(spark.sparkContext.defaultParallelism) \
        .transform(pin_shared, eager=False)
    cents = _ivf_mean(
        e.select(F.col("label").alias("cell"), "v"))
    # LAZY checkpoint, same argument: the K×D-literal assignment feeds
    # the cap-guard count, pair generation, BOTH cosine sides and the
    # final keep join — without the checkpoint the whole scan+assign
    # subtree is evaluated once per plan arm (~5×; the r16 "before"
    # plan shows 20 Exchanges from exactly this — guide §2.4 "share one
    # evaluation").  Lazy is safe because the FIRST consumer is the
    # synchronous cap-guard count below, which fully materializes the
    # blocks before any broadcast arm of the final plan exists; the
    # r16 eager shape paid a standalone materialization job per
    # checkpoint that the count/collect now absorbs.
    asg = e.select(
        "vec_id", "v",
        _ivf_cells(cents)[0]["cell"].alias("cluster")) \
        .transform(pin_shared, eager=False)
    # cap read through the facade at CALL time: tests tune it by
    # patching sparkdon.pipeline.MINHASH_BUCKET_CAP (the old monolith
    # surface), which a def-time import here would not see
    from sparkdon import pipeline as _facade

    cap = _facade.MINHASH_BUCKET_CAP
    n_over = (asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") > cap).count())
    if n_over:
        raise ValueError(
            f"x_semantic_dedup: {n_over} cluster(s) exceed the "
            f"pair-generation cap ({cap}) — the gate's "
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
        .select("d2", _cosine_scaled(dot, F.col("xn"), F.col("yn"))
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
          .transform(pin_shared))
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
    centroids.

    DECIMAL accumulation kept after a measured r17 A/B (guide §5 /
    VERDICT r16 #8).  Long fixed-point accumulation (per-element
    ``(p::decimal(28,10) * 1e10)::long``, sum longs, divide back) ran
    1.22× faster warm at sf0.1/local[32] (1.677 → 1.372 s; plain
    double sum 1.161 s as the inexactness bound) and was bit-identical
    here — but it is REJECTED for this path because its failure modes
    sit exactly at the 100 TB contract: (a) ``sum(long)`` overflows
    SILENTLY once a group's scaled sum passes 2^63 (≈9×10⁸ rows at
    unit-scale products — a plausible corpus size), where the DECIMAL
    sum stays exact; (b) past 2^53 the long→double conversion double-
    rounds and a 1-ulp drift can flip the 1e6 floor.  The oracle's own
    SQL sums DECIMAL(28,10), so the engine mirroring it keeps the gate
    meaningful at every scale."""
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


# ---------------------------------------------------------------------------
# semantic decontamination (r15 — UNREGISTERED r17+ swap candidate)
# ---------------------------------------------------------------------------

#: contamination bar, same integer-scaled cosine as the semantic-dedup
#: tier (floor(1e6·cos) — the engine-portable compare)
DECONTAM_SIM_SCALED = SEMANTIC_DUP_SIM_SCALED

#: the gate's deterministic "benchmark" slice: every 29th vec_id plays
#: the held-out eval set (GPT-3/PaLM-style decontamination separates
#: the corpus from a SMALL benchmark suite — the shape this models).
#: 29 chosen so the fixture's planted near-dup pairs cross the split:
#: 2 contaminated rows at sf0.01 and 5 at sf0.1 (sims 48-52 × 1e4,
#: comfortably past the 450000 bar — no floor-grid boundary risk), so
#: the flag column is exercised non-trivially at every gate scale.
DECONTAM_BENCH_MOD = 29


def decontam_semantic(vectors: DataFrame, bench: DataFrame,
                      threshold_scaled: int = DECONTAM_SIM_SCALED) -> DataFrame:
    """Embedding-space decontamination: flag every corpus vector whose
    max cosine against ANY benchmark vector reaches the bar — the
    semantic counterpart of the n-gram ``x_contamination`` gate (which
    catches verbatim leakage but not paraphrase).  Input: a
    ``(vec_id, v)`` corpus frame and a SMALL ``(bench_id, bv)``
    benchmark frame.  Returns ``(vec_id, max_sim_scaled,
    contaminated)`` for EVERY corpus vector (an empty benchmark means
    nothing is contaminated, never an empty result — left join, not
    cross join).

    100 TB shape: the benchmark side is eval suites, not corpus — KBs
    to MBs — so it broadcasts whole and the corpus streams ONCE
    through a codegen'd fold per (vector, bench) pair; the only
    shuffle is the vec_id-keyed max, whose map-side partial combine
    reduces each partition to one row per corpus vector before the
    exchange.  Nothing is quadratic in the corpus and no corpus-sized
    state ever leaves the executors.  Zero-norm vectors (empty docs
    embed to zero) yield NULL cosine — ignored by MAX, `contaminated`
    coalesces to false, both engines identically (the r13 ANSI-divide
    fuzz class)."""
    bn = bench.select("bench_id", "bv", _norm_col("bv").alias("bnorm"))
    vn = vectors.select("vec_id", "v", _norm_col("v").alias("vnorm"))
    dot = F.aggregate(F.zip_with("v", "bv", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    sims = (
        vn.join(F.broadcast(bn), F.lit(True), "left")
        .select("vec_id",
                _cosine_scaled(dot, F.col("vnorm"), F.col("bnorm"))
                .alias("sim_scaled"))
    )
    return (
        sims.groupBy("vec_id")
        .agg(F.max("sim_scaled").alias("max_sim_scaled"))
        .select(
            "vec_id", "max_sim_scaled",
            F.coalesce(F.col("max_sim_scaled") >= threshold_scaled,
                       F.lit(False)).alias("contaminated"))
    )


def _decontam_oracle_sql() -> str:
    cos = _DUCK_COS_SCALED.format(a="c.v", b="b.bv")
    return (
        "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), "
        f"b AS (SELECT vec_id AS bench_id, v AS bv FROM e "
        f" WHERE vec_id % {DECONTAM_BENCH_MOD} = 0), "
        f"c AS (SELECT * FROM e WHERE vec_id % {DECONTAM_BENCH_MOD} <> 0), "
        f"s AS (SELECT c.vec_id, MAX({cos}) AS max_sim_scaled "
        " FROM c LEFT JOIN b ON true GROUP BY c.vec_id) "
        "SELECT vec_id, max_sim_scaled, "
        f"COALESCE(max_sim_scaled >= {DECONTAM_SIM_SCALED}, false) "
        " AS contaminated FROM s"
    )


#: DuckDB oracle for :func:`x_decontam_embed` — kept module-level (like
#: `_TRIM_ORACLE`) so the fuzz battery and seed_sweep can pair it with
#: the unregistered gate
_DECONTAM_ORACLE = _decontam_oracle_sql()


@register("x_decontam_embed", _DECONTAM_ORACLE)
def x_decontam_embed(spark, sf_dir):
    """Gate-style wrapper for :func:`decontam_semantic`: the every-
    ``DECONTAM_BENCH_MOD``-th vector plays the benchmark suite, the
    rest are the corpus.  Built and oracle-verified in r15, REGISTERED
    at the r17 cycle-boundary swap (took the battery slot of the
    retired ``x_sim_topk``, whose broadcast-query + cosine-fold +
    salted-topk plan the surviving ANN gates execute as their refine
    stage).  Dossier: 3-scale oracle compare, random-tables battery
    row, permanent seed_sweep tables-tier slot, honest noop-sink
    probes 10× = 5.38 / 100× = 66.7 (fixed benchmark side — per-pair
    fold grows exactly k×, wall stays under it)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    bench = (e.filter(F.col("vec_id") % DECONTAM_BENCH_MOD == 0)
             .select(F.col("vec_id").alias("bench_id"),
                     F.col("v").alias("bv")))
    # r17 (guide §2.5): the per-(vector, bench) cosine fold is the
    # gate's whole cost and it inherits the CORPUS scan's partitioning —
    # one row group at fixture scale = the entire fold stage on one
    # core.  Spread only the corpus side (the bench side is broadcast);
    # no-op once the scan has >= parallelism splits.
    from ._registry import spread_narrow_scan

    corpus = spread_narrow_scan(
        e.filter(F.col("vec_id") % DECONTAM_BENCH_MOD != 0))
    return decontam_semantic(corpus, bench)
