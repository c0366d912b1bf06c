"""Product quantization: codebook training, code assignment, ADC-scan ANN.

Split out of the former monolithic ``sparkdon/pipeline.py`` (round 9);
every gate registers into the shared :mod:`sparkdon.pipeline` registry,
so ``pipeline.QUERIES`` / ``pipeline.ORACLE`` and every public name are
unchanged for callers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._registry import pin_shared, register, table
from .ann import (PQ_K, PQ_M, PQ_SUB, _DUCK_COS_SCALED, _IVF_DIMS,
                  _IVF_K, _IVF_NPROBE, _ann_vectors, _ivf_cells,
                  _ivf_mean, _norm_col, salted_qid_topk)


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
    twin of :func:`_ivf_mean`, one partial-agg over (m, cell) with
    PQ_SUB per-dimension averages (same r16 single-pass rewrite: the
    posexplode form multiplied rows ×PQ_SUB and paid a second exchange
    for the collect_list reassembly; column-wise ``avg(sv[i])``
    aggregates the identical value multisets in one pass, inside the
    1e-6 quantization's existing summation-order tolerance).  The
    collect is PQ_M×PQ_K×PQ_SUB floats of model state.

    Subvector length is ASSERTED in the same aggregate (the column-wise
    form hard-codes PQ_SUB where posexplode was length-agnostic —
    silent truncation / null averaging otherwise; r17, advisor find).
    ``F.get`` is the null-safe element access, so the length check is
    what reports, not an ANSI ArrayIndexOutOfBounds."""
    rows = (
        df.groupBy("m", "cell")
        .agg(*[(F.floor(F.avg(F.get(F.col("sv"), i)) * 1e6) / 1e6)
               .alias(f"c{i}")
               for i in range(PQ_SUB)],
             F.min(F.size("sv")).alias("_lmin"),
             F.max(F.size("sv")).alias("_lmax"))
        .collect()
    )
    bad = {(r["_lmin"], r["_lmax"]) for r in rows} - {(PQ_SUB, PQ_SUB)}
    if bad:
        raise ValueError(
            f"_pq_keyed_mean: expected {PQ_SUB}-dim subvectors, saw "
            f"lengths {sorted(set(x for t in bad for x in t))} — the "
            "vector dimensionality must be PQ_M x PQ_SUB")
    return {(r["m"], r["cell"]): [r[f"c{i}"] for i in range(PQ_SUB)]
            for r in rows}


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
    training strictly reduces reconstruction error vs that sample.

    The subspace-row checkpoint is LAZY (r17 action-count cut): its
    first consumer is the init ``_pq_keyed_mean`` collect — a
    synchronous driver action that materializes the blocks inside its
    own job before any other consumer exists; every Lloyd round's
    assignment then reads the blocks."""
    cur = _pq_sub_rows(e).transform(pin_shared, eager=False)
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
    # lazy checkpoint (r17): the codebook sample collect is the
    # synchronous first consumer — it materializes the blocks in its
    # own job, and the final encode reads them instead of re-scanning
    e = _ann_vectors(spark, sf_dir, spread=True).transform(pin_shared, eager=False)
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
    broadcast codebook literals.

    The vector checkpoint is LAZY (r17 action-count cut): the training
    chain's first action — the init ``_pq_keyed_mean`` collect inside
    :func:`pq_train_codebooks` — materializes it synchronously (no
    broadcast arm exists yet); the final encode reads the blocks."""
    e = _ann_vectors(spark, sf_dir, spread=True).transform(pin_shared, eager=False)
    cb = pq_train_codebooks(e, iters=1)
    return e.select("vec_id", _pq_code_expr(cb).alias("codes"))


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


# --- IVF+PQ (residual ADC within probed cells) -----------------------------


def _ivfpq_residual_expr(cents: dict, vec: str) -> F.Column:
    """``vec − centroid[cell]`` as one parsed expression: a CASE on the
    ``cell`` column dispatching to the matching K×D literal centroid (a
    missing cell can never be an assignment — the argmin only ranges
    over existing centroids — so no placeholder branch is needed).
    Double subtraction is IEEE-exact, so the residual doubles are
    bit-identical across engines given the 1e-6-quantized centroids."""
    branches = []
    for cell, cv in sorted(cents.items()):
        arr = "array(" + ", ".join(f"{float(x)!r}D" for x in cv) + ")"
        branches.append(
            f"WHEN {int(cell)} THEN "
            f"zip_with({vec}, {arr}, (a, c) -> a - c)")
    return F.expr("CASE cell " + " ".join(branches) + " END")


def _ivfpq_oracle_sql() -> str:
    ik, nprobe = _IVF_K, _IVF_NPROBE
    m, sub, k = PQ_M, PQ_SUB, PQ_K
    dims = _IVF_DIMS
    cos = _DUCK_COS_SCALED.format(a="qe.v", b="ce.v")

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
        # -- the x_sim_ivf coarse quantizer, verbatim ----------------------
        f"g0 AS (SELECT vec_id % {ik} AS cell, v FROM e), "
        f"cv0 AS {mean('g0')}, "
        "a1 AS (SELECT e.vec_id, e.v, (SELECT c.cell FROM cv0 c "
        f" ORDER BY {dist('c.cv', 'e.v')} ASC, c.cell ASC LIMIT 1) AS cell FROM e), "
        f"cv1 AS {mean('a1')}, "
        "a2 AS (SELECT e.vec_id, e.v, (SELECT c.cell FROM cv1 c "
        f" ORDER BY {dist('c.cv', 'e.v')} ASC, c.cell ASC LIMIT 1) AS cell FROM e), "
        # -- residual encode: PQ codebook over (v − centroid) --------------
        "res AS (SELECT a2.vec_id, a2.cell, "
        " list_transform(list_zip(a2.v, c.cv), t -> t[1] - t[2]) AS r "
        " FROM a2 JOIN cv1 c USING (cell)), "
        f"cb AS (SELECT vec_id AS j, r AS cv FROM res WHERE vec_id < {k}), "
        f"ms AS (SELECT unnest(generate_series(0, {m - 1})) AS m), "
        "d AS (SELECT res.vec_id, ms.m, cb.j, "
        " CAST(FLOOR(1e6 * list_sum(list_transform(list_zip("
        f"  res.r[ms.m*{sub}+1 : ms.m*{sub}+{sub}], "
        f"  cb.cv[ms.m*{sub}+1 : ms.m*{sub}+{sub}]), "
        "  t -> (t[1]-t[2])*(t[1]-t[2])))) AS BIGINT) AS dist "
        " FROM res, ms, cb), "
        "code AS (SELECT vec_id, m, j FROM ("
        " SELECT vec_id, m, j, row_number() OVER "
        "  (PARTITION BY vec_id, m ORDER BY dist, j) AS rn FROM d) WHERE rn = 1), "
        # -- query side: probe cells + per-cell query residual -------------
        "probes AS (SELECT q.vec_id AS qid, p.cell FROM e q, LATERAL "
        f" (SELECT c.cell FROM cv1 c ORDER BY {dist('c.cv', 'q.v')} ASC, c.cell ASC "
        f"  LIMIT {nprobe}) p WHERE q.vec_id < 10), "
        "qr AS (SELECT probes.qid, probes.cell, "
        " list_transform(list_zip(q.v, c.cv), t -> t[1] - t[2]) AS qr "
        " FROM probes JOIN e q ON q.vec_id = probes.qid "
        " JOIN cv1 c USING (cell)), "
        # -- ADC over the probed cells' codes ------------------------------
        "adc AS (SELECT qr.qid, a2.vec_id AS cid, "
        " SUM(CAST(FLOOR(1e6 * list_sum(list_transform(list_zip("
        f"  qr.qr[code.m*{sub}+1 : code.m*{sub}+{sub}], "
        f"  cb.cv[code.m*{sub}+1 : code.m*{sub}+{sub}]), "
        "  t -> (t[1]-t[2])*(t[1]-t[2])))) AS BIGINT)) AS ad "
        " FROM qr JOIN a2 ON a2.cell = qr.cell "
        " JOIN code ON code.vec_id = a2.vec_id JOIN cb ON cb.j = code.j "
        " WHERE a2.vec_id <> qr.qid GROUP BY qr.qid, a2.vec_id), "
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


@register("x_sim_ivfpq", _ivfpq_oracle_sql())
def x_sim_ivfpq(spark, sf_dir):
    """IVF+PQ ANN — the canonical billion-scale serving shape (FAISS
    IVFADC): the ``x_sim_ivf`` coarse quantizer routes each query to its
    ``_IVF_NPROBE`` nearest cells, vectors are PQ-coded on their
    RESIDUAL (``v − centroid[cell]`` — residuals are what PQ quantizes
    well, their spread is a cell radius instead of the corpus diameter),
    the ADC scan reads only the probed cells' 8-byte codes against the
    per-cell query residual, and the per-query shortlist is re-ranked by
    exact cosine.  Every stage is the deterministic, oracle-proven
    machinery of its parent gate (quantized centroids, floored-integer
    subspace distances, (dist, id) tie-breaks), so the DuckDB oracle
    replays the full chain bit-for-bit.

    100 TB shape: this composes the two scan cuts that make
    billion-vector ANN serve — IVF prunes the scan to nprobe/K of the
    rows AND the rows scanned are codes (4–8 B) not floats (256 B), a
    combined ~85× read cut at these constants; the query side (10 rows ×
    nprobe cells of residuals) broadcasts; centroids and codebooks ride
    the closure as literals (K×D + PQ_K×D doubles of model state);
    the shortlist bounds the exact-refine join to ``PQ_SHORTLIST``
    float-vector reads per query.  Measured recall@5 vs exact cosine:
    0.62 at sf0.01 (deterministic; pytest-asserted ≥ 0.6) — bounded
    above by ``x_sim_ivf``'s 0.70 candidate recall at the same nprobe
    (the probed cells cap what ADC can see); the operating point trades
    that recall for the nprobe/K scan cut, exactly the IVFADC
    contract."""
    return _ivfpq_ann(spark, sf_dir)


def _ivfpq_ann(spark, sf_dir, train: bool = False):
    """IVF + residual-PQ ADC + exact re-rank.  ``train=True`` swaps the
    deterministic first-K residual sample for
    :func:`pq_train_codebooks` run over the residual frame — the real
    IVFADC build, where codebooks are k-means-fit on residual space.
    At sf0.01 both codebooks land recall@5 0.62 (the probed-cell
    candidate set, not ADC fidelity, is the binding constraint at this
    scale: ~190 candidates per query against a 50-entry shortlist);
    training's effect shows in residual reconstruction error, which
    tests/test_pipeline.py asserts strictly improves."""
    # Checkpoint eagerness (r17 action-count cut, VERDICT r16 #2): the
    # whole e → scored → res chain is LAZY.  The first action to touch
    # it is a synchronous driver collect — the init _ivf_mean for e,
    # then the codebook sample collect (or the trainer's init mean) for
    # scored+res, which materializes BOTH frames' blocks in one job
    # (res's lineage runs through scored, so computing res persists
    # scored's partitions too).  No broadcast arm exists before those
    # collects, so the r16 concurrent-materialization hazard cannot
    # occur; the final plan's qprobe broadcast arm and coded main side
    # then read already-persisted blocks.  This cuts the gate from 7 to
    # 4 synchronous jobs (3 standalone checkpoint materializations
    # folded into the collects that follow them).
    e = _ann_vectors(spark, sf_dir, spread=True).transform(pin_shared, eager=False)

    # coarse quantizer: identical chain to x_sim_ivf (hash-group init +
    # one Lloyd round, 1e-6-quantized means); the once-consumed
    # first-round assignment is not checkpointed (r16 trim, guide §1.2)
    cents = _ivf_mean(e.select((F.col("vec_id") % _IVF_K).alias("cell"), "v"))
    a1 = e.select(
        "vec_id", "v", _ivf_cells(cents)[0]["cell"].alias("cell"))
    cents = _ivf_mean(a1.select("cell", "v"))
    # the checkpoint keeps v (both residual encodes read it) but NOT the
    # full K-entry distance array — only the assignment cell and the
    # NPROBE probe cells its two consumers actually use (r17, guide
    # §2.2 "fewer bytes"; in-projection subexpression elimination
    # evaluates the sorted array once per row for both columns)
    cells = _ivf_cells(cents)
    scored = e.select(
        "vec_id", "v",
        cells[0]["cell"].alias("cell"),
        F.transform(F.slice(cells, 1, _IVF_NPROBE),
                    lambda s: s["cell"]).alias("pcells"),
    ).transform(pin_shared, eager=False)

    # residual PQ encode: codebook = first PQ_K residuals (the
    # x_pq_codes deterministic sample, taken over residual space);
    # checkpointed so the K-branch residual CASE expression is
    # evaluated once, not once per downstream action
    res = scored.select(
        "vec_id", "cell", _ivfpq_residual_expr(cents, "v").alias("v")) \
        .transform(pin_shared, eager=False)
    if train:
        cb = pq_train_codebooks(res, iters=1)
    else:
        cb = _pq_codebook(res)
    coded = res.select(
        "vec_id", "cell", _pq_codes_array_expr(cb).alias("codes"))

    # query side: probe set + per-(query, cell) residual
    qprobe = (
        scored.filter(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("qid"), "v",
            F.explode("pcells").alias("cell"))
        .select("qid", "cell", _ivfpq_residual_expr(cents, "v").alias("qv"))
    )

    adc = (
        coded.join(F.broadcast(qprobe), "cell")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"),
                _pq_adc_expr(cb).alias("ad"))
    )
    # two-stage shortlist: a single per-qid window caps parallelism at
    # the query count (10 tasks sorting the whole candidate set — the
    # 100× probe measured a 12.6× decade slope from exactly this); the
    # shared salted helper takes the per-(qid, salt) local top-k first,
    # then the global per-qid top-k over the ≤ 32·k survivors — a
    # superset of the global top-k under the same tie-break, so the
    # result is identical and the oracle is unchanged.
    short = salted_qid_topk(
        adc, k=PQ_SHORTLIST, order=[F.asc("ad"), F.asc("cid")],
    ).select("qid", "cid")

    # exact cosine re-rank on the ORIGINAL vectors
    return _cosine_rerank(short, e)


def _cosine_rerank(short: DataFrame, e: DataFrame, topk: int = 5) -> DataFrame:
    """(qid, cid) shortlist + (vec_id, v) vectors → exact-cosine top-k
    (qid, cid, sim_scaled) — the shared re-rank tail of the PQ-ADC and
    IVF+PQ gates (one code path so the flooring/tie-break can never
    diverge between them)."""
    en = e.select("vec_id", "v", _norm_col("v").alias("nv"))
    q = en.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"))
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
            .filter(F.col("rn") <= topk).drop("rn"))


def _pq_ann(spark, sf_dir, cb: list | None = None):
    """PQ-ADC + exact re-rank over an arbitrary codebook (default: the
    deterministic first-K sample ``x_sim_pq`` oracles; pass
    :func:`pq_train_codebooks` output for the trained A/B that
    tests/test_pipeline.py asserts recall on)."""
    # checkpointed: the vector frame feeds the codebook sample collect,
    # the coded corpus, the broadcast query side and the exact re-rank —
    # four arms that would each re-run the scan + repartition.
    # Eagerness depends on who materializes FIRST (r17 action-count
    # cut): with cb=None the codebook sample collect is a synchronous
    # first consumer, so the checkpoint rides it lazily; with a caller
    # codebook the first consumers are the final plan's concurrent
    # broadcast + main arms — the case the r16 policy requires eager.
    e = _ann_vectors(spark, sf_dir, spread=True)
    if cb is None:
        e = e.transform(pin_shared, eager=False)
        cb = _pq_codebook(e)
    else:
        e = e.transform(pin_shared)
    coded = e.select("vec_id", _pq_codes_array_expr(cb).alias("codes"))
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    adc = (
        coded.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("cid"),
                _pq_adc_expr(cb).alias("ad"))
    )
    # salted two-stage shortlist (round 11): the flat PQ-ADC stage scans
    # the whole coded corpus per query, so a single per-qid window would
    # sort it on one task per query — same fix as the IVF+PQ gate
    short = salted_qid_topk(
        adc, k=PQ_SHORTLIST, order=[F.asc("ad"), F.asc("cid")],
    ).select("qid", "cid")
    return _cosine_rerank(short, e)
