"""Driver-style verification of the r15-staged gates (pipeline/
staged_gates.py): each staged entry runs on Spark AND its DuckDB
oracle at sf0.001, compared exactly the way the driver compares —
row count, column names, order-insensitive canonical values — so the
r15 battery swap registers already-verified entries."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from sparkdon.pipeline.staged_gates import (STAGED, STAGED_ORACLE,
                                            STAGED_BPE_MERGES,
                                            _staged_score_model)

SF_DIR = "/root/testdata/sf0.001"

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows


def _oracle_rows(sql: str):
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_gate_matches_oracle(spark, key):
    df = STAGED[key](spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]
    o_cols, o_rows = _oracle_rows(STAGED_ORACLE[key])
    assert sorted(s_cols) == sorted(o_cols)
    assert len(s_rows) == len(o_rows) > 0
    assert canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)


def test_score_gate_far_from_floor_boundaries(spark):
    """floor(10000·p) is hash-stable only while no document's p sits at
    an ulp of the 1e-4 grid (Spark's Math.exp and DuckDB's libm exp may
    differ in the last ulp).  Assert the margin is ≥ 1e-6 grid units —
    ~10 orders above ulp noise; if a future fixture regeneration trips
    this, nudge _SCORE_WEIGHTS."""
    # recompute p at full precision through the same public path — at
    # the pytest scale AND the driver's sf0.01 gate scale
    from pyspark.sql import functions as F  # noqa: F811 (local clarity)

    from sparkdon.pipeline.classifier import fasttext_score
    from sparkdon.pipeline.staged_gates import table

    for sf in (SF_DIR, "/root/testdata/sf0.01"):
        docs = table(spark, sf, "documents").select("doc_id", "text")
        scored = fasttext_score(docs, _staged_score_model(),
                                out_col="_p")
        g = scored.select((F.lit(10000.0) * F.col("_p")).alias("g"))
        margin = g.select(
            F.min(F.least(F.col("g") - F.floor("g"),
                          F.lit(1.0) - (F.col("g") - F.floor("g"))))
            .alias("m")).collect()[0]["m"]
        assert margin > 1e-6, f"{sf}: score near floor grid: {margin}"
    assert STAGED["x_fasttext_score"](spark, SF_DIR).count() > 0


def test_bpe_oracle_replace_twice_is_exact():
    """The PRODUCTION oracle expression (via the shared _bpe_word_expr
    builder — not a test-local copy, review find r13) vs the encoder's
    single greedy pass, fuzzed on dense adversarial words (runs of
    merge-pair characters — the separator-starvation worst case)."""
    import random

    from sparkdon.pipeline.staged_gates import _bpe_word_expr

    def enc(word):
        syms = list(word)
        for a, b in STAGED_BPE_MERGES:
            ab, acc = a + b, []
            for x in syms:
                if acc and x == b and acc[-1] == a:
                    acc[-1] = ab
                else:
                    acc.append(x)
            syms = acc
        return syms

    tok = _bpe_word_expr(STAGED_BPE_MERGES)

    rng = random.Random(7)
    words = []
    for alpha in ("er", "ero", "atch", "ercust", "erinowst"):
        words += ["".join(rng.choices(alpha, k=rng.randint(2, 30)))
                  for _ in range(150)]
    words += ["er" * 25, "ererer" * 6, "custocustocusto", "batchbatch"]
    con = duckdb.connect()
    con.execute("CREATE TABLE w AS SELECT unnest(?) AS w", [words])
    got = con.execute(f"SELECT w, {tok} FROM w").fetchall()
    bad = [(w, g, enc(w)) for w, g in got if g != " ".join(enc(w))]
    assert not bad, bad[:3]


def test_bpe_oracle_rejects_same_symbol_merges():
    """replace-twice is provably exact only for a != b (a run of five
    same symbols gives [aa, a, aa] vs greedy [aa, aa, a]); a repinned
    merge list containing ('e','e') must fail at build time, never as
    a silent driver mismatch."""
    from sparkdon.pipeline.staged_gates import _bpe_word_expr

    with pytest.raises(ValueError, match="same-symbol"):
        _bpe_word_expr([("e", "r"), ("a", "a")])


def test_fixture_text_is_single_space_tokenizable():
    """Every oracle in the repo (the 150 registered ones and the staged
    three) splits text on a single space while the Spark side uses the
    \\s+ class: pin the fixture property that makes them equivalent —
    no tabs/newlines/control whitespace, no leading/trailing/double
    spaces.  A regenerated fixture violating this fails HERE, not as an
    opaque value-hash mismatch."""
    import pyarrow.parquet as pq

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        texts = pq.read_table(f"/root/testdata/{sf}/documents.parquet",
                              columns=["text"])["text"].to_pylist()
        assert texts
        for t in texts:
            assert t is not None
            assert not any(c in t for c in "\t\n\x0b\x0c\r")
            assert "  " not in t and t == t.strip(" ")


def test_pack_gate_score_ties_are_real(spark):
    """The curriculum score (doc_id·37 % 101) must actually collide at
    fixture scale, or the doc_id tie-break the gate claims to verify
    is never exercised."""
    from sparkdon.pipeline.staged_gates import table

    docs = table(spark, SF_DIR, "documents")
    n, d = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(((F.col("doc_id") * 37) % 101)).alias("d")
    ).collect()[0]
    assert d < n  # pigeonhole at >=102 docs, but assert, don't assume


def test_staged_plans_keep_their_scale_shapes(spark, monkeypatch):
    """The staged gates must inherit their families' 100 TB shapes:
    scoring through the md5 hash is still a zero-shuffle Python-free
    projection, and the staged encode is still one Arrow stage.  The
    r16 `spread_narrow_scan` adds a fixture-only round-robin Exchange
    (it is a no-op once scan partitions >= cores — exactly the 100 TB
    regime this test models), so neutralize it for the shape check."""
    from sparkdon.pipeline import _registry

    monkeypatch.setattr(_registry, "spread_narrow_scan", lambda df: df)
    score = STAGED["x_fasttext_score"](spark, SF_DIR)
    plan = score._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    enc = STAGED["x_bpe_encode"](spark, SF_DIR)
    eplan = enc._jdf.queryExecution().executedPlan().toString()
    assert eplan.count("MapInPandas") == 1, eplan
    assert "Exchange" not in eplan, eplan


def test_staged_oracle_types_portable():
    """The round-8 lesson applied ahead of registration: a DuckDB
    result type without an exact Spark twin (HUGEINT, DECIMAL, …)
    passes the str()-canon compare locally but fails the driver's
    type-sensitive value hash.  Run the repo's own audit allowlist
    over the staged oracles."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "audit_oracle_types",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts",
            "audit_oracle_types.py"))
    audit = _ilu.module_from_spec(spec)
    spec.loader.exec_module(audit)

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"'{SF_DIR}/documents.parquet'")
    bad = []
    for name, sql in sorted(STAGED_ORACLE.items()):
        for col, typ in ((r[0], r[1]) for r in
                         con.execute(f"DESCRIBE {sql}").fetchall()):
            if not audit._base_ok(typ):
                bad.append((name, col, typ))
    assert not bad, bad
