"""Seeded random differential battery: the driver verifies each oracle
on the FIXED fixture, so an oracle could in principle agree there by
accident (fixture-overfit token shapes, no edge words).  These
batteries regenerate random documents/embeddings/events tables AND a
random TPC-H instance — empty/null/unicode docs, zero vectors,
duplicate timestamps, malformed JSON, orderless customers, null
balances, odd-cent money — and assert Spark gate ≡ DuckDB oracle on
THAT, across the pipeline, relational, SPARQL, and staged tiers.

Same compare as scripts/check_correctness.py (row count, columns,
order-insensitive canonical values); fixed seeds so CI is stable."""

from __future__ import annotations

import importlib.util
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts", "check_correctness.py"))
_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_check)
canon_rows = _check.canon_rows

SEED = 20260816
N_DOCS = 220

TPCH_TABLES = ("region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "documents", "events")

#: gates whose inputs are documents-only AND whose oracle is exact (no
#: fixture-specific constants baked into semantics beyond thresholds)
GATES = [
    "x_dedup_exact",
    "x_dedup_jaccard",
    "x_dedup_simhash",
    "x_fingerprint",
    "x_chunk_dedup",
    "x_lang_id",
    "x_text_stats",
    "x_text_quality",
    "x_vocab_topk",
    "x_token_bpe",
    "x_bpe_pairs",
    "x_pack_sequences",
    "x_length_buckets",
    "x_char_entropy",
    "x_mix_sample",
    "x_sample_stratified",
]

#: embeddings-only gates (dim kept at the fixture's 64 so PQ subspace
#: assumptions hold); edge shapes: a ZERO vector, exact-duplicate
#: vectors, near-zero magnitudes
EMBED_GATES = ["x_embed_norm", "x_embed_gram", "x_embed_quantize",
               "x_pq_codes", "x_sim_topk"]

#: events-only gates; edge shapes: duplicate timestamps within a user,
#: constant-value runs (percentile/winsor ties), single-event users,
#: malformed/fractional/overflowing props JSON
EVENT_GATES = ["x_window_tumbling", "x_event_lag", "x_event_percentiles",
               "x_winsorize", "x_asof_join", "x_json_extract"]


def _compare(spark, sf_dir, views, pairs):
    """The one driver-style compare all batteries share (review find
    r13: six copy-pasted blocks had already drifted in their failure
    reporting): run each (key, fn, sql) pair on Spark and DuckDB and
    return the surviving failures — a crash IS a finding."""
    con = duckdb.connect()
    for v in views:
        con.execute(f"CREATE VIEW {v} AS SELECT * FROM "
                    f"'{sf_dir}/{v}.parquet/*.parquet'")
    failures = []
    for key, fn, sql in pairs:
        try:
            df = fn(spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            cur = con.execute(sql)
            o_cols = [c[0] for c in cur.description]
            o_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((key, "error", str(e)[:200]))
            continue
        if sorted(s_cols) != sorted(o_cols):
            failures.append((key, "columns", s_cols, o_cols))
        elif canon_rows(s_cols, s_rows) != canon_rows(o_cols, o_rows):
            sc = canon_rows(s_cols, s_rows)
            oc = canon_rows(o_cols, o_rows)
            diff = [(a, b) for a, b in zip(sc, oc) if a != b][:2]
            failures.append((key, "values", len(sc), len(oc), diff))
    return failures


def _pipeline_pairs(keys):
    from sparkdon import pipeline
    from sparkdon.pipeline._registry import RETIRED, RETIRED_ORACLE

    # gates RETIRED from the battery (r16 swap: x_embed_norm,
    # x_dedup_substring_hashed) keep their random-corpus coverage here,
    # same doctrine as tests/test_retired_gates.py
    q = {**RETIRED, **pipeline.QUERIES}
    o = {**RETIRED_ORACLE, **pipeline.ORACLE}
    return [(k, q[k], o[k]) for k in keys]


def _engine_pairs():
    from sparkdon import rdf_queries, relational

    return ([(k, relational.QUERIES[k], relational.ORACLE[k])
             for k in sorted(relational.QUERIES)]
            + [(k, rdf_queries.QUERIES[k], rdf_queries.ORACLE[k])
               for k in sorted(rdf_queries.QUERIES)])


def _random_docs(rng):
    vocab = (["the", "of", "data", "spark", "a", "is", "x1", "9", "42",
              "word", "row", "batch", "scan", "e", "er", "ererer",
              # non-ASCII words: md5 must hash identical UTF-8 bytes
              # and the BPE oracle's '(.)' must split CODEPOINTS the
              # way Python's list(word) does
              "café", "naïve", "日本語", "Größe", "łódź"]
             + [f"w{i}" for i in range(40)])
    rows = []
    for i in range(N_DOCS):
        kind = rng.random()
        if kind < 0.05:
            text = ""                      # empty doc
        elif kind < 0.10:
            text = rng.choice(vocab)       # single token
        elif kind < 0.20:
            # dense duplicate text — dedup gates must collide
            text = " ".join(["dup"] * rng.randint(5, 30))
        else:
            n = rng.randint(2, 120)
            text = " ".join(rng.choices(vocab, k=n))
        rows.append((i, text,
                     rng.choice(["en", "de", "fr", "xx"]),
                     rng.choice(["web", "wiki", "book"]),
                     len(text)))
    return rows


_DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
                "n_chars long")


@pytest.fixture(scope="module")
def rand_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("randsf")
    (spark.createDataFrame(_random_docs(random.Random(SEED)), _DOCS_SCHEMA)
     .repartition(3)
     .write.mode("overwrite").parquet(str(d / "documents.parquet")))
    return str(d)


def test_pipeline_gates_match_oracles_on_random_corpus(spark, rand_dir):
    failures = _compare(spark, rand_dir, ["documents"],
                        _pipeline_pairs(GATES))
    assert not failures, failures


@pytest.fixture(scope="module")
def rand_tables_dir(spark, tmp_path_factory):
    import datetime

    d = tmp_path_factory.mktemp("randsf2")
    rng = random.Random(SEED + 1)
    dim = 64
    vecs = []
    for i in range(120):
        kind = rng.random()
        if kind < 0.04:
            v = [0.0] * dim                       # zero vector
        elif kind < 0.12 and vecs:
            v = list(vecs[rng.randrange(len(vecs))][1])  # exact dup
        elif kind < 0.2:
            v = [rng.uniform(-1e-4, 1e-4) for _ in range(dim)]
        else:
            v = [rng.uniform(-1, 1) for _ in range(dim)]
        vecs.append((i, v, rng.randrange(4)))
    (spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int")
     .repartition(3)
     .write.mode("overwrite").parquet(str(d / "embeddings.parquet")))

    t0 = datetime.datetime(2024, 1, 1)
    evs = []
    for i in range(400):
        user = rng.randrange(25)
        if rng.random() < 0.2 and evs:
            ts = evs[-1][1]                       # duplicate timestamp
        else:
            ts = t0 + datetime.timedelta(seconds=rng.randrange(86400 * 3))
        val = rng.choice([0.0, 1.0, 1.0, -5.5, rng.uniform(-100, 100)])
        props = rng.choice(
            [f'{{"k": {rng.randrange(100)}}}', "{}", "not json", "",
             '{"k": 1.5}', '{"k": "7"}',          # fractional / quoted
             '{"k": 99999999999999999999}'])      # int64 overflow
        evs.append((i, ts, user,
                    rng.choice(["click", "view", "purchase", "error",
                                "signup"]),
                    val, props))
    (spark.createDataFrame(
        evs, "event_id long, ts timestamp, user_id long, "
             "event_type string, value double, props string")
     .repartition(3)
     .write.mode("overwrite").parquet(str(d / "events.parquet")))
    return str(d)


@pytest.mark.parametrize("gates,view", [(EMBED_GATES, "embeddings"),
                                        (EVENT_GATES, "events")])
def test_embed_and_event_gates_match_on_random_tables(
        spark, rand_tables_dir, gates, view):
    failures = _compare(spark, rand_tables_dir, [view],
                        _pipeline_pairs(gates))
    assert not failures, failures


def test_trim_spans_matches_on_random_corpus(spark, rand_dir):
    """x_trim_spans / x_soft_dedup (battery-registered at the r16 swap;
    these random-corpus rows predate and outlive the registration per
    the standing gate-admission rule): the dense-dup docs ("dup dup dup …")
    exercise self-overlapping windows and fat dup clusters,
    empty/single-token docs the passthrough, and unicode words the
    byte-for-byte reassembly."""
    from sparkdon.pipeline.clusters import _SOFT_DEDUP_ORACLE, x_soft_dedup
    from sparkdon.pipeline.dedup import _TRIM_ORACLE, x_trim_spans
    from sparkdon.pipeline.packing import (_CHUNK_STRIDE_ORACLE,
                                           x_chunk_stride)
    from sparkdon.pipeline.sampling import (_DSIR_ORACLE,
                                            _KEEP_TOP_APPROX_ORACLE,
                                            x_dsir_weights,
                                            x_keep_top_approx)
    from sparkdon.pipeline.text import _HLL_UNION_ORACLE, x_hll_union

    failures = _compare(spark, rand_dir, ["documents"],
                        [("x_trim_spans", x_trim_spans, _TRIM_ORACLE),
                         ("x_soft_dedup", x_soft_dedup,
                          _SOFT_DEDUP_ORACLE),
                         ("x_dsir_weights", x_dsir_weights,
                          _DSIR_ORACLE),
                         ("x_keep_top_approx", x_keep_top_approx,
                          _KEEP_TOP_APPROX_ORACLE),
                         ("x_chunk_stride", x_chunk_stride,
                          _CHUNK_STRIDE_ORACLE),
                         ("x_hll_union", x_hll_union,
                          _HLL_UNION_ORACLE)])
    assert not failures, failures


def test_decontam_matches_on_random_tables(spark, rand_tables_dir):
    """The r15 unregistered r17+ swap candidate (x_decontam_embed) goes
    through the battery ahead of registration: the random embeddings
    tier's zero vectors hit the NULL-cosine lane, exact dups guarantee
    true flags whenever a dup pair crosses the mod-29 bench/corpus
    split, and near-zero magnitudes stress the scaled floor."""
    from sparkdon.pipeline.ann import _DECONTAM_ORACLE, x_decontam_embed

    failures = _compare(spark, rand_tables_dir, ["embeddings"],
                        [("x_decontam_embed", x_decontam_embed,
                          _DECONTAM_ORACLE)])
    assert not failures, failures


def test_staged_gates_match_on_random_corpus(spark, rand_dir):
    """The r15-staged gates go through the same random-corpus
    differential ahead of registration — empty docs score the bias,
    zero-token docs pack with zero-width spans, and the pinned merge
    list encodes arbitrary vocabulary."""
    from sparkdon.pipeline.staged_gates import STAGED, STAGED_ORACLE

    pairs = [(k, STAGED[k], STAGED_ORACLE[k]) for k in sorted(STAGED)]
    failures = _compare(spark, rand_dir, ["documents"], pairs)
    assert not failures, failures


def _random_tpch(rng):
    """Random TPC-H-shaped tables with the shapes the fixture lacks:
    customers with zero orders, a nation with zero customers, balances
    exactly AT the filter thresholds the gates use, negative balances,
    odd-cent money (the .xx5 rounding boundary), duplicate names, an
    empty segment string, tied order dates."""
    import datetime

    region = [(i, n) for i, n in enumerate(
        ["AMERICA", "ASIA", "AFRICA", "EUROPE", "MIDDLE EAST"])]
    nation = [(i, f"NATION{i:02d}", rng.randrange(5)) for i in range(25)]
    # nation 24 gets no customers/suppliers (empty FK target)
    segs = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD",
            "FURNITURE", ""]
    bals = [0.0, 1000.0, 4500.5, 5000.0, 9000.0, -999.99]
    customer = []
    for i in range(120):
        bal = (rng.choice(bals) if rng.random() < 0.2
               else rng.randrange(-99999, 1000000) / 100.0)
        customer.append((i, f"Customer#{i % 40:09d}",  # duplicate names
                         rng.randrange(24), bal, rng.choice(segs)))
    supplier = [(i, f"Supplier#{i:09d}", rng.randrange(24),
                 rng.randrange(-9999, 999999) / 100.0) for i in range(25)]
    part = [(i, f"{rng.choice(['green', 'red'])} part {i}",
             f"Brand#{rng.randrange(5)}{rng.randrange(5)}",
             rng.choice(["ECONOMY BRUSHED", "STANDARD POLISHED",
                         "SMALL PLATED"]),
             rng.randrange(1, 50), rng.randrange(90000, 200000) / 100.0)
            for i in range(40)]
    t0 = datetime.datetime(2023, 1, 1)
    orders, lineitem = [], []
    ok = 0
    for c, *_ in customer:
        if c % 5 == 0:
            continue                       # orderless customers
        for _ in range(rng.randrange(0, 5)):
            od = t0 + datetime.timedelta(days=rng.randrange(0, 900))
            orders.append((ok, c, rng.choice("OFP"),
                           rng.randrange(100000, 40000000) / 100.0, od,
                           rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM",
                                       "4-NOT SPECIFIED", "5-LOW"])))
            for ln in range(1, rng.randrange(1, 5)):
                lineitem.append((
                    ok, rng.randrange(40), rng.randrange(25), ln,
                    float(rng.randrange(1, 51)),
                    rng.randrange(90000, 10000000) / 100.0,
                    rng.randrange(0, 11) / 100.0,
                    rng.randrange(0, 9) / 100.0,
                    rng.choice("ANR"), rng.choice("OF"),
                    od + datetime.timedelta(days=rng.randrange(1, 120))))
            ok += 1
    return {
        "region": (region, "r_regionkey int, r_name string"),
        "nation": (nation,
                   "n_nationkey int, n_name string, n_regionkey int"),
        "customer": (customer,
                     "c_custkey long, c_name string, c_nationkey int, "
                     "c_acctbal double, c_mktsegment string"),
        "supplier": (supplier,
                     "s_suppkey long, s_name string, s_nationkey int, "
                     "s_acctbal double"),
        "part": (part, "p_partkey long, p_name string, p_brand string, "
                       "p_type string, p_size int, p_retailprice double"),
        "orders": (orders,
                   "o_orderkey long, o_custkey long, o_orderstatus "
                   "string, o_totalprice double, o_orderdate timestamp, "
                   "o_orderpriority string"),
        "lineitem": (lineitem,
                     "l_orderkey long, l_partkey long, l_suppkey long, "
                     "l_linenumber int, l_quantity double, "
                     "l_extendedprice double, l_discount double, "
                     "l_tax double, l_returnflag string, "
                     "l_linestatus string, l_shipdate timestamp"),
    }


def _write_tpch(spark, d, tables, rand_dir, rand_tables_dir):
    import shutil

    for name, (rows, schema) in tables.items():
        (spark.createDataFrame(rows, schema).repartition(2)
         .write.mode("overwrite").parquet(str(d / f"{name}.parquet")))
    # documents/events gates in the same battery read from one dir
    shutil.copytree(f"{rand_dir}/documents.parquet",
                    str(d / "documents.parquet"))
    shutil.copytree(f"{rand_tables_dir}/events.parquet",
                    str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def rand_tpch_dir(spark, tmp_path_factory, rand_dir, rand_tables_dir):
    return _write_tpch(spark, tmp_path_factory.mktemp("randtpch"),
                       _random_tpch(random.Random(SEED + 2)),
                       rand_dir, rand_tables_dir)


def test_relational_and_sparql_gates_match_on_random_tpch(
        spark, rand_tpch_dir):
    """Every relational-battery and SPARQL-engine gate against its
    oracle on the random TPC-H instance — the SPARQL side additionally
    re-derives the rdf-ization on the new tables, so the compiler,
    paths, and engine entry points are differentially tested on data
    with empty joins, threshold-exact filters, and money boundaries the
    fixture never exercises."""
    failures = _compare(spark, rand_tpch_dir, TPCH_TABLES,
                        _engine_pairs())
    assert not failures, failures


@pytest.fixture(scope="module")
def rand_tpch_nulls_dir(spark, tmp_path_factory, rand_dir,
                        rand_tables_dir):
    """The TPC-H instance with NULL c_acctbal on ~15% of customers:
    rdfize emits NO triple for a null value, so SPARQL OPTIONAL /
    aggregates / censuses must align with SQL NULL semantics — the
    fixture (no nulls anywhere) cannot test that."""
    rng = random.Random(SEED + 3)
    tables = _random_tpch(rng)
    cust, schema = tables["customer"]
    cust = [(k, n, nk, (None if rng.random() < 0.15 else bal), seg)
            for k, n, nk, bal, seg in cust]
    tables["customer"] = (cust, schema)
    return _write_tpch(spark, tmp_path_factory.mktemp("randtpchnull"),
                       tables, rand_dir, rand_tables_dir)


def test_sparql_gates_match_with_null_columns(spark, rand_tpch_nulls_dir):
    """All 38 SPARQL gates (plus the relational battery) against their
    oracles when a column carries NULLs — the null → no-triple →
    unbound chain must line up with SQL NULL end to end.  First run of
    this shape caught the census oracles counting count(*) where
    rdfize emits only non-null triples."""
    failures = _compare(spark, rand_tpch_nulls_dir, TPCH_TABLES,
                        _engine_pairs())
    assert not failures, failures


def test_documents_gates_match_with_null_text(spark, tmp_path_factory):
    """The documents battery again with NULL text on ~10% of rows —
    crawl pipelines see null text after failed extraction, and every
    gate/oracle pair must agree on it (swept clean on first run r13;
    kept as regression)."""
    d = tmp_path_factory.mktemp("randnulldocs")
    rng = random.Random(SEED + 4)
    rows = [(i, (None if rng.random() < 0.1 else t), l, s, n)
            for i, t, l, s, n in _random_docs(rng)]
    (spark.createDataFrame(rows, _DOCS_SCHEMA)
     .repartition(3)
     .write.mode("overwrite").parquet(str(d / "documents.parquet")))
    failures = _compare(spark, str(d), ["documents"],
                        _pipeline_pairs(GATES))
    assert not failures, failures


def test_documents_gates_match_with_adversarial_whitespace(
        spark, tmp_path_factory):
    """The documents battery with whitespace-adversarial text on ~25%
    of rows — consecutive/leading/trailing spaces make split(' ')
    manufacture empty-string tokens, the one place Spark's regex split
    and DuckDB's string_split could drift (r14; the r13 batteries only
    ever joined with single spaces).  Runs the doc gates AND the
    r16-registered x_trim_spans, whose byte-for-byte reassembly must
    reproduce the original spacing on untouched docs."""
    d = tmp_path_factory.mktemp("randwsdocs")
    rng = random.Random(SEED + 5)
    rows = []
    for i, t, l, s, n in _random_docs(rng):
        r = rng.random()
        if r < 0.08:
            t = "  " + t                       # leading run
        elif r < 0.16:
            t = t + " "                        # trailing space
        elif r < 0.25:
            t = t.replace(" ", "  ", 3)        # internal double spaces
        rows.append((i, t, l, s, len(t)))
    (spark.createDataFrame(rows, _DOCS_SCHEMA)
     .repartition(3)
     .write.mode("overwrite").parquet(str(d / "documents.parquet")))
    from sparkdon.pipeline.dedup import _TRIM_ORACLE, x_trim_spans

    failures = _compare(
        spark, str(d), ["documents"],
        _pipeline_pairs(GATES)
        + [("x_trim_spans", x_trim_spans, _TRIM_ORACLE)])
    assert not failures, failures
