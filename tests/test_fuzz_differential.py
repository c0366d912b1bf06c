"""Seeded random differential battery: generated SPARQL through the
full engine stack vs mechanically-generated SQL on DuckDB.

The hand-written oracle gates cover chosen shapes; this battery walks a
constrained query grammar (patterns over the rdf-ized customer/nation
schema, numeric/string filters, optional group-count, optional
order+limit) with a FIXED seed, so it is deterministic in CI yet covers
combinations nobody hand-picked.  Every case asserts the engine's bag
of rows equals DuckDB's on the original relational tables — the same
compare the driver runs, minus the hashing.
"""

import math
import os
import random
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
#: 40 through round 11; 70 in round 12 with five new grammar
#: productions (EXISTS semi, MINUS, HAVING, DISTINCT, bag UNION); 85 in
#: round 13 with three more (sequence-path sugar for the FK hops,
#: ORDER BY a unique STR(?c) key + LIMIT/OFFSET — the one shape where a
#: cutoff is deterministic — and !BOUND after a scoped OPTIONAL)
N_CASES = 85
SEED = 20260814

#: (sparql var, predicate, sql column, type)
CUSTOMER_ATTRS = [
    ("name", "p:c_name", "c_name", "str"),
    ("bal", "p:c_acctbal", "c_acctbal", "double"),
    ("seg", "p:c_mktsegment", "c_mktsegment", "str"),
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    return str(v)


def gen_case(rng):
    """One random case: returns (sparql, sql, schema_dict, tables)."""
    attrs = rng.sample(CUSTOMER_ATTRS, rng.randint(1, len(CUSTOMER_ATTRS)))
    join_nation = rng.random() < 0.5
    patterns = [f"?c {p} ?{v} ." for v, p, _, _ in attrs]
    sql_cols = {v: c for v, _, c, _ in attrs}
    joins = ""
    tables = ("region", "nation", "customer", "supplier")
    opt_schema = {}
    if join_nation:
        # half the cases spell the FK hop as sequence-path sugar — the
        # compiled plan must be the same join either way (r13)
        path_style = rng.random() < 0.5
        if path_style:
            patterns.append("?c p:c_nationkey/p:n_name ?nname .")
        else:
            patterns.append("?c p:c_nationkey ?n . ?n p:n_name ?nname .")
        sql_cols["nname"] = "n_name"
        joins = " JOIN nation ON c_nationkey = n_nationkey"
        if rng.random() < 0.4:  # second FK hop to region
            if path_style:
                patterns.append(
                    "?c p:c_nationkey/p:n_regionkey/p:r_name ?rname .")
            else:
                patterns.append(
                    "?n p:n_regionkey ?r . ?r p:r_name ?rname .")
            sql_cols["rname"] = "r_name"
            joins += " JOIN region ON n_regionkey = r_regionkey"
    # OPTIONAL with the filter scoped INSIDE: binds only when the same
    # row clears the bar, NULL otherwise (left-join semantics on self)
    notbound_bar = None
    if "bal" not in sql_cols and rng.random() < 0.35:
        bar = rng.choice([2000, 5000.25, 8000])
        patterns.append(
            f"OPTIONAL {{ ?c p:c_acctbal ?optbal FILTER(?optbal > {bar}) }}")
        sql_cols["optbal"] = (
            f"CASE WHEN c_acctbal > {bar} THEN c_acctbal ELSE NULL END")
        opt_schema["optbal"] = "double"
        if rng.random() < 0.3:
            # !BOUND after the scoped OPTIONAL (r13): keep only rows
            # where the optional arm did NOT bind — c_acctbal is
            # non-null in the fixture, so the SQL twin is the bar's
            # complement (and optbal projects as all-NULL on both sides)
            notbound_bar = bar

    filters, conds = [], []
    if notbound_bar is not None:
        filters.append("FILTER(!BOUND(?optbal))")
        conds.append(f"NOT (c_acctbal > {notbound_bar})")
    if any(v == "bal" for v, *_ in attrs) and rng.random() < 0.7:
        op = rng.choice(["<", ">", "<=", ">="])
        const = rng.choice([0, 1000, 4500.5, 9000])
        filters.append(f"FILTER(?bal {op} {const})")
        conds.append(f"c_acctbal {op} {const}")
    if any(v == "seg" for v, *_ in attrs) and rng.random() < 0.5:
        segs = rng.sample(
            ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"],
            rng.randint(1, 3))
        inlist = ", ".join(f'"{s}"' for s in segs)
        filters.append(f"FILTER(?seg IN ({inlist}))")
        conds.append("c_mktsegment IN (%s)" % ", ".join(f"'{s}'" for s in segs))
    if join_nation and rng.random() < 0.4:
        letter = rng.choice("ABCEIMU")
        filters.append(f'FILTER(STRSTARTS(?nname, "{letter}"))')
        conds.append(f"n_name LIKE '{letter}%'")
    if rng.random() < 0.3:  # anti-join: customers with no orders
        tables = tables + ("orders",)
        filters.append("FILTER NOT EXISTS { ?o p:o_custkey ?c }")
        conds.append("NOT EXISTS (SELECT 1 FROM orders "
                     "WHERE o_custkey = c_custkey)")
    elif rng.random() < 0.3:  # semi-join twin: customers WITH orders
        tables = tables + ("orders",)
        filters.append("FILTER EXISTS { ?o p:o_custkey ?c }")
        conds.append("EXISTS (SELECT 1 FROM orders "
                     "WHERE o_custkey = c_custkey)")
    if "seg" in sql_cols and rng.random() < 0.25:
        # MINUS on the shared ?c: removes customers whose segment
        # matches (compat-set semantics; segment is single-valued and
        # non-null, so the SQL twin is a plain inequality)
        seg = rng.choice(["BUILDING", "AUTOMOBILE", "MACHINERY"])
        filters.append(
            f'MINUS {{ ?c p:c_mktsegment "{seg}" }}')
        conds.append(f"c_mktsegment <> '{seg}'")

    # BIND arithmetic on the balance when projected
    if "bal" in sql_cols and rng.random() < 0.4:
        k = rng.choice([2, 10, 0.5])
        patterns.append(f"BIND(?bal * {k} AS ?scaled)")
        sql_cols["scaled"] = f"c_acctbal * {k}"
        opt_schema["scaled"] = "double"
    # VALUES-constrained segment (inline table join)
    if "seg" in sql_cols and rng.random() < 0.3:
        segs = rng.sample(["BUILDING", "MACHINERY", "HOUSEHOLD"], 2)
        patterns.append(
            "VALUES ?seg { %s }" % " ".join(f'"{s}"' for s in segs))
        conds.append("c_mktsegment IN (%s)"
                     % ", ".join(f"'{s}'" for s in segs))

    where = " ".join(patterns + filters)
    sql_where = (" WHERE " + " AND ".join(conds)) if conds else ""

    group_var = None
    if rng.random() < 0.4:
        groupable = [v for v in sql_cols if v in ("seg", "nname", "rname")]
        if groupable:
            group_var = rng.choice(groupable)

    if group_var:
        # COUNT always; MIN/MAX over the balance when it is in scope
        # (exactly portable — unlike a double SUM, whose partial-agg
        # addition order differs between engines at the ulp level)
        aggs_sparql = ["(COUNT(*) AS ?cnt)"]
        aggs_sql = ["COUNT(*) AS cnt"]
        schema = {group_var: "str", "cnt": "long"}
        if "bal" in sql_cols and rng.random() < 0.6:
            fn = rng.choice(["MIN", "MAX"])
            aggs_sparql.append(f"({fn}(?bal) AS ?m)")
            aggs_sql.append(f"{fn}(c_acctbal) AS m")
            schema["m"] = "double"
        having_sparql = having_sql = ""
        if rng.random() < 0.4:
            k = rng.choice([1, 3, 10])
            having_sparql = f" HAVING (COUNT(*) > {k})"
            having_sql = f" HAVING COUNT(*) > {k}"
        sparql = (f"SELECT ?{group_var} {' '.join(aggs_sparql)} "
                  f"{{ {where} }} GROUP BY ?{group_var}{having_sparql}")
        sql = (f"SELECT {sql_cols[group_var]} AS {group_var}, "
               f"{', '.join(aggs_sql)} FROM customer{joins}{sql_where} "
               f"GROUP BY {sql_cols[group_var]}{having_sql}")
        return sparql, sql, schema, tables

    proj = list(sql_cols)
    sel = " ".join(f"?{v}" for v in proj)
    distinct_kw = ""
    if rng.random() < 0.3:
        distinct_kw = "DISTINCT "  # set semantics must agree engine-wide
    sparql = f"SELECT {distinct_kw}{sel} {{ {where} }}"
    sql = (f"SELECT {distinct_kw}"
           + ", ".join(f"{sql_cols[v]} AS {v}" for v in proj)
           + f" FROM customer{joins}{sql_where}")
    if not distinct_kw and rng.random() < 0.25:
        # bag-semantics UNION of two segment-sliced copies of the body;
        # the slices may COINCIDE (sampled with replacement), in which
        # case every row must appear twice — the duplicate-preserving
        # case a set-union bug would collapse
        s1, s2 = (rng.choice(["BUILDING", "MACHINERY", "HOUSEHOLD"])
                  for _ in range(2))

        def arm(seg):
            return "{ " + where + f' ?c p:c_mktsegment "{seg}" . ' + "}"

        def one(seg):
            return ("SELECT "
                    + ", ".join(f"{sql_cols[v]} AS {v}" for v in proj)
                    + f" FROM customer{joins}{sql_where}"
                    + (" AND" if sql_where else " WHERE")
                    + f" c_mktsegment = '{seg}'")

        sparql = (f"SELECT {sel} {{ "
                  + arm(s1) + " UNION " + arm(s2) + " }")
        sql = one(s1) + " UNION ALL " + one(s2)
        # return before the ORDER BY rewrite below — it rebuilds the
        # SPARQL from the single-arm body and would drop the union
        base_types = {v: t for v, _, _, t in attrs}
        base_types.update({"nname": "str", "rname": "str"})
        base_types.update(opt_schema)
        return sparql, sql, {v: base_types[v] for v in proj}, tables
    base_types = {v: t for v, _, _, t in attrs}
    base_types.update({"nname": "str", "rname": "str"})
    base_types.update(opt_schema)
    schema = {v: base_types[v] for v in proj}

    if not distinct_kw and rng.random() < 0.25:
        # deterministic top-k (r13): ORDER BY the UNIQUE customer IRI
        # string — the one shape where LIMIT/OFFSET has exactly one
        # answer (each surviving row carries a distinct ?c); SPARQL
        # codepoint order on plain strings = DuckDB binary collation
        k = rng.choice([5, 17, 60])
        off = rng.choice([0, 0, 10])
        tail = f" LIMIT {k}" + (f" OFFSET {off}" if off else "")
        sparql = (f"SELECT {sel} (STR(?c) AS ?cid) {{ {where} }} "
                  f"ORDER BY ?cid{tail}")
        sql = ("SELECT "
               + ", ".join(f"{sql_cols[v]} AS {v}" for v in proj)
               + ", 'urn:g:customer:' || c_custkey AS cid"
               + f" FROM customer{joins}{sql_where}"
               + f" ORDER BY cid{tail}")
        schema = {**schema, "cid": "str"}
        return sparql, sql, schema, tables

    if rng.random() < 0.3:
        order_v = rng.choice(proj)
        # a LIMIT under ORDER BY is only deterministic on a unique key;
        # none of these are, so order WITHOUT limit (full result, bag
        # compare is order-insensitive anyway) — the point is that
        # ORDER BY parses/compiles, not the cutoff.  distinct_kw must
        # ride along (review find: dropping it here left the SQL twin
        # DISTINCT while the SPARQL was a bag — 4/70 seeded cases were
        # silently inequivalent, passing only on a unique projection)
        sparql = (f"SELECT {distinct_kw}{sel} {{ {where} }} "
                  f"ORDER BY ?{order_v}")
    return sparql, sql, schema, tables


@pytest.fixture(scope="module")
def fuzz_cases():
    rng = random.Random(SEED)
    return [gen_case(rng) for _ in range(N_CASES)]


def test_random_differential_battery(spark, fuzz_cases):
    from sparkdon.rdf_queries import PREFIXES, run

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    failures = []
    for i, (sparql, sql, schema, tables) in enumerate(fuzz_cases):
        got = run(spark, SF, sparql, schema, tables=tables)
        grows = sorted(
            "|".join(canon(r[c]) for c in schema) for r in got.collect())
        cur = con.execute(sql)
        drows = sorted(
            "|".join(canon(v) for v in r) for r in cur.fetchall())
        if grows != drows:
            diffs = [(a, b) for a, b in zip(grows, drows) if a != b][:2]
            failures.append((i, sparql, len(grows), len(drows), diffs))
    assert not failures, failures
