"""Relational → RDF triple conversion (deterministic, JVM-side).

Maps the driver's TPC-H-ish tables onto the triple model so the SPARQL
engine can be exercised — and DuckDB-oracled — on the same data
(FIXTURES.md §B):

- row IRI:        ``urn:g:<table>:<key>``
- class triple:   ``<row> rdf:type urn:c:<table>``
- column triple:  ``<row> urn:p:<col> <literal>`` (xsd:integer / xsd:double
  typed, or plain string)
- FK columns become object properties linking row IRIs
  (``nation.n_regionkey → urn:g:region:<k>`` etc.), giving the graph real
  join structure for BGP/path queries.

Everything is built from ``select``/``unionByName`` over the parquet scans
— no Python row path, so the conversion itself scales with the cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkdon.terms import KIND_IRI, KIND_LIT, RDF, XSD

#: table -> (key column, [(column, kind)]) where kind is
#: 'int' | 'double' | 'str' | ('fk', target_table)
TABLE_SPEC = {
    "region": ("r_regionkey", [("r_name", "str")]),
    "nation": ("n_nationkey", [("n_name", "str"), ("n_regionkey", ("fk", "region"))]),
    "customer": (
        "c_custkey",
        [
            ("c_name", "str"),
            ("c_nationkey", ("fk", "nation")),
            ("c_acctbal", "double"),
            ("c_mktsegment", "str"),
        ],
    ),
    "supplier": (
        "s_suppkey",
        [("s_name", "str"), ("s_nationkey", ("fk", "nation")), ("s_acctbal", "double")],
    ),
    "orders": (
        "o_orderkey",
        [
            ("o_custkey", ("fk", "customer")),
            ("o_orderstatus", "str"),
            ("o_totalprice", "double"),
            ("o_orderpriority", "str"),
            ("o_orderdate", "datetime"),
        ],
    ),
}


def row_iri(table: str, key_col) -> F.Column:
    return F.concat(F.lit(f"urn:g:{table}:"), F.col(key_col).cast("string"))


def rdfize_table(df: DataFrame, table: str) -> DataFrame:
    key, cols = TABLE_SPEC[table]
    subject = row_iri(table, key)
    parts = [
        df.select(
            F.lit(KIND_IRI).alias("s_kind"),
            subject.alias("s"),
            F.lit(RDF + "type").alias("p"),
            F.lit(KIND_IRI).alias("o_kind"),
            F.lit(f"urn:c:{table}").alias("o"),
            F.lit(None).cast("string").alias("o_dt"),
            F.lit(None).cast("string").alias("o_lang"),
        )
    ]
    for col, kind in cols:
        pred = F.lit(f"urn:p:{col}")
        if isinstance(kind, tuple):
            _, target = kind
            o_kind, o, dt = (
                F.lit(KIND_IRI),
                F.concat(F.lit(f"urn:g:{target}:"), F.col(col).cast("string")),
                F.lit(None).cast("string"),
            )
        elif kind == "int":
            o_kind, o, dt = (
                F.lit(KIND_LIT), F.col(col).cast("string"), F.lit(XSD + "integer"))
        elif kind == "double":
            o_kind, o, dt = (
                F.lit(KIND_LIT), F.col(col).cast("string"), F.lit(XSD + "double"))
        elif kind == "datetime":
            o_kind, o, dt = (
                F.lit(KIND_LIT),
                F.date_format(F.col(col), "yyyy-MM-dd'T'HH:mm:ss"),
                F.lit(XSD + "dateTime"))
        else:
            o_kind, o, dt = (F.lit(KIND_LIT), F.col(col).cast("string"),
                             F.lit(None).cast("string"))
        parts.append(
            df.filter(F.col(col).isNotNull()).select(
                F.lit(KIND_IRI).alias("s_kind"),
                subject.alias("s"),
                pred.alias("p"),
                o_kind.alias("o_kind"),
                o.alias("o"),
                dt.alias("o_dt"),
                F.lit(None).cast("string").alias("o_lang"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def rdfize(spark: SparkSession, sf_dir: str,
           tables: tuple[str, ...] = ("region", "nation", "customer", "supplier"),
           located_in: bool = False) -> DataFrame:
    out = None
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        part = rdfize_table(df, t)
        out = part if out is None else out.unionByName(part)
    if located_in:
        out = out.unionByName(located_in_edges(spark, sf_dir))
    return out


def located_in_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A single shared predicate ``urn:p:locatedIn`` over the FK chain
    customer → nation → region — gives the graph a multi-level hierarchy
    so transitive property paths (G3/G4) have a SQL-expressible oracle."""

    def edge(df, src_tbl, src_key, dst_tbl, dst_key):
        return df.select(
            F.lit(KIND_IRI).alias("s_kind"),
            row_iri(src_tbl, src_key).alias("s"),
            F.lit("urn:p:locatedIn").alias("p"),
            F.lit(KIND_IRI).alias("o_kind"),
            F.concat(F.lit(f"urn:g:{dst_tbl}:"), F.col(dst_key).cast("string")).alias("o"),
            F.lit(None).cast("string").alias("o_dt"),
            F.lit(None).cast("string").alias("o_lang"),
        )

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return edge(cust, "customer", "c_custkey", "nation", "c_nationkey").unionByName(
        edge(nat, "nation", "n_nationkey", "region", "n_regionkey")
    )
