"""Audit the DuckDB result types of every oracle_sql() entry.

The driver's correctness gate hashes values type-sensitively, while
scripts/check_correctness.py canonicalises through ``str()`` — so an
oracle whose result types diverge from what Spark emits (e.g. DuckDB
promoting SUM(BIGINT) to HUGEINT) passes locally but fails the driver.
This happened in round 7 (x_pack_sequences / x_corpus_pack).

This audit DESCRIBEs every oracle at sf0.001 and fails on any result
column whose type is outside the portable allowlist that maps 1:1 onto
Spark's types.  Run standalone or via tests/test_oracle_types.py.

Usage: python scripts/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

import duckdb

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types with an unambiguous Spark twin.  Notably ABSENT: HUGEINT
# (int128 — no Spark equivalent, hash-diverges), DECIMAL (scale/precision
# rarely matches Spark's), unsigned ints, TINYINT/SMALLINT (Spark aggs
# produce long), INTERVAL.
ALLOWED = {
    "BIGINT", "INTEGER", "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN",
    "DATE", "TIMESTAMP", "BLOB",
}
_LIST_RE = re.compile(r"^(.*)\[\]$")


def _base_ok(t: str) -> bool:
    t = t.strip()
    m = _LIST_RE.match(t)
    if m:
        return _base_ok(m.group(1))
    return t in ALLOWED


def audit(sf_dir: str = "/root/testdata/sf0.001"):
    """Return a list of (name, column, type) violations."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    import __spark_entry__ as entrymod

    bad, errs = [], []
    for name, sql in sorted(entrymod.oracle_sql().items()):
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 — report, don't abort the sweep
            errs.append((name, str(e)))
            continue
        for col, typ, *_ in rows:
            if not _base_ok(typ):
                bad.append((name, col, typ))
    return bad, errs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    bad, errs = audit(sf_dir)
    for name, err in errs:
        print(f"DESCRIBE-ERROR {name}: {err[:200]}")
    for name, col, typ in bad:
        print(f"NON-PORTABLE {name}.{col}: {typ}")
    if not bad and not errs:
        print("all oracle result types portable")
    sys.exit(1 if (bad or errs) else 0)


if __name__ == "__main__":
    main()
