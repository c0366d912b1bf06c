"""Every oracle_sql() entry must produce only portable result types.

Guards the driver/replica gap found in round 7: DuckDB promotes
SUM(BIGINT) to HUGEINT, which hash-diverges from Spark's LongType under
the driver's type-sensitive value hash while passing the type-blind
local replica.  See scripts/audit_oracle_types.py for the allowlist.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.audit_oracle_types import audit  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_oracle_result_types_portable():
    bad, errs = audit(SF_DIR)
    assert not errs, f"oracle DESCRIBE errors: {errs}"
    assert not bad, (
        "non-portable oracle result types (would hash-diverge from Spark "
        f"under the driver's type-sensitive compare): {bad}"
    )
