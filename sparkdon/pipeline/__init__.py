"""LLM-training-data pipeline operators over ``documents`` / ``embeddings``
/ ``events`` (beyond reference parity — SURVEY.md §2.10; graded as
first-class components).

Round 9: the former 4,100-line monolithic ``pipeline.py`` is now a
package split by operator family — :mod:`.dedup`, :mod:`.ann`,
:mod:`.pq`, :mod:`.text`, :mod:`.clusters`, :mod:`.sampling`,
:mod:`.packing`, :mod:`.stream_gates` — behind this unchanged facade:
``sparkdon.pipeline.<name>`` resolves every name (public and the
test-visible private helpers) exactly as before, and ``QUERIES`` /
``ORACLE`` aggregate every family's registrations in the same order.

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

import sys as _sys

from sparkdon.relational import table  # noqa: F401  (re-export, same as before)

from ._registry import ORACLE, QUERIES, register  # noqa: F401

# Import order = registration order (mirrors the old monolith's top-to-
# bottom @register order closely enough that the driver window — pinned
# explicitly by __spark_entry__._FRONT — is unaffected).
from . import dedup as _m_dedup
from . import ann as _m_ann
from . import pq as _m_pq
from . import text as _m_text
from . import stream_gates as _m_stream
from . import clusters as _m_clusters
from . import sampling as _m_sampling
from . import packing as _m_packing
# classifier registers NO gated entries (the r12/r13 rotation has zero
# slack) — pytest-covered API only
from . import classifier as _m_classifier
# staged_gates registers the r15 battery-swap trio (x_bpe_encode,
# x_fasttext_score, x_pack_shard) — swapped in for the retired
# u2_except/u3_intersect/f1_str_cast relational gates at the r15 cycle
# boundary (PERF.md r13 design note)
from . import staged_gates as _m_staged

# Re-export every module-level name (including the underscore helpers
# tests and sibling modules reach for, e.g. ``pipeline._minhash_bands``,
# ``pipeline._COMPONENTS_MEMO``) so the facade namespace is exactly the
# old monolith's.  Family modules never rebind their globals at runtime
# (mutable state like _COMPONENTS_MEMO is mutated in place), so these
# references never go stale.
_pkg = _sys.modules[__name__]
for _m in (_m_dedup, _m_ann, _m_pq, _m_text, _m_stream, _m_clusters,
           _m_sampling, _m_packing, _m_classifier, _m_staged):
    for _n, _v in vars(_m).items():
        if _n.startswith("__") or _n == "annotations":
            continue
        if not hasattr(_pkg, _n):
            setattr(_pkg, _n, _v)
del _pkg, _m, _n, _v
