"""Shared size/threshold helpers for deliberate join-strategy picks.

One definition of the ``spark.sql.autoBroadcastJoinThreshold`` parser so
the closure loops (:mod:`sparkdon.paths`) and the PageRank loop
(:mod:`sparkdon.pipeline.clusters`) cannot drift on the subtle
suffix-parsing rules (r17, advisor find: two hand-rolled copies)."""

from __future__ import annotations


def broadcast_threshold_bytes(spark) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` in bytes (≤0 disables).

    Accepts the same forms Spark does: a bare byte count or a
    ``k/m/g``/``kb/mb/gb``/``b`` suffix, case-insensitive."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                             "10485760")).strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if raw.endswith(suf):
            raw, mult = raw[: -len(suf)], m
            break
    try:
        return int(float(raw)) * mult
    except ValueError:
        return 10 << 20
