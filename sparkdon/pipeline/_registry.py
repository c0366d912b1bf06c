"""Shared gate registry for the pipeline package: every family module
registers its driver-contract entries here, and the package facade
(:mod:`sparkdon.pipeline`) re-exports ``QUERIES`` / ``ORACLE`` exactly
as the former monolithic module did."""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: Dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLE[name] = sql
        return fn
    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Late-binding fixture loader: resolve ``table`` through the
    package facade at call time, so callers that patch
    ``sparkdon.pipeline.table`` (the old monolith's surface — several
    tests inject in-memory fixtures that way) redirect every family
    module's loads, exactly as they did when all gates lived in one
    module.  Unpatched, this is :func:`sparkdon.relational.table`."""
    from sparkdon import pipeline as _facade

    return _facade.table(spark, sf_dir, name)
