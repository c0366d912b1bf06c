"""The shared-frame pinning switch (r17, VERDICT r16 #7): every
multi-consumer subtree in the pipeline package is materialized through
``sparkdon.pipeline._registry.pin_shared``, whose primitive is selected
by ``SPARKDON_SHARED_FRAME_MODE``.  The default ``localCheckpoint`` is
unreplicated + lineage-truncating (an executor loss kills the query on
a real cluster); these tests pin that the switch actually swaps the
primitive so cluster runs can opt into fault tolerance without code
edits."""

from __future__ import annotations

import pytest

from sparkdon.pipeline._registry import pin_shared


def _spy(monkeypatch, calls):
    from pyspark.sql.classic.dataframe import DataFrame

    monkeypatch.setattr(
        DataFrame, "localCheckpoint",
        lambda self, eager=True: calls.append(("local", eager)) or self)
    monkeypatch.setattr(
        DataFrame, "checkpoint",
        lambda self, eager=True: calls.append(("reliable", eager)) or self)
    monkeypatch.setattr(
        DataFrame, "persist",
        lambda self, level=None: calls.append(("persist", level)) or self)
    monkeypatch.setattr(
        DataFrame, "count", lambda self: calls.append(("count", None)) or 0)


def test_default_mode_is_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARKDON_SHARED_FRAME_MODE", raising=False)
    calls: list = []
    df = spark.range(3)
    _spy(monkeypatch, calls)
    pin_shared(df)
    pin_shared(df, eager=False)
    assert calls == [("local", True), ("local", False)]


def test_reliable_mode_swaps_to_reliable_checkpoint(spark, monkeypatch):
    monkeypatch.setenv("SPARKDON_SHARED_FRAME_MODE", "reliable")
    calls: list = []
    df = spark.range(3)
    _spy(monkeypatch, calls)
    pin_shared(df)
    pin_shared(df, eager=False)
    assert calls == [("reliable", True), ("reliable", False)]


def test_persist_mode_persists_and_materializes_when_eager(spark, monkeypatch):
    monkeypatch.setenv("SPARKDON_SHARED_FRAME_MODE", "persist")
    calls: list = []
    df = spark.range(3)
    _spy(monkeypatch, calls)
    pin_shared(df, eager=False)
    assert [c[0] for c in calls] == ["persist"]
    calls.clear()
    pin_shared(df)
    assert [c[0] for c in calls] == ["persist", "count"]


def test_unknown_mode_raises(spark, monkeypatch):
    monkeypatch.setenv("SPARKDON_SHARED_FRAME_MODE", "bogus")
    with pytest.raises(ValueError, match="bogus"):
        pin_shared(spark.range(1))


def test_persist_mode_is_result_identical_end_to_end(spark, monkeypatch,
                                                     tmp_path):
    """A real (unspied) gate run under mode=persist returns the same
    rows as the default mode — the switch changes the materialization
    primitive, never the result."""
    import shutil

    sf = "/root/testdata/sf0.001"
    from sparkdon.pipeline.pq import x_pq_codes

    monkeypatch.delenv("SPARKDON_SHARED_FRAME_MODE", raising=False)
    base = sorted(map(tuple, x_pq_codes(spark, sf).collect()))
    monkeypatch.setenv("SPARKDON_SHARED_FRAME_MODE", "persist")
    got = sorted(map(tuple, x_pq_codes(spark, sf).collect()))
    assert got == base
    # reliable mode too, against a scratch checkpoint dir
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    monkeypatch.setenv("SPARKDON_SHARED_FRAME_MODE", "reliable")
    rel = sorted(map(tuple, x_pq_codes(spark, sf).collect()))
    assert rel == base
    shutil.rmtree(tmp_path / "ckpt", ignore_errors=True)
