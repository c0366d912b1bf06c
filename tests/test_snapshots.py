"""Versioned corpus snapshots (sparkdon/sources/snapshots.py, round 11):
append/overwrite commits, time travel, atomic-commit semantics, diff,
and vacuum."""

import json
import os

import pytest

from sparkdon.sources.snapshots import (read_snapshot, snapshot_diff,
                                        snapshot_versions, vacuum_snapshots,
                                        write_snapshot)


def _docs(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(lo, hi)], "doc_id long, text string")


def test_append_commits_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "corpus")
    v0 = write_snapshot(_docs(spark, 0, 10), root)
    v1 = write_snapshot(_docs(spark, 10, 15), root, meta={"crawl": "b"})
    assert (v0, v1) == (0, 1)
    assert snapshot_versions(root) == [0, 1]
    # latest sees both slices, v0 is frozen forever
    assert read_snapshot(spark, root).count() == 15
    assert read_snapshot(spark, root, version=0).count() == 10
    got = sorted(r.doc_id for r in read_snapshot(spark, root).collect())
    assert got == list(range(15))


def test_overwrite_starts_fresh_but_keeps_history(spark, tmp_path):
    root = str(tmp_path / "corpus")
    write_snapshot(_docs(spark, 0, 10), root)
    write_snapshot(_docs(spark, 100, 103), root, mode="overwrite")
    assert read_snapshot(spark, root).count() == 3
    assert read_snapshot(spark, root, version=0).count() == 10
    d = snapshot_diff(root, 0, 1)
    assert d["added"] and d["removed"]


def test_commit_is_manifest_rename_and_single_writer_guard(spark, tmp_path):
    root = str(tmp_path / "corpus")
    write_snapshot(_docs(spark, 0, 5), root)
    mdir = tmp_path / "corpus" / "_manifests"
    # a crashed half-commit (.tmp) is invisible to readers
    (mdir / "v00000001.json.deadbeef.tmp").write_text("{")
    assert snapshot_versions(root) == [0]
    assert read_snapshot(spark, root).count() == 5
    # a lost race onto an existing version number fails loudly
    m = json.loads((mdir / "v00000000.json").read_text())
    assert m["version"] == 0 and m["parent"] is None
    (mdir / "v00000001.json").write_text(json.dumps(
        {"version": 1, "parent": 0, "operation": "append",
         "files": m["files"], "meta": {}}))
    import sparkdon.sources.snapshots as snap
    orig = snap.snapshot_versions
    try:
        snap.snapshot_versions = lambda r: [0]  # racer thinks v1 is free
        with pytest.raises(RuntimeError, match="already committed"):
            write_snapshot(_docs(spark, 5, 6), root)
    finally:
        snap.snapshot_versions = orig


def test_read_missing_version_errors(spark, tmp_path):
    root = str(tmp_path / "corpus")
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root)
    write_snapshot(_docs(spark, 0, 3), root)
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=9)


def test_vacuum_drops_only_unreachable_files(spark, tmp_path):
    root = str(tmp_path / "corpus")
    write_snapshot(_docs(spark, 0, 5), root)                    # v0
    write_snapshot(_docs(spark, 5, 8), root)                    # v1 = v0+new
    write_snapshot(_docs(spark, 100, 102), root, mode="overwrite")  # v2
    write_snapshot(_docs(spark, 102, 104), root)                # v3 = v2+new
    removed = vacuum_snapshots(root, keep_last=2)
    # v0/v1 manifests gone; their files unreachable from v2/v3 → deleted
    assert snapshot_versions(root) == [2, 3]
    assert removed                                  # something was deleted
    assert read_snapshot(spark, root, version=3).count() == 4
    assert read_snapshot(spark, root, version=2).count() == 2
    for rel in removed:
        assert not os.path.exists(os.path.join(root, rel))
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=0)


def test_vacuum_sweeps_dirs_markers_and_orphans(spark, tmp_path):
    root = str(tmp_path / "corpus")
    write_snapshot(_docs(spark, 0, 5), root)                        # v0
    write_snapshot(_docs(spark, 100, 102), root, mode="overwrite")  # v1
    write_snapshot(_docs(spark, 102, 104), root)                    # v2
    data_root = tmp_path / "corpus" / "data"
    # orphan from a writer that crashed before its manifest commit,
    # versioned BELOW the keep floor
    orphan = data_root / "v00000000-deadbeefcafe"
    orphan.mkdir()
    (orphan / "part-00000-x.parquet").write_bytes(b"junk")
    (orphan / "_SUCCESS").write_bytes(b"")
    removed = vacuum_snapshots(root, keep_last=2)
    assert snapshot_versions(root) == [1, 2]
    # v0's whole per-commit dir is gone (parquet, _SUCCESS, the dir),
    # and so is the orphan; kept dirs intact
    leftover = sorted(p.name for p in data_root.iterdir())
    assert all(p.startswith(("v00000001-", "v00000002-")) for p in leftover)
    assert any(r.endswith(".parquet") for r in removed)
    assert read_snapshot(spark, root, version=2).count() == 4


def test_vacuum_never_deletes_files_reachable_from_retained_manifest(
        spark, tmp_path):
    """r11 VERDICT #5: an append-chain keeps ancestor files live — a
    per-commit dir far below the keep floor must survive vacuum whole
    as long as any retained manifest references a file in it."""
    root = str(tmp_path / "corpus")
    write_snapshot(_docs(spark, 0, 5), root)      # v0 — ancestor files
    write_snapshot(_docs(spark, 5, 8), root)      # v1 = v0 + new
    write_snapshot(_docs(spark, 8, 9), root)      # v2 = v1 + new
    write_snapshot(_docs(spark, 9, 10), root)     # v3 = v2 + new
    removed = vacuum_snapshots(root, keep_last=2)
    # v0/v1 manifests drop, but EVERY data file is still referenced by
    # the retained v2/v3 manifests — nothing physical may be deleted
    assert removed == []
    assert snapshot_versions(root) == [2, 3]
    assert read_snapshot(spark, root, version=2).count() == 9
    assert read_snapshot(spark, root, version=3).count() == 10
    got = sorted(r.doc_id for r in read_snapshot(spark, root).collect())
    assert got == list(range(10))


def test_vacuum_racing_reader_fails_loudly_not_silently(spark, tmp_path):
    """The documented concurrent-reader window: a frame planned against
    a version that vacuum then reclaims must ERROR on execution, never
    silently return a shrunken corpus; post-vacuum time travel to the
    reclaimed version errors at plan time."""
    root = str(tmp_path / "corpus")
    write_snapshot(_docs(spark, 0, 6), root)                        # v0
    write_snapshot(_docs(spark, 100, 102), root, mode="overwrite")  # v1
    write_snapshot(_docs(spark, 102, 103), root)                    # v2
    old = read_snapshot(spark, root, version=0)   # planned pre-vacuum
    assert vacuum_snapshots(root, keep_last=2)    # reclaims v0's files
    with pytest.raises(Exception):                # loud mid-job failure
        old.count()
    with pytest.raises(FileNotFoundError):        # loud at plan time
        read_snapshot(spark, root, version=0)
    # retained versions unaffected
    assert read_snapshot(spark, root, version=2).count() == 3


def test_commit_race_loses_loudly_not_silently(spark, tmp_path):
    # exclusive-create commit: with the version already taken, the
    # second writer's manifest must NOT clobber the first
    root = str(tmp_path / "corpus")
    write_snapshot(_docs(spark, 0, 3), root)
    mdir = tmp_path / "corpus" / "_manifests"
    first = (mdir / "v00000000.json").read_text()
    import sparkdon.sources.snapshots as snap
    orig = snap.snapshot_versions
    try:
        snap.snapshot_versions = lambda r: []      # racer targets v0 again
        with pytest.raises(RuntimeError, match="already committed"):
            write_snapshot(_docs(spark, 9, 10), root)
    finally:
        snap.snapshot_versions = orig
    assert (mdir / "v00000000.json").read_text() == first   # untouched
    assert not list(mdir.glob("*.tmp"))                     # tmp cleaned


def test_streaming_commits_versioned_corpus(spark, tmp_path):
    """Composition: a streaming source's micro-batches committed as
    snapshot versions via foreachBatch — each batch is an atomic,
    time-travelable corpus version (the incremental-crawl shape)."""
    import pandas as pd

    root = str(tmp_path / "corpus")
    src = tmp_path / "in"
    src.mkdir()
    pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]}).to_parquet(
        src / "b0.parquet")
    pd.DataFrame({"doc_id": [3], "text": ["c"]}).to_parquet(
        src / "b1.parquet")

    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (stream.writeStream.foreachBatch(
            lambda bdf, _bid: write_snapshot(bdf, root, meta={"batch": _bid}))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    assert q.awaitTermination(120)
    versions = snapshot_versions(root)
    assert len(versions) == 2
    assert read_snapshot(spark, root).count() == 3      # cumulative
    assert read_snapshot(spark, root, version=versions[0]).count() in (1, 2)
