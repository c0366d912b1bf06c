"""Versioned corpus snapshots — a manifest-log parquet layout for the
documents/curation tier (round 11).

The problem it solves: a training corpus is built INCREMENTALLY (each
crawl adds a slice; dedup/filters rewrite others), but training runs
need a REPRODUCIBLE corpus version — "the exact rows model X saw".
Directory-of-parquet cannot give that: a reader that lists a directory
while a writer appends sees a torn state, and yesterday's corpus is
gone once files churn.

Layout (the public Delta/Iceberg idea reduced to its load-bearing
minimum — data files are immutable, a tiny JSON manifest per version
names the exact file set, the manifest commit is one atomic rename)::

    <root>/data/v00000003-<token>/part-*.parquet   immutable, per-commit dir
    <root>/_manifests/v00000003.json               {version, parent, files,
                                                    operation, meta}

Scale shape: a manifest is FILE-COUNT-sized (a 100 TB corpus at 1 GB
files is a ~100k-line JSON — megabytes), so reads never pay a
recursive directory listing over object storage: ``read_snapshot``
hands Spark the exact file list.  Appends write only new files plus
one manifest; old versions stay readable forever (time travel) until
an explicit physical cleanup.  Writers are SINGLE-WRITER by contract
(the rename is atomic against readers, not against a concurrent
writer racing the same version number — a real multi-writer needs a
coordination service, which this container does not have; the
``version_exists`` collision check turns a lost race into a loud
error, not a silent overwrite).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"v{version:08d}.json")


def snapshot_versions(root: str) -> list[int]:
    """All committed versions, ascending.  A crashed half-written
    commit (``.tmp`` file) is invisible here — only renamed manifests
    count."""
    d = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    for f in os.listdir(d):
        if f.startswith("v") and f.endswith(".json"):
            try:
                out.append(int(f[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _load_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as fh:
        return json.load(fh)


def write_snapshot(df: DataFrame, root: str, mode: str = "append",
                   meta: dict | None = None) -> int:
    """Commit ``df`` as a new corpus version; returns the version number.

    ``mode="append"``: the new version = parent's file set + this
    frame's files (an incremental crawl slice).  ``mode="overwrite"``:
    the new version = this frame's files only (a full rebuild — old
    files stay on disk for older versions).  The data files land in a
    fresh per-commit directory (never touched again); the commit point
    is the manifest's atomic ``os.replace``."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    versions = snapshot_versions(root)
    version = (versions[-1] + 1) if versions else 0
    parent = versions[-1] if versions else None

    token = uuid.uuid4().hex[:12]
    data_dir = os.path.join(root, "data", f"v{version:08d}-{token}")
    df.write.mode("errorifexists").parquet(data_dir)
    files = sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.startswith("part-") and f.endswith(".parquet"))
    entries = [{"path": os.path.relpath(p, root),
                "bytes": os.path.getsize(p)} for p in files]
    if mode == "append" and parent is not None:
        entries = _load_manifest(root, parent)["files"] + entries

    manifest = {
        "version": version,
        "parent": parent,
        "operation": mode,
        "files": entries,
        "meta": meta or {},
    }
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(root, version) + f".{token}.tmp"
    final = _manifest_path(root, version)
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    # THE commit point.  os.link has exclusive-create semantics (unlike
    # os.replace, which silently clobbers), so two writers racing the
    # same version number get ONE winner and one loud error — an
    # exists() pre-check would be a TOCTOU hole.
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise RuntimeError(
            f"snapshot v{version} already committed — concurrent writer? "
            "(single-writer contract, see module docstring)") from None
    finally:
        os.unlink(tmp)
    return version


def read_snapshot(spark: SparkSession, root: str,
                  version: int | None = None) -> DataFrame:
    """The exact rows of a committed version (latest when None) — the
    reproducible-corpus read.  Spark gets the manifest's explicit file
    list, so no directory listing and no torn reads against an
    in-flight writer."""
    versions = snapshot_versions(root)
    if not versions:
        raise FileNotFoundError(f"no snapshots under {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise FileNotFoundError(f"snapshot v{version} not in {versions}")
    m = _load_manifest(root, version)
    paths = [os.path.join(root, e["path"]) for e in m["files"]]
    if not paths:
        raise ValueError(f"snapshot v{version} is empty")
    return spark.read.parquet(*paths)


def snapshot_diff(root: str, old: int, new: int) -> dict:
    """File-level diff between two versions: which immutable files a
    version added/removed.  (Row-level crawl diffs are
    :func:`sparkdon.sources.warc.crawl_diff` over the two
    ``read_snapshot`` frames.)"""
    a = {e["path"] for e in _load_manifest(root, old)["files"]}
    b = {e["path"] for e in _load_manifest(root, new)["files"]}
    return {"added": sorted(b - a), "removed": sorted(a - b)}


def vacuum_snapshots(root: str, keep_last: int = 2) -> list[str]:
    """Physically delete data files referenced ONLY by versions older
    than the last ``keep_last`` (and their manifests).  Time travel to
    vacuumed versions is gone — that is the explicit trade; returns the
    deleted file list (relative paths).

    Cleanup is COMPLETE for the reclaimed horizon: per-commit data
    directories whose commit version is below the keep floor are swept
    whole once no live file remains in them — including ``_SUCCESS``
    markers and ORPHANED directories from writers that crashed between
    the parquet write and the manifest commit.  Directories at or above
    the keep floor are never touched (an orphan there may be a commit
    in flight).

    Safety invariant: a file reachable from ANY retained manifest is
    never deleted, no matter how old its per-commit directory is — an
    append-chain keeps ancestor files live indefinitely.

    Concurrent-reader window: vacuum does not coordinate with readers.
    A ``read_snapshot`` frame built BEFORE a vacuum that reclaims its
    version fails LOUDLY mid-job on the missing files (Spark's default
    ``spark.sql.files.ignoreMissingFiles=false``) — it never silently
    returns a shrunken corpus.  Do NOT enable ``ignoreMissingFiles`` on
    sessions reading snapshots: it would turn that loud failure into a
    silent partial read.  After vacuum, time travel to a reclaimed
    version raises ``FileNotFoundError`` at plan time (manifest gone).
    Long reads of old versions must either finish before retention
    runs or pin ``keep_last`` above the version they read."""
    import re as _re
    import shutil

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = snapshot_versions(root)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    if not keep:
        return []
    keep_floor = keep[0]
    live = {e["path"] for v in keep for e in _load_manifest(root, v)["files"]}
    removed = []
    data_root = os.path.join(root, "data")
    pat = _re.compile(r"^v(\d{8})-")
    for d in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        m = pat.match(d)
        if not m or int(m.group(1)) >= keep_floor:
            continue
        ddir = os.path.join(data_root, d)
        has_live = any(
            os.path.relpath(os.path.join(ddir, f), root) in live
            for f in os.listdir(ddir))
        if has_live:
            continue  # an old version's files still reachable from keep
        for f in sorted(os.listdir(ddir)):
            rel = os.path.relpath(os.path.join(ddir, f), root)
            if f.startswith("part-") and f.endswith(".parquet"):
                removed.append(rel)
        shutil.rmtree(ddir)
    for v in drop:
        os.remove(_manifest_path(root, v))
    return removed
