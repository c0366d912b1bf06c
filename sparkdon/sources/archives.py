"""TAR archive ingestion — the other container corpora arrive in
(arXiv source dumps, academic bulk exports, internal document drops
are ``.tar`` / ``.tar.gz`` of files).

Same scale shape as the WARC reader: a tar (and especially a tar.gz)
is not block-splittable, so the FILE is the unit of parallelism —
``binaryFile`` scan, one task per archive, members exploded to rows in
a narrow Arrow stage.  Member payloads then flow into
:func:`sparkdon.multimodal.extract_text` / ``extract_metadata`` like
any other document rows.
"""

from __future__ import annotations

import io
import lzma
import tarfile
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: output schema of read_tar
TAR_SCHEMA = ("archive string, member string, size long, "
              "mtime long, payload binary")


def tar_members(data: bytes, max_member_bytes: int = 1 << 28):
    """One tar[.gz|.bz2|.xz] file's bytes → (name, size, mtime, bytes)
    for every regular-file member.  ``max_member_bytes`` bounds memory
    against hostile archives (a member claiming petabytes); oversized
    members are skipped, not truncated — a partial document is worse
    than a missing one."""
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
        for info in tf:
            if not info.isreg():
                continue
            if info.size > max_member_bytes:
                continue
            f = tf.extractfile(info)
            if f is None:
                continue
            yield info.name, info.size, info.mtime, f.read()


def read_tar(spark: SparkSession, path: str,
             max_member_bytes: int = 1 << 28) -> DataFrame:
    """Distributed tar scan: ``binaryFile`` over ``path`` → one row per
    member file.  One archive = one task (tar.gz is one gzip stream —
    not splittable); corrupt archives contribute their readable prefix
    (tarfile raises past the good members, same tolerance contract as
    the WARC reader)."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                try:
                    for name, size, mtime, payload in tar_members(
                            bytes(content), max_member_bytes):
                        rows.append((fname, name, size, int(mtime),
                                     payload))
                except (tarfile.TarError, EOFError, OSError,
                        zlib.error, lzma.LZMAError):
                    # truncated/corrupt archives (the COMPRESSION layer
                    # raises EOFError/OSError/zlib/lzma errors, not
                    # TarError) keep the members already yielded
                    pass
            yield pd.DataFrame(rows, columns=["archive", "member",
                                              "size", "mtime", "payload"])

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(run, TAR_SCHEMA)


def tar_bytes(members: list[tuple], gz: bool = False) -> bytes:
    """Writer twin: ``(name, payload)`` pairs → tar[.gz] bytes."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz" if gz else "w") as tf:
        for name, payload in members:
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tf.addfile(info, io.BytesIO(payload))
    return buf.getvalue()
