"""``spark.read.format("warc")`` — WARC archives as a native Python
Data Source (Spark 4 API), wrapping :mod:`sparkdon.sources.warc`'s
parser in the engine's own reader plumbing.

Two partition modes, matching the scan contracts documented on
``read_warc``:

- **Default: one ``InputPartition`` per file** (gzip WARC is not
  block-splittable) — Common Crawl's uniform ~1 GB layout saturates a
  cluster this way with zero shuffle.
- **``option("index", <parquet dir>)``: one partition per index span.**
  Point it at a persisted :func:`sparkdon.sources.warc.warc_split_index`
  result (or a CDX-derived ``(warc_file, offset, length)`` frame) and
  each task seek-reads one ~target-sized byte range — the skew-bounded
  plan for mixed-size archive sets.  The index parquet is read
  driver-side with pyarrow at planning time (it is file-count-sized,
  not data-sized).

Paths are POSIX-reachable filesystems (local dir, NFS/fuse), the same
contract as ``read_warc_ranges``/``write_warc``.  Usage::

    spark.dataSource.register(WarcDataSource)
    df = spark.read.format("warc").option("path", "/crawl/segment0").load()
    # balanced: persist warc_split_index(...) as parquet, then
    df = (spark.read.format("warc")
          .option("path", "/crawl/segment0")
          .option("index", "/crawl/segment0.splits").load())
    # streaming ingestion: new files landing in the directory arrive
    # as micro-batches, checkpoint-resumable (see WarcStreamReader)
    stream = spark.readStream.format("warc").option("path", "/landing").load()
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import StructType

from .warc import WARC_SCHEMA, _local_path, parse_warc_records

#: column order of the emitted tuples (must match WARC_SCHEMA)
_COLS = ("record_id", "warc_type", "target_uri", "warc_date",
         "content_type", "http_status", "http_content_type", "payload",
         "payload_length")


def _list_warc_files(path: str) -> list[str]:
    """dir → every ``*.warc`` / ``*.warc.gz`` under it (SUFFIX match —
    an in-progress ``seg.warc.gz.tmp`` must never be listed, or a
    streaming offset would freeze its truncated prefix); glob pattern
    or single existing file pass through; a not-yet-created directory
    is an EMPTY listing (a stream watcher started before the crawler
    creates the landing dir idles instead of crashing).  Deterministic
    (sorted) so partition planning is stable across runs."""
    p = _local_path(path)
    if os.path.isdir(p):
        out = []
        for root, _dirs, files in os.walk(p):
            out += [os.path.join(root, f) for f in files
                    if f.endswith((".warc", ".warc.gz"))
                    and not f.startswith(".")]
        return sorted(out)
    if any(ch in p for ch in "*?["):
        return sorted(_glob.glob(p))
    if os.path.isfile(p):
        return [p]
    return []


def _read_warc_file(fname: str, off: int | None = None,
                    ln: int | None = None):
    """Shared open→parse→row-tuple body of the batch and streaming
    readers (one copy, so the emitted row shape cannot diverge)."""
    with open(_local_path(str(fname)), "rb") as fh:
        if off is None:
            data = fh.read()
        else:
            fh.seek(int(off))
            data = fh.read(int(ln))
    for rec in parse_warc_records(data):
        rec["payload_length"] = len(rec["payload"])
        yield (fname,) + tuple(rec[c] for c in _COLS)


class WarcDataSource(DataSource):
    """WARC batch source; see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType | str:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> "WarcReader":
        return WarcReader(dict(self.options))

    def streamReader(self, schema: StructType) -> "WarcStreamReader":  # noqa: N802
        return WarcStreamReader(dict(self.options))


#: (applicationId → Accumulator[int]) — see :func:`skipped_files_accumulator`
_SKIP_ACCS: dict = {}


def skipped_files_accumulator(spark):
    """Driver-queryable counter of files a WARC stream planned into a
    batch and then found deleted (retention racing ingestion).

    Call BEFORE starting the streaming query; every
    :class:`WarcStreamReader` built afterwards in this Spark application
    captures the accumulator, and worker-side skips flow back to the
    driver at task completion — ``skipped_files_accumulator(spark).value``
    after a batch is the operational surface the worker-stderr log line
    alone could not provide.  One accumulator per application (keyed on
    applicationId so a restarted SparkContext never inherits a dead
    handle); idempotent, so monitors and readers share one instance."""
    app = spark.sparkContext.applicationId
    acc = _SKIP_ACCS.get(app)
    if acc is None:
        acc = spark.sparkContext.accumulator(0)
        _SKIP_ACCS.clear()   # at most one live application per process
        _SKIP_ACCS[app] = acc
    return acc


def skip_counter_option(acc) -> str:
    """Serialize an accumulator for ``.option("skip_counter", ...)``.

    A streaming query's :class:`WarcStreamReader` is constructed in a
    JVM-spawned Python runner process, not the user's driver process, so
    module state cannot carry the accumulator there — but an
    ``Accumulator`` is fully described by its integer ``aid``:
    rebuilding an int accumulator around the same id (the reader calls
    ``pyspark.accumulators._deserialize_accumulator`` — exactly what
    unpickling one does) routes worker-side updates back to the
    creating driver regardless of which process bumps them.  The option
    carries ONLY that integer — never a pickle — so a skip_counter
    value injected through untrusted reader config is at worst a wrong
    counter id, not arbitrary code execution at reader construction
    (advice r14; pickle.loads on an option-map string was an ACE sink)::

        acc = skipped_files_accumulator(spark)
        stream = (spark.readStream.format("warc")
                  .option("path", landing_dir)
                  .option("skip_counter", skip_counter_option(acc))
                  .load())
        ...  # after a batch: acc.value >= files lost to retention races

    The count is AT-LEAST-once, like every Spark accumulator bumped
    inside a task: a failed/restarted batch re-plans the same vanished
    file (checkpoint replay) and counts it again, as does a task retry.
    Treat a nonzero value as "races happened, go look", not as an exact
    loss tally.
    """
    return str(int(acc.aid))


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError('format("warc") needs .option("path", ...)')
        self.path = options["path"]
        self.index = options.get("index")

    def partitions(self):
        if self.index:
            import pyarrow.parquet as pq

            tbl = pq.read_table(
                _local_path(self.index),
                columns=["warc_file", "offset", "length"])
            spans = sorted(zip(
                (str(f) for f in tbl["warc_file"].to_pylist()),
                tbl["offset"].to_pylist(), tbl["length"].to_pylist()))
            if not spans:
                raise ValueError(f"empty WARC split index: {self.index}")
            return [InputPartition(s) for s in spans]
        files = _list_warc_files(self.path)
        if not files:
            raise ValueError(f"no WARC files under {self.path!r}")
        return [InputPartition((f, None, None)) for f in files]

    def read(self, partition: InputPartition):
        fname, off, ln = partition.value
        yield from _read_warc_file(fname, off, ln)


class WarcStreamReader(DataSourceStreamReader):
    """``spark.readStream.format("warc")`` — streaming crawl ingestion:
    the option("path") directory is watched for NEW archive files; each
    micro-batch processes the files that appeared since the last
    committed offset (one task per new file, the batch contract).

    An offset is the sorted list of file paths seen so far, carried in
    the checkpoint — so a restarted query resumes exactly after the
    files already processed: exactly-once per file *that remains
    readable*.  A file deleted between planning and read (retention
    racing ingestion) is skipped, not retried — its rows are
    unrecoverable either way, and failing would poison the batch
    forever — so under retention races the guarantee degrades to
    at-most-once for the raced file; each skip is logged to the
    WORKER's stderr AND counted on the application's
    :func:`skipped_files_accumulator` (when one was created before the
    reader) — accumulator updates ship back at task completion, so the
    DRIVER can query the count after each batch; the plain
    ``skipped_files`` attribute still increments only on the
    process-local reader copy (a test / direct-invocation diagnostic).  The offset grows with the
    file count of the watched directory; crawl segments are bounded
    (~tens of thousands of files), which keeps the checkpoint JSON in
    the megabytes.  Files must LAND ATOMICALLY (write elsewhere,
    rename in — the same contract every Spark file stream has): a file
    listed mid-write would be parsed short, and its later bytes never
    revisited.

    Composes with the streaming curation tier:
    ``near_dup_matches(warc_documents(stream), corpus_index)`` filters
    arriving crawl records against the corpus LSH index as they land.
    """

    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError('format("warc") needs .option("path", ...)')
        self.path = options["path"]
        #: paths this reader instance has already put in an offset —
        #: latestOffset unions with it so the offset is MONOTONE: a
        #: processed file deleted by retention (and even re-landed
        #: under the same name) never re-enters a batch; without this
        #: the listing shrinks and end-start "rediscovers" old names
        self._seen: set[str] = set()
        #: files planned into a batch but vanished before read.
        #: Incremented by the PROCESS-LOCAL copy that executed read()
        #: (a pickled worker copy in a real streaming query) — the
        #: driver-held instance never updates, so this is a test /
        #: direct-invocation diagnostic; the driver-queryable surface is
        #: the accumulator below (plus the worker-stderr log line).
        self.skipped_files = 0
        #: the application's skip accumulator: from option("skip_counter")
        #: (the real-query path — see :func:`skip_counter_option`; this
        #: __init__ runs in a separate planning process for real queries)
        #: or, for direct in-process invocation, the module registry;
        #: None when the caller never created one
        opt = options.get("skip_counter")
        if opt is not None:
            # the option is the accumulator's integer id (see
            # skip_counter_option) — rebuild the id-stub the way
            # unpickling an Accumulator would, without ever running
            # pickle.loads on option-map content
            from pyspark.accumulators import (INT_ACCUMULATOR_PARAM,
                                              _deserialize_accumulator)

            self._skip_acc = _deserialize_accumulator(
                int(opt), 0, INT_ACCUMULATOR_PARAM)
        else:
            # registry fallback ONLY for the accumulator of the
            # currently-active SparkContext — a restarted context's
            # reader must never inherit the previous application's dead
            # handle (review find, r13: the registry is purged lazily,
            # so key on the live applicationId, not "whatever is there")
            self._skip_acc = None
            try:
                from pyspark import SparkContext

                sc = SparkContext._active_spark_context
                if sc is not None:
                    self._skip_acc = _SKIP_ACCS.get(sc.applicationId)
            except Exception:
                pass

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API name)
        return {"files": []}

    def latestOffset(self) -> dict:  # noqa: N802
        self._seen.update(_list_warc_files(self.path))
        return {"files": sorted(self._seen)}

    def partitions(self, start: dict, end: dict):
        # the checkpointed start offset also feeds the monotone set, so
        # a restart after retention deletions cannot shrink the horizon
        self._seen.update(start.get("files", ()))
        new = sorted(set(end.get("files", ())) - set(start.get("files", ())))
        return [InputPartition(f) for f in new]

    def read(self, partition: InputPartition):
        fname = partition.value
        try:
            yield from _read_warc_file(fname)
        except FileNotFoundError:
            # the file was planned into this batch and then deleted
            # (retention racing ingestion).  Failing would poison the
            # batch forever (checkpoint replay re-plans the same file);
            # its rows are unrecoverable either way — skip loudly.
            import sys

            self.skipped_files += 1
            if self._skip_acc is not None:
                self._skip_acc += 1
            print(f"[warc stream] planned file vanished, skipping: "
                  f"{fname}", file=sys.stderr)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the checkpoint; no source-side state

    def stop(self) -> None:
        pass
