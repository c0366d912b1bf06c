"""WARC (ISO 28500) ingestion — the Common Crawl / web-archive format
every large-scale training-data pipeline starts from.

Beyond-reference source (the reference reads RDF files and SPARQL
endpoints; a 100 TB text corpus arrives as ``*.warc.gz``).  Built from
the public ISO 28500 / WARC 1.1 record grammar and the Common Crawl
layout: a WARC file is a sequence of records, each

    WARC/1.0\\r\\n
    <headers: Name: value, continuation lines start with SP/TAB>\\r\\n
    \\r\\n
    <Content-Length bytes of block>\\r\\n\\r\\n

and a ``.warc.gz`` is per-record gzip members concatenated — which is
why the format is NOT block-splittable: the unit of parallelism is the
FILE.  That matches Common Crawl's shape exactly (a crawl is ~64k-90k
files of ~1 GB each), so :func:`read_warc` scans with ``binaryFile``
(one task per file, Arrow-batched parse, narrow — no shuffle) and a
1000-executor cluster eats a full crawl with perfect parallelism.
Filters on the OUTPUT frame (warc_type, http_status, content type)
run JVM-side after the parse stage; column pruning cannot reach inside
a gzip member, so the parse always pays one pass per file — the same
cost every WARC reader pays.

HTTP ``response`` records additionally get their HTTP envelope split:
status code, response Content-Type, and the body as ``payload`` (the
raw block is never duplicated).  :func:`html_to_text` then turns HTML
payloads into text entirely with JVM-side ``regexp_replace`` chains —
no Python in the hot path — and :func:`warc_documents` composes the
two into the ``documents``-table shape the pipeline operators consume.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

#: output schema of read_warc
WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, http_content_type string, payload binary, "
    "payload_length long"
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members in LINEAR time.

    ``gzip.decompress`` handles multi-member streams but re-copies the
    entire remaining buffer per member (``do.unused_data``) — O(n·m),
    measured 14 s for a 5 MB / 20k-member file, where real Common
    Crawl files are per-RECORD members.  Feeding a fresh
    ``decompressobj`` in bounded blocks caps the per-member copy at one
    block (measured ~40× faster on the same file — PERF.md r10-late)."""
    import zlib

    out: list[bytes] = []
    pos, n = 0, len(data)
    block = 1 << 16
    while pos < n:
        d = zlib.decompressobj(wbits=31)  # expect a gzip header
        try:
            while not d.eof and pos < n:
                out.append(d.decompress(data[pos:pos + block]))
                pos += min(block, n - pos)
        except zlib.error:
            break  # corrupt member — keep the good prefix
        if not d.eof:
            break  # truncated final member
        pos -= len(d.unused_data)  # rewind the unconsumed block tail
        out.append(d.flush())
    return b"".join(out)


def _warc_headers(raw: bytes) -> dict[str, str]:
    """One record's header bytes (version line through the line before
    the blank separator) → lowercase-keyed dict.  Duplicate headers keep
    the LAST value; continuation lines (leading SP/TAB) append.  Both
    :func:`parse_warc_records` and :func:`_scan_split_ranges` MUST use
    this walk — if they disagree on Content-Length (e.g. a record with
    duplicate headers), span boundaries drift off record boundaries and
    ranged reads silently truncate."""
    headers: dict[str, str] = {}
    last_key = None
    for line in raw.split(b"\r\n")[1:]:
        if line[:1] in (b" ", b"\t") and last_key:  # continuation
            headers[last_key] += " " + line.strip().decode(
                "utf-8", "replace")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            continue
        last_key = name.strip().decode("ascii", "replace").lower()
        headers[last_key] = value.strip().decode("utf-8", "replace")
    return headers


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Parse one WARC file's bytes (plain or multi-member gzip) into
    record dicts.  Tolerant of trailing garbage and truncated tails —
    a crawl file with a bad last record yields its good prefix."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if not data[pos:pos + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = _warc_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        if length < 0:
            break  # a negative length would stall pos — infinite yield
        block = data[hdr_end + 4:hdr_end + 4 + length]
        if len(block) < length:
            break  # truncated tail
        rec = {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "http_status": None,
            "http_content_type": None,
            "payload": block,
        }
        if rec["warc_type"] == "response" and block[:5] == b"HTTP/":
            http_end = block.find(b"\r\n\r\n")
            if http_end >= 0:
                status_line, *hlines = block[:http_end].split(b"\r\n")
                parts = status_line.split(None, 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for hl in hlines:
                    hname, hsep, hval = hl.partition(b":")
                    if hsep and hname.strip().lower() == b"content-type":
                        rec["http_content_type"] = hval.strip().decode(
                            "latin-1", "replace")
                        break
                rec["payload"] = block[http_end + 4:]
        yield rec
        pos = hdr_end + 4 + length


def read_warc(spark: SparkSession, path: str,
              target_split_bytes: int | None = None) -> DataFrame:
    """Distributed WARC scan: ``binaryFile`` over ``path`` (dir, glob,
    or single file; ``.warc`` and ``.warc.gz`` both work) → one row per
    WARC record.  Parsing runs in an Arrow-batched ``mapInPandas``
    stage, narrow.

    **Parallelism contract (default form): ONE FILE = ONE TASK.**  Gzip
    WARC is not block-splittable, so the default scan's max task time is
    the LARGEST file's inflate+parse.  That is the right plan for
    Common Crawl's uniform ~1 GB layout; for a mixed-size archive set
    (one 10 GB outlier among 100 MB files) the outlier straggles the
    stage.  Pass ``target_split_bytes`` to bound that skew with the
    two-pass indexed scan: pass 1 (:func:`warc_split_index`) walks each
    file's gzip-member/record boundaries and emits ~target-sized byte
    ranges; pass 2 (:func:`read_warc_ranges`) seek-reads the ranges as
    balanced tasks.  Requires every executor to reach ``path`` as a
    POSIX filesystem (local dir, NFS/fuse mount) — the same contract as
    :func:`write_warc`.  A single-member gzip file (not per-record
    members) stays one span: that layout is inherently unsplittable."""
    if target_split_bytes is not None:
        return read_warc_ranges(
            spark, warc_split_index(spark, path, target_split_bytes))

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_records(bytes(content)):
                    rec["warc_file"] = fname
                    rec["payload_length"] = len(rec["payload"])
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[
                    "warc_file", "record_id", "warc_type", "target_uri",
                    "warc_date", "content_type", "http_status",
                    "http_content_type", "payload", "payload_length"])

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(run, WARC_SCHEMA)


#: output schema of warc_split_index
WARC_SPLIT_SCHEMA = (
    "warc_file string, offset long, length long, n_members long"
)


def _scan_split_ranges(data: bytes, target_split_bytes: int) -> Iterator[tuple]:
    """Yield ``(offset, length, n_members)`` spans covering ``data``,
    cut only at gzip-member (``.warc.gz``) or WARC-record (plain
    ``.warc``) boundaries, each span ≥ ``target_split_bytes`` except the
    last.  The span bytes fed back to :func:`parse_warc_records` parse
    to exactly the records of the members they cover, so the
    spans-union equals the whole-file parse.  Walking gzip members
    inflates-and-discards (zlib, no parse, no payload retention) — the
    index pass costs one inflate per file; the parse/decode work moves
    to the balanced second pass."""
    n = len(data)
    start = pos = 0
    members = 0
    if data[:2] == b"\x1f\x8b":
        import zlib

        block = 1 << 16
        while pos < n:
            d = zlib.decompressobj(wbits=31)
            try:
                while not d.eof and pos < n:
                    d.decompress(data[pos:pos + block])
                    pos += min(block, n - pos)
            except zlib.error:
                break  # corrupt member — stop at the good prefix
            if not d.eof:
                break  # truncated final member
            pos -= len(d.unused_data)
            members += 1
            if pos - start >= target_split_bytes:
                yield (start, pos - start, members)
                start, members = pos, 0
    else:
        while pos < n:
            while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
                pos += 1
            if data[pos:pos + 5] != b"WARC/":
                break
            hdr_end = data.find(b"\r\n\r\n", pos)
            if hdr_end < 0:
                break
            try:
                length = int(
                    _warc_headers(data[pos:hdr_end]).get(
                        "content-length", ""))
            except ValueError:
                break
            if length < 0 or hdr_end + 4 + length > n:
                break  # negative length would stall pos — infinite loop
            pos = hdr_end + 4 + length
            members += 1
            if pos - start >= target_split_bytes:
                yield (start, pos - start, members)
                start, members = pos, 0
    if members:
        yield (start, pos - start, members)


def _local_path(uri: str) -> str:
    """binaryFile's ``file:``-scheme path → an ``open()``-able path.
    Other schemes have no POSIX seek-read here and fail loudly."""
    if uri.startswith("file:"):
        p = uri[len("file:"):]
        return "/" + p.lstrip("/")
    if "://" in uri.split("/", 1)[0] or uri.split("/", 1)[0].endswith(":"):
        raise ValueError(
            f"read_warc_ranges needs a POSIX-reachable path, got {uri!r}")
    return uri


def warc_split_index(spark: SparkSession, path: str,
                     target_split_bytes: int = 64 << 20) -> DataFrame:
    """Pass 1 of the skew-bounded WARC scan: one task per file walks the
    gzip-member / record boundaries and emits ``WARC_SPLIT_SCHEMA`` rows
    of ~``target_split_bytes`` spans.  At 100 TB this is the cheap pass
    (inflate-and-discard, no record parse, no Python string building);
    persist its output next to the archive to amortize it across reads —
    it is the same role as Common Crawl's published CDX offset index."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for off, ln, members in _scan_split_ranges(
                        bytes(content), target_split_bytes):
                    rows.append({"warc_file": fname, "offset": off,
                                 "length": ln, "n_members": members})
            yield pd.DataFrame(
                rows, columns=["warc_file", "offset", "length", "n_members"])

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(run, WARC_SPLIT_SCHEMA)


def read_warc_ranges(spark: SparkSession, index: DataFrame,
                     parallelism: int | None = None) -> DataFrame:
    """Pass 2 of the skew-bounded WARC scan: seek-read each index span
    and parse it — max task work is one span (~target_split_bytes), not
    one file, so a 10× outlier file becomes ~10 balanced tasks instead
    of one straggler.  Spans are hash-repartitioned so consecutive spans
    of the hot file land on different tasks."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[dict] = []
            for fname, off, ln in zip(pdf["warc_file"], pdf["offset"],
                                      pdf["length"]):
                with open(_local_path(str(fname)), "rb") as fh:
                    fh.seek(int(off))
                    data = fh.read(int(ln))
                for rec in parse_warc_records(data):
                    rec["warc_file"] = fname
                    rec["payload_length"] = len(rec["payload"])
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[
                    "warc_file", "record_id", "warc_type", "target_uri",
                    "warc_date", "content_type", "http_status",
                    "http_content_type", "payload", "payload_length"])

    nparts = parallelism or spark.sparkContext.defaultParallelism
    idx = index.repartition(nparts, "warc_file", "offset")
    return idx.mapInPandas(run, WARC_SCHEMA)


def warc_bytes(records: list[dict], gzip_per_record: bool = False) -> bytes:
    """Writer twin: record dicts (``warc_type``, ``payload``, optional
    ``target_uri`` / ``record_id`` / ``warc_date`` / ``content_type`` /
    ``http_headers``) → WARC file bytes, optionally as per-record gzip
    members like the real crawl files."""
    out = io.BytesIO()
    for i, rec in enumerate(records):
        block = rec.get("payload", b"")
        if isinstance(block, str):
            block = block.encode("utf-8")
        if rec.get("http_headers"):
            block = rec["http_headers"].encode("latin-1") + b"\r\n\r\n" \
                + block
        headers = [
            ("WARC-Type", rec.get("warc_type", "resource")),
            ("WARC-Record-ID",
             rec.get("record_id", f"<urn:uuid:rec-{i}>")),
            ("WARC-Date", rec.get("warc_date", "2024-01-01T00:00:00Z")),
            ("Content-Length", str(len(block))),
        ]
        if rec.get("target_uri"):
            headers.append(("WARC-Target-URI", rec["target_uri"]))
        if rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        member = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode("utf-8") for k, v in headers) \
            + b"\r\n" + block + b"\r\n\r\n"
        out.write(gzip.compress(member) if gzip_per_record else member)
    return out.getvalue()


def write_warc(records: DataFrame, path: str,
               gzip_per_record: bool = True) -> None:
    """Distributed WARC sink: each partition writes ONE
    ``part-NNNNN.warc[.gz]`` file — the same file-parallel unit
    :func:`read_warc` scans back (and Common Crawl's own layout).
    ``response`` rows get a minimal HTTP envelope re-synthesized from
    ``http_status`` / ``http_content_type``, so logical fields
    round-trip.  Executors write directly to ``path``, which must be
    a filesystem every executor can reach (local dir in local mode,
    NFS/fuse mount on a cluster) — for engine-native storage use
    parquet; this sink exists for interop with WARC tooling."""
    import glob
    import os

    os.makedirs(path, exist_ok=True)
    # overwrite semantics: stale part files from a previous (wider)
    # write would otherwise be silently mixed back in by read_warc
    for old_part in glob.glob(os.path.join(path, "part-*.warc*")):
        os.remove(old_part)
    suffix = ".warc.gz" if gzip_per_record else ".warc"

    def run(rows) -> None:
        from pyspark import TaskContext

        f = None
        try:
            for r in rows:
                rec = {"warc_type": r["warc_type"],
                       "record_id": r["record_id"],
                       "warc_date": r["warc_date"],
                       "target_uri": r["target_uri"],
                       "content_type": r["content_type"],
                       "payload": bytes(r["payload"] or b"")}
                if r["warc_type"] == "response" and r["http_status"]:
                    ct = (r["http_content_type"]
                          or "application/octet-stream")
                    rec["http_headers"] = (
                        f"HTTP/1.1 {r['http_status']} "
                        f"Response\r\nContent-Type: {ct}")
                if f is None:  # lazily: empty partitions write nothing
                    part = TaskContext.get().partitionId()
                    f = open(os.path.join(
                        path, f"part-{part:05d}{suffix}"), "wb")
                # one record at a time: a ~1 GB partition never
                # materializes in executor memory (each record is its
                # own gzip member, so per-record framing is identical)
                f.write(warc_bytes([rec],
                                   gzip_per_record=gzip_per_record))
        finally:
            if f is not None:
                f.close()

    records.foreachPartition(run)


#: HTML named entities worth decoding without a parser (the numeric
#: forms are handled generically).  ``&amp;`` is NOT here — it must be
#: decoded LAST, after every other entity pass, or double-escaped
#: entities (``&amp;lt;``) decode twice and corrupt extracted text.
_ENTITIES = [("&nbsp;", " "), ("&lt;", "<"),
             ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"),
             ("&apos;", "'")]


def html_to_text(col) -> F.Column:
    """HTML → visible text as a pure JVM-side expression chain (WET-style
    extraction): drops ``<script>``/``<style>``/comments, turns
    block-level closers into newlines, strips the remaining tags,
    decodes the common entities, and collapses runs of whitespace.
    No Python UDF — this runs inside whole-stage codegen, which is the
    difference between a WET pass over a crawl finishing or not."""
    c = F.col(col) if isinstance(col, str) else col
    # (?is): case-insensitive, dot matches newline
    c = F.regexp_replace(c, r"(?is)<(script|style)\b.*?</\1\s*>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(
        c, r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote)\b[^>]*>",
        "\n")
    c = F.regexp_replace(c, r"(?s)<[^>]*>", " ")
    for ent, rep in _ENTITIES:
        c = F.regexp_replace(c, ent, rep)
    c = F.regexp_replace(c, r"&#(\d+);", " ")  # numeric entities → space
    c = F.regexp_replace(c, "&amp;", "&")      # ampersand LAST (one pass)
    c = F.regexp_replace(c, r"[ \t\x0b\f\r]+", " ")
    c = F.regexp_replace(c, r" ?\n[ \n]*", "\n")
    # Spark's trim strips only spaces — boundary newlines need the regex
    c = F.regexp_replace(c, r"^\n+|\n+$", "")
    return F.trim(c)


def canonical_url(col) -> F.Column:
    """Crawl-grade URL canonicalization as a JVM-side expression chain:
    lowercase scheme+host, strip the fragment, default ports, a
    ``www.`` prefix, common tracking parameters (``utm_*`` &c.), any
    trailing ``?``/``&``, and a trailing slash on non-root paths.  The
    standard key for exact URL dedup across a crawl — at 100 TB this
    runs in whole-stage codegen next to the hash-agg, no Python."""
    orig = F.col(col) if isinstance(col, str) else col
    # lowercase scheme://host (keep path case — it is significant)
    c = F.concat(
        F.lower(F.regexp_extract(orig,
                                 r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)),
        F.regexp_extract(orig,
                         r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1))
    c = F.regexp_replace(c, r"#.*$", "")                    # fragment
    c = F.regexp_replace(c, r"^(https?://)www\.", r"$1")    # www.
    c = F.regexp_replace(c, r"^(http://[^/?#]*):80(/|$|\?)", r"$1$2")
    c = F.regexp_replace(c, r"^(https://[^/?#]*):443(/|$|\?)", r"$1$2")
    # tracking params: lookbehind keeps the ?/& delimiter for whatever
    # param follows; the removed param eats ITS trailing &
    c = F.regexp_replace(
        c, r"(?<=[?&])(utm_[a-z]+|fbclid|gclid|ref)=[^&#]*&?", "")
    # trailing slash on a non-root path (before the query or the end)
    c = F.regexp_replace(c, r"(://[^/?#]+/[^?#]*[^/])/(\?|$)", r"$1$2")
    c = F.regexp_replace(c, r"[?&]+$", "")                  # dangling
    # schemeless/relative URIs don't match the extracts above (which
    # would collapse them ALL to "" — one dedup key): pass them through
    return F.when(
        orig.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://"), c).otherwise(orig)


def url_host(col) -> F.Column:
    """Lowercased host (no port/userinfo) — the per-site grouping key
    for domain-level quality filters and per-host rate caps."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.regexp_extract(c, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?"
                               r"([^/?#:]*)", 1)
    return F.lower(host)


def dedup_latest_by_url(docs: DataFrame) -> DataFrame:
    """Exact URL dedup, keeping the NEWEST fetch per canonical URL —
    aggregate+join-free: ``max_by`` under a hash aggregate (one shuffle
    on the canonical key, map-side partial agg, AQE-splittable — no
    window, so a hot URL cannot pin a partition; the same skew logic as
    pipeline/dedup.py's agg rewrite)."""
    keyed = docs.withColumn("_curl", canonical_url("url"))
    best = keyed.groupBy("_curl").agg(
        F.max_by(F.struct(*[F.col(c) for c in docs.columns]),
                 F.col("fetch_date")).alias("_doc"))
    return best.select("_doc.*")


def wet_documents(records: DataFrame) -> DataFrame:
    """WET (``conversion``) records → the same documents shape.  A WET
    crawl already carries extracted plain text, so this is a filter +
    cast — no HTML pass."""
    return records.filter(F.col("warc_type") == "conversion").select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetch_date"),
        F.col("payload").cast("string").alias("text"),
    )


#: charsets Spark's ``decode`` supports, keyed by the (lowercased)
#: names crawled Content-Type headers actually use
_CHARSETS = {"utf-8": "UTF-8", "utf8": "UTF-8",
             "iso-8859-1": "ISO-8859-1", "latin-1": "ISO-8859-1",
             "latin1": "ISO-8859-1", "us-ascii": "US-ASCII",
             "ascii": "US-ASCII", "utf-16": "UTF-16",
             "utf-16be": "UTF-16BE", "utf-16le": "UTF-16LE"}


def decode_payload_text(payload_col, content_type_col) -> F.Column:
    """Binary payload → string honoring the HTTP header's
    ``charset=`` parameter (JVM-side ``decode``; the charsets Spark
    supports cover the overwhelming share of crawled pages — anything
    else falls back to UTF-8 with replacement, the same behavior a
    bare cast gives)."""
    cs = F.lower(F.regexp_extract(
        F.coalesce(content_type_col, F.lit("")),
        r"(?i)charset\s*=\s*\"?([A-Za-z0-9_-]+)", 1))
    expr = None
    for name, java in _CHARSETS.items():
        if java == "UTF-8":
            continue  # the fallback
        cond = cs == name
        branch = F.decode(payload_col, java)
        expr = F.when(cond, branch) if expr is None \
            else expr.when(cond, branch)
    return expr.otherwise(F.decode(payload_col, "UTF-8"))


def _html_responses(records: DataFrame) -> DataFrame:
    """The shared successful-HTML-response predicate — the SAME rows
    must feed the documents table and the link graph."""
    return records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.coalesce(F.col("http_content_type"), F.lit(""))
        .contains("html"))


def warc_documents(records: DataFrame) -> DataFrame:
    """HTTP 200 HTML ``response`` records → the ``documents``-table
    shape (doc_id, url, fetch_date, text).  Everything after the parse
    stage is JVM-side: the filters, the charset-aware decode, and the
    :func:`html_to_text` chain."""
    html = _html_responses(records)
    return html.select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetch_date"),
        html_to_text(decode_payload_text(
            F.col("payload"), F.col("http_content_type"))).alias("text"),
    )


def extract_links(records: DataFrame) -> DataFrame:
    """HTTP 200 HTML ``response`` records → the web-graph edge list
    ``(src, dst, dst_host)``: every absolute http(s) ``href`` in each
    page, extracted JVM-side (``regexp_extract_all`` + explode — whole
    pipeline stays in codegen).  This is the input a PageRank-style
    authority scorer (pipeline/clusters.py ``x_pagerank``'s Pregel
    loop) consumes for CCNet/RefinedWeb-style quality weighting.
    hrefs match case-insensitively, quoted or not; relative links are
    skipped — resolving them needs the RFC 3986 merge, which belongs
    Python-side if ever needed."""
    html = _html_responses(records)
    text = decode_payload_text(F.col("payload"),
                               F.col("http_content_type"))
    hrefs = F.expr(
        r"""regexp_extract_all(_page, '(?i)href\\s*=\\s*["\']?([^"\'#\\s>]+)',"""
        " 1)")
    edges = (html
             .select(F.col("target_uri").alias("src"),
                     text.alias("_page"))
             .select("src", F.explode(hrefs).alias("dst"))
             .filter(F.col("dst").rlike(r"^https?://")))
    return edges.select(
        "src", canonical_url("dst").alias("dst"),
        url_host("dst").alias("dst_host"))


def _diff_side(docs: DataFrame, hash_name: str,
               flag_name: str) -> DataFrame:
    """One snapshot reduced to exactly one (canonical url, 8-byte
    xxhash64, presence flag) row — newest fetch wins, null text hashes
    as a sentinel so nullness below can mean ONLY "absent side"."""
    text = F.coalesce(F.col("text"), F.lit("\x00<null-text>"))
    return (docs
            .select(canonical_url("url").alias("url"),
                    F.xxhash64(text).alias(hash_name),
                    F.col("fetch_date").alias("_fd"))
            .groupBy("url")
            .agg(F.max_by(F.col(hash_name), F.col("_fd")).alias(hash_name),
                 F.lit(True).alias(flag_name)))


#: stopword marker sets for the lang vote — deliberately small and
#: high-frequency; swap in fuller per-language sets for production
_LANG_MARKERS = {
    "en": ("the", "and", "is", "of", "to"),
    "de": ("der", "die", "und", "ist", "nicht"),
    "fr": ("le", "les", "et", "est", "une"),
    "es": ("el", "los", "que", "es", "una"),
}


def lang_guess(col) -> F.Column:
    """Stopword-vote language guess as a pure JVM expression: count
    each language's marker tokens, take the argmax (ties resolve by
    language code — deterministic), ``unk`` when nothing matches.
    The same heuristic family as pipeline.text's ``x_lang_id`` gate,
    generalized to several languages for crawl curation."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(c), r"\s+")
    scored = [
        F.struct(
            F.size(F.filter(toks, lambda t: t.isin(*marks))).alias("n"),
            F.lit(lang).alias("lang"))
        for lang, marks in sorted(_LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scored))
    return F.when(best["n"] > 0, best["lang"]).otherwise("unk")


def to_documents_table(docs: DataFrame,
                       assume_unique: bool = False) -> DataFrame:
    """Crawl documents → the engine's canonical ``documents`` table
    shape (doc_id bigint, text, lang, source, n_chars) — the exact
    schema every pipeline operator (dedup / quality / LM scoring /
    sampling / packing) consumes, so curated crawl output drops
    straight into them.  doc_id is the 64-bit hash of the canonical
    URL (deterministic across runs); source is the host.

    doc_id must be a KEY downstream, so multiple captures of one
    canonical URL first collapse to the newest fetch
    (:func:`dedup_latest_by_url`); pass ``assume_unique=True`` to
    skip that shuffle when the input is already URL-deduped."""
    if not assume_unique:
        docs = dedup_latest_by_url(docs)
    return docs.select(
        F.xxhash64(canonical_url("url")).alias("doc_id"),
        "text",
        lang_guess("text").alias("lang"),
        url_host("url").alias("source"),
        F.length("text").cast("long").alias("n_chars"),
    )


def crawl_diff(old_docs: DataFrame, new_docs: DataFrame) -> DataFrame:
    """Snapshot diff for continuous-pretraining refreshes: documents
    keyed by canonical URL, compared by content hash →
    ``(url, status ∈ added|removed|changed|unchanged)``.

    Each side first reduces to ONE row per canonical key (newest fetch
    wins — recrawl/http+https captures would otherwise fan the join
    out into conflicting rows), carrying an 8-byte ``xxhash64`` and an
    explicit presence flag (null TEXT hashes as a sentinel, so flag
    nullness below can only mean "absent on that side").  Then one
    full-outer equi-join — the inherent minimum for a diff — whose
    shuffle never carries document text."""
    o = _diff_side(old_docs, "_oh", "_in_old")
    n = _diff_side(new_docs, "_nh", "_in_new")
    full = o.join(n, "url", "full_outer")
    status = (F.when(F.col("_in_old").isNull(), "added")
              .when(F.col("_in_new").isNull(), "removed")
              .when(F.col("_oh") != F.col("_nh"), "changed")
              .otherwise("unchanged"))
    return full.select("url", status.alias("status"))


def filter_blocked_hosts(docs: DataFrame, blocked: DataFrame) -> DataFrame:
    """Drop documents whose URL host appears in a blocklist frame
    (column ``host``, e.g. a UT1-style category list).  Broadcast
    left-anti join — the blocklist (≤ a few M rows) ships to every
    executor, no shuffle of the corpus side; at 100 TB this is the
    only join shape that works for a curation filter."""
    keyed = docs.withColumn("_host", url_host("url"))
    small = F.broadcast(blocked.select(F.lower("host").alias("_host"))
                        .distinct())
    return keyed.join(small, "_host", "left_anti").drop("_host")
