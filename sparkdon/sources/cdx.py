"""CDX-J crawl index — Common Crawl's URL→(file, offset, length) offset
index, the companion to :mod:`sparkdon.sources.warc`.

Beyond-reference source (public formats: the CDXJ line grammar used by
Common Crawl's ``cc-index`` and pywb — ``<SURT> <timestamp14> <JSON>``
per line — and the SURT canonicalization rule).  The index is what makes
a 100 TB crawl *random-accessible*: a URL filter over the tiny index
plus :func:`sparkdon.sources.warc.read_warc_ranges` seek-reads touch
only the matching gzip members instead of inflating every archive file.

Spark-first shapes:

- :func:`build_cdx` is the distributed index builder — one task per
  archive file (the same parallel unit the scan uses), walking
  per-record gzip members and emitting one typed row each.
- :func:`read_cdx` / :func:`write_cdxj` parse and emit the text format
  with JVM-side expressions only (split + ``from_json``/``to_json``) —
  no Python in the per-line path, so an index scan is a plain
  whole-stage-codegen text scan that Catalyst can filter-push.
- :func:`surt_key` is the JVM expression twin of the Python
  :func:`surt` used by the builder; pytest asserts they agree, so
  query-side prefix filters match builder-side keys.
"""

from __future__ import annotations

import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

#: typed CDX row — offset/length address ONE gzip member (or record
#: span in a plain .warc), directly consumable by read_warc_ranges
CDX_SCHEMA = (
    "surt string, ts string, url string, warc_file string, "
    "offset long, length long, status int, mime string, "
    "digest string, warc_type string"
)

#: the JSON block's fields, as CDXJ stores them (offset/length are
#: strings in Common Crawl's files; read_cdx casts)
_CDXJ_JSON_SCHEMA = (
    "url string, filename string, offset string, length string, "
    "status string, mime string, digest string, warc_type string"
)


#: matches a LEADING scheme only — the same anchor the JVM twin uses;
#: '://' later in the string (a URL inside a query param) must not
#: reposition the host split
_LEADING_SCHEME = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")


def surt(url: str) -> str:
    """Python SURT key (Sort-friendly URI Reordering Transform):
    ``https://www.Example.COM:443/Path?q=1#frag`` →
    ``com,example,www)/Path?q=1``.  Scheme dropped (leading only — an
    embedded URL in the query must not shift the host), host lowercased,
    the SCHEME'S default port stripped (``http``/scheme-less ``:80``,
    ``https`` ``:443`` — an ``http://host:443`` keeps its port, matching
    pywb/cc-index keys), ``#fragment`` dropped, labels reversed
    comma-joined; path/query kept case-sensitively (the pywb rule).
    Raw spaces are percent-encoded so a key is always one CDXJ field."""
    m = _LEADING_SCHEME.match(url)
    scheme = m.group(0)[:-3].lower() if m else "http"
    rest = url[m.end():] if m else url
    for i, ch in enumerate(rest):
        if ch in "/?#":
            host, path = rest[:i], rest[i:]
            break
    else:
        host, path = rest, "/"
    path = path.split("#", 1)[0] or "/"
    host = host.rsplit("@", 1)[-1].lower()
    port = ""
    if ":" in host:
        host, _, port = host.rpartition(":")
    if port == {"http": "80", "https": "443"}.get(scheme):
        port = ""
    key = ",".join(reversed(host.split("."))) \
        + (":" + port if port else "") + ")" + path
    return key.replace(" ", "%20")


def surt_key(col) -> F.Column:
    """JVM expression twin of :func:`surt` over a URL column (pytest
    asserts equality on a shared URL battery)."""
    scheme = F.lower(
        F.regexp_extract(col, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    scheme = F.when(scheme == "", F.lit("http")).otherwise(scheme)
    rest = F.regexp_replace(col, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    host = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    path = F.substring(rest, F.length(host) + 1, F.lit(1 << 30))
    path = F.regexp_replace(path, r"#.*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    host = F.lower(F.regexp_replace(host, r"^.*@", ""))
    port = F.regexp_extract(host, r":([^:]*)$", 1)
    host = F.regexp_replace(host, r":[^:]*$", "")
    is_default = ((scheme == "https") & (port == "443")) | \
        ((scheme == "http") & (port == "80"))
    port = F.when((port == "") | is_default, F.lit("")) \
        .otherwise(F.concat(F.lit(":"), port))
    return F.regexp_replace(
        F.concat(F.array_join(F.reverse(F.split(host, r"\.")), ","),
                 port, F.lit(")"), path),
        " ", "%20")


def _ts14(warc_date: str) -> str:
    """WARC-Date (ISO 8601) → CDX timestamp14 (digits only, first 14)."""
    return "".join(c for c in warc_date if c.isdigit())[:14]


def build_cdx(spark: SparkSession, warc_path: str) -> DataFrame:
    """Distributed CDX builder over a WARC archive set: one task per
    file (binaryFile, same unit as the scan) walks the per-record gzip
    members / record spans, parses each, and emits one ``CDX_SCHEMA``
    row per record.  ``digest`` is the payload's sha1 hex (Common Crawl
    uses base32 sha1; hex keeps stdlib-only and is self-consistent
    between build and verify).  A whole-file-gzip archive still gets a
    row per RECORD, but all its rows share the single whole-file span
    (offset 0, length = file size) — such files are not
    record-addressable, so a range fetch must inflate the whole file
    and re-filter (``fetch_by_cdx`` does exactly that)."""
    from .warc import _scan_split_ranges, parse_warc_records

    def run(batches) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                # target 1 byte → every member/record its own span
                for off, ln, _m in _scan_split_ranges(data, 1):
                    for rec in parse_warc_records(data[off:off + ln]):
                        url = rec["target_uri"] or ""
                        rows.append({
                            "surt": surt(url) if url else "",
                            "ts": _ts14(rec["warc_date"]),
                            "url": url,
                            "warc_file": fname,
                            "offset": off,
                            "length": ln,
                            "status": rec["http_status"],
                            "mime": (rec["http_content_type"]
                                     or rec["content_type"] or ""),
                            "digest": hashlib.sha1(
                                rec["payload"]).hexdigest(),
                            "warc_type": rec["warc_type"],
                        })
            yield pd.DataFrame(
                rows, columns=["surt", "ts", "url", "warc_file", "offset",
                               "length", "status", "mime", "digest",
                               "warc_type"])

    files = spark.read.format("binaryFile").load(warc_path) \
        .select("path", "content")
    return files.mapInPandas(run, CDX_SCHEMA)


def write_cdxj(cdx: DataFrame, path: str) -> None:
    """CDX frame → sorted CDXJ text shards (Common Crawl's layout: the
    index is globally sorted by SURT key so consumers can binary-search
    / range-partition it).  The sort is Spark's distributed range sort;
    each output shard is internally sorted and shard ranges are
    disjoint."""
    line = F.concat_ws(
        " ", "surt", "ts",
        F.to_json(F.struct(
            "url",
            F.col("warc_file").alias("filename"),
            F.col("offset").cast("string").alias("offset"),
            F.col("length").cast("string").alias("length"),
            F.col("status").cast("string").alias("status"),
            "mime", "digest", "warc_type")))
    cdx.orderBy("surt", "ts").select(line.alias("value")) \
        .write.mode("overwrite").text(path)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDXJ text (plain or ``.gz`` — Spark's text source inflates
    gzip transparently) → typed ``CDX_SCHEMA`` frame.  Pure JVM parse:
    one 3-way split plus ``from_json``; a SURT-prefix filter on the
    result is an ordinary pushed predicate over the text scan."""
    parts = F.split(F.col("value"), " ", 3)
    j = F.from_json(parts[2], _CDXJ_JSON_SCHEMA)
    return (
        spark.read.text(path)
        .filter(F.length(F.trim("value")) > 0)
        .select(
            parts[0].alias("surt"),
            parts[1].alias("ts"),
            j["url"].alias("url"),
            j["filename"].alias("warc_file"),
            j["offset"].cast("long").alias("offset"),
            j["length"].cast("long").alias("length"),
            j["status"].cast("int").alias("status"),
            j["mime"].alias("mime"),
            j["digest"].alias("digest"),
            j["warc_type"].alias("warc_type"),
        )
    )


def fetch_by_cdx(spark: SparkSession, cdx: DataFrame,
                 surt_prefix: str | None = None,
                 parallelism: int | None = None) -> DataFrame:
    """Random-access record fetch: filter the (tiny) index, seek-read
    only the matching members via ``read_warc_ranges``.  At 100 TB this
    is the difference between inflating a whole crawl and touching a
    few thousand gzip members: the index scan prunes first, the range
    read is one seek+inflate per surviving record.

    When a prefix filter is given, the fetched records are additionally
    semi-joined back on ``target_uri`` against the filtered index: a
    span that holds MORE than one record (whole-file-gzip archives, or
    a span-granular index from ``warc_split_index``) parses every
    record in the span, and the join drops the non-matching ones.  The
    URL set is prefix-sized, so the semi-join is left unhinted — AQE
    broadcasts it when the prefix really is narrow, and a deliberately
    broad prefix (half the crawl) degrades to a shuffle join instead
    of an executor OOM."""
    from .warc import read_warc_ranges

    if surt_prefix is not None:
        cdx = cdx.filter(F.col("surt").startswith(surt_prefix))
    refs = cdx.select("warc_file", "offset", "length").distinct()
    fetched = read_warc_ranges(spark, refs, parallelism=parallelism)
    if surt_prefix is None:
        return fetched
    urls = cdx.select(F.col("url").alias("target_uri")).distinct()
    return fetched.join(urls, "target_uri", "left_semi")
