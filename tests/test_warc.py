"""WARC ingestion tests (sparkdon/sources/warc.py): parser ↔ writer
round-trips (plain + per-record gzip), the distributed binaryFile scan,
JVM-side HTML text extraction, and the documents-shape composition."""

import pytest

from sparkdon.sources.warc import (html_to_text, parse_warc_records,
                                   read_warc, warc_bytes, warc_documents)

HTML = (b"<html><head><title>T</title><style>p{color:red}</style></head>"
        b"<body><h1>Head&amp;line</h1><!-- hidden -->"
        b"<p>First   para</p><p>Second &lt;para&gt;</p>"
        b"<script>alert('no')</script></body></html>")

RECORDS = [
    {"warc_type": "warcinfo", "content_type": "application/warc-fields",
     "payload": b"software: sparkdon-test\r\n"},
    {"warc_type": "response", "target_uri": "http://example.com/a",
     "record_id": "<urn:uuid:aaa>",
     "content_type": "application/http; msgtype=response",
     "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                     "charset=utf-8\r\nServer: x",
     "payload": HTML},
    {"warc_type": "response", "target_uri": "http://example.com/b",
     "record_id": "<urn:uuid:bbb>",
     "content_type": "application/http; msgtype=response",
     "http_headers": "HTTP/1.1 404 Not Found\r\nContent-Type: text/html",
     "payload": b"<html>gone</html>"},
    {"warc_type": "conversion", "target_uri": "http://example.com/a",
     "content_type": "text/plain", "payload": b"already text"},
]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    recs = list(parse_warc_records(warc_bytes(RECORDS, gzip_per_record=gz)))
    assert [r["warc_type"] for r in recs] == [
        "warcinfo", "response", "response", "conversion"]
    resp = recs[1]
    assert resp["target_uri"] == "http://example.com/a"
    assert resp["record_id"] == "<urn:uuid:aaa>"
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html; charset=utf-8"
    assert resp["payload"] == HTML  # HTTP envelope split off
    assert recs[2]["http_status"] == 404
    assert recs[3]["payload"] == b"already text"


def test_warc_header_continuation_and_truncated_tail():
    data = warc_bytes(RECORDS[:1])
    # fold the software line as a continuation header
    folded = data.replace(
        b"Content-Length:", b"X-Folded: a\r\n\tb c\r\nContent-Length:")
    recs = list(parse_warc_records(folded))
    assert len(recs) == 1

    # a truncated final record yields the good prefix
    two = warc_bytes(RECORDS[:2])
    recs = list(parse_warc_records(two[:len(two) - 40]))
    assert len(recs) == 1 and recs[0]["warc_type"] == "warcinfo"


def test_read_warc_scan(spark, tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(
        warc_bytes(RECORDS, gzip_per_record=True))
    (tmp_path / "b.warc").write_bytes(warc_bytes(RECORDS[1:2]))
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 5
    ok = df.filter("warc_type = 'response' AND http_status = 200")
    assert ok.count() == 2  # one per file
    got = {(r["target_uri"], r["http_status"]) for r in rows
           if r["warc_type"] == "response"}
    assert got == {("http://example.com/a", 200),
                   ("http://example.com/b", 404)}


def test_html_to_text_jvm_side(spark):
    df = spark.createDataFrame([(HTML.decode("utf-8"),)], "html string")
    text = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
    assert "alert" not in text and "color:red" not in text
    assert "hidden" not in text
    assert "Head&line" in text
    assert "First para" in text and "Second <para>" in text
    # no Python UDF in the plan
    plan = df.select(html_to_text("html")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_warc_documents_shape(spark, tmp_path):
    (tmp_path / "c.warc").write_bytes(warc_bytes(RECORDS))
    docs = warc_documents(read_warc(spark, str(tmp_path)))
    rows = docs.collect()
    assert len(rows) == 1  # the 404 and non-response records filtered
    row = rows[0]
    assert row["doc_id"] == "<urn:uuid:aaa>"
    assert row["url"] == "http://example.com/a"
    assert "Head&line" in row["text"] and "script" not in row["text"]


def test_wet_documents_shape(spark, tmp_path):
    from sparkdon.sources.warc import wet_documents

    (tmp_path / "d.warc.gz").write_bytes(
        warc_bytes(RECORDS, gzip_per_record=True))
    rows = wet_documents(read_warc(spark, str(tmp_path))).collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "already text"
    assert rows[0]["url"] == "http://example.com/a"


def test_canonical_url_and_host(spark):
    from sparkdon.sources.warc import canonical_url, url_host

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/?utm_source=x&q=1#frag",
         "http://example.com/Path?q=1"),
        ("https://Example.com:443/", "https://example.com/"),
        ("https://example.com/a/b/", "https://example.com/a/b"),
        ("http://example.com/?fbclid=abc", "http://example.com/"),
        ("http://user:pw@sub.Example.com:8080/x", None),  # host only below
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    for (inp, want), out in zip(cases, got):
        if want is not None:
            assert out == want, (inp, out)
    hosts = [r["h"] for r in
             df.select(url_host("url").alias("h")).collect()]
    assert hosts[0] == "www.example.com"
    assert hosts[-1] == "sub.example.com"

    # JVM-side: no Python stage in the plan
    plan = df.select(canonical_url("url"), url_host("url")) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_dedup_latest_by_url(spark):
    from sparkdon.sources.warc import dedup_latest_by_url

    docs = spark.createDataFrame(
        [("a", "http://www.ex.com/p?utm_source=t", "2024-01-01T00:00:00Z",
          "old"),
         ("b", "http://ex.com/p", "2024-03-01T00:00:00Z", "new"),
         ("c", "http://ex.com/other", "2024-02-01T00:00:00Z", "only")],
        "doc_id string, url string, fetch_date string, text string")
    rows = {r["doc_id"]: r for r in dedup_latest_by_url(docs).collect()}
    assert set(rows) == {"b", "c"}  # a and b canonicalize identically
    assert rows["b"]["text"] == "new"
    assert set(rows["b"].asDict()) == {"doc_id", "url", "fetch_date",
                                       "text"}


def test_html_entities_single_pass_and_schemeless_urls(spark):
    from sparkdon.sources.warc import canonical_url, html_to_text

    # double-escaped entities must decode exactly ONCE
    df = spark.createDataFrame(
        [("<p>Use &amp;lt;b&amp;gt; for bold &amp; more</p>",)],
        "html string")
    text = df.select(html_to_text("html").alias("t")).collect()[0]["t"]
    assert text == "Use &lt;b&gt; for bold & more"

    # schemeless/relative URIs pass through unchanged — NOT collapsed
    # to one empty dedup key
    urls = ["example.com/a", "dns:example.com", "", "/rel/path",
            "http://Real.com/x/"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r["c"] for r in
           df.select(canonical_url("url").alias("c")).collect()]
    assert got[:4] == urls[:4]
    assert got[4] == "http://real.com/x"


def test_charset_aware_document_decode(spark, tmp_path):
    latin = "<html><p>café français</p></html>".encode("latin-1")
    recs = [
        {"warc_type": "response", "target_uri": "http://l1.com/",
         "record_id": "<urn:uuid:l1>",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                         "charset=ISO-8859-1",
         "payload": latin},
        {"warc_type": "response", "target_uri": "http://u8.com/",
         "record_id": "<urn:uuid:u8>",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
         "payload": "<html><p>café utf8</p></html>".encode()},
    ]
    (tmp_path / "c.warc").write_bytes(warc_bytes(recs))
    docs = {r["doc_id"]: r["text"] for r in
            warc_documents(read_warc(spark, str(tmp_path))).collect()}
    assert docs["<urn:uuid:l1>"] == "café français"
    assert docs["<urn:uuid:u8>"] == "café utf8"


def test_filter_blocked_hosts(spark):
    from sparkdon.sources.warc import filter_blocked_hosts

    docs = spark.createDataFrame(
        [("a", "http://Bad.com/x", "d", "t"),
         ("b", "http://good.com/y", "d", "t"),
         ("c", "https://sub.bad.com/z", "d", "t")],
        "doc_id string, url string, fetch_date string, text string")
    blocked = spark.createDataFrame([("BAD.com",)], "host string")
    kept = filter_blocked_hosts(docs, blocked)
    assert {r["doc_id"] for r in kept.collect()} == {"b", "c"}
    assert kept.columns == docs.columns
    # broadcast side asserted in the plan
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_write_warc_roundtrip(spark, tmp_path):
    from sparkdon.sources.warc import write_warc

    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "a.warc.gz").write_bytes(
        warc_bytes(RECORDS, gzip_per_record=True))
    records = read_warc(spark, str(tmp_path / "in")).repartition(2)
    out = str(tmp_path / "out")
    write_warc(records, out)

    again = read_warc(spark, out)
    want = read_warc(spark, str(tmp_path / "in"))
    cols = ["record_id", "warc_type", "target_uri", "http_status",
            "http_content_type", "payload_length"]
    assert sorted(map(tuple, again.select(cols).collect())) == \
        sorted(map(tuple, want.select(cols).collect()))
    # payload bytes survive exactly (HTTP envelope re-synthesized)
    a = {r["record_id"]: bytes(r["payload"]) for r in again.collect()}
    w = {r["record_id"]: bytes(r["payload"]) for r in want.collect()}
    assert a == w


def test_extract_links_edge_list(spark, tmp_path):
    from sparkdon.sources.warc import extract_links

    page = (b"<html><body>"
            b'<a href="http://Other.com/x?utm_source=t">one</a>'
            b"<a href='https://second.com/y#frag'>two</a>"
            b'<a href="/relative/skipped">three</a>'
            b'<a href="mailto:a@b.c">four</a>'
            b"</body></html>")
    recs = [{"warc_type": "response", "target_uri": "http://src.com/p",
             "record_id": "<urn:uuid:s>",
             "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
             "payload": page}]
    (tmp_path / "l.warc").write_bytes(warc_bytes(recs))
    edges = extract_links(read_warc(spark, str(tmp_path)))
    got = {(r["src"], r["dst"], r["dst_host"]) for r in edges.collect()}
    assert got == {
        ("http://src.com/p", "http://other.com/x", "other.com"),
        ("http://src.com/p", "https://second.com/y", "second.com"),
    }
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # whole chain stays JVM-side


def test_extract_links_uppercase_and_unquoted(spark, tmp_path):
    from sparkdon.sources.warc import extract_links

    page = (b'<html><A HREF="http://upper.com/a">x</A>'
            b"<a href=http://unquoted.com/b>y</a></html>")
    recs = [{"warc_type": "response", "target_uri": "http://s.com/",
             "record_id": "<urn:uuid:u>",
             "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
             "payload": page}]
    (tmp_path / "u.warc").write_bytes(warc_bytes(recs))
    got = {r["dst"] for r in
           extract_links(read_warc(spark, str(tmp_path))).collect()}
    assert got == {"http://upper.com/a", "http://unquoted.com/b"}


def test_write_warc_overwrites_stale_parts(spark, tmp_path):
    from sparkdon.sources.warc import write_warc

    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "a.warc").write_bytes(warc_bytes(RECORDS))
    records = read_warc(spark, str(tmp_path / "in"))
    out = str(tmp_path / "out")
    write_warc(records.repartition(4), out)
    write_warc(records.repartition(1), out)  # narrower re-write
    again = read_warc(spark, out)
    assert again.count() == len(RECORDS)  # no stale parts mixed in


def test_crawl_diff(spark):
    from sparkdon.sources.warc import crawl_diff

    old = spark.createDataFrame(
        [("a", "http://h.com/same", "d", "text one"),
         ("b", "http://h.com/changed", "d", "old text"),
         ("c", "http://h.com/gone", "d", "bye")],
        "doc_id string, url string, fetch_date string, text string")
    new = spark.createDataFrame(
        [("a2", "http://WWW.h.com/same", "d", "text one"),  # canonical match
         ("b2", "http://h.com/changed", "d", "NEW text"),
         ("d2", "http://h.com/fresh", "d", "hi")],
        "doc_id string, url string, fetch_date string, text string")
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    assert got == {"http://h.com/same": "unchanged",
                   "http://h.com/changed": "changed",
                   "http://h.com/gone": "removed",
                   "http://h.com/fresh": "added"}


def test_crawl_diff_null_text_and_duplicate_keys(spark):
    from sparkdon.sources.warc import crawl_diff

    old = spark.createDataFrame(
        [("a", "http://h.com/null-gone", "2024-01", None),   # null text
         ("b", "http://h.com/dup", "2024-01", "v1")],
        "doc_id string, url string, fetch_date string, text string")
    new = spark.createDataFrame(
        [("c", "http://h.com/dup", "2024-02", "v2"),          # newest
         ("d", "http://WWW.h.com/dup", "2024-01", "v1"),      # stale twin
         ("e", "http://h.com/null-fresh", "2024-02", None)],
        "doc_id string, url string, fetch_date string, text string")
    got = {r["url"]: r["status"] for r in crawl_diff(old, new).collect()}
    # null text is a value, not a missing side
    assert got["http://h.com/null-gone"] == "removed"
    assert got["http://h.com/null-fresh"] == "added"
    # duplicate canonical keys resolve to the newest capture: one row
    assert got["http://h.com/dup"] == "changed"
    assert len(got) == 3


def test_to_documents_table_schema_and_lang(spark, tmp_path):
    from sparkdon.sources.warc import to_documents_table

    recs = [
        {"warc_type": "response", "target_uri": "http://en.site.com/a",
         "record_id": "<urn:uuid:e>",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
         "payload": b"<html><p>the cat is on the roof of the house"
                    b" and it is happy to be there</p></html>"},
        {"warc_type": "response", "target_uri": "http://de.seite.de/b",
         "record_id": "<urn:uuid:d>",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
         "payload": "<html><p>der hund ist nicht im haus und die katze "
                    "ist auch nicht da</p></html>".encode()},
    ]
    (tmp_path / "d.warc").write_bytes(warc_bytes(recs))
    docs = to_documents_table(
        warc_documents(read_warc(spark, str(tmp_path))))

    # the EXACT canonical documents-table schema the pipeline reads
    canonical = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert [(f.name, f.dataType) for f in docs.schema.fields] == \
        [(f.name, f.dataType) for f in canonical.schema.fields]

    rows = {r["source"]: r for r in docs.collect()}
    assert rows["en.site.com"]["lang"] == "en"
    assert rows["de.seite.de"]["lang"] == "de"
    for r in rows.values():
        assert r["n_chars"] == len(r["text"])
        assert isinstance(r["doc_id"], int)

    # deterministic ids: same crawl → same ids
    again = to_documents_table(
        warc_documents(read_warc(spark, str(tmp_path))))
    assert {r["doc_id"] for r in again.collect()} == \
        {r["doc_id"] for r in docs.collect()}


def test_to_documents_table_collapses_captures(spark):
    from sparkdon.sources.warc import to_documents_table

    docs = spark.createDataFrame(
        [("a", "http://h.com/x?utm_source=t", "2024-01", "old"),
         ("b", "http://www.h.com/x", "2024-06", "new")],
        "doc_id string, url string, fetch_date string, text string")
    rows = to_documents_table(docs).collect()
    assert len(rows) == 1 and rows[0]["text"] == "new"  # doc_id is a key


def _many_records(n, tag):
    return [
        {"warc_type": "resource", "target_uri": f"http://{tag}.test/{i}",
         "record_id": f"<urn:uuid:{tag}-{i}>", "content_type": "text/plain",
         "payload": (f"{tag}-{i} " * 40).encode()}
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_split_index_bounds_outlier_skew(spark, tmp_path, gz):
    """VERDICT r10 #5: one 10x-outlier file must become ~10 balanced
    spans under the indexed scan, and the indexed parse must equal the
    whole-file parse record-for-record."""
    from sparkdon.sources.warc import read_warc_ranges, warc_split_index

    suffix = ".warc.gz" if gz else ".warc"
    small = warc_bytes(_many_records(20, "s"), gzip_per_record=gz)
    # outlier: ~10x the small file's record count
    (tmp_path / f"big{suffix}").write_bytes(
        warc_bytes(_many_records(200, "b"), gzip_per_record=gz))
    (tmp_path / f"s1{suffix}").write_bytes(small)
    (tmp_path / f"s2{suffix}").write_bytes(
        warc_bytes(_many_records(20, "t"), gzip_per_record=gz))

    target = len(small)  # split budget ≈ one small file
    idx = warc_split_index(spark, str(tmp_path), target_split_bytes=target)
    rows = idx.collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
    # the outlier is cut into multiple spans, none much over the target
    big_spans = by_file[f"big{suffix}"]
    assert len(big_spans) >= 5
    assert max(r.length for r in big_spans) < 3 * target
    # bounded max-task skew: largest span ≪ the whole outlier file
    big_size = (tmp_path / f"big{suffix}").stat().st_size
    assert max(r.length for r in big_spans) < big_size / 3
    # spans tile each file exactly (offset-sorted, contiguous from 0)
    for fname, spans in by_file.items():
        spans = sorted(spans, key=lambda r: r.offset)
        assert spans[0].offset == 0
        for a, b in zip(spans, spans[1:]):
            assert a.offset + a.length == b.offset

    # indexed parse == plain parse
    plain = read_warc(spark, str(tmp_path)).select(
        "record_id", "warc_type", "target_uri", "payload_length")
    ranged = read_warc_ranges(spark, idx).select(
        "record_id", "warc_type", "target_uri", "payload_length")
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, ranged.collect()))
    # the one-call convenience form
    conv = read_warc(spark, str(tmp_path), target_split_bytes=target)
    assert conv.count() == plain.count()


def test_split_ranges_duplicate_content_length_agrees_with_parser():
    """A record carrying duplicate Content-Length headers: the span
    scanner and the record parser must pick the SAME one (last wins),
    or span boundaries drift off record boundaries and ranged reads
    silently truncate the span tail."""
    from sparkdon.sources.warc import _scan_split_ranges

    rec = warc_bytes(RECORDS[1:2])
    # inject a bogus first Content-Length before the real one
    assert rec.count(b"Content-Length:") == 1
    dup = rec.replace(b"Content-Length:",
                      b"Content-Length: 7\r\nContent-Length:")
    data = dup + warc_bytes(RECORDS[2:4])
    want = [r["record_id"] for r in parse_warc_records(data)]
    assert len(want) == 3  # parser takes the last (correct) length

    spans = list(_scan_split_ranges(data, target_split_bytes=1))
    assert sum(m for _, _, m in spans) == 3
    got = [r["record_id"]
           for off, length, _ in spans
           for r in parse_warc_records(data[off:off + length])]
    assert got == want


def test_negative_content_length_terminates_not_spins():
    """r12 review: a record claiming a negative Content-Length must
    stop the parse at the good prefix — pos would otherwise stagnate
    and parse_warc_records yields the same record forever while
    _scan_split_ranges spins without yielding."""
    from sparkdon.sources.warc import _scan_split_ranges

    good = warc_bytes(RECORDS[:1])
    bad = warc_bytes(RECORDS[1:2]).replace(
        b"Content-Length: ", b"Content-Length: -", 1)
    data = good + bad
    recs = list(parse_warc_records(data))
    assert len(recs) == 1 and recs[0]["warc_type"] == "warcinfo"
    spans = list(_scan_split_ranges(data, target_split_bytes=1))
    assert sum(m for _, _, m in spans) == 1


def test_split_index_single_member_gzip_stays_whole(tmp_path):
    """A whole-file gzip stream (not per-record members) is inherently
    unsplittable: the index must return it as ONE span."""
    import gzip as _gzip

    from sparkdon.sources.warc import _scan_split_ranges

    data = _gzip.compress(warc_bytes(_many_records(100, "w")))
    spans = list(_scan_split_ranges(data, target_split_bytes=1024))
    assert spans == [(0, len(data), 1)]


def test_local_path_rejects_remote_schemes():
    from sparkdon.sources.warc import _local_path

    assert _local_path("file:/a/b.warc") == "/a/b.warc"
    assert _local_path("file:///a/b.warc") == "/a/b.warc"
    assert _local_path("/a/b.warc") == "/a/b.warc"
    with pytest.raises(ValueError):
        _local_path("hdfs://nn/a/b.warc")


# --- spark.read.format("warc") Python Data Source (round 11) ---------------

def test_warc_data_source_file_per_partition(spark, tmp_path):
    from sparkdon.sources.warc_source import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    (tmp_path / "a.warc.gz").write_bytes(
        warc_bytes(RECORDS, gzip_per_record=True))
    (tmp_path / "b.warc").write_bytes(warc_bytes(RECORDS[1:3]))
    df = spark.read.format("warc").option("path", str(tmp_path)).load()
    want = read_warc(spark, str(tmp_path)).select(
        "record_id", "warc_type", "target_uri", "payload_length")
    got = df.select("record_id", "warc_type", "target_uri", "payload_length")
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    # one partition per file
    assert df.rdd.getNumPartitions() == 2


def test_warc_data_source_indexed_partitions(spark, tmp_path):
    from sparkdon.sources.warc_source import WarcDataSource
    from sparkdon.sources.warc import warc_split_index

    spark.dataSource.register(WarcDataSource)
    big = warc_bytes(_many_records(120, "d"), gzip_per_record=True)
    (tmp_path / "big.warc.gz").write_bytes(big)
    idx_dir = tmp_path / "splits"
    target = max(1, len(big) // 6)
    warc_split_index(spark, str(tmp_path / "big.warc.gz"),
                     target_split_bytes=target) \
        .write.mode("overwrite").parquet(str(idx_dir))
    n_spans = spark.read.parquet(str(idx_dir)).count()
    assert n_spans >= 4
    df = (spark.read.format("warc")
          .option("path", str(tmp_path))
          .option("index", str(idx_dir)).load())
    assert df.rdd.getNumPartitions() == n_spans
    assert df.count() == 120
    assert sorted(r.record_id for r in df.select("record_id").collect()) == \
        sorted(f"<urn:uuid:d-{i}>" for i in range(120))


def test_warc_data_source_missing_path_errors(spark):
    from sparkdon.sources.warc_source import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    with pytest.raises(Exception):
        spark.read.format("warc").load().collect()


def test_warc_stream_source_incremental_with_checkpoint(spark, tmp_path):
    """spark.readStream.format("warc"): files landing in the directory
    arrive as new micro-batches, and a SECOND run against the same
    checkpoint processes only the files added since — exactly-once per
    file across restarts."""
    from sparkdon.sources.warc_source import WarcDataSource

    spark.dataSource.register(WarcDataSource)
    src = tmp_path / "landing"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.warc.gz").write_bytes(
        warc_bytes(_many_records(7, "sa"), gzip_per_record=True))

    def drain():
        q = (spark.readStream.format("warc").option("path", str(src)).load()
             .select("record_id", "target_uri")
             .writeStream.foreachBatch(
                 lambda bdf, _bid: bdf.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        assert q.awaitTermination(120)

    drain()
    got1 = sorted(r.record_id for r in spark.read.parquet(out).collect())
    assert got1 == sorted(f"<urn:uuid:sa-{i}>" for i in range(7))

    (src / "b.warc").write_bytes(warc_bytes(_many_records(3, "sb")))
    drain()
    got2 = sorted(r.record_id for r in spark.read.parquet(out).collect())
    # file a NOT reprocessed; file b's records appended exactly once
    assert len(got2) == 10
    assert sorted(set(got2)) == got2


def test_warc_stream_vanished_file_skipped_and_counted(tmp_path):
    """r11 ADVICE: a file deleted between planning and read is skipped
    (at-most-once for the raced file, never a poisoned batch) and the
    skip is surfaced on the per-worker ``skipped_files`` counter."""
    from pyspark.sql.datasource import InputPartition

    from sparkdon.sources.warc_source import WarcStreamReader

    reader = WarcStreamReader({"path": str(tmp_path)})
    gone = str(tmp_path / "vanished.warc.gz")
    rows = list(reader.read(InputPartition(gone)))
    assert rows == []
    assert reader.skipped_files == 1


def test_warc_stream_offsets_monotone_and_tmp_files_ignored(spark, tmp_path):
    """r11 review: (a) a processed-then-deleted (even re-landed) file
    must not re-enter a batch — offsets are monotone; (b) in-progress
    .tmp files are never listed; (c) a not-yet-created landing dir
    idles instead of crashing."""
    from sparkdon.sources.warc_source import WarcDataSource, _list_warc_files

    spark.dataSource.register(WarcDataSource)
    src = tmp_path / "landing"
    # (c) path does not exist yet → empty listing, not a bogus "file"
    assert _list_warc_files(str(src)) == []
    src.mkdir()
    (src / "half.warc.gz.tmp").write_bytes(b"\x1f\x8b partial")
    assert _list_warc_files(str(src)) == []      # (b) suffix match only

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    (src / "a.warc.gz").write_bytes(
        warc_bytes(_many_records(4, "ma"), gzip_per_record=True))

    def drain():
        q = (spark.readStream.format("warc").option("path", str(src)).load()
             .select("record_id")
             .writeStream.foreachBatch(
                 lambda bdf, _bid: bdf.write.mode("append").parquet(out))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .start())
        assert q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 4
    # (a) retention deletes the processed file; a same-named file
    # re-lands; a restarted query must NOT reprocess the name
    (src / "a.warc.gz").unlink()
    (src / "a.warc.gz").write_bytes(
        warc_bytes(_many_records(4, "ma"), gzip_per_record=True))
    (src / "b.warc.gz").write_bytes(
        warc_bytes(_many_records(2, "mb"), gzip_per_record=True))
    drain()
    got = [r.record_id for r in spark.read.parquet(out).collect()]
    assert len(got) == 6                          # 4 + only b's 2
    assert sorted(set(got)) == sorted(got)


def test_warc_stream_skip_counter_reaches_driver(spark, tmp_path):
    """VERDICT r12 #5: retention-race skips must be queryable from the
    DRIVER, not just worker stderr — wire an accumulator through
    option("skip_counter") and read its value after the batch.  A
    dangling symlink makes the race deterministic: it is listed at
    planning time and raises FileNotFoundError at read time, exactly
    the planned-then-deleted shape."""
    from sparkdon.sources.warc_source import (WarcDataSource,
                                              skip_counter_option,
                                              skipped_files_accumulator)

    spark.dataSource.register(WarcDataSource)
    src = tmp_path / "landing"
    src.mkdir()
    (src / "ok.warc.gz").write_bytes(
        warc_bytes(_many_records(3, "sc"), gzip_per_record=True))
    (src / "gone.warc.gz").symlink_to(src / "never-existed.warc.gz")

    acc = skipped_files_accumulator(spark)
    assert skipped_files_accumulator(spark) is acc  # idempotent handle
    base = acc.value
    out = str(tmp_path / "out")
    q = (spark.readStream.format("warc")
         .option("path", str(src))
         .option("skip_counter", skip_counter_option(acc))
         .load()
         .select("record_id")
         .writeStream.foreachBatch(
             lambda bdf, _bid: bdf.write.mode("append").parquet(out))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True)
         .start())
    assert q.awaitTermination(120)
    # the readable file's rows all arrived; the raced file surfaced on
    # the driver-side counter instead of poisoning the batch
    assert spark.read.parquet(out).count() == 3
    assert acc.value - base == 1
