"""CDX-J offset index (sparkdon/sources/cdx.py, round 11): SURT keys
(Python builder twin vs JVM query expression), distributed build over
per-record-gzip WARC, CDXJ write/read round-trip (plain + gzip), and
index-driven random-access fetch through read_warc_ranges."""

import gzip

import pytest

from sparkdon.sources.cdx import (build_cdx, fetch_by_cdx, read_cdx, surt,
                                  surt_key, write_cdxj)
from sparkdon.sources.warc import warc_bytes

RECS_A = [
    {"warc_type": "response", "target_uri": "http://example.com/a",
     "record_id": "<urn:uuid:a1>", "warc_date": "2024-03-05T10:20:30Z",
     "content_type": "application/http; msgtype=response",
     "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
     "payload": b"<html>alpha</html>"},
    {"warc_type": "response", "target_uri": "https://www.Example.COM:443/B?q=1",
     "record_id": "<urn:uuid:a2>", "warc_date": "2024-03-05T10:21:00Z",
     "content_type": "application/http; msgtype=response",
     "http_headers": "HTTP/1.1 404 Not Found\r\nContent-Type: text/plain",
     "payload": b"gone"},
]
RECS_B = [
    {"warc_type": "resource", "target_uri": "http://other.net/x",
     "record_id": "<urn:uuid:b1>", "warc_date": "2024-04-01T00:00:00Z",
     "content_type": "text/plain", "payload": b"beta"},
]


def test_surt_python_rules():
    assert surt("https://www.Example.COM:443/Path?q=1") == \
        "com,example,www)/Path?q=1"
    assert surt("http://example.com/a") == "com,example)/a"
    assert surt("http://user@host.org:80") == "org,host)/"
    assert surt("http://a.b.c/") == "c,b,a)/"
    # only the scheme's OWN default port is stripped (pywb rule)
    assert surt("http://example.com:443/a") == "com,example:443)/a"
    assert surt("https://example.com:80/a") == "com,example:80)/a"
    assert surt("example.com:80/a") == "com,example)/a"  # scheme-less = http
    # fragments never reach the key
    assert surt("http://example.com/a#frag") == "com,example)/a"
    assert surt("http://example.com#frag") == "com,example)/"
    assert surt("http://example.com/a?q=1#x=y") == "com,example)/a?q=1"


def test_surt_jvm_twin_matches_python(spark):
    urls = ["https://www.Example.COM:443/Path?q=1", "http://example.com/a",
            "http://user@host.org:80", "http://a.b.c/",
            "https://sub.domain.io:8443/p/q?r=s#frag", "http://x.y",
            "http://example.com:443/a", "https://example.com:80/a",
            "example.com:80/a", "http://example.com/a#frag",
            "http://example.com#frag", "ftp://files.org:21/x",
            # adversarial: embedded URLs, multi-#, @ in query, empty
            # port, non-numeric port, spaces, bare host, ?#-ordering
            "http://a.io/r?to=https://b.io:8443/x#f",
            "http://a.io/p#one#two", "http://u:p@w.io:80/q?a=@b",
            "http://w.io:/path", "http://w.io:abc/p",
            "http://w.io/a b/c d#e f", "w.io", "http://w.io?q=1#f",
            "HTTPS://W.IO:443#f", "http://w.io/#", "http://w.io/?#"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(surt_key("url")).collect()]
    assert got == [surt(u) for u in urls]


@pytest.fixture()
def archive(tmp_path):
    (tmp_path / "a.warc.gz").write_bytes(
        warc_bytes(RECS_A, gzip_per_record=True))
    (tmp_path / "b.warc.gz").write_bytes(
        warc_bytes(RECS_B, gzip_per_record=True))
    return tmp_path


def test_build_cdx_rows(spark, archive):
    rows = {r.url: r for r in build_cdx(spark, str(archive)).collect()}
    assert len(rows) == 3
    a = rows["http://example.com/a"]
    assert a.surt == "com,example)/a"
    assert a.ts == "20240305102030"
    assert a.status == 200
    assert a.mime == "text/html"
    assert a.warc_type == "response"
    assert a.warc_file.endswith("a.warc.gz")
    # the (offset, length) addresses exactly one gzip member
    raw = (archive / "a.warc.gz").read_bytes()
    member = raw[a.offset:a.offset + a.length]
    assert gzip.decompress(member).startswith(b"WARC/1.0")
    import hashlib
    assert a.digest == hashlib.sha1(b"<html>alpha</html>").hexdigest()


def test_cdxj_roundtrip_and_sorted(spark, archive, tmp_path):
    cdx = build_cdx(spark, str(archive))
    out = tmp_path / "cdx"
    write_cdxj(cdx, str(out))
    back = read_cdx(spark, str(out))
    want = sorted(map(tuple, cdx.collect()))
    got = sorted(map(tuple, back.collect()))
    assert got == want
    # emitted lines are globally sorted by (surt, ts)
    lines = []
    for p in sorted(out.glob("part-*")):
        lines += p.read_text().splitlines()
    keys = [tuple(line.split(" ", 3)[:2]) for line in lines]
    assert keys == sorted(keys)


def test_read_cdx_gzip_text(spark, archive, tmp_path):
    cdx = build_cdx(spark, str(archive))
    out = tmp_path / "cdxgz"
    out.mkdir()
    line_rows = cdx.collect()
    import json as _json
    lines = []
    for r in line_rows:
        lines.append(f'{r.surt} {r.ts} ' + _json.dumps({
            "url": r.url, "filename": r.warc_file,
            "offset": str(r.offset), "length": str(r.length),
            "status": str(r.status) if r.status is not None else None,
            "mime": r.mime, "digest": r.digest,
            "warc_type": r.warc_type}))
    (out / "cdx-00000.gz").write_bytes(
        gzip.compress(("\n".join(sorted(lines)) + "\n").encode()))
    back = read_cdx(spark, str(out))
    assert sorted(r.url for r in back.collect()) == \
        sorted(r.url for r in line_rows)


def test_fetch_by_cdx_random_access(spark, archive):
    cdx = build_cdx(spark, str(archive)).localCheckpoint()
    # domain prefix (no host-closing paren) sweeps subdomains too;
    # "com,example)" alone would match only the bare host
    got = fetch_by_cdx(spark, cdx, surt_prefix="com,example").collect()
    assert sorted(r.target_uri for r in got) == [
        "http://example.com/a", "https://www.Example.COM:443/B?q=1"]
    only_bare = fetch_by_cdx(spark, cdx, surt_prefix="com,example)").collect()
    assert [r.target_uri for r in only_bare] == ["http://example.com/a"]
    assert {bytes(r.payload) for r in got if r.warc_type == "response"} \
        >= {b"gone"}
    # no filter → the whole archive, equal to the full scan
    from sparkdon.sources.warc import read_warc
    all_rows = fetch_by_cdx(spark, cdx).select("record_id").collect()
    full = read_warc(spark, str(archive)).select("record_id").collect()
    assert sorted(map(tuple, all_rows)) == sorted(map(tuple, full))


# --- r11 review findings ----------------------------------------------------

def test_surt_embedded_url_and_spaces(spark):
    # a '://' inside the query must not shift the host split
    assert surt("example.com/redirect?to=http://a.b") == \
        "com,example)/redirect?to=http://a.b"
    # raw spaces percent-encode so a key stays one CDXJ field
    assert surt("http://example.com/a b/c") == "com,example)/a%20b/c"
    urls = ["example.com/redirect?to=http://a.b", "http://example.com/a b/c"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(surt_key("url")).collect()]
    assert got == [surt(u) for u in urls]


def test_spacey_url_survives_cdxj_roundtrip(spark, tmp_path):
    recs = [{"warc_type": "resource", "target_uri": "http://s.io/a b",
             "record_id": "<urn:uuid:sp>", "warc_date": "2024-01-02T03:04:05Z",
             "content_type": "text/plain", "payload": b"x"}]
    (tmp_path / "s.warc.gz").write_bytes(warc_bytes(recs, gzip_per_record=True))
    cdx = build_cdx(spark, str(tmp_path / "s.warc.gz"))
    out = tmp_path / "cdx"
    write_cdxj(cdx, str(out))
    back = read_cdx(spark, str(out)).collect()
    assert len(back) == 1
    assert back[0].url == "http://s.io/a b"
    assert back[0].offset == 0 and back[0].length is not None


def test_fetch_by_cdx_whole_file_gzip_refilters(spark, tmp_path):
    # whole-file gzip: every record shares the file-wide span; the
    # prefix fetch must still return ONLY the matching records
    recs = [
        {"warc_type": "resource", "target_uri": "http://one.io/x",
         "record_id": "<urn:uuid:w1>", "warc_date": "2024-01-01T00:00:00Z",
         "content_type": "text/plain", "payload": b"1"},
        {"warc_type": "resource", "target_uri": "http://two.io/y",
         "record_id": "<urn:uuid:w2>", "warc_date": "2024-01-01T00:00:00Z",
         "content_type": "text/plain", "payload": b"2"},
    ]
    (tmp_path / "w.warc.gz").write_bytes(gzip.compress(warc_bytes(recs)))
    cdx = build_cdx(spark, str(tmp_path / "w.warc.gz")).localCheckpoint()
    rows = cdx.collect()
    assert len(rows) == 2
    assert all(r.offset == 0 for r in rows)       # shared whole-file span
    got = fetch_by_cdx(spark, cdx, surt_prefix="io,one)").collect()
    assert [r.target_uri for r in got] == ["http://one.io/x"]
