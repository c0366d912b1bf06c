"""RFC 9309 robots filtering: parser groups, longest-match semantics,
agent-group override, wildcard/anchor patterns, crawl extraction."""

from sparkdon.sources.robots import (filter_by_robots, parse_robots,
                                     robots_rules)
from sparkdon.sources.warc import read_warc, warc_bytes

ROBOTS = """# comment
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.json$

User-agent: goodbot
User-agent: nicebot
Disallow:

User-agent: badbot
Disallow: /
"""


def test_parse_robots_groups():
    rows = parse_robots(ROBOTS, "h.com")
    assert ("h.com", "*", False, "/private/") in rows
    assert ("h.com", "*", True, "/private/ok") in rows
    assert ("h.com", "*", False, "/*.json$") in rows
    assert ("h.com", "badbot", False, "/") in rows
    # the empty Disallow group emits allow-all SENTINELS (the group's
    # existence must survive so it overrides '*')
    assert {r for r in rows if r[1] in ("goodbot", "nicebot")} == \
        {("h.com", "goodbot", True, ""), ("h.com", "nicebot", True, "")}


def _docs(spark):
    urls = ["http://h.com/public/a",        # allowed (no match)
            "http://h.com/private/x",       # disallowed
            "http://h.com/private/ok/page", # Allow beats shorter Disallow
            "http://h.com/data/file.json",  # $-anchored wildcard
            "http://h.com/data/file.json5", # anchor must NOT match
            "http://other.com/anything"]    # no robots: allowed
    return spark.createDataFrame(
        [(f"d{i}", u, "2024", "t") for i, u in enumerate(urls)],
        "doc_id string, url string, fetch_date string, text string")


def test_filter_by_robots_longest_match(spark):
    rules = spark.createDataFrame(parse_robots(ROBOTS, "h.com"),
                                  "host string, agent string, "
                                  "allow boolean, path string")
    kept = {r["doc_id"]
            for r in filter_by_robots(_docs(spark), rules).collect()}
    assert kept == {"d0", "d2", "d4", "d5"}

    # badbot's specific group overrides '*' — everything on h.com gone
    kept = {r["doc_id"] for r in
            filter_by_robots(_docs(spark), rules, agent="BadBot").collect()}
    assert kept == {"d5"}

    # goodbot's group is allow-all: '*' rules must NOT apply
    kept = {r["doc_id"] for r in
            filter_by_robots(_docs(spark), rules, agent="goodbot").collect()}
    assert kept == {"d0", "d1", "d2", "d3", "d4", "d5"}


def test_robots_rules_from_crawl(spark, tmp_path):
    recs = [
        {"warc_type": "response", "target_uri": "http://h.com/robots.txt",
         "record_id": "<urn:uuid:r>",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/plain",
         "payload": ROBOTS.encode()},
        {"warc_type": "response", "target_uri": "http://h.com/page",
         "record_id": "<urn:uuid:p>",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/html",
         "payload": b"<html>not robots</html>"},
    ]
    (tmp_path / "r.warc").write_bytes(warc_bytes(recs))
    rules = robots_rules(read_warc(spark, str(tmp_path)))
    got = {(r["agent"], r["allow"], r["path"]) for r in rules.collect()}
    assert ("*", False, "/private/") in got
    assert ("badbot", False, "/") in got
    assert rules.filter("host != 'h.com'").count() == 0


def test_review_fixes_bom_port_5xx_and_stale_capture(spark, tmp_path):
    # BOM-prefixed robots bodies must parse (a fully-disallowed host
    # was previously treated as allow-all)
    recs = [
        {"warc_type": "response",
         "target_uri": "http://bom.com:8080/robots.txt",
         "record_id": "<urn:uuid:b>", "warc_date": "2024-01-01T00:00:00Z",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/plain",
         "payload": "﻿User-agent: *\nDisallow: /\n".encode()},
        # 5xx robots: RFC 9309 mandates assume-complete-disallow
        {"warc_type": "response", "target_uri": "http://down.com/robots.txt",
         "record_id": "<urn:uuid:d>", "warc_date": "2024-01-01T00:00:00Z",
         "http_headers": "HTTP/1.1 503 Unavailable\r\nContent-Type: text/plain",
         "payload": b"oops"},
        # two captures of one host: the NEWEST must win
        {"warc_type": "response", "target_uri": "http://re.com/robots.txt",
         "record_id": "<urn:uuid:old>", "warc_date": "2024-01-01T00:00:00Z",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/plain",
         "payload": b"User-agent: *\nAllow: /private/data\n"},
        {"warc_type": "response", "target_uri": "https://re.com/robots.txt",
         "record_id": "<urn:uuid:new>", "warc_date": "2024-06-01T00:00:00Z",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/plain",
         "payload": b"User-agent: *\nDisallow: /private/\n"},
    ]
    (tmp_path / "x.warc").write_bytes(warc_bytes(recs))
    rules = robots_rules(read_warc(spark, str(tmp_path)))
    got = {(r["host"], r["allow"], r["path"]) for r in rules.collect()}
    assert ("bom.com", False, "/") in got        # BOM + port stripped
    assert ("down.com", False, "/") in got       # 5xx disallow-all
    assert ("re.com", False, "/private/") in got  # newest capture
    assert ("re.com", True, "/private/data") not in got  # stale gone

    # ...and the filter joins on the SAME host key (port stripped)
    docs = spark.createDataFrame(
        [("p", "http://bom.com:8080/page", "2024", "t"),
         ("q", "http://re.com/private/data/x", "2024", "t"),
         ("z", "http://down.com/a", "2024", "t")],
        "doc_id string, url string, fetch_date string, text string")
    kept = {r["doc_id"] for r in filter_by_robots(docs, rules).collect()}
    assert kept == set()


def test_filter_preserves_duplicates_and_map_columns(spark):
    from pyspark.sql import functions as F

    rules = spark.createDataFrame(
        [("h.com", "*", False, "/private/")],
        "host string, agent string, allow boolean, path string")
    docs = spark.createDataFrame(
        [("a", "http://h.com/ok", "2024", "t"),
         ("a", "http://h.com/ok", "2024", "t"),  # duplicate row
         ("b", "http://h.com/private/x", "2024", "t")],
        "doc_id string, url string, fetch_date string, text string"
    ).withColumn("meta", F.create_map(F.lit("k"), F.lit("v")))
    out = filter_by_robots(docs, rules).collect()
    # duplicates preserved (no grouping), map column survives
    assert [r["doc_id"] for r in out] == ["a", "a"]
    assert out[0]["meta"] == {"k": "v"}
    # r12: the default is UNHINTED (a full crawl's per-host rule frame
    # is not broadcastable; AQE upgrades small ones at runtime) —
    # broadcast_rules=True pins the hint for known-small rule sets.
    # autoBroadcastJoinThreshold=-1 makes the assertion DISCRIMINATING:
    # without it, tiny frames broadcast with or without the hint and a
    # reintroduced forced hint would pass unnoticed.
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        hinted_plan = filter_by_robots(docs, rules, broadcast_rules=True) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in hinted_plan   # hint survives -1
        default_plan = filter_by_robots(docs, rules) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in default_plan  # truly unhinted
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    same = filter_by_robots(docs, rules, broadcast_rules=True).collect()
    assert sorted(map(tuple, same)) == sorted(map(tuple, out))


def test_sitemap_parsing_and_extraction(spark, tmp_path):
    import gzip

    from sparkdon.sources.robots import parse_sitemap, sitemap_urls

    urlset = """<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><loc>http://h.com/a</loc><lastmod>2024-01-02</lastmod></url>
      <url><lastmod>2024</lastmod><loc> http://h.com/b </loc></url>
      <url><priority>0.5</priority></url>
    </urlset>"""
    assert parse_sitemap(urlset) == [
        ("http://h.com/a", "2024-01-02", "url"),
        ("http://h.com/b", "2024", "url"),
    ]
    index = """<sitemapindex>
      <sitemap><loc>http://h.com/sitemap-2.xml</loc></sitemap>
    </sitemapindex>"""
    assert parse_sitemap(index) == [
        ("http://h.com/sitemap-2.xml", None, "sitemap")]

    recs = [
        {"warc_type": "response", "target_uri": "http://h.com/sitemap.xml",
         "record_id": "<urn:uuid:s1>",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: application/xml",
         "payload": urlset.encode()},
        {"warc_type": "response",
         "target_uri": "http://g.com/sitemap-news.xml.gz",
         "record_id": "<urn:uuid:s2>",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: application/gzip",
         "payload": gzip.compress(index.encode())},
    ]
    (tmp_path / "s.warc").write_bytes(warc_bytes(recs))
    got = {(r["host"], r["loc"], r["kind"]) for r in
           sitemap_urls(read_warc(spark, str(tmp_path))).collect()}
    assert got == {("h.com", "http://h.com/a", "url"),
                   ("h.com", "http://h.com/b", "url"),
                   ("g.com", "http://h.com/sitemap-2.xml", "sitemap")}


def test_sitemap_cdata_entities_hints_and_newest(spark, tmp_path):
    from sparkdon.sources.robots import parse_sitemap, sitemap_urls

    # CDATA and entity-escaped locs both decode
    xml = ("<urlset><url><loc><![CDATA[http://h.com/cdata]]></loc></url>"
           "<url><loc>http://h.com/p?a=1&amp;b=2</loc></url></urlset>")
    assert parse_sitemap(xml) == [
        ("http://h.com/cdata", None, "url"),
        ("http://h.com/p?a=1&b=2", None, "url")]

    # discovery via robots 'Sitemap:' directive at an unconventional
    # path + newest capture per sitemap URL wins
    odd = "http://h.com/index.php?feed=pages"
    recs = [
        {"warc_type": "response", "target_uri": "http://h.com/robots.txt",
         "record_id": "<urn:uuid:r>", "warc_date": "2024-01-01T00:00:00Z",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/plain",
         "payload": f"User-agent: *\nDisallow:\nSitemap: {odd}\n".encode()},
        {"warc_type": "response", "target_uri": odd,
         "record_id": "<urn:uuid:m>", "warc_date": "2024-01-01T00:00:00Z",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/xml",
         "payload": b"<urlset><url><loc>http://h.com/only-via-hint</loc>"
                    b"</url></urlset>"},
        {"warc_type": "response", "target_uri": "http://h.com/sitemap.xml",
         "record_id": "<urn:uuid:o>", "warc_date": "2024-01-01T00:00:00Z",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/xml",
         "payload": b"<urlset><url><loc>http://h.com/x</loc>"
                    b"<lastmod>2024-01-01</lastmod></url></urlset>"},
        {"warc_type": "response", "target_uri": "http://h.com/sitemap.xml",
         "record_id": "<urn:uuid:n>", "warc_date": "2024-06-01T00:00:00Z",
         "http_headers": "HTTP/1.1 200 OK\r\nContent-Type: text/xml",
         "payload": b"<urlset><url><loc>http://h.com/x</loc>"
                    b"<lastmod>2024-06-01</lastmod></url></urlset>"},
    ]
    (tmp_path / "m.warc").write_bytes(warc_bytes(recs))
    got = {(r["loc"], r["lastmod"]) for r in
           sitemap_urls(read_warc(spark, str(tmp_path))).collect()}
    assert ("http://h.com/only-via-hint", None) in got
    assert ("http://h.com/x", "2024-06-01") in got
    assert ("http://h.com/x", "2024-01-01") not in got  # stale capture
