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
