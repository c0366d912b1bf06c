"""robots.txt (RFC 9309 Robots Exclusion Protocol) — parse the robots
responses already present in a crawl and filter documents by them.

Training-data curation increasingly re-checks robots permissions
post-hoc (opt-out compliance): the crawl itself contains each host's
``/robots.txt`` response, so the rule set needs no extra fetching.

Scale shape: the rules frame is tiny relative to the corpus (one host
emits a handful of rows), so :func:`filter_by_robots` collapses it to
one array-of-structs row per host and BROADCASTS that — the corpus
side joins 1:1 and never shuffles; longest-match resolution is one
``aggregate`` higher-order function in the projection.

Rule matching implements RFC 9309 §2.2.2: most-specific (longest)
matching path wins; on a tie Allow wins; no matching rule → allowed.
``$`` end-anchors and mid-pattern ``*`` wildcards are supported by
compiling each rule path to a ``LIKE`` pattern JVM-side.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from sparkdon.sources.warc import url_host

#: output schema of robots_rules
RULES_SCHEMA = "host string, agent string, allow boolean, path string"


def parse_robots(text: str, host: str) -> list[tuple]:
    """One robots.txt body → ``(host, agent, allow, path)`` rows.
    Consecutive ``User-agent`` lines share the following rule block
    (RFC 9309 §2.2.1); comments and unknown directives are ignored.
    A group whose rules are all empty (``Disallow:``) is allow-all —
    it emits a SENTINEL row ``(host, agent, True, "")`` so the group's
    existence survives (a specific-agent group must override ``*``
    even when it contains no restrictions)."""
    rows: list[tuple] = []
    agents: list[str] = []
    in_group = False  # False: collecting UA lines; True: collecting rules
    emitted = 0

    def close_group() -> None:
        if agents and emitted == 0:
            for a in agents:
                rows.append((host, a, True, ""))

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, sep, value = line.partition(":")
        if not sep:
            continue
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_group:  # a new group starts
                close_group()
                agents = []
                in_group = False
                emitted = 0
            agents.append(value.lower())
        elif key in ("allow", "disallow"):
            in_group = True
            if not agents:
                continue  # rules before any user-agent: ignored
            if not value:
                continue  # empty Disallow/Allow: no restriction
            for a in agents:
                rows.append((host, a, key == "allow", value))
                emitted += 1
        # crawl-delay / sitemap / unknown: ignored
    close_group()
    return rows


def robots_rules(records: DataFrame) -> DataFrame:
    """Extract and parse robots rules from a crawl's record frame →
    the rules frame :func:`filter_by_robots` consumes.

    Per host the NEWEST capture wins (http+https and recrawl captures
    of the same host otherwise merge into one rule set, letting a
    stale long ``Allow`` outrank a fresh ``Disallow`` via
    longest-match).  Hosts whose robots.txt returned 5xx emit a
    disallow-all row — RFC 9309 §2.3.1.4 mandates assuming complete
    disallow when robots is unreachable.  Host keys come from the same
    :func:`url_host` the filter side uses (ports/userinfo stripped
    identically).  BOM-prefixed bodies parse correctly
    (``utf-8-sig``)."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for host, payload, status in zip(pdf["host"], pdf["payload"],
                                             pdf["status"]):
                if status is not None and 500 <= status < 600:
                    rows.append((host, "*", False, "/"))
                    continue
                body = bytes(payload or b"").decode("utf-8-sig",
                                                    "replace")
                rows.extend(parse_robots(body, host))
            yield pd.DataFrame(rows, columns=["host", "agent", "allow",
                                              "path"])

    robots = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status").isNotNull())
        & ((F.col("http_status") == 200)
           | F.col("http_status").between(500, 599))
        & F.col("target_uri").rlike(r"^https?://[^/]+/robots\.txt$"))
    newest = (robots
              .groupBy(url_host("target_uri").alias("host"))
              .agg(F.max_by(F.struct(F.col("payload").alias("payload"),
                                     F.col("http_status").alias("status")),
                            F.col("warc_date")).alias("_r"))
              .select("host", "_r.payload", "_r.status"))
    return newest.mapInPandas(run, RULES_SCHEMA).dropDuplicates()


def parse_sitemap(xml: str) -> list[tuple]:
    """One sitemap.xml body → ``(loc, lastmod, kind)`` rows, where
    ``kind`` is ``url`` (urlset entries) or ``sitemap`` (sitemapindex
    entries, for the caller to fetch/recurse).  Regex-tolerant of the
    namespace/ordering variation real sitemaps show; CDATA-wrapped
    values (common CMS output) and the spec-mandated XML entity
    escaping (``&amp;`` &c.) are both handled — unescaped locs can
    never join against crawled canonical URLs."""
    import html
    import re

    rows: list[tuple] = []
    for m in re.finditer(r"(?s)<(url|sitemap)\b[^>]*>(.*?)</\1>", xml):
        kind, body = m.group(1), m.group(2)
        body = re.sub(r"(?s)<!\[CDATA\[(.*?)\]\]>", r"\1", body)
        loc = re.search(r"(?s)<loc[^>]*>\s*([^<\s][^<]*?)\s*</loc>", body)
        if not loc:
            continue
        lastmod = re.search(r"(?s)<lastmod[^>]*>\s*([^<]+?)\s*</lastmod>",
                            body)
        rows.append((html.unescape(loc.group(1)),
                     html.unescape(lastmod.group(1)) if lastmod else None,
                     "url" if kind == "url" else "sitemap"))
    return rows


def _sitemap_hints(records: DataFrame) -> DataFrame:
    """``Sitemap:`` directive URLs from the crawl's robots.txt bodies —
    the authoritative discovery signal (RFC 9309 allows sitemaps at
    ANY path, including query strings the shape regex can't see)."""

    def run(batches) -> Iterator:
        import re

        import pandas as pd

        for pdf in batches:
            urls: list[str] = []
            for payload in pdf["payload"]:
                body = bytes(payload or b"").decode("utf-8-sig",
                                                    "replace")
                urls.extend(m.group(1) for m in re.finditer(
                    r"(?im)^\s*sitemap\s*:\s*(\S+)", body))
            yield pd.DataFrame({"_hint": urls})

    robots = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("target_uri").rlike(r"^https?://[^/]+/robots\.txt$"))
    return robots.select("payload").mapInPandas(run, "_hint string") \
        .dropDuplicates()


def sitemap_urls(records: DataFrame) -> DataFrame:
    """Extract URL inventories from the sitemap responses present in a
    crawl → ``(host, loc, lastmod, kind)``.  The freshness frontier:
    joined against the crawled documents' canonical URLs it yields the
    not-yet-fetched and changed-since-lastmod URL sets.

    Discovery = conventional URL shapes (``…sitemap*.xml[.gz]``) UNION
    whatever the hosts' own robots.txt ``Sitemap:`` directives name
    (unhinted semi-join, AQE-broadcast when the hint list fits —
    sitemaps live at arbitrary paths).  Per
    sitemap URL the NEWEST capture wins, mirroring
    :func:`robots_rules` — stale recrawl captures would otherwise emit
    conflicting ``lastmod`` rows for the same loc."""

    def run(batches) -> Iterator:
        import pandas as pd

        from sparkdon.sources.warc import _gunzip_members

        for pdf in batches:
            rows: list[tuple] = []
            for host, payload in zip(pdf["host"], pdf["payload"]):
                raw = bytes(payload or b"")
                if raw[:2] == b"\x1f\x8b":  # sitemap.xml.gz
                    raw = _gunzip_members(raw)
                xml = raw.decode("utf-8-sig", "replace")
                rows.extend((host,) + r for r in parse_sitemap(xml))
            yield pd.DataFrame(rows, columns=["host", "loc", "lastmod",
                                              "kind"])

    # unhinted: the hint list scales with host count; AQE broadcasts
    # it when it actually fits
    hinted = records.join(
        _sitemap_hints(records),
        records["target_uri"] == F.col("_hint"), "left_semi")
    shaped = records.filter(
        F.col("target_uri").rlike(r"(?i)sitemap[^/]*\.xml(\.gz)?($|\?)"))
    maps = shaped.unionByName(hinted).filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200))
    newest = (maps
              .groupBy(url_host("target_uri").alias("host"),
                       F.col("target_uri"))
              .agg(F.max_by(F.col("payload"), F.col("warc_date"))
                   .alias("payload")))
    return newest.mapInPandas(
        run, "host string, loc string, lastmod string, kind string") \
        .dropDuplicates()


def _like_pattern(path_col) -> F.Column:
    """Rule path → SQL LIKE pattern: ``*`` → ``%``, ``$`` end-anchor
    honored, otherwise prefix match (trailing ``%``)."""
    esc = F.regexp_replace(path_col, r"([%_\\])", r"\\$1")
    starred = F.regexp_replace(esc, r"\*", "%")
    anchored = F.col("_anchored")
    return F.when(anchored,
                  F.regexp_replace(starred, r"\$$", "")) \
            .otherwise(F.concat(starred, F.lit("%")))


def filter_by_robots(docs: DataFrame, rules: DataFrame,
                     agent: str = "*",
                     broadcast_rules: bool = False) -> DataFrame:
    """Keep only documents the rule set allows for ``agent``
    (lowercased; a host's specific-agent group overrides its ``*``
    group, RFC 9309 §2.2.1).

    The rules collapse to ONE array-of-structs row per host, joined
    1:1 onto the documents, and the longest-match / Allow-wins verdict
    (§2.2.2) is a single ``aggregate`` higher-order function in the
    projection.  Documents pass through byte-identical — no grouping,
    so duplicate rows and non-orderable (map) columns survive
    untouched.

    ``broadcast_rules`` defaults to FALSE: the per-host rule frame
    scales with the number of hosts (tens of millions across a full
    crawl), so a forced broadcast would OOM executors at corpus scale —
    unhinted, AQE upgrades the host-keyed join to broadcast exactly
    when the rule frame really is small (a single segment's hosts).
    Pass True to pin the hint for a known-small rule set."""
    agent = agent.lower()
    hint = F.broadcast if broadcast_rules else (lambda d: d)
    r = rules.filter(F.col("agent").isin(agent, "*"))
    # specific-agent group overrides '*' per host
    if agent != "*":
        has_specific = (r.filter(F.col("agent") == agent)
                        .select("host").distinct()
                        .withColumnRenamed("host", "_sh"))
        r = (r.join(hint(has_specific),
                    r["host"] == has_specific["_sh"], "left")
             .filter((F.col("agent") == agent) | F.col("_sh").isNull())
             .drop("_sh"))
    # allow-all sentinel rows exist only for the group-override logic
    r = r.filter(F.col("path") != "")
    r = (r.withColumn("_anchored", F.col("path").endswith("$"))
         .withColumn("_pat", _like_pattern(F.col("path")))
         .withColumn("_len", F.length("path")))
    per_host = (r.groupBy(F.col("host").alias("_rb_host"))
                .agg(F.collect_list(
                    F.struct(F.col("_len").alias("len"),
                             F.col("allow").alias("allow"),
                             F.col("_pat").alias("pat")))
                    .alias("_rb_rules")))

    keyed = (docs
             .withColumn("_rb_host", url_host("url"))
             .withColumn("_rb_path", F.regexp_extract(
                 "url", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^#]*)", 1))
             .withColumn("_rb_path",
                         F.when(F.col("_rb_path") == "", "/")
                         .otherwise(F.col("_rb_path"))))
    joined = keyed.join(hint(per_host), "_rb_host", "left")
    # one fold over the host's rules: keep the best MATCHING rule,
    # longer wins, equal length prefers Allow; len -1 = nothing matched
    verdict = F.expr(
        "aggregate(_rb_rules, struct(-1 AS len, true AS allow), "
        " (acc, r) -> IF(_rb_path LIKE r.pat AND "
        "   (r.len > acc.len OR (r.len = acc.len AND r.allow)), "
        "   struct(r.len AS len, r.allow AS allow), acc))")
    return (joined
            .filter(F.col("_rb_rules").isNull() | verdict["allow"])
            .drop("_rb_host", "_rb_path", "_rb_rules"))
