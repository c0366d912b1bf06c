"""robots.txt (RFC 9309 Robots Exclusion Protocol) — parse the robots
responses already present in a crawl and filter documents by them.

Training-data curation increasingly re-checks robots permissions
post-hoc (opt-out compliance): the crawl itself contains each host's
``/robots.txt`` response, so the rule set needs no extra fetching.

Scale shape: the rules frame is tiny relative to the corpus (one host
emits a handful of rows), so :func:`filter_by_robots` BROADCASTS it —
the corpus side never shuffles.  Longest-match resolution is a
``max_by`` over a lexicographic (match-length, allow) struct under a
hash aggregate keyed by doc — AQE-splittable, no window.

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
    """Extract and parse every host's ``/robots.txt`` response from a
    crawl's record frame → the rules frame :func:`filter_by_robots`
    consumes.  Narrow Arrow stage over the (few) robots rows."""

    def run(batches) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for uri, payload in zip(pdf["target_uri"], pdf["payload"]):
                host = uri.split("://", 1)[-1].split("/", 1)[0].lower()
                body = bytes(payload or b"").decode("utf-8", "replace")
                rows.extend(parse_robots(body, host))
            yield pd.DataFrame(rows, columns=["host", "agent", "allow",
                                              "path"])

    robots = records.filter(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        & F.col("target_uri").rlike(r"^https?://[^/]+/robots\.txt$"))
    return robots.mapInPandas(run, RULES_SCHEMA).dropDuplicates()


def _like_pattern(path_col) -> F.Column:
    """Rule path → SQL LIKE pattern: ``*`` → ``%``, ``$`` end-anchor
    honored, otherwise prefix match (trailing ``%``)."""
    esc = F.regexp_replace(path_col, r"([%_\\\\])", r"\\$1")
    starred = F.regexp_replace(esc, r"\*", "%")
    anchored = F.col("_anchored")
    return F.when(anchored,
                  F.regexp_replace(starred, r"\$$", "")) \
            .otherwise(F.concat(starred, F.lit("%")))


def filter_by_robots(docs: DataFrame, rules: DataFrame,
                     agent: str = "*") -> DataFrame:
    """Keep only documents the rule set allows for ``agent``
    (lowercased; a host's specific-agent group overrides its ``*``
    group, RFC 9309 §2.2.1).  Rules broadcast; corpus never shuffles
    except the per-doc verdict hash-agg."""
    agent = agent.lower()
    r = rules.filter(F.col("agent").isin(agent, "*"))
    # specific-agent group overrides '*' per host
    if agent != "*":
        has_specific = (r.filter(F.col("agent") == agent)
                        .select("host").distinct()
                        .withColumnRenamed("host", "_sh"))
        r = (r.join(F.broadcast(has_specific),
                    r["host"] == has_specific["_sh"], "left")
             .filter((F.col("agent") == agent) | F.col("_sh").isNull())
             .drop("_sh"))
    # allow-all sentinel rows exist only for the group-override logic
    r = r.filter(F.col("path") != "")
    r = (r.withColumn("_anchored", F.col("path").endswith("$"))
         .withColumn("_pat", _like_pattern(F.col("path")))
         .withColumn("_len", F.length("path"))
         .select("host", "allow", "_pat", "_len"))

    keyed = docs.withColumn("_host", url_host("url")).withColumn(
        "_path", F.coalesce(
            F.regexp_extract("url", r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+"
                                    r"([^#]*)", 1), F.lit("")))
    keyed = keyed.withColumn(
        "_path", F.when(F.col("_path") == "", "/").otherwise(
            F.col("_path")))
    hits = keyed.join(F.broadcast(r), keyed["_host"] == r["host"],
                      "left").withColumn(
        "_match", F.col("_pat").isNotNull()
        & F.expr("_path LIKE _pat"))
    # RFC 9309: longest matching rule wins; tie → Allow wins.
    # struct(len, allow) max is exactly that lexicographic order.
    verdict = (hits.groupBy(*[F.col(c) for c in docs.columns])
               .agg(F.max(F.when(F.col("_match"),
                                 F.struct(F.col("_len"),
                                          F.col("allow"))))
                    .alias("_best")))
    return (verdict.filter(F.col("_best").isNull()
                           | F.col("_best.allow"))
            .drop("_best"))
