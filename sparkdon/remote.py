"""Remote SPARQL-protocol source (S3) — reference ``RemoteEndpoint``
(gastrodon/__init__.py:633-775).

The reference wraps SPARQLWrapper; that library is not available here, so
the SPARQL protocol is spoken directly over urllib (public HTTP standard:
GET/POST with ``application/sparql-results+json``).  JSON term decoding
mirrors ``_jsonToNode`` (gastrodon/__init__.py:651-662).

Two consumption modes:

- ``select()`` — driver-side fetch → pandas (the reference's UX; results
  are interactively sized).
- ``to_spark(sparql, partitions=N)`` — scale path: the result set is
  fetched by executors in LIMIT/OFFSET slices inside ``mapInPandas``
  (each task issues its own HTTP request), yielding a distributed
  bindings DataFrame without the driver ever holding the full result.
  OFFSET pagination requires a stable ordering — callers should include
  ORDER BY for strict exactly-once semantics; most stores paginate
  deterministically for a fixed query.
"""

from __future__ import annotations

import json
import re
import urllib.parse
import urllib.request
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from sparkdon.errors import QueryExecutionError
from sparkdon.session import Endpoint, QName, _normalize_column_type
from sparkdon.terms import BNode, IRI, to_python


def _decode_json_term(node: dict | None) -> Any:
    """SPARQL-JSON term → Python value (mirrors _jsonToNode's switch on
    'uri' / 'typed-literal' / 'literal' / 'bnode')."""
    if node is None:
        return None
    t = node.get("type")
    if t == "uri":
        return IRI(node["value"])
    if t == "bnode":
        return BNode(node["value"])
    # 'literal' and 'typed-literal'
    return to_python("lit", node["value"], node.get("datatype"), node.get("xml:lang"))


def _dataset_params(default_graph, named_graphs) -> list:
    """Protocol dataset parameters (SPARQL 1.1 Protocol §2.1.4) as
    repeatable (name, value) pairs.  ``default_graph`` accepts a single
    IRI (reference parity: gastrodon's RemoteEndpoint default_graph) or
    a list; ``named_graphs`` a list."""
    if default_graph is None:
        dgs = []
    elif isinstance(default_graph, (list, tuple)):
        dgs = list(default_graph)
    else:
        dgs = [default_graph]
    return ([("default-graph-uri", str(g)) for g in dgs]
            + [("named-graph-uri", str(g)) for g in (named_graphs or [])])


_XRNS = "{http://www.w3.org/2005/sparql-results#}"


def _parse_xml_results(text: str | bytes) -> dict:
    """SPARQL Query Results XML Format → the JSON-results dict shape
    (fetch_bindings' output contract) — the fallback for endpoints that
    serve only ``application/sparql-results+xml``."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    boolean = root.find(_XRNS + "boolean")
    if boolean is not None:
        return {"head": {}, "boolean": (boolean.text or "").strip() == "true"}
    head = [v.get("name")
            for v in root.findall(f"{_XRNS}head/{_XRNS}variable")]
    bindings = []
    for res in root.findall(f"{_XRNS}results/{_XRNS}result"):
        b = {}
        for bind in res.findall(_XRNS + "binding"):
            for child in bind:
                tag = child.tag[len(_XRNS):]
                if tag == "uri":
                    node = {"type": "uri", "value": child.text or ""}
                elif tag == "bnode":
                    node = {"type": "bnode", "value": child.text or ""}
                else:
                    node = {"type": "literal",
                            "value": "".join(child.itertext())}
                    lang = child.get(
                        "{http://www.w3.org/XML/1998/namespace}lang")
                    dt = child.get("datatype")
                    if lang:
                        node["xml:lang"] = lang
                    elif dt:
                        node["datatype"] = dt
                b[bind.get("name")] = node
        bindings.append(b)
    return {"head": {"vars": head}, "results": {"bindings": bindings}}


def fetch_bindings(url: str, sparql: str, default_graph=None,
                   user: str | None = None, passwd: str | None = None,
                   timeout: int = 60, raw_post: bool = False,
                   named_graphs=None) -> dict:
    """One SPARQL-protocol request → parsed JSON results document.

    ``raw_post=True`` uses the §2.1.3 direct-POST form (body is the bare
    query, ``Content-Type: application/sparql-query``, protocol params on
    the URL) instead of form encoding — the right choice for very large
    queries, where percent-encoding inflates the body."""
    ds = _dataset_params(default_graph, named_graphs)
    if raw_post:
        if ds:
            url += ("&" if "?" in url else "?") + urllib.parse.urlencode(ds)
        data = sparql.encode()
        ctype = "application/sparql-query; charset=UTF-8"
    else:
        data = urllib.parse.urlencode([("query", sparql)] + ds).encode()
        ctype = "application/x-www-form-urlencoded"
    req = urllib.request.Request(
        url,
        data=data,
        headers={
            # JSON preferred; XML accepted for endpoints that only
            # serve the XML results format (parsed to the same shape)
            "Accept": "application/sparql-results+json, "
                      "application/sparql-results+xml;q=0.9",
            "Content-Type": ctype,
        },
    )
    if user is not None:
        import base64

        cred = base64.b64encode(f"{user}:{passwd or ''}".encode()).decode()
        req.add_header("Authorization", f"Basic {cred}")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            rtype = (resp.headers.get("Content-Type") or "") \
                .split(";", 1)[0].strip().lower()
            if rtype in ("application/sparql-results+xml",
                         "application/xml", "text/xml"):
                return _parse_xml_results(body)
            return json.loads(body.decode())
    except urllib.error.HTTPError as e:  # friendly error (gastrodon:570-579)
        body = e.read().decode(errors="replace")[:2000]
        raise QueryExecutionError(
            f"remote endpoint returned HTTP {e.code}: {body}", sparql) from None
    except urllib.error.URLError as e:
        raise QueryExecutionError(
            f"cannot reach remote endpoint {url}: {e.reason}", sparql) from None


class RemoteEndpoint(Endpoint):
    """SPARQL-protocol endpoint client (select/update; construct emulated
    via SELECT ?s ?p ?o reassembly like the reference's _construct,
    gastrodon/__init__.py:766-775)."""

    def __init__(self, url: str, spark: SparkSession | None = None,
                 prefixes: dict[str, str] | None = None, user: str | None = None,
                 passwd: str | None = None, default_graph=None,
                 base_uri: str | None = None, named_graphs=None):
        if spark is None:
            spark = SparkSession.getActiveSession()
        self.url = url
        self.user = user
        self.passwd = passwd
        self.default_graph = default_graph
        #: protocol named-graph-uri list (beyond reference parity — the
        #: server half landed this round; §2.1.4 dataset override)
        self.named_graphs = list(named_graphs) if named_graphs else None
        # Endpoint.__init__ touches spark conf; tolerate spark=None for
        # pure-driver use (pandas only)
        self.spark = spark
        self.prefixes = dict(prefixes or {})
        self.base_uri = base_uri
        if spark is not None:
            spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    # -- driver-side select → pandas -----------------------------------

    def select(self, sparql: str, bindings: dict | None = None) -> pd.DataFrame:
        sparql = self._prepare(sparql, bindings, depth=3)
        sparql = self._inject_prefixes(sparql)
        doc = fetch_bindings(self.url, sparql, self.default_graph,
                             self.user, self.passwd,
                             named_graphs=self.named_graphs)
        variables = doc["head"]["vars"]
        cols: dict[str, list] = {v: [] for v in variables}
        for row in doc["results"]["bindings"]:
            for v in variables:
                value = _decode_json_term(row.get(v))  # missing key -> None
                if isinstance(value, IRI):
                    value = QName(self.short_name(str(value)), str(value))
                cols[v].append(value)
        pdf = pd.DataFrame(cols, columns=variables)
        for c in pdf.columns:
            pdf[c] = _normalize_column_type(pdf[c])
        return pdf

    def _inject_prefixes(self, sparql: str) -> str:
        """Prepend only prefixes that occur in the text and aren't already
        declared (gastrodon _prepend_namespaces, gastrodon/__init__.py:
        325-346)."""
        declared = {
            m.lower() for m in
            re.findall(r"(?im)^\s*prefix\s+([A-Za-z_][\w-]*):", sparql)
        }
        lines = []
        for pfx, ns in sorted(self.prefixes.items()):
            if pfx.lower() in declared:
                continue
            if re.search(rf"(?<![\w:]){re.escape(pfx)}:", sparql):
                lines.append(f"PREFIX {pfx}: <{ns}>")
        if self.base_uri and "base" not in sparql.lower():
            lines.append(f"BASE <{self.base_uri}>")
        return ("\n".join(lines) + "\n" + sparql) if lines else sparql

    # -- scale path: partitioned fetch into a Spark DataFrame ----------

    def to_spark(self, sparql: str, partitions: int = 8,
                 page_size: int = 10_000, max_pages_per_task: int = 1000) -> DataFrame:
        """Distributed fetch: each task pages through its LIMIT/OFFSET
        stripes until a short page signals the end.  All columns come back
        as strings (lexical forms) — cast downstream as needed."""
        if self.spark is None:
            raise QueryExecutionError("to_spark requires a SparkSession")
        sparql = self._inject_prefixes(sparql)
        url, dg, user, passwd = self.url, self.default_graph, self.user, self.passwd
        ds_pairs = _dataset_params(dg, self.named_graphs)

        probe = fetch_bindings(url, sparql + " LIMIT 1", dg, user, passwd,
                               named_graphs=self.named_graphs)
        variables = probe["head"]["vars"]
        if not variables:
            raise QueryExecutionError("query projects no variables", sparql)

        # The stripe fetcher must be fully self-contained (stdlib-only
        # imports INSIDE the closure): cloudpickle then serializes it by
        # value, so executors need neither sparkdon on their PYTHONPATH
        # nor --py-files.  Referencing module-level helpers here would
        # serialize by reference and fail on workers without the package.
        def fetch_stripe(batches):
            import json as _json
            import urllib.parse as _up
            import urllib.request as _ur

            import pandas as _pd

            def _fetch(q):
                params = [("query", q)] + list(ds_pairs)
                req = _ur.Request(
                    url,
                    data=_up.urlencode(params).encode(),
                    headers={
                        "Accept": "application/sparql-results+json",
                        "Content-Type": "application/x-www-form-urlencoded",
                    },
                )
                if user is not None:
                    import base64 as _b64

                    cred = _b64.b64encode(f"{user}:{passwd or ''}".encode()).decode()
                    req.add_header("Authorization", f"Basic {cred}")
                with _ur.urlopen(req, timeout=60) as resp:
                    return _json.loads(resp.read().decode())

            for pdf in batches:
                for pid in pdf["id"]:
                    page = 0
                    while page < max_pages_per_task:
                        offset = (pid + page * partitions) * page_size
                        doc = _fetch(f"{sparql} LIMIT {page_size} OFFSET {offset}")
                        rows = doc["results"]["bindings"]
                        if rows:
                            out = {
                                v: [r.get(v, {}).get("value") for r in rows]
                                for v in variables
                            }
                            yield _pd.DataFrame(out)
                        if len(rows) < page_size:
                            break
                        page += 1

        ids = self.spark.range(partitions).select("id")
        schema = ", ".join(f"`{v}` string" for v in variables)
        return ids.mapInPandas(fetch_stripe, schema)

    # -- construct / update --------------------------------------------

    def construct(self, sparql: str, bindings: dict | None = None):
        """Remote CONSTRUCT via SELECT reassembly, exactly the reference's
        ``_construct`` (gastrodon/__init__.py:766-775): issue the query
        over the protocol, read the bindings for ?s ?p ?o, and rebuild a
        local graph from them.  Returns a LocalEndpoint over the
        reassembled triples."""
        if self.spark is None:
            raise QueryExecutionError("remote construct requires a SparkSession")
        sparql = self._prepare(sparql, bindings, depth=3)
        sparql = self._inject_prefixes(sparql)
        doc = fetch_bindings(self.url, sparql, self.default_graph,
                             self.user, self.passwd,
                             named_graphs=self.named_graphs)
        variables = doc["head"]["vars"]
        missing = [v for v in ("s", "p", "o") if v not in variables]
        if missing:
            raise QueryExecutionError(
                f"remote construct needs ?s ?p ?o bindings; missing {missing}", sparql)

        from sparkdon.io import triples_df
        from sparkdon.session import LocalEndpoint
        from sparkdon.terms import KIND_BNODE, KIND_IRI, KIND_LIT, XSD

        def term_kind(node: dict) -> str:
            t = node.get("type")
            if t == "uri":
                return KIND_IRI
            if t == "bnode":
                return KIND_BNODE
            return KIND_LIT

        rows = []
        for row in doc["results"]["bindings"]:
            s, p, o = row.get("s"), row.get("p"), row.get("o")
            if s is None or p is None or o is None:
                continue  # incomplete solution constructs no triple
            o_kind = term_kind(o)
            o_dt = o.get("datatype") if o_kind == KIND_LIT else None
            o_lang = o.get("xml:lang") if o_kind == KIND_LIT else None
            if o_kind == KIND_LIT and o_dt == XSD + "string":
                o_dt = None  # simple-literal normalization (matches io._encode)
            rows.append((
                term_kind(s), s["value"], p["value"],
                o_kind, o["value"], o_dt, o_lang,
            ))
        return LocalEndpoint(self.spark, triples_df(self.spark, rows),
                             prefixes=dict(self.prefixes),
                             base_uri=self.base_uri)

    # -- peel / decollect (reference parity, round 10) ------------------

    @staticmethod
    def _json_triple_row(s: dict, p: dict, o: dict):
        """Three SPARQL-JSON terms → one flat triple-table row."""
        from sparkdon.terms import KIND_BNODE, KIND_IRI, KIND_LIT, XSD

        def kind(node: dict) -> str:
            t = node.get("type")
            if t == "uri":
                return KIND_IRI
            if t == "bnode":
                return KIND_BNODE
            return KIND_LIT

        o_kind = kind(o)
        o_dt = o.get("datatype") if o_kind == KIND_LIT else None
        o_lang = o.get("xml:lang") if o_kind == KIND_LIT else None
        if o_kind == KIND_LIT and o_dt == XSD + "string":
            o_dt = None  # simple-literal normalization (matches io._encode)
        return (kind(s), s["value"], p["value"], o_kind, o["value"], o_dt, o_lang)

    def peel(self, node, strategy: str = "path", max_depth: int = 100):
        """Copy the subgraph about ``node`` from the remote store —
        every fact at the node, recursing through blank-node objects —
        and rebind exactly the prefixes the copied graph uses (reference
        ``RemoteEndpoint.peel``/``_peel``, gastrodon/__init__.py:688-743).
        Returns a LocalEndpoint over the copied triples.

        Two traversal strategies, because stores disagree on how (or
        whether) a query can NAME a blank node:

        - ``"path"`` (default, pure SPARQL 1.1): level k fetches the
          triples of bnodes exactly k bnode-hops from the root with one
          chained-pattern query (``<n> ?p0 ?b1 . FILTER(isBlank(?b1)) .
          ?b1 ?p1 ?b2 ...``).  Remote round trips = closure DEPTH, not
          bnode count — strictly fewer requests than the reference's
          per-bnode queue — and it needs no store-specific bnode
          addressing, so it works against any compliant endpoint
          (including :mod:`sparkdon.protocol`'s own server).
        - ``"virtuoso"``: the reference's store-specific walk — one
          query per discovered bnode, referenced through
          :meth:`_bnode_to_sparql`'s ``<nodeID://...>`` IRI quirk
          (gastrodon/__init__.py:736-743 documents why the portable
          alternatives fail or crawl on Virtuoso).
        """
        from sparkdon.io import triples_df
        from sparkdon.session import LocalEndpoint
        from sparkdon.terms import KIND_BNODE
        from sparkdon.uris import ns_part

        if self.spark is None:
            raise QueryExecutionError("remote peel requires a SparkSession")
        node = self._resolve_node(node)
        rows: set[tuple] = set()

        def fetch(sparql: str) -> list[dict]:
            doc = fetch_bindings(self.url, sparql, self.default_graph,
                                 self.user, self.passwd,
                                 named_graphs=self.named_graphs)
            return doc["results"]["bindings"]

        if strategy == "virtuoso":
            root = f"<{node}>" if not isinstance(node, BNode) \
                else self._bnode_to_sparql(node)
            seen_b: set[str] = set()
            queue = [root]
            for _ in range(max_depth * 1000):
                if not queue:
                    break
                ref = queue.pop(0)
                for b in fetch(
                        f"SELECT (?that AS ?s) ?p ?o {{ VALUES ?that {{ {ref} }} "
                        "?that ?p ?o }"):
                    row = self._json_triple_row(b["s"], b["p"], b["o"])
                    rows.add(row)
                    if row[3] == KIND_BNODE and row[4] not in seen_b:
                        seen_b.add(row[4])
                        queue.append(self._bnode_to_sparql(BNode(row[4])))
            if queue:  # budget exhausted mid-walk: never return a
                raise QueryExecutionError(  # silently truncated subgraph
                    f"peel walk exceeded {max_depth * 1000} bnode fetches "
                    f"({len(queue)} still queued); raise max_depth")
        elif strategy == "path":
            if isinstance(node, BNode):
                raise QueryExecutionError(
                    "portable SPARQL cannot name a blank node; peel a "
                    "bnode root with strategy='virtuoso' (store-specific "
                    "bnode addressing)")
            root = f"<{node}>"
            for depth in range(max_depth):
                if depth == 0:
                    q = f"SELECT DISTINCT (?that AS ?s) ?p ?o {{ VALUES ?that {{ {root} }} ?that ?p ?o }}"
                else:
                    hops, prev = [], "?b0"
                    for i in range(1, depth + 1):
                        cur = "?s" if i == depth else f"?b{i}"
                        hops.append(f"{prev} ?q{i} {cur} . FILTER(isBlank({cur}))")
                        prev = cur
                    q = ("SELECT DISTINCT ?s ?p ?o { "
                         f"VALUES ?b0 {{ {root} }} " + " ".join(hops) +
                         " ?s ?p ?o }")
                level = {self._json_triple_row(b["s"], b["p"], b["o"])
                         for b in fetch(q)}
                if not level - rows:  # nothing new: done (cycle-safe)
                    if depth > 0:
                        break
                rows |= level
                if not any(r[3] == KIND_BNODE for r in level):
                    break  # no bnode objects at this level -> no deeper level
        else:
            raise QueryExecutionError(f"unknown peel strategy {strategy!r}")

        # rebind only the namespaces the peeled graph actually uses
        # (reference peel, gastrodon/__init__.py:695-700)
        used_ns = set()
        for r in rows:
            for u in ((r[1],) if r[0] == "iri" else ()) + (r[2],) + (
                    (r[4],) if r[3] == "iri" else ()):
                if u.startswith("http") or u.startswith("urn:"):
                    used_ns.add(ns_part(u))
        pfx = {p: ns for p, ns in self.prefixes.items() if ns in used_ns}
        # sort key maps None dt/lang slots to "" — plain tuple sorting
        # would raise TypeError comparing None against a str when the
        # same lexical form appears both plain and typed/lang-tagged
        ordered = sorted(rows, key=lambda r: tuple(v or "" for v in r))
        return LocalEndpoint(self.spark, triples_df(self.spark, ordered),
                             prefixes=pfx, base_uri=self.base_uri)

    def decollect(self, node):
        """RDF container held in the REMOTE store → Python value, same
        contract as the local ``decollect`` (reference ``decollect`` is
        an Endpoint-level method, gastrodon/__init__.py:403-463: Seq/Alt
        → list ordered by the numeric ``rdf:_N`` index, Bag →
        collections.Counter, Alt falls through to Seq handling).  One
        protocol round trip fetches the node's facts."""
        import collections

        from sparkdon.terms import RDF
        from sparkdon.session import QName as _QName

        node = self._resolve_node(node)
        ref = self._bnode_to_sparql(node) if isinstance(node, BNode) \
            else f"<{node}>"
        doc = fetch_bindings(
            self.url, f"SELECT ?p ?o {{ {ref} ?p ?o }}",
            self.default_graph, self.user, self.passwd,
            named_graphs=self.named_graphs)
        types: set[str] = set()
        members: list[tuple[int, Any]] = []
        for b in doc["results"]["bindings"]:
            p = b["p"]["value"]
            if p == RDF + "type" and b["o"].get("type") == "uri":
                types.add(b["o"]["value"])
            elif p.startswith(RDF + "_"):
                try:
                    idx = int(p[len(RDF) + 1:])
                except ValueError:
                    continue
                value = _decode_json_term(b["o"])
                if isinstance(value, IRI):
                    value = _QName(self.short_name(str(value)), str(value))
                members.append((idx, value))
        if RDF + "Bag" in types:
            return collections.Counter(v for _, v in members)
        return [v for _, v in sorted(members, key=lambda t: t[0])]

    def _bnode_to_sparql(self, bnode) -> str:
        """Virtuoso quirk: a blank node substituted into a remote
        query/update round-trips as an IRI of its returned label (e.g.
        ``<nodeID://b10023>``) — writing ``_:label`` would mint a FRESH
        blank node server-side instead of referencing the stored one
        (reference ``RemoteEndpoint._bnode_to_sparql``,
        gastrodon/__init__.py:667-668)."""
        return f"<{str(bnode)}>"

    def update(self, sparql: str, bindings: dict | None = None) -> None:
        sparql = self._prepare(sparql, bindings, depth=3)
        sparql = self._inject_prefixes(sparql)
        data = urllib.parse.urlencode({"update": sparql}).encode()
        req = urllib.request.Request(
            self.url, data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        try:
            urllib.request.urlopen(req, timeout=60).read()
        except urllib.error.HTTPError as e:
            raise QueryExecutionError(
                f"remote update failed: HTTP {e.code}", sparql) from None
