"""Serve a sparkdon endpoint over the SPARQL 1.1 protocol (HTTP).

The reference is a pure endpoint *client* (gastrodon/__init__.py:553-612
speaks the protocol to remote stores); this module adds the server side:
any :class:`~sparkdon.session.Endpoint` — in particular a
:class:`~sparkdon.session.LocalEndpoint` holding a Spark-resident graph —
can be published as a SPARQL endpoint.  That closes the federation loop:
another sparkdon session (or any SPARQL 1.1 client) can point a
``SERVICE <url> { ... }`` clause or a :class:`~sparkdon.remote.RemoteEndpoint`
at it.

Protocol coverage (SPARQL 1.1 Protocol §2.1/§2.2): query via GET
(``?query=``), query via URL-encoded POST (``query=`` parameter), query
via direct POST (``application/sparql-query`` body), update via
URL-encoded POST (``update=`` parameter), and update via direct POST
(``application/sparql-update`` body).  Results are
``application/sparql-results+json`` (the only serialization produced —
an ``Accept`` header that excludes it is answered 406; an unsupported
POST body type is answered 415).  SELECT answers with a bindings
document, ASK with a boolean document.

The handler evaluates queries on the Spark driver; requests are served
from daemon threads of a ``ThreadingHTTPServer`` — Spark sessions are
thread-safe for concurrent job submission, so parallel SERVICE fetches
against one server are fine.
"""

from __future__ import annotations

import json
import re
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from sparkdon.terms import KIND_BNODE, KIND_IRI

_FORM_RE = re.compile(
    r"\b(SELECT|ASK|CONSTRUCT|DESCRIBE|INSERT|DELETE|WITH|CLEAR|DROP)\b",
    re.IGNORECASE,
)

#: prologue declarations stripped before form detection — a PREFIX label
#: or IRI may embed a form keyword (``PREFIX d: <urn:ns/delete#>``) and
#: must not win the match
_PROLOGUE_RE = re.compile(
    r"^\s*(?:#[^\n]*\n\s*"                       # comment lines
    r"|PREFIX\s+[^<\s]*\s*<[^>]*>\s*"            # PREFIX label: <iri>
    r"|BASE\s*<[^>]*>\s*)*",
    re.IGNORECASE,
)


def _query_form(sparql: str) -> str:
    """First query-form keyword after the prologue.  PREFIX/BASE
    declarations (and comments) are stripped first so that labels or
    IRIs containing a form keyword cannot misroute the query."""
    m = _FORM_RE.search(sparql[_PROLOGUE_RE.match(sparql).end():])
    return m.group(1).upper() if m else ""


def _struct_to_json(v) -> dict | None:
    """Term-struct (Row or dict) → SPARQL-JSON results term node."""
    if v is None:
        return None
    kind, lex, dt, lang = v["kind"], v["lex"], v["dt"], v["lang"]
    if kind == KIND_IRI:
        return {"type": "uri", "value": lex}
    if kind == KIND_BNODE:
        return {"type": "bnode", "value": lex}
    node: dict = {"type": "literal", "value": lex}
    if lang:
        node["xml:lang"] = lang
    elif dt:
        node["datatype"] = dt
    return node


class SparqlProtocolServer:
    """Publish an Endpoint at ``http://host:port/sparql``.

    >>> srv = SparqlProtocolServer(local_endpoint).start()   # doctest: +SKIP
    >>> other.select(f'SELECT * {{ SERVICE <{srv.url}> {{ ?s ?p ?o }} }}')
    """

    def __init__(self, endpoint, host: str = "127.0.0.1", port: int = 0):
        self.endpoint = endpoint
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_POST(self):
                # a malformed request (bad Content-Length, non-UTF-8
                # body) must answer 400, not kill the handler thread
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(length).decode()
                except (ValueError, UnicodeDecodeError) as exc:
                    outer._plain(self, 400, f"malformed request: {exc}")
                    return
                # media type without parameters (";charset=...")
                ctype = (self.headers.get("Content-Type") or
                         "application/x-www-form-urlencoded")
                ctype = ctype.split(";", 1)[0].strip().lower()
                if ctype == "application/sparql-query":
                    # §2.1.3 query via direct POST: the body IS the query;
                    # protocol params (default-graph-uri...) ride the URL
                    # query string, so merge them in
                    params = urllib.parse.parse_qs(
                        urllib.parse.urlparse(self.path).query)
                    params["query"] = [body]
                elif ctype == "application/sparql-update":
                    # §2.2.2 update via direct POST (URL params merged as
                    # for direct-POST query)
                    params = urllib.parse.parse_qs(
                        urllib.parse.urlparse(self.path).query)
                    params["update"] = [body]
                elif ctype == "application/x-www-form-urlencoded":
                    params = urllib.parse.parse_qs(body)
                else:
                    outer._plain(self, 415,
                                 f"unsupported Content-Type {ctype!r}; use "
                                 "application/x-www-form-urlencoded, "
                                 "application/sparql-query, or "
                                 "application/sparql-update")
                    return
                outer._handle(self, params, method="POST")

            def do_GET(self):
                _, _, qs = self.path.partition("?")
                outer._handle(self, urllib.parse.parse_qs(qs), method="GET")

            def log_message(self, *args):  # quiet
                pass

        self.server = ThreadingHTTPServer((host, port), Handler)
        self.server.daemon_threads = True
        self.queries: list[str] = []
        self._thread: threading.Thread | None = None

    # -- lifecycle ------------------------------------------------------

    @property
    def url(self) -> str:
        host, port = self.server.server_address[:2]
        return f"http://{host}:{port}/sparql"

    def start(self) -> "SparqlProtocolServer":
        self._thread = threading.Thread(
            target=self.server.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()

    def __enter__(self) -> "SparqlProtocolServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- request handling ----------------------------------------------

    @staticmethod
    def _plain(h: BaseHTTPRequestHandler, code: int, text: str,
               allow: str | None = None) -> None:
        body = text.encode()
        h.send_response(code)
        if allow:
            h.send_header("Allow", allow)
        h.send_header("Content-Type", "text/plain; charset=utf-8")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)

    @staticmethod
    def _accepts(h: BaseHTTPRequestHandler, offered: tuple) -> bool:
        """Minimal content negotiation: we produce exactly one
        serialization per result kind; honor an Accept header that can
        take it (or that wildcards), reject one that explicitly cannot."""
        accept = h.headers.get("Accept")
        if not accept:
            return True
        for part in accept.split(","):
            mt = part.split(";", 1)[0].strip().lower()
            if mt in offered or mt == "*/*":
                return True
        return False

    #: acceptable Accept media types per result kind
    _JSON_TYPES = ("application/sparql-results+json", "application/json",
                   "application/*")
    _NT_TYPES = ("application/n-triples", "text/plain", "text/*",
                 "application/*")

    def _handle(self, h: BaseHTTPRequestHandler, params: dict,
                method: str = "POST") -> None:
        try:
            if "update" in params:
                if method != "POST":
                    # SPARQL 1.1 protocol §2.2: update only via POST; a
                    # state-mutating GET is also a CSRF/crawler hazard
                    self._plain(h, 405, "update is only accepted via POST",
                                allow="POST")
                    return
                sparql = params["update"][0]
                self.queries.append(sparql)
                self.endpoint.update(sparql)
                h.send_response(204)
                h.end_headers()
                return
            sparql = params.get("query", [""])[0]
            self.queries.append(sparql)
            form = _query_form(sparql)
            if form in ("CONSTRUCT", "DESCRIBE"):
                # graph results serialize as N-Triples
                from sparkdon.io import nt_string

                if not self._accepts(h, self._NT_TYPES):
                    self._plain(h, 406, "graph results are produced as "
                                        "application/n-triples")
                    return
                result = (self.endpoint.construct(sparql)
                          if form == "CONSTRUCT"
                          else self.endpoint.describe(sparql))
                body = nt_string(result.graph).encode()
                h.send_response(200)
                h.send_header("Content-Type", "application/n-triples")
                h.send_header("Content-Length", str(len(body)))
                h.end_headers()
                h.wfile.write(body)
                return
            if not self._accepts(h, self._JSON_TYPES):
                self._plain(h, 406, "only application/sparql-results+json "
                                    "is produced")
                return
            if form == "ASK":
                doc: dict = {"head": {}, "boolean": bool(self.endpoint.ask(sparql))}
            elif form == "SELECT":
                doc = self._select_document(sparql)
            else:
                raise ValueError(
                    f"unsupported query form {form or 'EMPTY'!r}; this "
                    "endpoint serves SELECT / ASK / CONSTRUCT / DESCRIBE "
                    "/ update")
        except Exception as e:  # protocol: malformed/failed → 4xx + text
            self._plain(h, 400, str(e))
            return
        body = json.dumps(doc).encode()
        h.send_response(200)
        h.send_header("Content-Type", "application/sparql-results+json")
        h.send_header("Content-Length", str(len(body)))
        h.end_headers()
        h.wfile.write(body)

    def _select_document(self, sparql: str) -> dict:
        pdf = self.endpoint.select_raw(sparql).toPandas()
        names = [c[2:] for c in pdf.columns if c.startswith("v_")]
        bindings = []
        for _, row in pdf.iterrows():
            b = {}
            for n in names:
                node = _struct_to_json(row["v_" + n])
                if node is not None:
                    b[n] = node
            bindings.append(b)
        return {"head": {"vars": names}, "results": {"bindings": bindings}}
