"""Serve a sparkdon endpoint over the SPARQL 1.1 protocol (HTTP).

The reference is a pure endpoint *client* (gastrodon/__init__.py:553-612
speaks the protocol to remote stores); this module adds the server side:
any :class:`~sparkdon.session.Endpoint` — in particular a
:class:`~sparkdon.session.LocalEndpoint` holding a Spark-resident graph —
can be published as a SPARQL endpoint.  That closes the federation loop:
another sparkdon session (or any SPARQL 1.1 client) can point a
``SERVICE <url> { ... }`` clause or a :class:`~sparkdon.remote.RemoteEndpoint`
at it.

Protocol subset: query-via-POST (``application/x-www-form-urlencoded``,
``query=`` parameter) and update-via-POST (``update=`` parameter),
results as ``application/sparql-results+json``.  SELECT answers with a
bindings document, ASK with a boolean document.  This is the slice the
in-repo clients (remote.py, sources/sparql_source.py, SERVICE) speak.

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
                length = int(self.headers.get("Content-Length", 0))
                params = urllib.parse.parse_qs(self.rfile.read(length).decode())
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

    def _handle(self, h: BaseHTTPRequestHandler, params: dict,
                method: str = "POST") -> None:
        try:
            if "update" in params:
                if method != "POST":
                    # SPARQL 1.1 protocol §2.2: update only via POST; a
                    # state-mutating GET is also a CSRF/crawler hazard
                    body = b"update is only accepted via POST"
                    h.send_response(405)
                    h.send_header("Allow", "POST")
                    h.send_header("Content-Type", "text/plain; charset=utf-8")
                    h.send_header("Content-Length", str(len(body)))
                    h.end_headers()
                    h.wfile.write(body)
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
            if form == "ASK":
                doc: dict = {"head": {}, "boolean": bool(self.endpoint.ask(sparql))}
            elif form == "SELECT":
                doc = self._select_document(sparql)
            else:
                raise ValueError(
                    f"unsupported query form {form or 'EMPTY'!r}; this "
                    "endpoint serves SELECT / ASK / update")
        except Exception as e:  # protocol: malformed/failed → 4xx + text
            body = str(e).encode()
            h.send_response(400)
            h.send_header("Content-Type", "text/plain; charset=utf-8")
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)
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
