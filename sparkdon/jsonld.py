"""JSON-LD 1.0 reader (expansion subset) — stdlib ``json`` only.

The reference delegates parsing to rdflib, which loads JSON-LD through
its plugin serializers, so a gastrodon user's JSON-LD data should load
here too (reference parity at the format level: gastrodon
``__init__.py`` parses whatever ``Graph().parse`` accepts).  This is a
documented SUBSET of the public W3C JSON-LD 1.0 algorithms — the
shapes data files actually use:

- local ``@context``: term → IRI, term → {``@id``, ``@type`` (``@id``
  or a datatype), ``@container`` (``@list``/``@set``)}, compact-IRI
  prefixes, ``@vocab``, ``@base``, ``@language``; an array of contexts
  merges left-to-right.
- node objects: ``@id`` (absolute / compact / relative / ``_:`` bnode),
  ``@type``, nested node objects (fresh bnodes), arrays, ``@graph``.
- values: plain strings (+ context language), numbers (integer →
  ``xsd:integer``, otherwise ``xsd:double``), booleans, ``@value``
  objects with ``@type``/``@language``, ``{"@id": …}`` references,
  ``@list`` arrays → ``rdf:first``/``rdf:rest`` chains.

``@reverse`` is supported both as a node-object keyword and as a
context term definition (``{"@reverse": "prop"}``), including the
flip-back-to-forward case of a reverse term used inside ``@reverse``
(r11).  Honest boundaries (raise ``NotImplementedError``): remote
``@context`` URLs (no network at parse time) and 1.1-only keywords.
Named graphs inside ``@graph`` nodes flatten into the default graph —
same behavior as the reference's default rdflib ``Graph``.

Scale shape: :func:`read_jsonld` mirrors ``read_rdfxml`` — a JSON
document is not line-splittable, so the FILE is the parallel unit
(``binaryFile`` scan → Arrow-batched per-file parse, narrow), with
per-file bnode prefixes so labels can never collide across files.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from sparkdon.io import _encode_triple
from sparkdon.terms import (KIND_BNODE, RDF, TRIPLE_SCHEMA, XSD, BNode,
                            IRI, Literal)
from sparkdon.uris import _ABSOLUTE

_KEYWORDS = {"@id", "@type", "@value", "@language", "@list", "@set",
             "@graph", "@context", "@index", "@reverse"}

RDF_FIRST = IRI(RDF + "first")
RDF_REST = IRI(RDF + "rest")
RDF_NIL = IRI(RDF + "nil")
RDF_TYPE = IRI(RDF + "type")


class _Ctx:
    def __init__(self, base: str | None):
        self.terms: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base = base
        self.language: str | None = None
        self.triples: list[tuple] = []
        #: single shared counter box: every context derived from this
        #: one allocates from the SAME sequence, so distinct anonymous
        #: nodes can never collide across nested/sibling contexts
        self._bn_box = [0]

    def bnode(self) -> BNode:
        self._bn_box[0] += 1
        return BNode(f"jb{self._bn_box[0]}")

    def child(self) -> "_Ctx":
        c = _Ctx(self.base)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.language = self.language
        c.triples = self.triples  # shared sink
        c._bn_box = self._bn_box  # shared counter
        return c

    # -- context processing ------------------------------------------------

    def push_context(self, ctx) -> "_Ctx":
        if ctx is None:
            return self
        out = self.child()
        for one in (ctx if isinstance(ctx, list) else [ctx]):
            if one is None:
                out.terms, out.vocab, out.language = {}, None, None
                continue
            if isinstance(one, str):
                raise NotImplementedError(
                    "remote @context URLs are not fetched at parse time")
            if not isinstance(one, dict):
                raise ValueError(f"bad @context entry {one!r}")
            if "@vocab" in one:
                out.vocab = one["@vocab"]
            if "@base" in one:
                out.base = one["@base"]
            if "@language" in one:
                out.language = one["@language"]
            for term, defn in one.items():
                if term.startswith("@"):
                    continue
                if isinstance(defn, str):
                    out.terms[term] = {"@id": defn}
                elif isinstance(defn, dict):
                    if "@reverse" in defn:
                        # reverse term: same @id machinery, flipped
                        # subject/object at emit time
                        rd = dict(defn)
                        rd["@id"] = rd.pop("@reverse")
                        rd["@reverse_term"] = True
                        out.terms[term] = rd
                    else:
                        out.terms[term] = defn
                else:
                    raise ValueError(f"bad term definition {term!r}")
        return out

    # -- IRI expansion -----------------------------------------------------

    def expand_iri(self, value: str, vocab: bool = False,
                   _seen: frozenset = frozenset()):
        """Expand a string in IRI position: keyword, bnode, term,
        compact IRI (prefixes expanded recursively, cycle-guarded),
        absolute, then @vocab (property position) or @base (reference
        position).  Keyword ALIASES ("type": "@type") return the
        keyword string for the caller to handle."""
        if value.startswith("@"):
            return value
        if value.startswith("_:"):
            return BNode("u." + value[2:])
        if value in self.terms and value not in _seen:
            mapped = self.terms[value].get("@id", value)
            if mapped.startswith("@"):
                return mapped  # keyword alias
            if mapped != value:
                expanded = self.expand_iri(mapped, vocab,
                                           _seen | {value})
                if isinstance(expanded, (IRI, BNode)):
                    return expanded
        pfx, sep, local = value.partition(":")
        if sep:
            if pfx in self.terms and pfx not in _seen \
                    and not local.startswith("//"):
                ns = self.expand_iri(self.terms[pfx].get("@id", ""),
                                     True, _seen | {pfx})
                return IRI(str(ns) + local)
            if _ABSOLUTE.match(value) or pfx in ("urn", "mailto", "tag"):
                return IRI(value)
        if vocab and self.vocab is not None:
            return IRI(self.vocab + value)
        if not vocab and self.base is not None:
            from urllib.parse import urljoin

            return IRI(urljoin(self.base, value))
        return IRI(value)


def _scalar_literal(ctx: _Ctx, v) -> Literal:
    if isinstance(v, bool):
        return Literal("true" if v else "false", XSD + "boolean")
    if isinstance(v, int):
        return Literal(str(v), XSD + "integer")
    if isinstance(v, float):
        import math

        if math.isinf(v):
            return Literal("INF" if v > 0 else "-INF", XSD + "double")
        if math.isnan(v):
            return Literal("NaN", XSD + "double")
        # canonical xsd:double lexical form (JSON-LD 1.0 §data-round-
        # tripping): minimal mantissa with a '.', exponent without
        # leading zeros — 2.5 → "2.5E0"
        m, _, e = f"{v:.15E}".partition("E")
        m = m.rstrip("0")
        if m.endswith("."):
            m += "0"
        return Literal(f"{m}E{int(e)}", XSD + "double")
    if ctx.language is not None:
        return Literal(str(v), None, ctx.language)
    # simple literal: the engine's convention is datatype None
    # (RDF 1.1 collapses it with xsd:string; the Turtle parser agrees)
    return Literal(str(v), None)


def _value_object(ctx: _Ctx, obj: dict):
    v = obj["@value"]
    dt = obj.get("@type")
    lang = obj.get("@language")
    if dt is not None:
        return Literal(_lex_of(v), str(ctx.expand_iri(dt, vocab=True)))
    if lang is not None:
        return Literal(_lex_of(v), None, lang)
    if isinstance(v, (bool, int, float)):
        return _scalar_literal(ctx, v)
    return Literal(str(v), None)


def _lex_of(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _list_node(ctx: _Ctx, items: list, term_def: dict):
    """Build an rdf:List chain, returning its head term."""
    if not items:
        return RDF_NIL
    head = ctx.bnode()
    node = head
    for i, item in enumerate(items):
        obj = _object_term(ctx, item, term_def)
        ctx.triples.append((node, RDF_FIRST, obj))
        nxt = ctx.bnode() if i + 1 < len(items) else RDF_NIL
        ctx.triples.append((node, RDF_REST, nxt))
        node = nxt
    return head


def _object_term(ctx: _Ctx, v, term_def: dict):
    """One value in object position → an RDF term (emitting any nested
    triples into the shared sink)."""
    if isinstance(v, dict):
        if "@value" in v:
            return _value_object(ctx, v)
        if "@list" in v:
            return _list_node(ctx, v["@list"], term_def)
        if set(v) == {"@id"}:
            return ctx.expand_iri(v["@id"])
        return _node_object(ctx, v)  # nested node
    if isinstance(v, (bool, int, float)):
        return _scalar_literal(ctx, v)
    # string: coerced by the term definition
    if term_def.get("@type") == "@id":
        return ctx.expand_iri(v)
    if "@type" in term_def:
        return Literal(str(v),
                       str(ctx.expand_iri(term_def["@type"], vocab=True)))
    if "@language" in term_def:
        lang = term_def["@language"]
        return Literal(str(v), None, lang) if lang \
            else Literal(str(v), None)
    return _scalar_literal(ctx, v)


def _reverse_subject_term(ctx: _Ctx, v):
    """A value in reverse position becomes the emitted triple's SUBJECT,
    so it must denote a node: a node object, an {"@id": …} reference, or
    an IRI string (JSON-LD 1.0 §6.12 — value objects are invalid
    here)."""
    if isinstance(v, dict):
        if "@value" in v or "@list" in v:
            raise ValueError("@reverse value must be a node object")
        t = ctx.expand_iri(v["@id"]) if set(v) == {"@id"} \
            else _node_object(ctx, v)
    elif isinstance(v, str):
        t = ctx.expand_iri(v)
    else:
        raise ValueError("@reverse value must be a node object or IRI")
    return t if isinstance(t, (IRI, BNode)) else IRI(str(t))


def _emit_reverse(ctx: _Ctx, subj, rmap) -> None:
    """Emit the triples of a ``@reverse`` map (literal keyword or a
    context alias of it): each value node points back at ``subj`` —
    unless the key is itself a reverse TERM, which flips back to a
    forward edge."""
    if not isinstance(rmap, dict):
        raise ValueError("@reverse must map properties to node values")
    for rkey, rval in rmap.items():
        pred = ctx.expand_iri(rkey, vocab=True)
        if isinstance(pred, str) and pred.startswith("@"):
            continue
        if ":" not in str(pred):
            continue
        if not isinstance(pred, IRI):
            pred = IRI(str(pred))
        flip = ctx.terms.get(rkey, {}).get("@reverse_term", False)
        for v in _as_list(rval):
            t = _reverse_subject_term(ctx, v)
            ctx.triples.append((subj, pred, t) if flip
                               else (t, pred, subj))


def _node_object(ctx: _Ctx, node: dict):
    """Emit a node object's triples; return its subject term."""
    ctx = ctx.push_context(node.get("@context"))
    # keyword aliases ("id": "@id", "type": "@type") are valid 1.0 and
    # ubiquitous in schema.org-style data — resolve key meanings first
    aliased_id = None
    handled: set[str] = set()
    for key in node:
        if key in _KEYWORDS:
            continue
        if ctx.terms.get(key, {}).get("@id") == "@id":
            aliased_id = node[key]
            handled.add(key)
    if "@id" in node:
        subj = ctx.expand_iri(node["@id"])
    elif aliased_id is not None:
        subj = ctx.expand_iri(aliased_id)
    else:
        subj = ctx.bnode()
    if isinstance(subj, str) and not isinstance(subj, (IRI, BNode)):
        subj = IRI(subj)
    for t in _as_list(node.get("@type")):
        ctx.triples.append((subj, RDF_TYPE, ctx.expand_iri(t, vocab=True)))
    if "@reverse" in node:
        _emit_reverse(ctx, subj, node["@reverse"])
    for key, value in node.items():
        if key in _KEYWORDS or key in handled:
            continue
        term_def = ctx.terms.get(key, {})
        pred = ctx.expand_iri(key, vocab=True)
        if pred == "@type":  # aliased @type
            for t in _as_list(value):
                ctx.triples.append(
                    (subj, RDF_TYPE, ctx.expand_iri(t, vocab=True)))
            continue
        if pred == "@reverse":  # aliased @reverse
            _emit_reverse(ctx, subj, value)
            continue
        if isinstance(pred, str) and pred.startswith("@"):
            continue  # other aliased keywords carry no triples here
        if ":" not in str(pred):
            continue  # expands to a relative IRI: dropped (JSON-LD 1.0
            # drops keys that do not expand to an absolute IRI)
        if not isinstance(pred, IRI):
            pred = IRI(str(pred))
        values = []
        for v in _as_list(value):
            # inline {"@set": [...]} is transparent (spec: @set
            # disappears on expansion)
            if isinstance(v, dict) and "@set" in v:
                values.extend(_as_list(v["@set"]))
            else:
                values.append(v)
        if term_def.get("@reverse_term"):
            # context-defined reverse property: each value node points
            # BACK at this subject
            for v in values:
                ctx.triples.append(
                    (_reverse_subject_term(ctx, v), pred, subj))
            continue
        if term_def.get("@container") == "@list" \
                and not (len(values) == 1 and isinstance(values[0], dict)
                         and "@list" in values[0]):
            ctx.triples.append(
                (subj, pred, _list_node(ctx, values, term_def)))
            continue
        for v in values:
            ctx.triples.append((subj, pred, _object_term(ctx, v, term_def)))
    # nested @graph (named or not) flattens into the default graph
    for g in _as_list(node.get("@graph")):
        _node_object(ctx, g)
    return subj


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def parse_jsonld(document, base: str | None = None) -> list[tuple]:
    """JSON-LD text (or an already-loaded object) → TRIPLE_SCHEMA rows."""
    if isinstance(document, (str, bytes)):
        document = json.loads(document)
    ctx = _Ctx(base)
    top = _as_list(document)
    for item in top:
        if not isinstance(item, dict):
            raise ValueError("top-level JSON-LD items must be objects")
        local = ctx.push_context(item.get("@context"))
        if "@graph" in item and "@id" not in item:
            for node in _as_list(item["@graph"]):
                _node_object(local, node)
            # keys other than @graph/@context on a graph wrapper are
            # rare; handle them as a node too if present
            if set(item) - {"@context", "@graph"}:
                _node_object(local, {k: v for k, v in item.items()
                                     if k != "@graph"})
        else:
            _node_object(local, item)
    return [_encode_triple(s, p, o) for s, p, o in ctx.triples]


def to_jsonld(rows, indent: int | None = None) -> str:
    """TRIPLE_SCHEMA rows → expanded-form JSON-LD text (one node object
    per subject, full IRIs, ``@value`` objects — the form every JSON-LD
    processor accepts without a context).  The writer twin of
    :func:`parse_jsonld`; round-trips through it modulo bnode labels."""
    nodes: dict[tuple, dict] = {}
    for s_kind, s, p, o_kind, o, dt, lang in rows:
        key = (s_kind, s)
        node = nodes.setdefault(
            key, {"@id": ("_:" + s) if s_kind == KIND_BNODE else s})
        if p == str(RDF_TYPE) and o_kind == "iri":
            node.setdefault("@type", []).append(o)
            continue
        if o_kind == "iri":
            val: dict = {"@id": o}
        elif o_kind == KIND_BNODE:
            val = {"@id": "_:" + o}
        elif lang is not None:
            val = {"@value": o, "@language": lang}
        elif dt is not None:
            val = {"@value": o, "@type": dt}
        else:
            val = {"@value": o}
        node.setdefault(p, []).append(val)
    return json.dumps(list(nodes.values()), indent=indent,
                      sort_keys=True)


def read_jsonld(spark: SparkSession, path: str,
                base: str | None = None) -> DataFrame:
    """Distributed JSON-LD scan: one parse task per file (JSON is not
    line-splittable), per-file bnode prefixes, narrow Arrow stage —
    the same shape as :func:`sparkdon.rdfxml.read_rdfxml`."""
    import hashlib

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fp, content in zip(pdf["path"], pdf["content"]):
                if not len(content):
                    continue
                tag = hashlib.md5(fp.encode()).hexdigest()[:8]
                for r in parse_jsonld(bytes(content), base):
                    r = list(r)
                    if r[0] == KIND_BNODE:
                        r[1] = f"{tag}.{r[1]}"
                    if r[3] == KIND_BNODE:
                        r[4] = f"{tag}.{r[4]}"
                    rows.append(r)
            yield pd.DataFrame(
                rows, columns=[f.name for f in TRIPLE_SCHEMA.fields])

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")
    return files.mapInPandas(gen, TRIPLE_SCHEMA).dropDuplicates()
