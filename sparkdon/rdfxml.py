"""RDF/XML reader (W3C RDF 1.1 XML Syntax) — the default rdflib parse
format, so the most common serialization a reference user feeds
``Graph().parse(...)`` (gastrodon delegates parsing wholesale to rdflib;
see gastrodon/__init__.py:848-857 for the inline path).

Implemented from the public spec with stdlib ``xml.etree`` only:

- node elements: ``rdf:Description`` and typed nodes (element name →
  ``rdf:type``), ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` / anonymous
- property elements: ``rdf:resource`` / ``rdf:nodeID`` objects, text
  literals with ``rdf:datatype`` or inherited ``xml:lang``, nested node
  elements, property attributes (on node and empty property elements)
- ``rdf:parseType`` Resource | Literal (→ ``rdf:XMLLiteral``) |
  Collection (→ ``rdf:first``/``rdf:rest`` chain)
- ``rdf:li`` → ``rdf:_1``, ``rdf:_2``, … (per-node-element counter)
- ``xml:base`` scoping and ``xml:lang`` inheritance
- reification: ``rdf:ID`` on a property element emits the four
  ``rdf:Statement`` triples

Scale shape: RDF/XML is not line-splittable, so the distributed unit is
the FILE — :func:`read_rdfxml` scans with ``binaryFile`` and parses each
file inside an Arrow-batched ``mapInPandas`` stage (one task per file
split; a 1000-file dump parses 1000-way parallel).  Inline strings parse
on the driver like the Turtle path.
"""

from __future__ import annotations

import itertools
import xml.etree.ElementTree as ET
from urllib.parse import urljoin

from pyspark.sql import DataFrame, SparkSession

from sparkdon.errors import SparkdonError
from sparkdon.io import _encode_triple
from sparkdon.terms import KIND_BNODE, RDF, TRIPLE_SCHEMA, BNode, IRI, Literal

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_XML_NS = "http://www.w3.org/XML/1998/namespace"

#: rdf:* attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {
    _RDF_NS + a for a in (
        "about", "ID", "nodeID", "resource", "datatype", "parseType",
        "aboutEach", "aboutEachPrefix", "bagID", "li", "RDF", "Description")
}

#: node-element names that are forbidden (spec §7.2.5 coreSyntaxTerms)
_FORBIDDEN_NODES = {_RDF_NS + a for a in ("RDF", "ID", "about", "bagID",
                                          "parseType", "resource", "nodeID",
                                          "li", "aboutEach",
                                          "aboutEachPrefix")}


def _q(tag: str) -> tuple[str, str]:
    """Split an ElementTree ``{ns}local`` tag into (ns, local)."""
    if tag.startswith("{"):
        ns, _, local = tag[1:].partition("}")
        return ns, local
    return "", tag


class _Ctx:
    def __init__(self, base: str | None):
        self.base = base
        self.triples: list = []
        self._bn = itertools.count()

    def bnode(self, label: str | None = None) -> BNode:
        return BNode(label if label else f"rx{next(self._bn)}")

    def emit(self, s, p, o) -> None:
        self.triples.append((s, p, o))

    def resolve(self, ref: str, base: str | None) -> IRI:
        if base:
            return IRI(urljoin(base, ref))
        return IRI(ref)


def _elem_base(el: ET.Element, base: str | None) -> str | None:
    xb = el.get("{" + _XML_NS + "}base")
    if xb is not None:
        return urljoin(base, xb) if base else xb
    return base


def _elem_lang(el: ET.Element, lang: str | None) -> str | None:
    xl = el.get("{" + _XML_NS + "}lang")
    return xl if xl is not None else lang


def _node_element(ctx: _Ctx, el: ET.Element, base: str | None,
                  lang: str | None):
    """Parse a node element, emit its triples, return its subject term."""
    base = _elem_base(el, base)
    lang = _elem_lang(el, lang)
    ns, local = _q(el.tag)
    name = ns + local
    if name in _FORBIDDEN_NODES:
        raise SparkdonError(f"rdf:{local} is not a valid node element")

    about = el.get("{" + _RDF_NS + "}" + "about")
    rid = el.get("{" + _RDF_NS + "}" + "ID")
    nid = el.get("{" + _RDF_NS + "}" + "nodeID")
    if sum(x is not None for x in (about, rid, nid)) > 1:
        raise SparkdonError(
            "at most one of rdf:about / rdf:ID / rdf:nodeID per node")
    if about is not None:
        subj = ctx.resolve(about, base)
    elif rid is not None:
        subj = ctx.resolve("#" + rid, base)
    elif nid is not None:
        subj = ctx.bnode(nid)
    else:
        subj = ctx.bnode()

    if name != _RDF_NS + "Description":
        ctx.emit(subj, IRI(RDF + "type"), IRI(name))

    # property attributes on the node element (spec §2.12)
    for attr, val in el.attrib.items():
        ans, alocal = _q(attr)
        aname = ans + alocal
        if ans == _XML_NS or aname in _SYNTAX_ATTRS or attr.startswith("xmlns"):
            continue
        if aname == _RDF_NS + "type":
            ctx.emit(subj, IRI(RDF + "type"), ctx.resolve(val, base))
        else:
            ctx.emit(subj, IRI(aname), Literal(val, lang=lang))

    li_counter = itertools.count(1)
    for child in el:
        _property_element(ctx, subj, child, base, lang, li_counter)
    return subj


def _xml_literal(el: ET.Element) -> str:
    """Serialize element CONTENT (text + children) for parseType=Literal."""
    parts = [el.text or ""]
    for c in el:
        parts.append(ET.tostring(c, encoding="unicode"))
    return "".join(parts)


def _property_element(ctx: _Ctx, subj, el: ET.Element, base: str | None,
                      lang: str | None, li_counter) -> None:
    base = _elem_base(el, base)
    lang = _elem_lang(el, lang)
    ns, local = _q(el.tag)
    if ns + local == _RDF_NS + "li":
        pred = IRI(f"{RDF}_{next(li_counter)}")
    else:
        pred = IRI(ns + local)

    reify_id = el.get("{" + _RDF_NS + "}" + "ID")
    parse_type = el.get("{" + _RDF_NS + "}" + "parseType")
    resource = el.get("{" + _RDF_NS + "}" + "resource")
    nid = el.get("{" + _RDF_NS + "}" + "nodeID")
    datatype = el.get("{" + _RDF_NS + "}" + "datatype")

    prop_attrs = [
        (ans + alocal, val)
        for attr, val in el.attrib.items()
        for ans, alocal in [_q(attr)]
        if ans != _XML_NS and (ans + alocal) not in _SYNTAX_ATTRS
        and not attr.startswith("xmlns")
    ]

    children = list(el)
    obj = None

    if parse_type == "Resource":
        obj = ctx.bnode()
        inner_li = itertools.count(1)
        for child in children:
            _property_element(ctx, obj, child, base, lang, inner_li)
    elif parse_type == "Literal":
        obj = Literal(_xml_literal(el), datatype=_RDF_NS + "XMLLiteral")
    elif parse_type == "Collection":
        items = [_node_element(ctx, c, base, lang) for c in children]
        obj = IRI(RDF + "nil") if not items else ctx.bnode()
        cur = obj
        for i, item in enumerate(items):
            ctx.emit(cur, IRI(RDF + "first"), item)
            nxt = IRI(RDF + "nil") if i == len(items) - 1 else ctx.bnode()
            ctx.emit(cur, IRI(RDF + "rest"), nxt)
            cur = nxt
    elif parse_type is not None:
        # spec: unknown parseType behaves as Literal
        obj = Literal(_xml_literal(el), datatype=_RDF_NS + "XMLLiteral")
    elif resource is not None:
        obj = ctx.resolve(resource, base)
    elif nid is not None:
        obj = ctx.bnode(nid)
    elif children:
        if len(children) != 1:
            raise SparkdonError(
                f"property element <{local}> with multiple node children "
                "(missing rdf:parseType='Resource'?)")
        obj = _node_element(ctx, children[0], base, lang)
    elif prop_attrs:
        # empty property element with property attributes → bnode object
        obj = ctx.bnode()
        for aname, val in prop_attrs:
            if aname == _RDF_NS + "type":
                ctx.emit(obj, IRI(RDF + "type"), ctx.resolve(val, base))
            else:
                ctx.emit(obj, IRI(aname), Literal(val, lang=lang))
        prop_attrs = []
    else:
        text = el.text or ""
        if datatype is not None:
            obj = Literal(text, datatype=datatype)
        else:
            obj = Literal(text, lang=lang)

    if prop_attrs and parse_type is None and (resource is not None or nid is not None):
        # rdf:resource/rdf:nodeID object plus property attributes:
        # the attributes describe the OBJECT node (spec §2.12)
        for aname, val in prop_attrs:
            if aname == _RDF_NS + "type":
                ctx.emit(obj, IRI(RDF + "type"), ctx.resolve(val, base))
            else:
                ctx.emit(obj, IRI(aname), Literal(val, lang=lang))

    ctx.emit(subj, pred, obj)
    if reify_id is not None:
        st = ctx.resolve("#" + reify_id, base)
        ctx.emit(st, IRI(RDF + "type"), IRI(RDF + "Statement"))
        ctx.emit(st, IRI(RDF + "subject"), subj)
        ctx.emit(st, IRI(RDF + "predicate"), pred)
        ctx.emit(st, IRI(RDF + "object"), obj)


def parse_rdfxml(text: str | bytes, base: str | None = None) -> list[tuple]:
    """RDF/XML text → encoded triple rows (io.triples_df input)."""
    root = ET.fromstring(text)
    ctx = _Ctx(base)
    base = _elem_base(root, base)
    lang = _elem_lang(root, None)
    if _q(root.tag) == (_RDF_NS, "RDF"):
        for child in root:
            _node_element(ctx, child, base, lang)
    else:
        # a single node element is a legal document (spec §2.11)
        _node_element(ctx, root, base, lang)
    return [_encode_triple(s, p, o) for s, p, o in ctx.triples]


def read_rdfxml(spark: SparkSession, path: str,
                base: str | None = None) -> DataFrame:
    """Distributed RDF/XML scan: ``binaryFile`` over the path (glob/dir
    ok), one parse task per file via Arrow-batched ``mapInPandas`` —
    RDF/XML is not line-splittable, so the file is the parallel unit.
    Blank-node labels are prefixed with a per-file hash so labels from
    different files can never collide."""
    import hashlib

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fp, content in zip(pdf["path"], pdf["content"]):
                if not len(content):
                    # write_rdfxml's text sink leaves 0-byte part files
                    # for empty partitions; they carry no document
                    continue
                tag = hashlib.md5(fp.encode()).hexdigest()[:8]
                for r in parse_rdfxml(bytes(content), base):
                    r = list(r)
                    if r[0] == KIND_BNODE:
                        r[1] = f"{tag}.{r[1]}"
                    if r[3] == KIND_BNODE:
                        r[4] = f"{tag}.{r[4]}"
                    rows.append(r)
            yield pd.DataFrame(
                rows, columns=[f.name for f in TRIPLE_SCHEMA.fields])

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(gen, TRIPLE_SCHEMA).dropDuplicates()


# ---------------------------------------------------------------------------
# writer (round 10) — pairs with the reader: write_rdfxml emits ONE complete
# RDF/XML document per partition file, exactly the unit read_rdfxml scans
# ---------------------------------------------------------------------------

#: NCName character classes (XML Namespaces §3; ASCII subset is what IRI
#: local names use in practice — anything beyond falls back to a longer
#: namespace split or an honest error)
import re as _re

_NCNAME_CHAR = _re.compile(r"[A-Za-z0-9_.\-À-￿]")
_NCNAME_START = _re.compile(r"[A-Za-z_À-￿]")
#: characters XML 1.0 cannot represent at all (not even escaped)
_XML_ILLEGAL = _re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F]")


def _split_qname(iri: str) -> tuple[str, str]:
    """Split a predicate IRI into (namespace, NCName local part): the
    longest suffix that is a valid NCName.  RDF/XML structurally cannot
    serialize a predicate with an empty local part (spec §2.4) — that
    raises, honestly, rather than emitting an invalid element name."""
    i = len(iri)
    while i > 0 and _NCNAME_CHAR.match(iri[i - 1]):
        i -= 1
    while i < len(iri) and not _NCNAME_START.match(iri[i]):
        i += 1
    local = iri[i:]
    if not local:
        raise SparkdonError(
            f"predicate <{iri}> has no NCName local part; RDF/XML cannot "
            "serialize it — use Turtle/N-Triples for this graph")
    return iri[:i], local


def _check_xml_text(lex: str) -> str:
    if _XML_ILLEGAL.search(lex):
        raise SparkdonError(
            "literal contains control characters XML 1.0 cannot represent; "
            "use Turtle/N-Triples for this graph")
    return lex


def _is_ncname(label: str) -> bool:
    return bool(label) and bool(_NCNAME_START.match(label[0])) and all(
        _NCNAME_CHAR.match(c) for c in label)


def serialize_rdfxml(rows, prefixes: dict[str, str] | None = None) -> str:
    """Encoded triple rows → one complete RDF/XML document (spec-form
    ``rdf:Description`` node elements grouped by subject, deterministic
    order).  ``prefixes`` (prefix → namespace) seeds the xmlns table;
    namespaces not covered get generated ``ns1``, ``ns2``, … labels."""
    from xml.sax.saxutils import escape, quoteattr

    from sparkdon.terms import KIND_IRI as _IRI, KIND_LIT as _LIT

    rows = sorted(
        (tuple(r) for r in rows),
        key=lambda r: (r[0], r[1], r[2], r[3], r[4], r[5] or "", r[6] or ""))
    ns_table: dict[str, str] = {}
    seed = {p: ns for p, ns in (prefixes or {}).items()
            if p and _NCNAME_START.match(p[0])
            and all(_NCNAME_CHAR.match(c) for c in p) and p != "rdf"}
    ns_to_prefix = {ns: p for p, ns in seed.items()}

    def prefix_for(ns: str) -> str:
        got = ns_table.get(ns)
        if got is None:
            got = ns_to_prefix.get(ns)
            taken = set(ns_table.values())
            if got is None or got in taken:
                n = 1
                while f"ns{n}" in taken or f"ns{n}" in seed:
                    n += 1
                got = f"ns{n}"
            ns_table[ns] = got
        return got

    # rdf:nodeID must be an NCName; labels that aren't (read_rdfxml's
    # per-file md5 tags lead with a digit) map to minted b1, b2, … —
    # deterministic within the document, avoiding every valid label
    valid_labels = {r[1] for r in rows if r[0] == KIND_BNODE
                    and _is_ncname(r[1])}
    valid_labels |= {r[4] for r in rows if r[3] == KIND_BNODE
                     and _is_ncname(r[4])}
    bmap: dict[str, str] = {}

    def node_id(label: str) -> str:
        if _is_ncname(label):
            return label
        got = bmap.get(label)
        if got is None:
            n = len(bmap) + 1
            while f"b{n}" in valid_labels:
                n += 1000000
            got = bmap.setdefault(label, f"b{n}")
        return got

    def text_of(lex: str) -> str:
        # escape() leaves \r alone, but XML 1.0 §2.11 end-of-line
        # normalization would turn it into \n on ANY parse — emit the
        # character reference so literals round-trip exactly
        return escape(_check_xml_text(lex)).replace("\r", "&#13;")

    body: list[str] = []
    prev_subj = None
    for s_kind, s, p, o_kind, o, o_dt, o_lang in rows:
        ns, local = _split_qname(p)
        tag = f"{prefix_for(ns)}:{local}"
        subj = (s_kind, s)
        if subj != prev_subj:
            if prev_subj is not None:
                body.append("  </rdf:Description>")
            ident = ("rdf:about=" + quoteattr(s) if s_kind == _IRI
                     else "rdf:nodeID=" + quoteattr(node_id(s)))
            body.append(f"  <rdf:Description {ident}>")
            prev_subj = subj
        if o_kind == _IRI:
            body.append(f"    <{tag} rdf:resource={quoteattr(o)}/>")
        elif o_kind == _LIT:
            attrs = ""
            if o_lang:
                attrs = " xml:lang=" + quoteattr(o_lang)
            elif o_dt:
                attrs = " rdf:datatype=" + quoteattr(o_dt)
            body.append(
                f"    <{tag}{attrs}>{text_of(o)}</{tag}>")
        else:
            body.append(f"    <{tag} rdf:nodeID={quoteattr(node_id(o))}/>")
    if prev_subj is not None:
        body.append("  </rdf:Description>")
    decls = [f'xmlns:rdf="{_RDF_NS}"'] + [
        f"xmlns:{pfx}={_quoteattr_ns(ns)}"
        for ns, pfx in sorted(ns_table.items(), key=lambda kv: kv[1])]
    head = "<rdf:RDF " + " ".join(decls) + ">"
    return "\n".join(
        ['<?xml version="1.0" encoding="utf-8"?>', head, *body,
         "</rdf:RDF>"]) + "\n"


def _quoteattr_ns(ns: str) -> str:
    from xml.sax.saxutils import quoteattr

    return quoteattr(ns)


def rdfxml_string(triples: DataFrame, prefixes: dict[str, str] | None = None,
                  limit: int = 100_000) -> str:
    """Serialize a bounded triple DataFrame to RDF/XML (driver-side, the
    same bound discipline as io.nt_string); use :func:`write_rdfxml` for
    unbounded graphs."""
    rows = triples.limit(limit + 1).collect()
    if len(rows) > limit:
        raise SparkdonError(
            f"graph exceeds serialization bound of {limit} triples; "
            "use write_rdfxml")
    return serialize_rdfxml(
        [(r["s_kind"], r["s"], r["p"], r["o_kind"], r["o"],
          r["o_dt"], r["o_lang"]) for r in rows], prefixes)


def write_rdfxml(triples: DataFrame, path: str,
                 prefixes: dict[str, str] | None = None) -> None:
    """Distributed RDF/XML sink: each partition serializes to ONE
    complete document row, written with the text sink — so the output
    directory is a set of standalone ``.rdf``-style part files, exactly
    the file-parallel unit :func:`read_rdfxml` scans back.  (RDF/XML is
    not line-splittable; the per-file document IS the scale shape.)
    Bnode labels are already partition-unique in a triple frame, so no
    re-labelling is needed on write."""
    import pandas as pd

    cols = [f.name for f in TRIPLE_SCHEMA.fields]

    def gen(batches):
        rows: list[tuple] = []
        for pdf in batches:
            rows.extend(pdf[cols].itertuples(index=False, name=None))
        if rows:
            yield pd.DataFrame({"value": [serialize_rdfxml(rows, prefixes)]})

    (triples.mapInPandas(gen, "value string")
     .write.mode("overwrite").text(path))
