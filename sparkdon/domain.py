"""Sphinx RDF documentation domain — parity with the reference's
``gastrodon/domain/__init__.py:16-131`` (``URIRefRole``, ``Subject``,
``RDFDomain``, ``squash_uri_to_label``, ``setup``).

The reference registers an ``rdf`` Sphinx domain so documentation can
cross-reference RDF subjects with ``:rdf:uri:`dbo:Person``` roles and
``.. rdf:subject::`` directives, resolving written forms through a
``UriResolver`` seeded from a T-Box graph's namespaces.

Sphinx is an optional dependency here.  All resolution/indexing logic
lives in plain module functions (tested without Sphinx); the Sphinx
class wiring is built lazily by :func:`build_sphinx_classes` so that
importing :mod:`sparkdon.domain` never requires Sphinx, and a docs
build that *does* have Sphinx gets the same domain surface as the
reference (``app.add_config_value("rdf_tbox", ...)`` +
``app.add_domain(RDFDomain)``).
"""

from __future__ import annotations

from string import ascii_lowercase
from typing import Any

from .uris import UriResolver

#: default base URI for relative subject names — same scratch base the
#: reference hard-codes (gastrodon/domain/__init__.py:55)
DEFAULT_BASE_URI = "http://rdf.ontology2.com/scratch/"

DOMAIN_NAME = "rdf"
DOMAIN_LABEL = "RDF"
INDEX_TEMPLATE = "RDF Subject; %s"


def squash_uri_to_label(name: str) -> str:
    """Lower-case and keep ``-``, ``_``, ASCII lowercase and Unicode
    numerics (``str.isnumeric``, faithfully matching the reference's
    character test, gastrodon/domain/__init__.py:86-94 — NOT a strict
    ``[a-z0-9_-]`` filter); everything else becomes ``-``, so a URI
    turns into a stable docutils target id.

    >>> squash_uri_to_label("uri-http://example.com/Person")
    'uri-http---example-com-person'
    """
    out = []
    for c in name:
        low = c.lower()
        if low.isnumeric() or low in ascii_lowercase or low in "-_":
            out.append(low)
        else:
            out.append("-")
    return "".join(out)


def namespaces_of(tbox: Any) -> dict[str, str]:
    """Extract a prefix→namespace dict from any T-Box-ish object:
    a plain dict, a sparkdon Endpoint (``.prefixes``), an
    rdflib-style graph (``.namespaces()`` yielding tuples), or a
    pandas frame shaped like ``Endpoint.namespaces()``."""
    if tbox is None:
        return {}
    if isinstance(tbox, dict):
        return {str(k): str(v) for k, v in tbox.items()}
    prefixes = getattr(tbox, "prefixes", None)
    if isinstance(prefixes, dict):
        return {str(k): str(v) for k, v in prefixes.items()}
    ns = getattr(tbox, "namespaces", None)
    if callable(ns):
        got = ns()
        if hasattr(got, "index") and hasattr(got, "itertuples"):  # pandas
            return {str(i): str(u) for i, u in zip(got.index, got["uri"])}
        return {str(p): str(u) for p, u in got}
    raise TypeError(f"cannot extract namespaces from {type(tbox).__name__}")


def make_resolver(tbox: Any, base_uri: str = DEFAULT_BASE_URI) -> UriResolver:
    """The resolver ``RDFDomain.__init__`` seeds into domaindata
    (reference :51-55)."""
    return UriResolver(namespaces_of(tbox), base_uri)


def process_link_parts(
    resolver: UriResolver, target: str, title: str, has_explicit_title: bool
) -> tuple[str, str]:
    """``URIRefRole.process_link`` logic (reference :18-23): the written
    target resolves to an absolute URI; without an explicit title the
    display form is the humanized URI."""
    target = resolver.any_to_uri(target)
    if not has_explicit_title:
        title = resolver.humanize_uri(target)
    return title, target


def subject_signature(resolver: UriResolver, sig: str) -> tuple[str, str]:
    """``Subject.handle_signature`` logic (reference :29-33): returns
    (canonical-uri, display-name) for the signature node."""
    uri = resolver.any_to_uri(sig)
    return uri, resolver.humanize_uri(uri)


def subject_target_name(objtype: str, name: str) -> str:
    """``Subject.add_target_and_index`` target id (reference :41)."""
    return squash_uri_to_label(f"{objtype}-{name}")


def resolve_object_xref(
    objects: dict[str, tuple[str, str]], target: str
) -> tuple[str, str] | None:
    """``RDFDomain.resolve_xref`` lookup (reference :76-84): return
    (docname, labelid) when the target is indexed, else None."""
    docname, labelid = objects.get(target, ("", ""))
    if not docname:
        return None
    return docname, labelid


def build_sphinx_classes():
    """Construct the Sphinx classes (URIRefRole, Subject, RDFDomain).

    Imported lazily so the module works without Sphinx; raises a clear
    ImportError when Sphinx is absent.
    """
    try:
        from sphinx import addnodes
        from sphinx.directives import ObjectDescription
        from sphinx.domains import Domain, ObjType
        from sphinx.roles import XRefRole
        from sphinx.util.nodes import make_refnode
    except ImportError as e:  # pragma: no cover - exercised via fake sphinx
        raise ImportError(
            "sparkdon.domain's Sphinx integration requires sphinx; "
            "install sphinx to build RDF-domain documentation"
        ) from e

    class URIRefRole(XRefRole):
        domain = DOMAIN_NAME

        def process_link(self, env, refnode, has_explicit_title, title, target):
            resolver = env.domaindata[self.domain]["resolver"]
            return process_link_parts(resolver, target, title, has_explicit_title)

    class Subject(ObjectDescription):
        domain = DOMAIN_NAME
        indextemplate = INDEX_TEMPLATE

        def handle_signature(self, sig, signode):
            resolver = self.env.domaindata[self.domain]["resolver"]
            uri, display = subject_signature(resolver, sig)
            signode += addnodes.desc_name(uri, display)
            return uri

        def add_target_and_index(self, name, sig, signode):
            targetname = subject_target_name(self.objtype, name)
            signode["ids"].append(targetname)
            self.state.document.note_explicit_target(signode)
            self.env.domaindata[self.domain]["objects"][name] = (
                self.env.docname,
                targetname,
            )

    class RDFDomain(Domain):
        name = DOMAIN_NAME
        label = DOMAIN_LABEL
        object_types = {"uri": ObjType("uri", "uri")}
        roles = {"uri": URIRefRole()}
        directives = {"subject": Subject}
        initial_data = {"objects": {}}

        def __init__(self, env):
            super().__init__(env)
            tbox = env.config.rdf_tbox
            self.env.domaindata[self.name]["resolver"] = make_resolver(tbox)

        def resolve_xref(
            self, env, fromdocname, builder, typ, target, node, contnode
        ):
            found = resolve_object_xref(self.data["objects"], target)
            if found is None:
                return None
            docname, labelid = found
            return make_refnode(builder, fromdocname, docname, labelid, contnode)

    return URIRefRole, Subject, RDFDomain


def setup(app):
    """Sphinx extension entry point (reference :128-131).  ``rdf_tbox``
    accepts anything :func:`namespaces_of` understands (an Endpoint, a
    dict, an rdflib graph)."""
    _, _, RDFDomain = build_sphinx_classes()
    app.add_config_value("rdf_tbox", {}, "env")
    app.add_domain(RDFDomain)
    return {"parallel_read_safe": True}
