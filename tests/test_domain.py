"""Sphinx RDF domain port (sparkdon/domain.py vs reference
gastrodon/domain/__init__.py:16-131).

Sphinx is not installed in this container, so the pure-logic layer is
tested directly and the class wiring is exercised against a minimal
fake `sphinx` package that mirrors the attributes the reference code
touches.
"""

from __future__ import annotations

import sys
import types

import pandas as pd
import pytest

from sparkdon import domain
from sparkdon.uris import UriResolver

NS = {
    "dbo": "http://dbpedia.org/ontology/",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
}


def _resolver():
    return UriResolver(NS, domain.DEFAULT_BASE_URI)


# ---------------------------------------------------------------- pure logic


def test_squash_uri_to_label_matches_reference_charset():
    # reference :86-94 — lowercase, keep [a-z0-9_-], else '-'
    assert domain.squash_uri_to_label("uri-dbo:Person") == "uri-dbo-person"
    assert (
        domain.squash_uri_to_label("uri-http://example.com/A_b-9")
        == "uri-http---example-com-a_b-9"
    )
    assert domain.squash_uri_to_label("") == ""


def test_namespaces_of_accepts_dict_endpoint_pandas_and_tuples():
    assert domain.namespaces_of(NS) == NS
    assert domain.namespaces_of(None) == {}

    class FakeEndpoint:
        prefixes = NS

    assert domain.namespaces_of(FakeEndpoint()) == NS

    # the sparkdon Endpoint.namespaces() frame shape (session.py:83-90)
    frame = pd.DataFrame(
        {"uri": [NS["dbo"], NS["rdfs"]]},
        index=pd.Index(["dbo", "rdfs"], name="prefix"),
    )

    class FrameTBox:
        def namespaces(self):
            return frame

    assert domain.namespaces_of(FrameTBox()) == NS

    class RdflibStyle:  # rdflib Graph.namespaces() yields tuples
        def namespaces(self):
            return [("dbo", NS["dbo"]), ("rdfs", NS["rdfs"])]

    assert domain.namespaces_of(RdflibStyle()) == NS

    with pytest.raises(TypeError):
        domain.namespaces_of(42)


def test_process_link_parts_resolves_and_humanizes():
    r = _resolver()
    # no explicit title: target expands, title humanizes (reference :18-23)
    title, target = domain.process_link_parts(r, "dbo:Person", "dbo:Person", False)
    assert target == "http://dbpedia.org/ontology/Person"
    assert title == "dbo:Person"
    # explicit title survives untouched
    title, target = domain.process_link_parts(r, "dbo:Person", "People", True)
    assert (title, target) == ("People", "http://dbpedia.org/ontology/Person")
    # base-relative written form
    title, target = domain.process_link_parts(r, "<thing>", "x", False)
    assert target == domain.DEFAULT_BASE_URI + "thing"
    assert title == "<thing>"


def test_subject_signature_and_target_name():
    r = _resolver()
    uri, display = domain.subject_signature(r, "dbo:Person")
    assert uri == "http://dbpedia.org/ontology/Person"
    assert display == "dbo:Person"
    assert (
        domain.subject_target_name("subject", uri)
        == "subject-http---dbpedia-org-ontology-person"
    )


def test_resolve_object_xref():
    objects = {"u": ("doc1", "label1")}
    assert domain.resolve_object_xref(objects, "u") == ("doc1", "label1")
    assert domain.resolve_object_xref(objects, "missing") is None
    assert domain.resolve_object_xref({"v": ("", "")}, "v") is None


# ---------------------------------------------------------- sphinx wiring


def _fake_sphinx(monkeypatch):
    """Install a minimal fake `sphinx` exposing exactly what
    build_sphinx_classes imports."""
    sphinx = types.ModuleType("sphinx")
    addnodes = types.ModuleType("sphinx.addnodes")
    addnodes.desc_name = lambda raw, text: ("desc_name", raw, text)
    directives = types.ModuleType("sphinx.directives")

    class ObjectDescription:
        pass

    directives.ObjectDescription = ObjectDescription
    domains_mod = types.ModuleType("sphinx.domains")

    class Domain:
        initial_data: dict = {}

        def __init__(self, env):
            self.env = env
            if self.name not in env.domaindata:
                env.domaindata[self.name] = {
                    k: dict(v) if isinstance(v, dict) else v
                    for k, v in self.initial_data.items()
                }
            self.data = env.domaindata[self.name]

    class ObjType:
        def __init__(self, lname, *roles):
            self.lname, self.roles = lname, roles

    domains_mod.Domain = Domain
    domains_mod.ObjType = ObjType
    roles_mod = types.ModuleType("sphinx.roles")

    class XRefRole:
        pass

    roles_mod.XRefRole = XRefRole
    util_nodes = types.ModuleType("sphinx.util.nodes")
    util_nodes.make_refnode = lambda builder, fromdoc, doc, labelid, contnode: (
        "refnode",
        fromdoc,
        doc,
        labelid,
        contnode,
    )
    util_mod = types.ModuleType("sphinx.util")
    util_mod.nodes = util_nodes
    sphinx.addnodes = addnodes
    for name, mod in [
        ("sphinx", sphinx),
        ("sphinx.addnodes", addnodes),
        ("sphinx.directives", directives),
        ("sphinx.domains", domains_mod),
        ("sphinx.roles", roles_mod),
        ("sphinx.util", util_mod),
        ("sphinx.util.nodes", util_nodes),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)


class _Env:
    def __init__(self, tbox):
        self.domaindata: dict = {}
        self.config = types.SimpleNamespace(rdf_tbox=tbox)
        self.docname = "docs/ontology"


class _SigNode:
    def __init__(self):
        self.children: list = []
        self.attrs = {"ids": []}

    def __iadd__(self, child):
        self.children.append(child)
        return self

    def __getitem__(self, k):
        return self.attrs[k]


def test_sphinx_wiring_end_to_end(monkeypatch):
    _fake_sphinx(monkeypatch)
    URIRefRole, Subject, RDFDomain = domain.build_sphinx_classes()

    env = _Env({"dbo": NS["dbo"]})
    dom = RDFDomain(env)
    assert dom.name == "rdf" and dom.label == "RDF"
    assert "uri" in dom.object_types and "subject" in dom.directives
    resolver = env.domaindata["rdf"]["resolver"]
    assert resolver.any_to_uri("dbo:Person") == "http://dbpedia.org/ontology/Person"

    # role: written qname -> absolute target + humanized title
    role = dom.roles["uri"]
    title, target = role.process_link(env, None, False, "dbo:Person", "dbo:Person")
    assert (title, target) == ("dbo:Person", "http://dbpedia.org/ontology/Person")

    # directive: signature -> desc_name child, target registered + indexed
    subj = Subject()
    subj.env = env
    subj.objtype = "subject"
    noted = []
    subj.state = types.SimpleNamespace(
        document=types.SimpleNamespace(note_explicit_target=noted.append)
    )
    signode = _SigNode()
    name = subj.handle_signature("dbo:Person", signode)
    assert name == "http://dbpedia.org/ontology/Person"
    assert signode.children == [("desc_name", name, "dbo:Person")]
    subj.add_target_and_index(name, "dbo:Person", signode)
    assert signode["ids"] == ["subject-http---dbpedia-org-ontology-person"]
    assert noted == [signode]
    assert env.domaindata["rdf"]["objects"][name] == (
        "docs/ontology",
        "subject-http---dbpedia-org-ontology-person",
    )

    # xref resolution through the recorded object
    node = dom.resolve_xref(env, "index", "builder", "uri", name, None, "CONT")
    assert node == (
        "refnode",
        "index",
        "docs/ontology",
        "subject-http---dbpedia-org-ontology-person",
        "CONT",
    )
    assert dom.resolve_xref(env, "index", "b", "uri", "nope", None, "C") is None


def test_setup_registers_domain_and_config(monkeypatch):
    _fake_sphinx(monkeypatch)
    calls = {}
    app = types.SimpleNamespace(
        add_config_value=lambda *a: calls.setdefault("config", a),
        add_domain=lambda d: calls.setdefault("domain", d),
    )
    meta = domain.setup(app)
    assert calls["config"][0] == "rdf_tbox"
    assert calls["domain"].name == "rdf"
    assert meta["parallel_read_safe"] is True


def test_build_sphinx_classes_without_sphinx_raises_cleanly():
    assert "sphinx" not in sys.modules  # container truth: sphinx absent
    with pytest.raises(ImportError, match="requires sphinx"):
        domain.build_sphinx_classes()
