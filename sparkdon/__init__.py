"""sparkdon — a PySpark-native analytics engine with the query and
data-processing capabilities of paulhoule/gastrodon.

The reference (``/root/reference/gastrodon``) fronts SPARQL endpoints and
returns pandas DataFrames; its execution is delegated to rdflib or a remote
store.  sparkdon *is* the executor: SPARQL text is parsed (``sparkdon.algebra``),
compiled to a Spark DataFrame plan (``sparkdon.compile``), optimized by
Catalyst, and executed by Tungsten; results come back as pandas DataFrames
with the same session conveniences the reference offers (prefix injection,
``?_x`` substitution, GROUP-BY index — gastrodon/__init__.py:317-372,487-511).

Public API (parity with gastrodon's documented surface, docs/api.rst):

- :class:`sparkdon.session.LocalEndpoint` — select / select_raw / construct /
  update / decollect / peel / namespaces / one / member
- :func:`sparkdon.session.inline` — Turtle text -> LocalEndpoint
- :func:`sparkdon.io.read_ntriples` — splittable N-Triples -> triple DataFrame
- :func:`sparkdon.io.ttl` — graph DataFrame -> Turtle text
- :func:`sparkdon.terms.to_python`, :class:`sparkdon.terms.IRI` etc.
"""

from sparkdon.terms import IRI, BNode, Literal, term_struct_type  # noqa: F401

__version__ = "0.2.0"
