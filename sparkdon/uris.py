"""URI resolution and humanization — parity with the reference's
``UriResolver`` (gastrodon/domain/__init__.py; behavior specified by the
doctests in docs/uri_resolution_examples.rst) and the Endpoint qname
helpers (``is_ok_qname``/``ns_part``/``local_part``,
gastrodon/__init__.py:206-260).

Re-implemented from the documented contract:
- ``any_to_uri``: angle brackets optional; qname-ish prefixes expand
  against declared namespaces; everything else resolves relative to the
  base URI (RFC 3986 reference resolution).
- ``humanize_uri``: declared namespace → ``pfx:local``; under the base
  URI → ``<relative>``; otherwise ``<absolute>``.
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

#: characters allowed in a QName local part (parens, colons etc. force
#: absolute-URI rendering)
_VALID_TAIL = re.compile(r"[A-Za-z_0-9\-.]*")

_ABSOLUTE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*://")


def ns_part(url: str) -> str:
    """Syntactic namespace part: through the last '#' or '/'."""
    x = str(url)
    return x[: max(x.rfind("#"), x.rfind("/")) + 1]


def local_part(url: str) -> str:
    """Syntactic local part: after the last '#' or '/'."""
    x = str(url)
    return x[max(x.rfind("#"), x.rfind("/")) + 1:]


class UriResolver:
    def __init__(self, namespaces: dict[str, str], base_uri: str | None = None):
        self.namespaces = dict(namespaces)
        self.base_uri = base_uri
        self._ns_set = set(self.namespaces.values())

    def is_ok_qname(self, url: str):
        """True when the URI splits into a declared namespace + a local
        part containing only QName-safe characters."""
        x = str(url)
        suffix = local_part(x)
        if not _VALID_TAIL.fullmatch(suffix):
            return None
        return ns_part(x) in self._ns_set

    def any_to_uri(self, text: str) -> str:
        """Resolve any written form — ``<...>``-wrapped, plain absolute,
        prefix:local, or base-relative — to an absolute URI string."""
        t = str(text)
        wrapped = t.startswith("<") and t.endswith(">")
        if wrapped:
            t = t[1:-1]
        if _ABSOLUTE.match(t):
            return t
        if not wrapped:
            pfx, sep, rest = t.partition(":")
            if sep and pfx in self.namespaces:
                return self.namespaces[pfx] + rest
        if self.base_uri is None:
            return t
        return urljoin(self.base_uri, t)

    def humanize_uri(self, url: str) -> str:
        """Human-friendly display form (the inverse of any_to_uri)."""
        x = str(url)
        ns = ns_part(x)
        if ns in self._ns_set and _VALID_TAIL.fullmatch(local_part(x)):
            pfx = next(p for p, n in self.namespaces.items() if n == ns)
            return f"{pfx}:{local_part(x)}"
        if self.base_uri and x.startswith(self.base_uri):
            return f"<{x[len(self.base_uri):]}>"
        return f"<{x}>"
