"""PDF text extraction — pure stdlib (``zlib`` + ``re``) from the
public PDF 1.7 spec (ISO 32000-1).

PDFs are a first-class pretraining-data source, so the engine gets a
real extraction path, same policy as the image/audio codecs: the
common shape decodes for real, the exotic shape raises or degrades
honestly.

Covered: classic ``N 0 obj … stream … endstream`` layout, FlateDecode
and uncompressed content streams, literal strings with all escape
forms, hex strings, the text-showing operators (``Tj``, ``'``, ``"``,
``TJ`` arrays), and line breaks from the text-positioning operators
(``Td``/``TD``/``T*``).  Simple fonts read as Latin-1 — correct for
Standard/WinAnsi-encoded text, the overwhelmingly common case for
text-bearing PDFs.  NOT covered (honest boundaries, documented here
rather than silently garbled): composite/CID (Type0) fonts with
2-byte codes, encrypted documents (detected → ``ValueError``), and
cross-reference STREAMS whose object streams hold the page content
(``/ObjStm`` bodies are inflated and scanned too, so most xref-stream
files still extract).

The Spark stage is :func:`sparkdon.multimodal.extract_text` — a
narrow Arrow-batched ``mapInPandas``, one document per row, the same
shape as the decode stages.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(
    rb"<<(?P<dict>(?:[^<>]|<<(?:[^<>]|<<[^>]*>>)*>>|<[0-9A-Fa-f\s]*>)*?)>>"
    rb"\s*stream\r?\n", re.S)

#: literal-string escapes (PDF 7.3.4.2)
_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b",
            b"f": b"\f", b"(": b"(", b")": b")", b"\\": b"\\"}


def _inflate(raw: bytes) -> bytes | None:
    try:
        return zlib.decompress(raw)
    except zlib.error:
        try:  # streams with trailing junk
            d = zlib.decompressobj()
            return d.decompress(raw)
        except zlib.error:
            return None


def _streams(payload: bytes):
    """Yield (dict_bytes, decoded_stream_bytes) for every stream whose
    filter we can apply (none, or FlateDecode)."""
    for m in _STREAM_RE.finditer(payload):
        d = m.group("dict")
        start = m.end()
        end = payload.find(b"endstream", start)
        if end < 0:
            continue
        raw = payload[start:end].rstrip(b"\r\n")
        if b"/FlateDecode" in d:
            data = _inflate(raw)
            if data is None:
                continue
        elif b"/Filter" in d:
            continue  # DCT/LZW/ASCII85… — not content text
        else:
            data = raw
        yield d, data


def _unescape_literal(body: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(body)
    while i < n:
        c = body[i:i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = body[i + 1:i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt and nxt in b"01234567":  # \ddd octal, 1-3 digits
            j = i + 1
            while j < min(i + 4, n) and body[j] in b"01234567":
                j += 1
            out.append(int(body[i + 1:j], 8) & 0xFF)
            i = j
        elif nxt in (b"\r", b"\n"):  # line continuation
            i += 2
            if nxt == b"\r" and body[i:i + 1] == b"\n":
                i += 1
        else:
            i += 2 if nxt else 1
            out += nxt
    return bytes(out)


#: one content-stream token: literal string (with escaped parens),
#: hex string, array delimiters, number, or operator name
_TOKEN_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^()\\])*)\)"
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>"
    rb"|(?P<op>[A-Za-z'\"*]+)"
    rb"|(?P<num>[-+.0-9]+)"
    rb"|(?P<delim>[\[\]])", re.S)


def _content_text(stream: bytes) -> str:
    """Walk one content stream's text operators → extracted text."""
    parts: list[str] = []
    pending: list[bytes] = []  # strings since the last operator

    def flush(line_break: bool = False):
        for raw in pending:
            parts.append(raw.decode("latin-1"))
        pending.clear()
        if line_break and parts and not parts[-1].endswith("\n"):
            parts.append("\n")

    for m in _TOKEN_RE.finditer(stream):
        if m.group("lit") is not None:
            pending.append(_unescape_literal(m.group("lit")))
        elif m.group("hex") is not None:
            h = re.sub(rb"\s", b"", m.group("hex"))
            if len(h) % 2:
                h += b"0"
            pending.append(bytes.fromhex(h.decode("ascii")))
        elif m.group("op"):
            op = m.group("op")
            if op in (b"Tj", b"TJ"):
                flush()
            elif op in (b"'", b'"'):
                parts.append("\n")
                flush()
            elif op in (b"Td", b"TD", b"T*"):
                flush(line_break=True)
            elif op == b"ET":
                flush(line_break=True)
            else:
                pending.clear()  # strings consumed by non-text ops
    flush()
    return "".join(parts)


def pdf_to_text(payload: bytes) -> str:
    """PDF bytes → extracted text (see module docstring for the
    envelope).  Raises ``ValueError`` for non-PDF or encrypted input;
    a text-free PDF (scanned images) returns ``""``."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF payload")
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", payload):
        raise ValueError("encrypted PDF")
    chunks: list[str] = []
    for d, data in _streams(payload):
        if b"/ObjStm" in d:
            # object stream: scan its inflated body for nested content
            for m2 in re.finditer(rb"BT(.*?)ET", data, re.S):
                t = _content_text(m2.group(0))
                if t.strip():
                    chunks.append(t)
            continue
        if b"/Image" in d or b"/XObject" in d and b"/Form" not in d:
            continue
        # embedded font programs and XMP metadata inflate to binary
        # that can contain a stray "BT" — never page content.  A real
        # font PROGRAM stream carries /Length1 (and /Subtype /OpenType
        # or /Type1C); /FontFile* keys live in the FontDescriptor, so
        # they are matched only for unusual inlined layouts
        if (b"/Length1" in d or b"/FontFile" in d or b"/Metadata" in d
                or b"/Type1C" in d or b"/OpenType" in d):
            continue
        if b"BT" in data:  # begin-text marker: a content stream
            t = _content_text(data)
            if t.strip():
                chunks.append(t)
    text = "".join(chunks)
    # collapse runs the positioning operators may have produced
    return re.sub(r"\n{3,}", "\n\n", text).strip()


def pdf_info(payload: bytes) -> dict:
    """Document metadata: header version + the Info dictionary's
    standard text fields (Title/Author/Subject/Producer/Creator/
    CreationDate), for the ``extract_metadata`` stage."""
    if payload[:5] != b"%PDF-":
        raise ValueError("not a PDF payload")
    out: dict = {"pdf_version":
                 payload[5:8].decode("ascii", "replace")}
    for key in (b"Title", b"Author", b"Subject", b"Producer",
                b"Creator", b"CreationDate"):
        m = re.search(rb"/" + key + rb"\s*\((?P<v>(?:\\.|[^()\\])*)\)",
                      payload, re.S)
        if m:
            val = _unescape_literal(m.group("v"))
            if val[:2] in (b"\xfe\xff", b"\xff\xfe"):  # UTF-16 text
                text = val.decode("utf-16", "replace")
            else:
                text = val.decode("latin-1")
            out[key.decode().lower()] = text
    pages = len(re.findall(rb"/Type\s*/Page[^s]", payload))
    if pages:
        out["pages"] = pages
    return out


def text_to_pdf(text: str, title: str | None = None,
                compress: bool = True) -> bytes:
    """Writer twin: plain text → a minimal valid PDF (one page, one
    Helvetica font, one FlateDecode content stream, classic xref
    table), so extraction round-trips are testable without fixtures."""

    def esc(s: str) -> bytes:
        return s.encode("latin-1", "replace") \
            .replace(b"\\", b"\\\\").replace(b"(", b"\\(") \
            .replace(b")", b"\\)")

    lines = text.split("\n")
    ops = [b"BT /F1 11 Tf 50 780 Td 14 TL"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"T*")
        ops.append(b"(" + esc(line) + b") Tj")
    ops.append(b"ET")
    content = b"\n".join(ops)
    filt = b""
    if compress:
        content = zlib.compress(content)
        filt = b" /Filter /FlateDecode"

    info = b""
    if title is not None:
        info = b"<< /Title (" + esc(title) + b") >>"
    objects = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        b"<< /Length " + str(len(content)).encode() + filt
        + b" >>\nstream\n" + content + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    if info:
        objects.append(info)

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += f"{off:010d} 00000 n \n".encode()
    trailer = (b"trailer\n<< /Size " + str(len(objects) + 1).encode()
               + b" /Root 1 0 R")
    if info:
        trailer += b" /Info " + str(len(objects)).encode() + b" 0 R"
    trailer += (b" >>\nstartxref\n" + str(xref_pos).encode()
                + b"\n%%EOF\n")
    out += trailer
    return bytes(out)
