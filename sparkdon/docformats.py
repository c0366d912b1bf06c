"""Office/ebook document text extraction — DOCX (ECMA-376) and EPUB
(IDPF OCF/OPF), both plain ZIP containers readable with stdlib
``zipfile`` + XML/HTML regex work.  Same role as :mod:`sparkdon.pdf`:
real extraction for the common shapes of a document corpus, honest
failure for the rest, all behind the narrow
:func:`sparkdon.multimodal.extract_text` stage.

- DOCX: ``word/document.xml`` paragraphs — ``<w:t>`` runs joined per
  ``<w:p>``, ``<w:tab/>`` → tab, ``<w:br/>`` → newline, XML entities
  decoded.  Headers/footers/footnotes are out of scope (they live in
  other part files and are usually noise for a training corpus).
- EPUB: the OPF manifest/spine is honored, so chapters come out in
  reading order, each XHTML document stripped to visible text with the
  same rules as the JVM-side ``html_to_text`` (script/style/comment
  removal, block tags → newlines, entities, whitespace collapse).
"""

from __future__ import annotations

import html
import io
import posixpath
import re
import zipfile

_BLOCK_TAGS = r"p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section|article"


def strip_html(s: str) -> str:
    """Python-side twin of :func:`sparkdon.sources.warc.html_to_text`
    (same rule set) for per-payload use inside zip containers."""
    s = re.sub(r"(?is)<(script|style)\b.*?</\1\s*>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(rf"(?i)</?({_BLOCK_TAGS})\b[^>]*>", "\n", s)
    s = re.sub(r"(?s)<[^>]*>", " ", s)
    s = html.unescape(s)
    s = re.sub(r"[ \t\x0b\f\r]+", " ", s)
    s = re.sub(r" ?\n[ \n]*", "\n", s)
    return s.strip()


def docx_to_text(payload: bytes) -> str:
    """DOCX bytes → text, one line per ``<w:p>`` paragraph."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        return _docx_from_zip(zf)


def _docx_from_zip(zf: "zipfile.ZipFile") -> str:
    xml = zf.read("word/document.xml").decode("utf-8", "replace")
    paras: list[str] = []
    for p in re.findall(r"(?s)<w:p[ >].*?</w:p>|<w:p/>", xml):
        parts: list[str] = []
        for m in re.finditer(
                r"(?s)<w:t(?:\s[^>]*)?>(.*?)</w:t>|<w:tab/>|<w:br/>", p):
            if m.group(0) == "<w:tab/>":
                parts.append("\t")
            elif m.group(0) == "<w:br/>":
                parts.append("\n")
            else:
                parts.append(html.unescape(m.group(1)))
        paras.append("".join(parts))
    return "\n".join(paras).strip()


def epub_to_text(payload: bytes) -> str:
    """EPUB bytes → text, chapters in OPF spine (reading) order."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        return _epub_from_zip(zf)


def _epub_from_zip(zf: "zipfile.ZipFile") -> str:
    names = set(zf.namelist())
    opf_path = None
    if "META-INF/container.xml" in names:
        container = zf.read("META-INF/container.xml") \
            .decode("utf-8", "replace")
        m = re.search(r'full-path="([^"]+)"', container)
        if m:
            opf_path = m.group(1)
    docs: list[str] = []
    if opf_path and opf_path in names:
        opf = zf.read(opf_path).decode("utf-8", "replace")
        base = posixpath.dirname(opf_path)
        hrefs = {m.group("id"): m.group("href") for m in re.finditer(
            r'<item\b[^>]*\bid="(?P<id>[^"]+)"[^>]*\bhref='
            r'"(?P<href>[^"]+)"[^>]*/?>', opf)}
        # items may list href before id — sweep the other order too
        for m in re.finditer(
                r'<item\b[^>]*\bhref="(?P<href>[^"]+)"[^>]*\bid='
                r'"(?P<id>[^"]+)"[^>]*/?>', opf):
            hrefs.setdefault(m.group("id"), m.group("href"))
        for idref in re.findall(r'<itemref\b[^>]*\bidref="([^"]+)"',
                                opf):
            href = hrefs.get(idref)
            if not href:
                continue
            path = posixpath.normpath(posixpath.join(base, href))
            if path in names:
                docs.append(path)
    if not docs:  # no/odd OPF: fall back to archive-order XHTML
        docs = [n for n in zf.namelist()
                if n.lower().endswith((".xhtml", ".html", ".htm"))]
    chapters = [strip_html(zf.read(d).decode("utf-8", "replace"))
                for d in docs]
    return "\n\n".join(c for c in chapters if c).strip()


def zip_document_text(payload: bytes) -> str:
    """Dispatch a ZIP-container document by its members: DOCX or EPUB;
    anything else raises (an arbitrary archive is not a document).
    The ZipFile is opened ONCE and shared with the format extractor —
    this runs per document in the extract_text hot path."""
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        names = set(zf.namelist())
        if "word/document.xml" in names:
            return _docx_from_zip(zf)
        if "META-INF/container.xml" in names or "mimetype" in names:
            return _epub_from_zip(zf)
    raise ValueError("ZIP payload is neither DOCX nor EPUB")


_SRT_INDEX = re.compile(r"^\d+$")
_SRT_TIME = re.compile(
    r"^\d{2}:\d{2}:\d{2}[,.]\d{3}\s*-->\s*\d{2}:\d{2}:\d{2}[,.]\d{3}")
_VTT_TIME = re.compile(r"^\S*\s*\d{2}:\d{2}(:\d{2})?\.\d{3}\s*-->")


def subtitle_to_text(payload: bytes) -> str:
    """SRT / WebVTT → caption text only: cue indices, timestamp lines,
    WEBVTT headers, NOTE/STYLE blocks and inline markup tags are
    dropped; consecutive cue lines join with newlines.  Subtitle files
    are a common video-adjacent text source in crawled corpora."""
    lines = [ln.strip() for ln in
             payload.decode("utf-8-sig", "replace").splitlines()]
    out: list[str] = []
    skipping_block = False
    for i, stripped in enumerate(lines):
        if not stripped:
            skipping_block = False
            continue
        if skipping_block:
            continue
        if stripped == "WEBVTT" or stripped.startswith("WEBVTT "):
            continue
        if stripped.startswith("X-TIMESTAMP-MAP"):  # HLS VTT segments
            continue
        # NOTE/STYLE/REGION start a comment block ONLY at a block
        # boundary and as a whole token — caption text may legitimately
        # begin with the words NOTE or NOTEBOOKS
        at_boundary = i == 0 or not lines[i - 1]
        if at_boundary and (stripped in ("NOTE", "STYLE", "REGION")
                            or stripped.startswith(("NOTE ", "STYLE ",
                                                    "REGION "))):
            skipping_block = True
            continue
        if _SRT_TIME.match(stripped) or _VTT_TIME.match(stripped):
            continue
        # a VTT cue IDENTIFIER (or an SRT index — all-digit caption
        # lines elsewhere are REAL text) is the line right before a
        # timestamp line
        if i + 1 < len(lines) and (_VTT_TIME.match(lines[i + 1])
                                   or _SRT_TIME.match(lines[i + 1])):
            continue
        # inline cue markup: <i>, <b>, <c.class>, <00:00:01.000>
        stripped = re.sub(r"<[^>]*>", "", stripped)
        if stripped:
            out.append(stripped)
    return "\n".join(out)


def looks_like_subtitles(raw: bytes) -> bool:
    """Cheap magic check for the extract_text dispatcher."""
    head = raw[:256].decode("utf-8-sig", "replace")
    if head.lstrip().startswith("WEBVTT"):
        return True
    lines = [ln.strip() for ln in head.splitlines() if ln.strip()][:2]
    return (len(lines) == 2 and _SRT_INDEX.match(lines[0]) is not None
            and _SRT_TIME.match(lines[1]) is not None)


#: environments whose CONTENT is not prose (dropped whole); document
#: structure environments are unwrapped instead
_TEX_DROP_ENVS = ("equation", "align", "gather", "eqnarray", "figure",
                  "table", "tabular", "tikzpicture", "verbatim",
                  "lstlisting", "thebibliography")

#: commands whose argument IS the text (unwrap braces)
_TEX_UNWRAP = ("textbf", "textit", "emph", "underline", "texttt",
               "section", "subsection", "subsubsection", "paragraph",
               "chapter", "title", "author", "caption", "footnote",
               "mbox", "text")


def latex_to_text(src: str) -> str:
    """LaTeX source → prose (the arXiv-dump extraction shape).  A
    documented HEURISTIC de-markup, not a TeX engine: comments, math
    (inline and display), non-prose environments, and unknown commands
    drop; text-carrying commands unwrap their argument; special-char
    escapes restore.  The goal is training-corpus text, where a lost
    formula beats leaked markup."""
    # \\ linebreaks (with optional [2mm] spacing) become sentinels
    # FIRST: left in place they read as escapes (\\% is linebreak +
    # comment, not an escaped percent) and their [..] argument as a
    # display-math opener
    s = re.sub(r"\\\\(\[[^\]]*\])?", "\x02", src)
    s = re.sub(r"(?<!\\)%[^\n]*", "", s)               # comments
    m = re.search(r"\\begin\{document\}(.*)\\end\{document\}", s,
                  re.S)
    if m:
        s = m.group(1)
    for env in _TEX_DROP_ENVS:
        s = re.sub(rf"(?s)\\begin\{{{env}\*?\}}.*?\\end\{{{env}\*?\}}",
                   " ", s)
    s = re.sub(r"(?s)\$\$.*?\$\$|\\\[.*?\\\]|\\\(.*?\\\)", " ", s)
    s = re.sub(r"(?s)(?<!\\)\$[^$]*\$", " ", s)        # inline math
    s = re.sub(r"\\(begin|end)\{[^}]*\}", " ", s)      # env wrappers
    for _ in range(3):  # nested unwraps: \emph{\textbf{x}}
        s = re.sub(rf"\\(?:{'|'.join(_TEX_UNWRAP)})\*?"
                   r"(?:\[[^\]]*\])?\{([^{}]*)\}", r"\1", s)
    s = re.sub(r"\\(?:cite|ref|eqref|label|input|include|usepackage|"
               r"includegraphics|bibliography(?:style)?|documentclass)"
               r"\*?(?:\[[^\]]*\])?\{[^}]*\}", " ", s)
    s = re.sub(r"\\[A-Za-z@]+\*?(?:\[[^\]]*\])?", " ", s)  # leftovers
    s = re.sub(r"\\([%&_$#])", r"\1", s)              # escapes
    # author-escaped literal braces must survive the grouping-brace
    # strip below — sentinel them through it
    s = s.replace("\\{", "\x00").replace("\\}", "\x01")
    s = s.replace("~", " ").replace("{", "").replace("}", "")
    s = s.replace("\x00", "{").replace("\x01", "}")
    s = s.replace("\x02", "\n")                        # linebreaks
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r" ?\n[ \n]*\n[ \n]*", "\n\n", s)       # paragraphs
    s = re.sub(r" ?\n ?", "\n", s)
    return s.strip()


def looks_like_latex(raw: bytes) -> bool:
    """Cheap magic for the extract_text dispatcher (TeX has none).
    Multi-file arXiv sources (chapter .tex \\input by main.tex) carry
    no preamble, so a density-of-commands heuristic backs up the
    preamble probe."""
    import re as _re

    head = raw[:4096]
    if b"\\documentclass" in head or b"\\begin{document}" in head:
        return True
    hits = _re.findall(
        rb"\\(?:section|subsection|chapter|begin|end|emph|textbf|"
        rb"cite|label|ref|item)\b", head)
    return len(hits) >= 3


# --- writer twins for round-trip tests -------------------------------------

def text_to_docx(paragraphs: list[str]) -> bytes:
    """Minimal valid DOCX: [Content_Types], rels, and a document.xml
    with one ``<w:p>``/``<w:t>`` per paragraph."""
    w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">"
        f"{html.escape(p)}</w:t></w:r></w:p>" for p in paragraphs)
    doc = (f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
           f'<w:document xmlns:w="{w}"><w:body>{body}</w:body>'
           f'</w:document>')
    ctypes = ('<?xml version="1.0"?><Types xmlns="http://schemas.'
              'openxmlformats.org/package/2006/content-types">'
              '<Default Extension="xml" ContentType="application/xml"/>'
              '<Override PartName="/word/document.xml" ContentType='
              '"application/vnd.openxmlformats-officedocument.'
              'wordprocessingml.document.main+xml"/></Types>')
    rels = ('<?xml version="1.0"?><Relationships xmlns="http://schemas.'
            'openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/officeDocument" '
            'Target="word/document.xml"/></Relationships>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", ctypes)
        zf.writestr("_rels/.rels", rels)
        zf.writestr("word/document.xml", doc)
    return buf.getvalue()


def chapters_to_epub(chapters: list[tuple[str, str]]) -> bytes:
    """Minimal valid EPUB from ``(title, body_text)`` chapters —
    container.xml → OPF with manifest + spine → one XHTML per chapter
    (spine deliberately references them in the given order)."""
    items, spine, files = [], [], []
    for i, (title, text) in enumerate(chapters):
        name = f"ch{i}.xhtml"
        body = "".join(f"<p>{html.escape(line)}</p>"
                       for line in text.split("\n"))
        files.append((f"OEBPS/{name}",
                      f"<html><head><title>{html.escape(title)}</title>"
                      f"</head><body><h1>{html.escape(title)}</h1>"
                      f"{body}</body></html>"))
        items.append(f'<item id="c{i}" href="{name}" '
                     f'media-type="application/xhtml+xml"/>')
        spine.append(f'<itemref idref="c{i}"/>')
    opf = (f'<?xml version="1.0"?><package xmlns="http://www.idpf.org/'
           f'2007/opf" version="3.0"><manifest>{"".join(items)}'
           f'</manifest><spine>{"".join(spine)}</spine></package>')
    container = ('<?xml version="1.0"?><container version="1.0" xmlns='
                 '"urn:oasis:names:tc:opendocument:xmlns:container">'
                 '<rootfiles><rootfile full-path="OEBPS/content.opf" '
                 'media-type="application/oebps-package+xml"/>'
                 '</rootfiles></container>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("META-INF/container.xml", container)
        zf.writestr("OEBPS/content.opf", opf)
        for path, content in files:
            zf.writestr(path, content)
    return buf.getvalue()
