"""DOCX/EPUB extraction tests (sparkdon/docformats.py): writer-twin
round-trips, spine ordering, entity/tab/br handling, container
dispatch, and the extract_text routing."""

import pytest

from sparkdon.docformats import (chapters_to_epub, docx_to_text,
                                 epub_to_text, strip_html, text_to_docx,
                                 zip_document_text)


def test_docx_roundtrip():
    paras = ["First paragraph.", "Second & <third> escape.", "", "Last"]
    assert docx_to_text(text_to_docx(paras)) == \
        "First paragraph.\nSecond & <third> escape.\n\nLast"


def test_docx_tabs_breaks_multiruns():
    import io
    import zipfile

    doc = ('<w:document xmlns:w="x"><w:body>'
           '<w:p><w:r><w:t>a</w:t></w:r><w:tab/>'
           '<w:r><w:t xml:space="preserve">b </w:t></w:r>'
           '<w:br/><w:r><w:t>c</w:t></w:r></w:p>'
           '</w:body></w:document>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", doc)
    assert docx_to_text(buf.getvalue()) == "a\tb \nc"


def test_epub_roundtrip_spine_order():
    # spine order is authoritative even when archive order differs
    chapters = [("Alpha", "line one\nline two"), ("Beta", "second ch")]
    text = epub_to_text(chapters_to_epub(chapters))
    assert "Alpha" in text and "line two" in text and "second ch" in text
    assert text.index("Alpha") < text.index("Beta")


def test_zip_dispatch_and_boundary():
    import io
    import zipfile

    assert "First" in zip_document_text(text_to_docx(["First"]))
    assert "ch" in zip_document_text(chapters_to_epub([("T", "ch")]))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("random.bin", b"xx")
    with pytest.raises(ValueError, match="neither"):
        zip_document_text(buf.getvalue())


def test_strip_html_matches_jvm_rules():
    s = ("<html><style>x{}</style><body><h1>A&amp;B</h1>"
         "<!-- no --><p>one  two</p><script>bad()</script></body>")
    got = strip_html(s)
    assert "A&B" in got and "one two" in got
    assert "bad" not in got and "x{}" not in got and "no" not in got


def test_extract_text_routes_zip(spark):
    from sparkdon.multimodal import extract_text

    rows = [(10, "document", bytearray(text_to_docx(["docx body"])),
             ("application/vnd.openxmlformats", None, None, None)),
            (11, "document", bytearray(chapters_to_epub([("C", "epub body")])),
             ("application/epub+zip", None, None, None)),
            (12, "document", bytearray(b"PK\x03\x04garbage-not-a-zip"),
             ("application/zip", None, None, None))]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, "
              "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    got = {r["media_id"]: r["text"] for r in extract_text(media).collect()}
    assert got[10] == "docx body"
    assert "epub body" in got[11]
    assert got[12] is None  # corrupt zip → null, not a dead task
