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


def test_subtitle_extraction():
    from sparkdon.docformats import looks_like_subtitles, subtitle_to_text

    srt = (b"1\n00:00:01,000 --> 00:00:03,000\nHello there.\n\n"
           b"2\n00:00:04,000 --> 00:00:06,500\n<i>Emphasis</i> line\n"
           b"second line\n")
    assert looks_like_subtitles(srt)
    assert subtitle_to_text(srt) == "Hello there.\nEmphasis line\nsecond line"

    vtt = (b"\xef\xbb\xbfWEBVTT\n\nNOTE\nthis is a comment\nmore note\n\n"
           b"cue-1\n00:01.000 --> 00:03.000 align:start\n"
           b"<c.yellow>Caption one</c>\n\n"
           b"00:00:04.000 --> 00:00:06.000\nCaption two\n")
    assert looks_like_subtitles(vtt)
    assert subtitle_to_text(vtt) == "Caption one\nCaption two"

    assert not looks_like_subtitles(b"just ordinary text\nwith lines\n")


def test_extract_text_gzip_and_subtitles(spark):
    import gzip

    from sparkdon.multimodal import extract_text

    srt = b"1\n00:00:01,000 --> 00:00:02,000\nGzipped caption\n"
    rows = [(20, "document", bytearray(gzip.compress(b"plain gz text")),
             (None, None, None, None)),
            (21, "document", bytearray(srt), (None, None, None, None)),
            (22, "document", bytearray(gzip.compress(srt)),
             (None, None, None, None))]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, "
              "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    got = {r["media_id"]: r["text"] for r in extract_text(media).collect()}
    assert got[20] == "plain gz text"
    assert got[21] == "Gzipped caption"
    assert got[22] == "Gzipped caption"


def test_subtitles_keep_note_like_and_numeric_captions():
    from sparkdon.docformats import subtitle_to_text

    srt = (b"1\n00:00:01,000 --> 00:00:03,000\nNOTE: he is lying.\n"
           b"second line\n\n2\n00:00:04,000 --> 00:00:05,000\n"
           b"The year was\n1984\nexactly\n")
    assert subtitle_to_text(srt) == \
        "NOTE: he is lying.\nsecond line\nThe year was\n1984\nexactly"

    vtt = (b"WEBVTT\nX-TIMESTAMP-MAP=LOCAL:00:00:00.000,MPEGTS:900000\n\n"
           b"NOTE real comment\nstill comment\n\n"
           b"00:01.000 --> 00:02.000\nNOTEBOOKS are great\nand cheap\n")
    assert subtitle_to_text(vtt) == "NOTEBOOKS are great\nand cheap"
