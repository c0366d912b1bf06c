"""PDF text-extraction tests (sparkdon/pdf.py): writer-twin
round-trips (compressed + raw), string escape forms, hex strings, TJ
arrays, metadata, boundaries, and the Spark extract_text stage."""

import zlib

import pytest

from sparkdon.pdf import pdf_info, pdf_to_text, text_to_pdf

TEXT = "Hello, PDF world!\nSecond line with (parens) and \\backslash.\n" \
       "Third: naïve café."


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_roundtrip(compress):
    got = pdf_to_text(text_to_pdf(TEXT, compress=compress))
    assert "Hello, PDF world!" in got
    assert "(parens) and \\backslash" in got
    assert "naïve café" in got
    # Td/T* line structure survives
    assert got.index("Hello") < got.index("Second") < got.index("Third")
    assert "Second line" in got.split("\n")[1]


def test_pdf_escapes_hex_and_tj_array():
    # hand-built content stream exercising \ddd octal, hex strings,
    # and a kerned TJ array
    content = (b"BT /F1 10 Tf 50 700 Td "
               b"(A\\101\\102) Tj "          # octal: A AB
               b"<48656C6C6F> Tj "            # hex: Hello
               b"[(ker) -120 (ned)] TJ "      # array with kerning
               b"T* (line2) Tj ET")
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Length "
           + str(len(content)).encode()
           + b" >>\nstream\n" + content + b"\nendstream\nendobj\n")
    got = pdf_to_text(pdf)
    assert "AAB" in got and "Hello" in got
    assert "kerned" in got
    assert got.endswith("line2")


def test_pdf_flate_content_and_objstm():
    inner = b"BT 1 0 0 1 50 700 Tm (packed text) Tj ET"
    stream = zlib.compress(b"<< /Type /Page >>\n" + inner)
    pdf = (b"%PDF-1.5\n2 0 obj\n<< /Type /ObjStm /Filter /FlateDecode"
           b" /Length " + str(len(stream)).encode()
           + b" >>\nstream\n" + stream + b"\nendstream\nendobj\n")
    assert pdf_to_text(pdf) == "packed text"


def test_pdf_boundaries():
    with pytest.raises(ValueError, match="not a PDF"):
        pdf_to_text(b"PK\x03\x04")
    with pytest.raises(ValueError, match="encrypted"):
        pdf_to_text(b"%PDF-1.4\n<< /Encrypt 9 0 R >>")
    # a text-free (image-only) PDF extracts to empty, not an error
    assert pdf_to_text(b"%PDF-1.4\nno streams here\n%%EOF") == ""


def test_pdf_info():
    pdf = text_to_pdf("body", title="My (Great) Doc")
    info = pdf_info(pdf)
    assert info["pdf_version"] == "1.4"
    assert info["title"] == "My (Great) Doc"
    assert info["pages"] == 1
    # UTF-16 text strings decode
    utf16 = "Tîtle".encode("utf-16")  # BOM-prefixed
    esc = utf16.replace(b"\\", b"\\\\").replace(b"(", b"\\(") \
        .replace(b")", b"\\)")
    raw = b"%PDF-1.7\n1 0 obj\n<< /Title (" + esc + b") >>\nendobj\n"
    assert pdf_info(raw)["title"] == "T\u00eetle"


def test_extract_text_stage(spark):
    from sparkdon.multimodal import extract_metadata, extract_text

    pdf = text_to_pdf("spark pdf doc", title="T1")
    rows = [(1, "document", bytearray(pdf), ("application/pdf",) + (None,) * 3),
            (2, "document", bytearray(b"plain utf8 \xc3\xa9"),
             ("text/plain", None, None, None)),
            (3, "document", bytearray(b"%PDF-1.4\n<< /Encrypt 9 0 R >>"),
             ("application/pdf", None, None, None))]
    media = spark.createDataFrame(
        rows, "media_id long, modality string, payload binary, "
              "meta struct<mime:string,width:int,height:int,duration_ms:long>")
    got = {r["media_id"]: r["text"]
           for r in extract_text(media).collect()}
    assert got[1] == "spark pdf doc"
    assert got[2] == "plain utf8 é"
    assert got[3] is None  # encrypted → null, not a dead task

    md = {r["media_id"]: r["metadata"]
          for r in extract_metadata(media).collect()}
    assert md[1]["title"] == "T1" and md[1]["pages"] == "1"


def test_pdf_font_and_metadata_streams_excluded():
    import zlib

    # a font program whose inflated bytes happen to contain BT ... Tj
    fontish = zlib.compress(b"\x01\x02 BT (garbage) Tj ET \x03")
    pdf = (b"%PDF-1.4\n5 0 obj\n<< /FontFile2 6 0 R /Filter /FlateDecode"
           b" /Length " + str(len(fontish)).encode()
           + b" >>\nstream\n" + fontish + b"\nendstream\nendobj\n")
    assert pdf_to_text(pdf) == ""
