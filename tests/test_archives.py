"""TAR ingestion + LaTeX extraction (the arXiv-dump pipeline shape):
member explosion, compression variants, corrupt-archive tolerance,
de-markup heuristics, and the tar -> extract_text composition."""

import pytest

from sparkdon.docformats import latex_to_text, looks_like_latex
from sparkdon.sources.archives import read_tar, tar_bytes, tar_members

TEX = r"""\documentclass{article} % class
\usepackage{amsmath}
\begin{document}
\title{A \textbf{Great} Paper}
We study the problem. % trailing comment
The result $x^2 + y$ holds for \emph{all} cases~\cite{smith2020}.

\begin{equation}
  e = mc^2
\end{equation}
Escaped: 50\% of \&cases.
\end{document}
"""


def test_latex_to_text():
    got = latex_to_text(TEX)
    assert "A Great Paper" in got
    assert "We study the problem." in got
    assert "for all cases" in got
    assert "Escaped: 50% of &cases." in got
    assert "$" not in got and "\\" not in got and "mc^2" not in got
    assert "amsmath" not in got and "smith2020" not in got
    assert looks_like_latex(TEX.encode())
    assert not looks_like_latex(b"plain text about \\\\ nothing")


def test_tar_members_and_limits():
    data = tar_bytes([("a/paper.tex", TEX), ("a/fig.bin", b"\x00" * 64)])
    got = {name: payload for name, _, _, payload in tar_members(data)}
    assert set(got) == {"a/paper.tex", "a/fig.bin"}
    assert got["a/paper.tex"].decode() == TEX
    # oversized members are skipped whole, not truncated
    small = {n for n, *_ in tar_members(data, max_member_bytes=100)}
    assert small == {"a/fig.bin"}


def test_read_tar_scan_and_extract_text(spark, tmp_path):
    from pyspark.sql import functions as F

    from sparkdon.multimodal import extract_text

    (tmp_path / "d1.tar").write_bytes(
        tar_bytes([("p1.tex", TEX), ("notes.txt", "plain notes")]))
    (tmp_path / "d2.tar.gz").write_bytes(
        tar_bytes([("p2.tex", TEX)], gz=True))
    (tmp_path / "bad.tar").write_bytes(b"not a tar at all" * 40)

    members = read_tar(spark, str(tmp_path))
    assert members.filter("member like '%.tex'").count() == 2
    assert members.count() == 3  # the corrupt archive contributes 0

    media = members.select(
        F.monotonically_increasing_id().alias("media_id"),
        F.lit("document").alias("modality"), "payload",
        F.lit(None).cast(
            "struct<mime:string,width:int,height:int,duration_ms:long>"
        ).alias("meta"))
    texts = [r["text"] for r in extract_text(media).collect()]
    assert sum("A Great Paper" in t for t in texts) == 2
    assert "plain notes" in texts


def test_latex_review_fixes():
    # \\[2mm] is a linebreak, NOT a display-math opener
    got = latex_to_text("a \\\\[2mm] b\nsome prose\n\\[ e=mc^2 \\]\ntail")
    assert "b" in got and "some prose" in got and "mc^2" not in got
    # the \\ linebreak itself never leaks
    got = latex_to_text("roses are red \\\\\nviolets are blue")
    assert "\\" not in got and "roses are red" in got
    # escaped literal braces survive the grouping-brace strip
    assert latex_to_text(r"The set \{a, b\} is small.") == \
        "The set {a, b} is small."
    # % after \\ starts a comment (only \% escapes a percent)
    got = latex_to_text("line one \\\\% secret\nline two")
    assert "secret" not in got and "line two" in got
    assert latex_to_text(r"grew by 50\% overall") == "grew by 50% overall"


def test_latex_multifile_detection_and_corrupt_gz(spark, tmp_path):
    from sparkdon.sources.archives import read_tar

    chapter = (b"\\section{Intro}\nWe study \\emph{foo} here.\n"
               b"\\cite{bar} shows \\textbf{more}.\n")
    assert looks_like_latex(chapter)  # no preamble, command density
    assert not looks_like_latex(b"an essay about the \\\\ character "
                                b"and nothing else")

    # a truncated .tar.gz fails its task no more — readable prefix only
    good = tar_bytes([("ok.txt", "fine")])
    gz = tar_bytes([("x.tex", chapter.decode())], gz=True)
    (tmp_path / "good.tar").write_bytes(good)
    (tmp_path / "trunc.tar.gz").write_bytes(gz[: len(gz) // 2])
    got = read_tar(spark, str(tmp_path)).collect()
    assert [r["member"] for r in got] == ["ok.txt"]
