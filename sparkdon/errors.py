"""Jupyter-friendly error reporting (reference Q9).

gastrodon marks the parse-error site with a caret line and suppresses the
noisy traceback (`GastrodonException._render_traceback_`,
gastrodon/__init__.py:130-159, 536-594).  We reproduce the same UX over
our own parser and over Spark's AnalysisException noise.
"""

from __future__ import annotations


class SparkdonError(Exception):
    """Base error; carries display lines for notebook-friendly rendering."""

    def __init__(self, *args, lines: list[str] | None = None):
        super().__init__(*args)
        self.lines = lines if lines is not None else [str(a) for a in args]

    def _render_traceback_(self):  # IPython hook (gastrodon/__init__.py:155-159)
        return self.lines


class SparqlSyntaxError(SparkdonError):
    """Parse error with a caret marking the failure position
    (mirrors gastrodon/__init__.py:584-588)."""

    def __init__(self, text: str, pos: int, message: str):
        line_start = text.rfind("\n", 0, pos) + 1
        line_end = text.find("\n", pos)
        if line_end == -1:
            line_end = len(text)
        line_no = text.count("\n", 0, pos) + 1
        col = pos - line_start
        src_line = text[line_start:line_end]
        caret = " " * col + "^"
        lines = [
            f"Error parsing SPARQL at line {line_no}:",
            src_line,
            caret,
            message,
        ]
        super().__init__("\n".join(lines), lines=lines)
        self.pos = pos
        self.message = message


class QueryExecutionError(SparkdonError):
    """Wraps engine-side failures with the query text attached."""

    def __init__(self, message: str, sparql: str | None = None):
        lines = [message]
        if sparql:
            lines += ["", "while executing:", sparql]
        super().__init__("\n".join(lines), lines=lines)


def one_error(count: int) -> SparkdonError:
    """Error for `one()` on a non-singleton (gastrodon/__init__.py:859-883)."""
    return SparkdonError(f"expected exactly one result, got {count}")
