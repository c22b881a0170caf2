"""v3io filter-dialect → Spark SQL predicate translation.

The reference ships filter strings verbatim to the storage server
(``os=='linux' and exists(region)``, ref: README.md:96,
pkg/tsdbctl/query.go:100-101, ``=``→``==`` rewrite
pkg/pquerier/sql_parser.go:171-173; ``__name__``→``_name``
pkg/pquerier/querier.go:192). Here the dialect is translated once into
a Spark SQL predicate over the samples schema, so Catalyst can push it
into the Parquet scan. Bare identifiers (anything that isn't a core
column, function call, or keyword) are label references and become
``labels['x']``.
"""

from __future__ import annotations

import re

_CORE_COLS = {"name", "ts", "value", "value_str", "series_id", "labels", "dt", "t"}
_KEYWORDS = {"and", "or", "not", "true", "false", "null", "like", "in", "is", "between"}

_STRING_RE = re.compile(r"('[^']*'|\"[^\"]*\")")


def translate_filter(filter_str: str) -> str:
    """Translate a v3io filter expression into a Spark SQL predicate."""
    if not filter_str or not filter_str.strip():
        return "true"
    parts = _STRING_RE.split(filter_str)
    out = []
    for i, part in enumerate(parts):
        if i % 2 == 1:  # quoted string literal — normalize double quotes
            if part.startswith('"'):
                part = "'" + part[1:-1].replace("'", "\\'") + "'"
            out.append(part)
            continue
        out.append(_translate_fragment(part))
    return "".join(out)


def _translate_fragment(s: str) -> str:
    s = s.replace("==", "=").replace("!=", "<>")

    # bare identifiers → labels['x'] (skip core cols, keywords, function calls)
    def repl(m):
        word = m.group(0)
        rest = s[m.end():].lstrip()
        if rest.startswith("("):  # function call (starts, exists, ...)
            return word
        return _ident(word)

    s = re.sub(r"\b[A-Za-z_][\w.]*\b", repl, s)
    # starts(col, <lit>) → startswith(col, <lit>)
    s = re.sub(r"\bstarts\s*\(", "startswith(", s)
    # exists(col) → (col IS NOT NULL)
    s = re.sub(r"\bexists\s*\(\s*([^)]*?)\s*\)", r"(\1 IS NOT NULL)", s)
    return s


def _ident(word: str) -> str:
    lw = word.lower()
    if lw in _KEYWORDS or lw in _CORE_COLS:
        if lw in ("__name__", "_name"):
            return "name"
        return word
    if word in ("__name__", "_name"):
        return "name"
    if "." in word:  # already qualified (e.g. labels.os)
        return word
    return f"labels['{word}']"
